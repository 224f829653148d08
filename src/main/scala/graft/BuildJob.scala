package graft

import graft.functions.GraftFunctions._
import graft.operators.{BqfParams, SketchAggregators}
import graft.sources.TokensTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One isolated headline-build measurement, meant to run in a fresh JVM so
  * scaling comparisons aren't polluted by heap/JIT state from earlier runs.
  * Builds the sharded sketch index (fixed shard count — the same job at any
  * parallelism) and prints one JSON line.
  *
  * args: cpus rows nBuckets [mode: sorted|udaf]
  */
object BuildJob {
  def main(args: Array[String]): Unit = {
    val Array(cpus, rows, nBuckets) = args.take(3).map(_.toInt)
    val mode = if (args.length > 3) args(3) else "sorted"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-build-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.kryoserializer.buffer.max", "512m")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      // xxhash64 fingerprints are high-entropy by construction: LZ4 on the
      // shuffle saved 11% bytes but cost ~20 s/core per 93M k-grams
      // (measured via StageMetrics) — 2.4x the map stage. Off for THIS job;
      // text-shuffling queries keep the default.
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val params = BqfParams(qBits = 16, countBits = 8, hashBits = 48, kTokens = 8, zTokens = 2)
    // per-stage metrics (north rule): one JSON line per completed stage on
    // stderr; stdout stays a single result line for the bench parser
    val stageMetrics = graft.plans.StageMetrics.attach(spark)
    def emitStages(): Unit = stageMetrics.jsonLines.foreach(l => System.err.println(s"[stage] $l"))
    val df = TokensTable.dataframe(spark, rows.toLong, partitions = cpus)
    val fps = sgram_fingerprints(col("tokens"), params.sTokens, params.hashBits, params.seed)
    val kgrams = df.select(sum(greatest(col("n_tok") - (params.sTokens - 1), lit(0)))).head().getLong(0)
    val t0 = System.nanoTime()
    // aggregate over the sketch bytes so Catalyst cannot prune the build
    // (a bare .count() would optimize the sketch construction away)
    mode match {
      case "fps" => // decompose: fingerprint generation only
        val n = df.select(explode(fps).as("fp")).count()
        println(s"""{"sec":${(System.nanoTime() - t0) / 1e9},"kgrams":$kgrams,"shards":0,"sketch_bytes":$n,"cpus":$cpus,"mode":"fps"}""")
        emitStages(); spark.stop(); return
      case "shuffle" => // decompose: fingerprints + shuffle, no build
        val shift = params.hashBits - java.lang.Integer.numberOfTrailingZeros(nBuckets)
        val n = df.select(explode(fps).as("fp"))
          .repartition(nBuckets, expr(s"shiftrightunsigned(fp, $shift)"))
          .count()
        println(s"""{"sec":${(System.nanoTime() - t0) / 1e9},"kgrams":$kgrams,"shards":0,"sketch_bytes":$n,"cpus":$cpus,"mode":"shuffle"}""")
        emitStages(); spark.stop(); return
      case "consume" => // decompose: shuffle + typed iterator consumption
        import spark.implicits._
        val shift = params.hashBits - java.lang.Integer.numberOfTrailingZeros(nBuckets)
        val n = df.select(explode(fps).as("fp"))
          .repartition(nBuckets, expr(s"shiftrightunsigned(fp, $shift)"))
          .select("fp").as[Long]
          .mapPartitions { it => var s = 0L; var c = 0L; it.foreach { v => s += v; c += 1 }; Iterator.single(c) }
          .reduce(_ + _)
        println(s"""{"sec":${(System.nanoTime() - t0) / 1e9},"kgrams":$kgrams,"shards":0,"sketch_bytes":$n,"cpus":$cpus,"mode":"consume"}""")
        emitStages(); spark.stop(); return
      case "chunks" => // decompose: map side of the sorted build only —
        // fingerprints + per-bucket chunk builders + chunk-row encode, NO
        // exchange (counts chunk rows in place). sorted minus chunks
        // isolates what the shuffle write/read itself costs.
        import spark.implicits._
        val shift = params.hashBits - java.lang.Integer.numberOfTrailingZeros(nBuckets)
        val n = df.select(fps.as("fps")).as[Array[Long]]
          .mapPartitions { docs =>
            val builders = new Array[scala.collection.mutable.ArrayBuilder.ofLong](nBuckets)
            docs.foreach { arr =>
              if (arr != null) {
                var i = 0
                while (i < arr.length) {
                  val b = (arr(i) >>> shift).toInt
                  if (builders(b) == null) builders(b) = new scala.collection.mutable.ArrayBuilder.ofLong
                  builders(b).addOne(arr(i))
                  i += 1
                }
              }
            }
            Iterator.range(0, nBuckets).flatMap { b =>
              if (builders(b) == null) Iterator.empty
              else { val r = builders(b).result(); builders(b) = null; Iterator.single((b.toLong, r)) }
            }
          }
          .map(c => c._2.length.toLong).reduce(_ + _)
        println(s"""{"sec":${(System.nanoTime() - t0) / 1e9},"kgrams":$kgrams,"shards":0,"sketch_bytes":$n,"cpus":$cpus,"mode":"chunks"}""")
        emitStages(); spark.stop(); return
      case "write" => // decompose: chunks + exchange write/read, NO array
        // decode and no shard build (bare count after the repartition)
        val shift = params.hashBits - java.lang.Integer.numberOfTrailingZeros(nBuckets)
        val spark2 = spark; import spark2.implicits._
        val n = df.select(fps.as("fps")).as[Array[Long]]
          .mapPartitions { docs =>
            val builders = new Array[scala.collection.mutable.ArrayBuilder.ofLong](nBuckets)
            docs.foreach { arr =>
              if (arr != null) {
                var i = 0
                while (i < arr.length) {
                  val b = (arr(i) >>> shift).toInt
                  if (builders(b) == null) builders(b) = new scala.collection.mutable.ArrayBuilder.ofLong
                  builders(b).addOne(arr(i))
                  i += 1
                }
              }
            }
            Iterator.range(0, nBuckets).flatMap { b =>
              if (builders(b) == null) Iterator.empty
              else { val r = builders(b).result(); builders(b) = null; Iterator.single((b.toLong, r)) }
            }
          }
          .toDF("bucket", "chunk")
          .repartition(nBuckets, col("bucket"))
          // sum(size(chunk)) reads only each array's length header — keeps
          // the chunk column from being pruned out of the exchange without
          // paying the Array[Long] decode
          .agg(sum(size(col("chunk")))).head().getLong(0)
        println(s"""{"sec":${(System.nanoTime() - t0) / 1e9},"kgrams":$kgrams,"shards":0,"sketch_bytes":$n,"cpus":$cpus,"mode":"write"}""")
        emitStages(); spark.stop(); return
      case "writebin" => // A/B of "write": chunks packed to BINARY columns
        // (one Platform.copyMemory per chunk) instead of array<long>
        val shift = params.hashBits - java.lang.Integer.numberOfTrailingZeros(nBuckets)
        val spark3 = spark; import spark3.implicits._
        val n = df.select(fps.as("fps")).as[Array[Long]]
          .mapPartitions { docs =>
            val builders = new Array[scala.collection.mutable.ArrayBuilder.ofLong](nBuckets)
            docs.foreach { arr =>
              if (arr != null) {
                var i = 0
                while (i < arr.length) {
                  val b = (arr(i) >>> shift).toInt
                  if (builders(b) == null) builders(b) = new scala.collection.mutable.ArrayBuilder.ofLong
                  builders(b).addOne(arr(i))
                  i += 1
                }
              }
            }
            Iterator.range(0, nBuckets).flatMap { b =>
              if (builders(b) == null) Iterator.empty
              else {
                val r = builders(b).result(); builders(b) = null
                val bytes = new Array[Byte](8 * r.length)
                org.apache.spark.unsafe.Platform.copyMemory(
                  r, org.apache.spark.unsafe.Platform.LONG_ARRAY_OFFSET,
                  bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length)
                Iterator.single((b.toLong, bytes))
              }
            }
          }
          .toDF("bucket", "chunk")
          .repartition(nBuckets, col("bucket"))
          .agg(sum(octet_length(col("chunk")))).head().getLong(0)
        println(s"""{"sec":${(System.nanoTime() - t0) / 1e9},"kgrams":$kgrams,"shards":0,"sketch_bytes":$n,"cpus":$cpus,"mode":"writebin"}""")
        emitStages(); spark.stop(); return
      case "merge" => // time the DISTRIBUTED merge only: 128 shards -> 16
        val shards = graft.plans.BqfPipeline.buildIndexSorted(df, fps, params, nBuckets)
        shards.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count() // build untimed
        val tm0 = System.nanoTime()
        val merged = graft.plans.BqfPipeline.reshardMerge(shards, params, math.max(1, nBuckets / 8))
        val row = merged.agg(count(lit(1)).as("shards"), sum(octet_length(col("sketch"))).as("bytes")).head()
        println(s"""{"sec":${(System.nanoTime() - tm0) / 1e9},"kgrams":$kgrams,"shards":${row.getLong(0)},"sketch_bytes":${row.getLong(1)},"cpus":$cpus,"mode":"merge"}""")
        emitStages(); spark.stop(); return
      case _ => ()
    }
    val shards = mode match {
      case "udaf" =>
        val bqf = SketchAggregators.bqfOverFingerprintArrays(params)
        df.withColumn("bucket", pmod(xxhash64(col("doc_id")), lit(nBuckets)))
          .groupBy(col("bucket"))
          .agg(bqf(fps).as("sketch"))
      case _ =>
        graft.plans.BqfPipeline.buildIndexSorted(df, fps, params, nBuckets)
    }
    val row = shards
      .agg(count(lit(1)).as("shards"), sum(octet_length(col("sketch"))).as("bytes"))
      .head()
    val sec = (System.nanoTime() - t0) / 1e9
    // this JVM's total GC time: startup GC before t0 is negligible (fixed
    // pre-touched heap, no allocation storm before the job), so the figure
    // attributes the build's own collector cost — the per-phase evidence
    // the r3 verdict asked for
    val gcMs = {
      val it = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.iterator()
      var t = 0L; while (it.hasNext) t += it.next().getCollectionTime
      t
    }
    println(s"""{"sec":$sec,"kgrams":$kgrams,"shards":${row.getLong(0)},"sketch_bytes":${row.getLong(1)},"cpus":$cpus,"mode":"$mode","gc_ms":$gcMs}""")
    emitStages()
    spark.stop()
  }

  /** tmpfs scratch for forked-JVM shuffle files (Spark creates per-app
    * subdirs inside and removes them on exit). tmpfs is RAM-backed, so two
    * guards (ADVICE r6): (1) require enough usable space for the largest
    * job's shuffle footprint (~3 GB of uncompressed fingerprints at the
    * 2.4M-row scaling size) plus slack, else fall back to the disk tmpdir;
    * (2) sweep per-app subdirs leaked by crashed forks — Spark only removes
    * them on graceful exit — but ONLY stale ones (>2 h old), because a live
    * harness session and the current fork share this directory.
    */
  private[graft] def shmLocalDir: String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) {
      val d = shm.resolve("graft-spark-local")
      try {
        java.nio.file.Files.createDirectories(d)
        val cutoff = System.currentTimeMillis() - 2L * 3600 * 1000
        val it = java.nio.file.Files.list(d).iterator()
        while (it.hasNext) {
          val sub = it.next()
          if (java.nio.file.Files.getLastModifiedTime(sub).toMillis < cutoff)
            try org.apache.commons.io.FileUtils.deleteQuietly(sub.toFile)
            catch { case _: Exception => () }
        }
        val usable = java.nio.file.Files.getFileStore(shm).getUsableSpace
        if (usable < 8L * 1024 * 1024 * 1024) {
          System.err.println(s"[graft] /dev/shm usable ${usable >> 20} MB < 8 GiB; " +
            "shuffle scratch falls back to java.io.tmpdir")
          return System.getProperty("java.io.tmpdir")
        }
      } catch { case _: Exception => () }
      d.toString
    } else System.getProperty("java.io.tmpdir")
  }

  /** Fork a fresh JVM running this main; returns (seconds, kgrams, gcMs). */
  def forked(cpus: Int, rows: Long, nBuckets: Int, heap: String): (Double, Long, Long) = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val opens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    // GC matters more than anything else for comparable scaling numbers on
    // this host: G1 young pauses reach 5-23 s on heaps > ~10 GB (slow
    // memory), which round 1 measured as local[8] *slower* than local[2].
    // ParallelGC + a fixed pre-touched heap + pretenured large arrays keep
    // pause time flat across core counts; pretouch happens before the timed
    // section (BuildJob times only the Spark job itself).
    // executor-sized fork (same rationale as CoreScale.forked): GC threads
    // and ActiveProcessorCount scale with the measured core count — a
    // cluster executor pinned to N cores gets N cores for GC/JIT/netty,
    // and a fixed-8-GC-thread fork lends small levels hidden parallelism
    val cmd = Seq(javaBin) ++ opens ++ Seq(
      s"-Xms$heap", s"-Xmx$heap",
      "-XX:+UseParallelGC", s"-XX:ParallelGCThreads=${math.min(8, math.max(2, cpus))}",
      s"-XX:ActiveProcessorCount=$cpus",
      "-XX:+AlwaysPreTouch", "-XX:PretenureSizeThreshold=1048576",
      "-Dspark.ui.enabled=false",
      // shuffle spill/files on tmpfs: this microVM's virtio disk sustains
      // ~360 MB/s, so at 4+ cores the ~750 MB shuffle write saturates it
      // and the map tasks stall off-CPU (run_ms >> cpu_ms in the stage
      // metrics) — measuring the disk, not the engine. A real cluster
      // executor has provisioned NVMe for exactly this; /dev/shm restores
      // that contract (bytes moved are identical).
      s"-Dspark.local.dir=$shmLocalDir",
      "-cp", System.getProperty("java.class.path"),
      "graft.BuildJob", cpus.toString, rows.toString, nBuckets.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toVector
    proc.waitFor()
    val json = out.find(_.startsWith("""{"sec":"""))
      .getOrElse(throw new RuntimeException(s"BuildJob produced no result; tail: ${out.takeRight(5).mkString(" | ")}"))
    val sec = """"sec":([0-9.Ee+-]+)""".r.findFirstMatchIn(json).get.group(1).toDouble
    val kg = """"kgrams":([0-9]+)""".r.findFirstMatchIn(json).get.group(1).toLong
    val gc = """"gc_ms":([0-9]+)""".r.findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(-1L)
    (sec, kg, gc)
  }
}
