package graft

import graft.functions.GraftFunctions._
import graft.operators.{BqfParams, BqfQuery}
import graft.plans.BqfPipeline
import graft.sources.TokensTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round benchmark: headline sketch-build/query throughput over the
  * deterministic tokens table, the full operator catalog at the bench scale
  * dir, and N-vs-4N-core scaling evidence (local[8] vs local[32] stands in
  * for the two cluster sizes — no real cluster in this sandbox; see
  * BASELINE.md). Prints ONE JSON line.
  */
object Bench {
  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.kryoserializer.buffer.max", "512m")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      // no spark.driver.memory here: in an already-running local-mode JVM it
      // is inert (the heap is build.sbt's clamped -Xmx), and echoing a 90g
      // request into the conf only misleads readers of the Spark UI/logs
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "200000").toLong
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"
    val nBuckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "128").toInt
    // forked measurement JVMs get their own fixed heap: -Xms=-Xmx+pretouch
    // keeps GC behavior identical across core counts, and a moderate size
    // keeps the (untimed) pretouch cheap — first-touch allocation on this
    // host is nonlinearly slow above ~8 GiB (4g=0.4 s, 8g=5 s, 12g=43-138 s
    // measured), so 8g is both the safe and the fast choice. Falls back to
    // SPARK_DRIVER_MEM (the pre-r2 knob name) under the same clamp.
    val heap = sys.env.get("SPARK_GRAFT_FORK_MEM").orElse {
      sys.env.get("SPARK_DRIVER_MEM").map { req =>
        val gb = "^([0-9]+)g$".r.findFirstMatchIn(req.trim.toLowerCase).map(_.group(1).toLong)
        gb match {
          case Some(g) => s"${math.min(math.max(g, 2L), 8L)}g"
          case None => req
        }
      }
    }.getOrElse("8g")

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    // 1. headline: sharded BQF index build over the tokens table, in a fresh
    // forked JVM (the same job at every parallelism level: FIXED shard
    // count; isolation keeps heap/JIT state from skewing the comparison)
    // host timing noise is 2-4x between runs (time-shared microVM): take
    // the min over trials as the capability estimate
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "2").toInt
    val headline = (1 to trials).map(_ => BuildJob.forked(cpus, benchRows, nBuckets, heap))
    val buildSec = headline.map(_._1).min
    val kgrams = headline.head._2
    results += "build_tokens_bqf" -> buildSec

    val spark = session(cpus)

    // 2. point-query throughput: 3M+ abundance probes through the broadcast sketch
    val queryParams = BqfParams(qBits = 16, countBits = 8, hashBits = 48, kTokens = 8, zTokens = 2)
    val queryDf = TokensTable.dataframe(spark, 20000, partitions = cpus)
    val qfps = sgram_fingerprints(col("tokens"), queryParams.sTokens, queryParams.hashBits, queryParams.seed)
    val sketchBytes = BqfPipeline.buildGlobal(queryDf, qfps, queryParams)
    val bq = new BqfQuery(spark, sketchBytes)
    val (nProbes, probeSec) = time {
      val n = queryDf.select(explode(qfps).as("fp"))
        .select(bq.abundanceOf(col("fp")).as("a")).filter(col("a") > 0).count()
      n
    }
    results += "point_queries" -> probeSec

    // 3. Fimpera sequence-stats throughput
    val (_, seqSec) = time {
      queryDf.select(bq.sequenceStatsOf(col("tokens")).as("st"))
        .filter(col("st.presenceRatio") > 0).count()
    }
    results += "sequence_stats" -> seqSec

    // 4. operator catalog at the bench scale dir
    val catalog = Seq(
      "q01_bqf_abundance", "q02_bqf_filter_ge2", "q03_bqf_membership",
      "q04_dedup_exact", "q05_ngram_jaccard", "q06_minhash_lsh", "q07_simhash",
      "q08_text_quality", "q09_token_counts", "q10_langid", "q11_doc_fingerprint",
      "q12_lang_source_stats", "q13_pricing_summary", "q14_top_revenue",
      "q15_sessionize", "q16_json_props", "q17_embedding_topk", "q18_embedding_lsh",
      "q19_tokens_per_source", "q20_tokens_seq_stats", "q21_sketch_compare",
      "q22_quantiles", "q23_enumerate_index", "q24_embedding_ivf",
      "q25_bqf_oom_abundance", "q26_cf_second_emit", "q27_embedding_neardup")
    catalog.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      // a failed query is recorded as -1 (excluded from the total), not as
      // its elapsed-until-failure time
      val sec = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      results += name -> sec
      // per-query progress on stderr as it completes: a killed run still
      // leaves every finished timing in the log (the final JSON line is
      // all-or-nothing)
      System.err.println(f"[bench] $name%-22s ${sec}%8.2f s")
    }

    // 5. scaling evidence (north rule: N -> 4N at >= 0.8). Two series, both
    // min-of-trials with trials INTERLEAVED across levels (this host's
    // timing varies ~2x between identical runs — interleaving samples every
    // level across the same noise windows), each measurement a fresh
    // GC-pinned JVM:
    //   (a) core: the reduce-side kernel (independent shard builds:
    //       generate -> radix sort -> canonical construction) with plain
    //       threads — the library's own scaling, no Spark machinery. This
    //       is the per-executor picture on a real cluster, where each
    //       executor brings its own memory/GC/shuffle service.
    //   (b) end-to-end: the full Spark job (same input, same FIXED 128
    //       shards) at 1/4/16 local cores. Levels stop at 16: nproc=32 is
    //       SMT on ~16 cores and the time-shared microVM sustains ~8-10 —
    //       beyond that a thread curve measures the host, not the library
    //       (bandwidth + core-kernel probes in BENCH/BASELINE.md).
    var scalingJson = ""
    if (doScaling) {
      // 600k docs (~93M k-grams) keeps each level compute-dominated while
      // holding the whole series under ~5 min in typical host windows
      val scaleRows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "600000").toLong
      val levels = sys.env.getOrElse("SPARK_GRAFT_SCALE_CPUS", "1,4,16")
        .split(",").map(_.trim.toInt).distinct.sorted
      val coreTrials = sys.env.getOrElse("SPARK_GRAFT_CORE_TRIALS", "2").toInt
      val scaleTrials = sys.env.getOrElse("SPARK_GRAFT_SCALE_TRIALS", "3").toInt

      def minPerLevel(run: Int => Double, nTrials: Int): Map[Int, Double] =
        (1 to nTrials).flatMap(_ => levels.map(c => c -> run(c)))
          .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).min }

      val core = minPerLevel(c => graft.core.CoreScale.forked(c, 128, 1200000, heap), coreTrials)
      val e2eRuns = (1 to scaleTrials).flatMap(_ =>
        levels.map(c => c -> BuildJob.forked(c, scaleRows, nBuckets, heap)))
      val e2e = e2eRuns.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2._1).min }
      val scaleKgrams = e2eRuns.head._2._2

      def lvlJson(m: Map[Int, Double]) =
        levels.map(c => "\"" + c + "\":" + m(c)).mkString("{", ",", "}")
      def effJson(m: Map[Int, Double]) = levels.sliding(2).collect { case Array(c1, c2) =>
        "\"" + c1 + "->" + c2 + "\":" + ((m(c1) / m(c2)) / (c2.toDouble / c1))
      }.mkString("{", ",", "}")
      val tputJson = levels.map(c => "\"" + c + "\":" + (scaleKgrams / e2e(c)).toLong)
        .mkString("{", ",", "}")
      scalingJson = s""","scaling":{"rows":$scaleRows,"levels":${lvlJson(e2e)},""" +
        s""""kgrams_per_sec":$tputJson,"efficiency":${effJson(e2e)},""" +
        s""""core_levels":${lvlJson(core)},"core_efficiency":${effJson(core)}}"""
    }

    val total = results.values.filter(_ >= 0).sum
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val kgramsPerSec = (kgrams / buildSec).toLong
    // self-diagnosing artifact: the harness JVM's actual heap + collector
    // ride in the JSON, so a GC-roulette anomaly (round-2's 368 s catalog
    // under 90g default-G1) is attributable from the artifact alone
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    val gcNames = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    val gc = {
      val it = gcNames.iterator(); val b = new StringBuilder
      while (it.hasNext) { if (b.nonEmpty) b += '+'; b ++= it.next().getName.replace(' ', '_') }
      b.toString
    }
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"""" +
      s""","cpus":$cpus,"bench_rows":$benchRows,"kgrams":$kgrams""" +
      s""","bqf_build_kgrams_per_sec":$kgramsPerSec,"point_probes":$nProbes""" +
      s""","point_queries_per_sec":${(nProbes / probeSec).toLong}""" +
      s""","harness_heap_mb":$heapMb,"harness_gc":"$gc"$scalingJson}""")
    spark.stop()
  }
}
