package graft.plans

import graft.operators.{BqfParams, SketchAggregators}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed build plans for BQF sketches.
  *
  * Scale design (100 TB / 1000 executors): per-partition partial sketches are
  * produced by Catalyst's partial aggregation (ObjectHashAggregate keeps the
  * filter as a JVM object per group); only serialized sketch blobs cross
  * shuffle boundaries. The sharded path buckets rows by a deterministic
  * xxhash64 of the row id, so shard membership is independent of Spark's
  * physical partitioning — the property that makes checkpoints resumable and
  * replays idempotent. Hot `source` values are handled by salt fan-out
  * before the per-source merge (two-level aggregation), and wide merges fold
  * through a bounded-fanout tree so no single reducer receives all blobs.
  */
object BqfPipeline {

  /** One-shot global build: fingerprint arrays -> single serialized sketch.
    * Plan: partial ObjectHashAggregate per partition -> single-row final
    * merge (fine up to a few thousand partitions; beyond that use
    * [[buildSharded]]).
    */
  def buildGlobal(df: DataFrame, fpCol: Column, params: BqfParams): Array[Byte] = {
    val bqf = SketchAggregators.bqfOverFingerprintArrays(params)
    df.agg(bqf(fpCol).as("sketch")).head().getAs[Array[Byte]](0)
  }

  /** Deterministic-bucket sharded build with bounded-fanout tree merge.
    * `idCol` must be a stable row identifier (e.g. doc_id).
    */
  def buildSharded(df: DataFrame, fpCol: Column, idCol: Column, params: BqfParams,
                   nBuckets: Int, fanout: Int = 16): Array[Byte] = {
    val bqf = SketchAggregators.bqfOverFingerprintArrays(params)
    val shards = df
      .withColumn("bucket", pmod(xxhash64(idCol), lit(nBuckets)))
      .groupBy(col("bucket"))
      .agg(bqf(fpCol).as("sketch"))
    treeMerge(shards, nBuckets, fanout)
  }

  /** Scale-path index build: explode fingerprints, shuffle them to
    * fingerprint-range buckets (high bits, so quotients inside each shard
    * stay uniform), and construct each shard filter in ONE sequential pass
    * from its gathered entries — no per-insert aggregation, no buffer
    * resize churn, no big-object serialization beyond the final sketch
    * blobs. Point queries route to a shard by the same high bits. This is
    * how the build survives 100 TB: Spark's shuffle machinery moves 8-byte
    * fingerprints; the sketch is only materialized once per shard.
    *
    * Returns (bucket, serialized sketch) rows; `nBuckets` must be a power
    * of two.
    */
  def buildIndexSorted(df: DataFrame, fpCol: Column, params: graft.operators.BqfParams,
                       nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && (nBuckets & (nBuckets - 1)) == 0, "nBuckets must be a power of 2")
    val spark = df.sparkSession
    import spark.implicits._
    val bucketBits = java.lang.Integer.numberOfTrailingZeros(nBuckets)
    val shift = params.hashBits - bucketBits
    // Map-side bucketing into ARRAY CHUNKS: a profile of this job at 155M
    // k-grams showed fingerprint extraction itself costs ~2 s at 8 cores
    // while shuffling the fingerprints as individual rows cost ~21 s and
    // re-reading them through the typed row boundary another ~13 s — the
    // row machinery, not the bytes, dominates. So each input task groups
    // its fingerprints by destination bucket and emits one (bucket, chunk)
    // array row per bucket (~tasks x buckets rows total instead of one row
    // per k-gram); array encode/decode is a memcpy. Same shuffle BYTES,
    // ~10^4x fewer shuffle ROWS.
    df.select(fpCol.as("fps")).as[Array[Long]]
      .mapPartitions(docs => chunkByBucket(docs, nBuckets, shift))
      .toDF("bucket", "chunk")
      .repartition(nBuckets, col("bucket"))
      .as[(Long, Array[Long])]
      .mapPartitions { it =>
        gatherChunks(it.map { case (b, c) => (b, c, null) }).map { case (bucket, fps, _) =>
          (bucket, buildShard(fps, null, params))
        }
      }
      .toDF("bucket", "sketch")
  }

  /** [[buildIndexSorted]] over an ALREADY-EXPLODED fingerprint column (one
    * Long row per k-gram) — the input shape a streaming ingest batch or a
    * cached/filtered fingerprint table hands you. Identical plan from the
    * chunking map stage on, so bulk-vs-incremental comparisons charged from
    * the same cached input are symmetric.
    */
  def buildIndexSortedFromFps(fps: DataFrame, params: BqfParams, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && (nBuckets & (nBuckets - 1)) == 0, "nBuckets must be a power of 2")
    val spark = fps.sparkSession
    import spark.implicits._
    val shift = params.hashBits - java.lang.Integer.numberOfTrailingZeros(nBuckets)
    fps.select(col("fp")).as[Long]
      // re-batch singles into arrays so the shared chunker's inner loop (and
      // its bounded-flush accounting) is identical to the per-doc path
      .mapPartitions(it => chunkByBucket(it.grouped(8192).map(_.toArray), nBuckets, shift))
      .toDF("bucket", "chunk")
      .repartition(nBuckets, col("bucket"))
      .as[(Long, Array[Long])]
      .mapPartitions { it =>
        gatherChunks(it.map { case (b, c) => (b, c, null) }).map { case (bucket, fps, _) =>
          (bucket, buildShard(fps, null, params))
        }
      }
      .toDF("bucket", "sketch")
  }

  /** Map-side bucketizer shared by the index builds: groups each task's
    * fingerprints by destination bucket into array-chunk rows.
    *
    * Bounded buffering: builders flush to chunk rows every ~4M buffered
    * fingerprints (32 MB), so task heap is independent of input-partition
    * size (an unbounded version scales with the partition — a skewed 100 TB
    * split would OOM the task). The shuffle writer consumes this iterator
    * lazily, so flushed chunks leave the heap as they are emitted. Null
    * fingerprint arrays (a null text/tokens row upstream) contribute
    * nothing, matching the old explode path's semantics.
    */
  private def chunkByBucket(docs: Iterator[Array[Long]], nBuckets: Int,
                            shift: Int): Iterator[(Long, Array[Long])] =
    new Iterator[(Long, Array[Long])] {
      private val builders = new Array[scala.collection.mutable.ArrayBuilder.ofLong](nBuckets)
      private val queue = scala.collection.mutable.Queue.empty[(Long, Array[Long])]
      private var nBuffered = 0L
      private val flushAt = 4L << 20
      // expected entries per bucket per flush epoch (uniform fingerprints):
      // pre-sizing the builders removes the doubling-growth copies, which
      // at full flush epochs re-copy roughly the whole buffered volume
      private val hint = math.min(flushAt / nBuckets, 1L << 20).toInt
      private def flush(): Unit = {
        var b = 0
        while (b < nBuckets) {
          val bb = builders(b)
          if (bb != null) { queue.enqueue((b.toLong, bb.result())); builders(b) = null }
          b += 1
        }
        nBuffered = 0L
      }
      private def fill(): Unit =
        while (queue.isEmpty && docs.hasNext) {
          while (docs.hasNext && nBuffered < flushAt) {
            val fps = docs.next()
            if (fps != null) {
              var i = 0
              while (i < fps.length) {
                val fp = fps(i)
                val b = (fp >>> shift).toInt
                var bb = builders(b)
                if (bb == null) {
                  bb = new scala.collection.mutable.ArrayBuilder.ofLong
                  bb.sizeHint(hint)
                  builders(b) = bb
                }
                bb.addOne(fp)
                i += 1
              }
              nBuffered += fps.length
            }
          }
          flush()
        }
      override def hasNext: Boolean = { fill(); queue.nonEmpty }
      override def next(): (Long, Array[Long]) = { fill(); queue.dequeue() }
    }

  /** Concatenate per-bucket chunk rows ((bucket, fps, stored?) with stored
    * possibly null for the all-ones build) into one contiguous pair of
    * arrays per bucket — plain arraycopies, no per-entry work.
    */
  /** Reduce-task memory guard: a shard build gathers its whole shard
    * (~16 B per fingerprint + radix buffers), so an under-sharded huge
    * corpus would OOM the executor mid-stage with no hint. Fail FAST with
    * the actionable fix instead (measured on the 620 M-k-gram run: 128
    * shards x 32 tasks broke an 8 GiB heap; 256 x 16 built fine). The cap
    * is a per-task fingerprint budget, overridable via the
    * `graft.maxShardFps` system property.
    */
  private def maxShardFps: Long =
    java.lang.Long.getLong("graft.maxShardFps", 96L << 20) // ~1.5 GB gathered

  private def gatherChunks(it: Iterator[(Long, Array[Long], Array[Long])])
      : Iterator[(Long, Array[Long], Array[Long])] = {
    val chunks = scala.collection.mutable.LongMap
      .empty[scala.collection.mutable.ArrayBuffer[(Array[Long], Array[Long])]]
    var gathered = 0L
    val cap = maxShardFps
    it.foreach { case (b, fps, stored) =>
      gathered += fps.length
      if (gathered > cap) throw new IllegalStateException(
        s"shard gather exceeds $cap fingerprints in one task — the corpus is " +
        "under-sharded for this executor memory; raise nBuckets (shard size = " +
        "total fingerprints / nBuckets must fit task memory at ~16 B each) or " +
        "-Dgraft.maxShardFps to raise the guard")
      chunks.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer.empty) += ((fps, stored))
    }
    chunks.iterator.map { case (bucket, parts) =>
      val n = parts.iterator.map(_._1.length).sum
      val fps = new Array[Long](n)
      val stored = if (parts.head._2 == null) null else new Array[Long](n)
      var off = 0
      parts.foreach { case (f, s) =>
        System.arraycopy(f, 0, fps, off, f.length)
        if (stored != null) System.arraycopy(s, 0, stored, off, s.length)
        off += f.length
      }
      (bucket, fps, stored)
    }
  }

  private def buildShard(fps: Array[Long], stored: Array[Long], params: BqfParams): Array[Byte] =
    graft.core.BackpackFilter.fromEntries(
      7, params.countBits, params.hashBits, params.mode,
      params.kTokens, params.zTokens, params.seed, fps, stored, fps.length).serialize()

  /** Distributed merge / re-shard: enumerate every shard sketch in parallel
    * (lazy raw iteration — no shard is materialized as an entry array on a
    * single node), shuffle the raw (fingerprint, storedCount) pairs to
    * `nOut` fingerprint-range buckets as paired ARRAY CHUNKS (same
    * rows-are-the-cost lesson as [[buildIndexSorted]]), and bulk-rebuild one
    * sketch per output bucket. This is the scale form of the final merge
    * level: where [[treeMerge]] ends in one serial reducer producing a
    * driver blob, reshardMerge's last level is `nOut` independent O(n)
    * sorted builds, so merge wall time scales with cores. Output bucket b
    * of nOut is exactly the merge of input shards covering that fingerprint
    * range (high-bit prefix nesting), regardless of how the inputs were
    * sharded.
    */
  def reshardMerge(shards: DataFrame, params: BqfParams, nOut: Int): DataFrame = {
    require(nOut >= 1 && (nOut & (nOut - 1)) == 0, "nOut must be a power of 2")
    val spark = shards.sparkSession
    import spark.implicits._
    val shift = params.hashBits - java.lang.Integer.numberOfTrailingZeros(nOut)
    shards.select("sketch").as[Array[Byte]]
      .mapPartitions { sketches =>
        val fb = new Array[scala.collection.mutable.ArrayBuilder.ofLong](nOut)
        val sb = new Array[scala.collection.mutable.ArrayBuilder.ofLong](nOut)
        sketches.foreach { bytes =>
          // specialized visitor: zero boxing across the 10^8-entry stream
          graft.core.BackpackFilter.deserialize(bytes).foreachRaw { (fp, stored) =>
            val b = (fp >>> shift).toInt
            if (fb(b) == null) {
              fb(b) = new scala.collection.mutable.ArrayBuilder.ofLong
              sb(b) = new scala.collection.mutable.ArrayBuilder.ofLong
            }
            fb(b).addOne(fp)
            sb(b).addOne(stored)
          }
        }
        Iterator.range(0, nOut).flatMap { b =>
          if (fb(b) == null) Iterator.empty
          else {
            val out = (b.toLong, fb(b).result(), sb(b).result())
            fb(b) = null; sb(b) = null
            Iterator.single(out)
          }
        }
      }
      .toDF("bucket", "fps", "stored")
      .repartition(nOut, col("bucket"))
      .as[(Long, Array[Long], Array[Long])]
      .mapPartitions(it => gatherChunks(it).map { case (bucket, fps, stored) =>
        (bucket, buildShard(fps, stored, params))
      })
      .toDF("bucket", "sketch")
  }

  /** The enumerate operator exposed relationally at scale: explode every
    * (bucket, sketch) shard row into its (fingerprint, abundance) entries,
    * streaming — nothing is materialized on the driver (ref enumerate,
    * /root/reference/src/rsqf.cpp:380-415, as a distributed flatMap).
    */
  def enumerateIndex(shards: DataFrame): DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    shards.select("sketch").as[Array[Byte]]
      .flatMap(b => graft.core.BackpackFilter.deserialize(b).entries())
      .toDF("fingerprint", "abundance")
  }

  /** Distributed point queries against a sharded index — the query path
    * once the index exceeds broadcast size (a 100 TB corpus's index is
    * GBs-to-TBs of shards; no single sketch can ride a broadcast variable).
    * Probes are routed to their shard by the same high-bit bucketing the
    * build used, co-grouped with the shard blob, and answered task-locally:
    * the shuffle moves 8-byte probe fingerprints plus each shard blob
    * exactly once; each reducer deserializes its shard once and probes all
    * of its fingerprints. Probes whose bucket has no shard answer 0
    * (nothing was ever inserted there). Returns (fp, abundance).
    */
  def queryIndex(shards: DataFrame, probes: DataFrame, params: BqfParams,
                 nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && (nBuckets & (nBuckets - 1)) == 0, "nBuckets must be a power of 2")
    val spark = shards.sparkSession
    import spark.implicits._
    val shift = params.hashBits - java.lang.Integer.numberOfTrailingZeros(nBuckets)
    val probesByBucket = probes.select(col("fp")).as[Long].groupByKey(fp => fp >>> shift)
    val shardsByBucket = shards.select(col("bucket"), col("sketch"))
      .as[(Long, Array[Byte])].groupByKey(_._1)
    probesByBucket.cogroup(shardsByBucket) { (bucket, ps, ss) =>
      if (!ss.hasNext) ps.map(fp => (fp, 0L))
      else {
        val first = ss.next()._2
        // Multiple rows for one bucket are ambiguous: a multi-version ingest
        // store (bucket, sketch, batch_id) holds SUPERSEDED versions whose
        // merge would double-count, while answering from an arbitrary row
        // would silently answer from a stale version. Refuse instead of
        // guessing — read ingest stores through IndexIngest.currentShards
        // (Cli query-index does this automatically) or compact first.
        require(!ss.hasNext,
          s"queryIndex: multiple sketch rows for bucket $bucket -- this looks like a " +
            "multi-version ingest store; query IndexIngest.currentShards(...) or compact it first")
        val f = graft.core.BackpackFilter.deserialize(first)
        ps.map(fp => (fp, f.abundance(fp)))
      }
    }.toDF("fp", "abundance")
  }

  /** Fold (bucket, sketch) rows into one sketch through a merge tree with
    * bounded fanout, so the final reducer never sees more than `fanout`
    * blobs per level.
    */
  def treeMerge(shards0: DataFrame, width0: Int, fanout: Int): Array[Byte] = {
    val merge = SketchAggregators.bqfMerge(cap = math.max(16, fanout))
    var shards = shards0
    var width = width0
    while (width > fanout) {
      width = (width + fanout - 1) / fanout
      shards = shards
        .groupBy(pmod(col("bucket"), lit(width)).as("bucket"))
        .agg(merge(col("sketch")).as("sketch"))
    }
    shards.agg(merge(col("sketch")).as("sketch")).head().getAs[Array[Byte]](0)
  }

  /** Two-level skew-safe per-source build: hot `source` values fan out over
    * `salts` deterministic salt buckets before the per-source merge, so no
    * single task absorbs a hot key's entire row stream.
    */
  def buildPerSource(df: DataFrame, fpCol: Column, idCol: Column, sourceCol: Column,
                     params: BqfParams, salts: Int = 8): DataFrame = {
    val bqf = SketchAggregators.bqfOverFingerprintArrays(params)
    val merge = SketchAggregators.bqfMerge()
    df.withColumn("__salt", pmod(xxhash64(idCol), lit(salts)))
      .groupBy(sourceCol.as("source"), col("__salt"))
      .agg(bqf(fpCol).as("partial"))
      .groupBy(col("source"))
      .agg(merge(col("partial")).as("sketch"))
  }
}

/** Resumable checkpointed build: shard sketches persist to a Parquet
  * checkpoint table carrying Iceberg-shaped lineage columns (partition id,
  * rows consumed, fingerprints consumed, merge depth, params tag, wall
  * time). No Iceberg runtime ships in this offline sandbox, so the store is
  * plain Parquet behind this interface; the commit unit is one batch job
  * (Spark's committer makes each append atomic), and buckets are
  * deterministic functions of row ids, so re-running a lost batch is
  * idempotent.
  */
object CheckpointedBuild {
  final val LineageColumns = Seq("bucket", "sketch", "rows_consumed",
    "fingerprints_consumed", "merge_depth", "params_tag", "committed_at_ms")

  private def paramsTag(p: BqfParams): String =
    s"q${p.qBits}c${p.countBits}h${p.hashBits}m${p.mode.tag}k${p.kTokens}z${p.zTokens}s${p.seed}"

  def committedBuckets(spark: SparkSession, dir: String): Set[Long] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Set.empty
    else spark.read.parquet(dir).select("bucket").distinct()
      .collect().map(_.getLong(0)).toSet
  }

  /** Build shard sketches for every bucket not yet committed, in batches of
    * `batchBuckets` (each batch = one atomic Parquet append). A killed run
    * resumes by skipping committed buckets.
    */
  def run(df: DataFrame, fpCol: Column, idCol: Column, params: BqfParams,
          nBuckets: Int, dir: String, batchBuckets: Int = 8,
          maxBatches: Int = Int.MaxValue): Unit = {
    val spark = df.sparkSession
    val bqf = SketchAggregators.bqfOverFingerprintArrays(params)
    val done = committedBuckets(spark, dir)
    val missing = (0L until nBuckets.toLong).filterNot(done)
    val tag = paramsTag(params)
    val withBucket = df
      .withColumn("__fps", fpCol)
      .withColumn("bucket", pmod(xxhash64(idCol), lit(nBuckets)))
    missing.grouped(batchBuckets).take(maxBatches).foreach { batch =>
      withBucket
        .filter(col("bucket").isin(batch: _*))
        .groupBy(col("bucket"))
        .agg(
          bqf(col("__fps")).as("sketch"),
          count(lit(1)).as("rows_consumed"),
          sum(size(col("__fps"))).as("fingerprints_consumed"))
        .withColumn("merge_depth", lit(0))
        .withColumn("params_tag", lit(tag))
        .withColumn("committed_at_ms", lit(System.currentTimeMillis()))
        .select(LineageColumns.map(col): _*)
        .write.mode("append").parquet(dir)
    }
  }

  /** Merge all committed shards into the final sketch. */
  def result(spark: SparkSession, dir: String, nBuckets: Int, fanout: Int = 16): Array[Byte] = {
    val shards = spark.read.parquet(dir).select("bucket", "sketch")
    BqfPipeline.treeMerge(shards, nBuckets, fanout)
  }
}
