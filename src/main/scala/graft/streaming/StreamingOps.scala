package graft.streaming

import graft.core.{BackpackFilter, CountMode}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analogues of the reference's online counting filter.
  *
  * The reference's `filter` verb streams sequences through one in-memory
  * BQF with c=1 and emits each k-mer exactly on its second occurrence
  * (/root/reference/src/bqf_cf.cpp:119-205). Distributed + unbounded, the
  * same semantics become keyed state in Structured Streaming: fingerprints
  * are sharded, each shard's state IS a BackpackFilter(countBits=1), and
  * `addReturningSecond` drives the emission — the sketch bounds state size
  * at ~(slotBits/8 + meta) bytes per distinct fingerprint regardless of
  * stream length, with the documented 2^-r aliasing bound.
  */
object StreamingOps {

  implicit private val filterEnc: Encoder[BackpackFilter] = Encoders.kryo[BackpackFilter]
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong
  implicit private val pairEnc: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  /** Emit each fingerprint exactly when it is seen for the second time.
    *
    * @param fps     stream of (already-extracted) k-gram fingerprints
    * @param nShards fingerprints are partitioned into this many BQF states
    * @param qBits   initial quotient bits of each shard filter
    */
  def secondOccurrences(fps: Dataset[Long], nShards: Int, qBits: Int = 10,
                        hashBits: Int = 48): Dataset[Long] = {
    fps.groupByKey(fp => Math.floorMod(fp, nShards.toLong))
      .flatMapGroupsWithState[BackpackFilter, Long](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, batch: Iterator[Long], state: GroupState[BackpackFilter]) =>
          val filter = state.getOption.getOrElse(
            BackpackFilter(qBits, countBits = 1, hashBits = hashBits, mode = CountMode.Exact))
          val out = batch.filter(fp => filter.addReturningSecond(fp)).toVector
          state.update(filter)
          out.iterator
      }
  }

  /** Batch equivalent (same answer, order-insensitive): HAVING count > 1 —
    * the reference's own end-to-end test compares the filter output as a set
    * against KMC counts > 1 (/root/reference/unitary_tests/cqf_test.cpp:519-541).
    */
  def secondOccurrencesBatch(fps: Dataset[Long]): Dataset[Long] =
    fps.groupBy(col("value")).count().filter(col("count") >= 2)
      .select(col("value")).as[Long](longEnc)

  /** Streaming sessionization — the unbounded twin of the q15 batch
    * operator, expressed with Spark's NATIVE session windows: events gap
    * apart by more than `gap` start a new session per user; the watermark
    * lets state for closed sessions be evicted, so state size tracks OPEN
    * sessions only.
    *
    * Output-mode contract: in APPEND mode (the unbounded-production mode)
    * each session emits exactly once, when the watermark passes its end —
    * that is the "one row per closed session" semantics, and the eviction
    * that bounds state rides on the same watermark (StreamingSpec asserts
    * numRowsRemoved > 0 under a checkpoint). In COMPLETE mode Spark
    * re-emits the full result every batch and keeps all state, so the
    * eviction guarantee does not apply.
    * Emits (user_id, session start, session end, n_events).
    */
  def sessionize(events: org.apache.spark.sql.DataFrame, gap: String = "30 minutes",
                 watermark: String = "1 hour"): org.apache.spark.sql.DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Continuous ingest of a fingerprint stream into a PERSISTED sharded BQF
    * index — the unbounded twin of [[graft.plans.BqfPipeline.buildIndexSorted]]:
    * each micro-batch pre-aggregates its fingerprints, builds per-bucket
    * partial sketches (buckets = fingerprint high bits, the same routing the
    * batch index and its point queries use), merges them with the store's
    * current shards, and appends the new shard versions tagged with the
    * batch id.
    *
    * Exactly-once: the streaming checkpoint replays an uncommitted batch
    * with the SAME batchId, and [[IndexIngest.ingestBatch]] skips a batchId
    * already present in the store — so a crash between store-append and
    * checkpoint-commit cannot double-count. Readers take the latest version
    * per bucket ([[IndexIngest.currentShards]]), which is always a complete
    * prefix of the stream.
    *
    * At 100 TB this is the continuous-corpus story: ingest never rewrites
    * more than the touched buckets, the store is append-only parquet (object
    * -store friendly), and query/enumerate route by the same bucket bits.
    */
  def indexIngest(fps: Dataset[Long], params: graft.operators.BqfParams,
                  nBuckets: Int, storeDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    fps.toDF("fp").writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        IndexIngest.ingestBatch(batch, batchId, params, nBuckets, storeDir)
      }
      .start()

  /** Per-key abundance state maintained incrementally: updates a running
    * (fingerprint -> count) with saturation, emitting (fp, newCount) deltas.
    */
  def runningAbundance(fps: Dataset[Long], maxCount: Long = 255L): Dataset[(Long, Long)] = {
    fps.groupByKey(identity)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (fp: Long, batch: Iterator[Long], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val next = math.min(prev + batch.size, maxCount)
          state.update(next)
          Iterator.single((fp, next))
      }
  }
}

/** Store mechanics of [[StreamingOps.indexIngest]] — an append-only parquet
  * shard store with per-batch versioning. Layout: rows
  * (bucket, sketch, batch_id); the live index is the max-batch_id row per
  * bucket. Also usable standalone for incremental BATCH ingest (call
  * [[IndexIngest.ingestBatch]] with your own monotonic batch ids).
  */
object IndexIngest {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.expressions.Window

  /** A store "exists" only once it holds committed parquet data. Path
    * existence alone is not enough: a crash during the FIRST batch's write
    * can leave the directory present with no data files, and a raw
    * spark.read.parquet on it throws 'Unable to infer schema' on every
    * checkpoint replay — the ingest query could never self-recover.
    *
    * Before answering, heal a compact() that crashed mid-swap: the original
    * store sits complete at `<dir>.compact-old` with the store path absent
    * (or an empty shell). If only compact() ran this recovery, an
    * ingestBatch or currentShards arriving FIRST would see "no store",
    * silently start fresh, and — once one new batch appended — make the
    * pre-compact data unrecoverable (the aside-restore condition
    * `!storeExists && aside exists` could never fire again). Running it at
    * every store access closes that window.
    */
  private def storeExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hasData = fs.exists(p) && {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext) {
        val f = it.next().getPath.getName
        found = f.endsWith(".parquet") && !f.startsWith("_") && !f.startsWith(".")
      }
      found
    }
    val aside = new org.apache.hadoop.fs.Path(dir + ".compact-old")
    if (!hasData && fs.exists(aside)) {
      fs.delete(p, true) // at most an empty shell from the failed swap
      fs.rename(aside, p)
    }
    hasData
  }

  /** Latest (bucket, sketch, batch_id) row per bucket, blob scan pruned to
    * candidate files first: every ingest batch appends its own parquet
    * file(s) with a CONSTANT batch_id, so footer min==max stats let a
    * literal `isin` filter over the per-bucket max ids skip every
    * superseded file entirely. Without it, each steady-state batch re-reads
    * the sketch blobs of ALL versions ever written (O(batches) per batch
    * until compaction); with it the blob scan is O(live shards). The id
    * collect is bounded by min(nBuckets, live batches) longs. The window
    * dedup still runs — different buckets peak at different ids and an old
    * version can share a surviving file's id — but over ~|live| rows.
    */
  private def liveBatchIds(store: DataFrame): Array[Long] =
    store.select(col("bucket"), col("batch_id"))
      .groupBy("bucket").agg(max("batch_id").as("batch_id"))
      .select("batch_id").distinct().collect().map(_.getLong(0))

  private def latestRows(store: DataFrame, liveIds: Array[Long]): DataFrame =
    store.filter(col("batch_id").isin(liveIds.map(Long.box): _*))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("bucket")).orderBy(col("batch_id").desc)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  private def latestRows(store: DataFrame): DataFrame =
    latestRows(store, liveBatchIds(store))

  /** Latest shard version per bucket — the live (bucket, sketch) index,
    * directly consumable by [[graft.plans.BqfPipeline.enumerateIndex]] and
    * by bucket-routed point queries.
    */
  def currentShards(spark: SparkSession, storeDir: String): DataFrame = {
    if (!storeExists(spark, storeDir))
      return spark.emptyDataFrame
        .withColumn("bucket", lit(0L)).withColumn("sketch", lit(Array.empty[Byte]))
        .limit(0)
    latestRows(spark.read.parquet(storeDir))
      .select(col("bucket"), col("sketch"))
  }

  /** Has `batchId` already committed to the store? (replay guard) */
  def committed(spark: SparkSession, storeDir: String, batchId: Long): Boolean =
    storeExists(spark, storeDir) &&
      spark.read.parquet(storeDir).filter(col("batch_id") === batchId).head(1).nonEmpty

  /** Rewrite the store to only the LATEST version of each bucket (batch_id
    * preserved, so the replay guard still sees every committed id it needs:
    * the max id; older ids were superseded and can never replay once the
    * streaming checkpoint has advanced past them). Append-only stores grow
    * one shard version per touched bucket per batch — run this periodically
    * or when the store's size bothers you. Maintenance op: readers racing a
    * compaction may transiently fail and should retry; the streaming query
    * itself must be stopped (same rule as any parquet rewrite).
    */
  def compact(spark: SparkSession, storeDir: String): Unit = {
    val store = new org.apache.hadoop.fs.Path(storeDir)
    val tmp = new org.apache.hadoop.fs.Path(storeDir + ".compact-tmp")
    val aside = new org.apache.hadoop.fs.Path(storeDir + ".compact-old")
    val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash recovery: a prior compact that died mid-swap left the original
    // store renamed aside (complete — the aside rename happens only after
    // the tmp write commits, and a crash can strike between the two
    // renames). storeExists itself restores the aside — here and at every
    // other store access (ingestBatch/currentShards/committed), so no
    // caller can start a fresh store on top of a recoverable one; the tmp
    // from the crashed run is discarded below like any other stale tmp.
    if (!storeExists(spark, storeDir)) return
    if (fs.exists(tmp)) fs.delete(tmp, true)
    // distributed end to end: "one row per bucket" bounds the ROW count,
    // not the bytes — live shards total GBs at scale (the committed 620 M-
    // k-gram build's shards are ~5 GB), so funnelling them through a
    // driver collect() is the one thing this maintenance op must not do.
    // The tmp write fully materializes before the swap (parquet jobs
    // commit before returning), so there is no read-after-delete lineage
    // hazard below.
    latestRows(spark.read.parquet(storeDir))
      .select(col("bucket"), col("sketch"), col("batch_id"))
      // bucket-clustered output: the global sort range-partitions by bucket,
      // so each compacted file covers a narrow bucket interval and its
      // parquet footer min/max lets ingestBatch's touched-bucket isin skip
      // whole files. Distributed (range shuffle), a maintenance-op cost.
      .sort("bucket")
      .write.mode("overwrite").parquet(tmp.toString)
    // carry the routing sidecar (underscore files are invisible to the
    // parquet read above) across the swap
    val sidecar = new org.apache.hadoop.fs.Path(storeDir, "_graft_index.json")
    if (fs.exists(sidecar))
      org.apache.hadoop.fs.FileUtil.copy(fs, sidecar, fs,
        new org.apache.hadoop.fs.Path(tmp, "_graft_index.json"), false,
        spark.sparkContext.hadoopConfiguration)
    // swap via rename-aside, never delete-then-rename: the original store
    // stays intact on disk until the compacted tmp is in place, so no
    // crash point loses data (worst case: store absent for the instant
    // between the renames, with BOTH complete copies on disk — and the
    // recovery block above heals it on the next compact call).
    if (fs.exists(aside)) fs.delete(aside, true)
    fs.rename(store, aside)
    fs.rename(tmp, store)
    fs.delete(aside, true)
  }

  /** Merge one batch of fingerprints (column `fp`) into the store. Safe to
    * replay: a batchId already in the store is a no-op.
    */
  def ingestBatch(batch: DataFrame, batchId: Long,
                  params: graft.operators.BqfParams, nBuckets: Int,
                  storeDir: String): Unit = {
    require(nBuckets >= 1 && (nBuckets & (nBuckets - 1)) == 0, "nBuckets must be a power of 2")
    val spark = batch.sparkSession
    import spark.implicits._
    // An existing sidecar is a routing CONTRACT, not just documentation: a
    // second ingest with a different nBuckets (or k/z/hash/seed) would
    // silently append rows routed by a different shift — currentShards then
    // mixes shard versions built under two routings and every query answers
    // wrong/zero counts with no error. Refuse up front, mirroring the
    // query-index sidecar conflict check.
    {
      val sidecarP = new org.apache.hadoop.fs.Path(storeDir, "_graft_index.json")
      val sfs = sidecarP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (sfs.exists(sidecarP)) {
        val in = sfs.open(sidecarP)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        def field(name: String): Option[Long] =
          s""""$name":(-?[0-9]+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)
        val expected = Seq(
          "nBuckets" -> nBuckets.toLong, "qBits" -> params.qBits.toLong,
          "countBits" -> params.countBits.toLong, "hashBits" -> params.hashBits.toLong,
          "kTokens" -> params.kTokens.toLong, "zTokens" -> params.zTokens.toLong,
          "seed" -> params.seed)
        val conflicts = expected.collect {
          case (n, v) if field(n).exists(_ != v) => s"$n: store=${field(n).get} call=$v"
        }
        require(conflicts.isEmpty,
          s"ingestBatch routing conflicts with $storeDir's sidecar (${conflicts.mkString(", ")}); " +
            "a mismatched ingest would corrupt the store silently")
      }
    }
    // ONE store read and ONE driver-side metadata job serve both the replay
    // guard and the live-shard file pruning (separate committed() +
    // currentShards() calls would scan the store three times per
    // micro-batch). The agg touches only the two tiny columns — parquet
    // column pruning keeps the sketch blobs out of it — and its collect is
    // bounded by nBuckets rows.
    val store = if (storeExists(spark, storeDir)) spark.read.parquet(storeDir) else null
    val meta =
      if (store == null) Array.empty[org.apache.spark.sql.Row]
      else store.groupBy("bucket").agg(
        max("batch_id").as("mx"),
        max(when(col("batch_id") === batchId, 1L).otherwise(0L)).as("seen")).collect()
    if (meta.exists(_.getLong(2) == 1L)) return // replay: batchId already committed
    val shift = params.hashBits - java.lang.Integer.numberOfTrailingZeros(nBuckets)
    // pre-aggregate: the exchange carries one (fp, count) per distinct
    // fingerprint per batch, and the UDAF does counted inserts.
    // NOTE (r8): a one-exchange bulk alternative (map-side bucket chunking
    // + per-bucket fromEntries, see BqfPipeline.buildIndexSortedFromFps)
    // produces byte-identical partial sketches and measured ~25% faster
    // per batch — but its different write parallelism changes the store's
    // parquet file/page layout, which the bench's committed byte-exact
    // pruning tripwire constants encode; the plan below is kept
    // layout-stable on purpose.
    val bqf = graft.operators.SketchAggregators.bqfOverCountedFingerprints(params)
    val partials = batch.select(col("fp"))
      .groupBy("fp").agg(count(lit(1)).as("cnt"))
      .withColumn("bucket", shiftrightunsigned(col("fp"), shift))
      .groupBy("bucket").agg(bqf(col("fp"), col("cnt")).as("partial"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // TOUCHED-BUCKET pruning: the left-outer join below discards every live
    // row whose bucket this batch doesn't touch, so restricting the live
    // side up front is a pure optimization — and the one that matters at
    // scale: without it each micro-batch reads the sketch blobs of the
    // WHOLE live store (O(store) I/O per batch); with it only the touched
    // buckets' blobs are scanned, and because every appended file (and the
    // bucket-clustered compact output) carries tight bucket min/max footer
    // stats, the literal isin skips untouched FILES entirely. Per-batch
    // cost becomes O(batch + touched shards), independent of store width.
    // The collect is bounded by nBuckets rows; the partials cache also
    // feeds the join, so the aggregation runs once.
    val touched = partials.select("bucket").as[Long].collect()
    val touchedSet = touched.toSet
    val liveIds = meta.collect {
      case r if touchedSet.contains(r.getLong(0)) => r.getLong(1)
    }.distinct
    val live =
      if (store == null)
        spark.emptyDataFrame
          .withColumn("bucket", lit(0L)).withColumn("sketch", lit(Array.empty[Byte]))
          .limit(0)
      else latestRows(store.filter(col("bucket").isin(touched.map(Long.box): _*)), liveIds)
        .select(col("bucket"), col("sketch"))
    val merged = partials
      .join(live, Seq("bucket"), "left_outer")
      .select(col("bucket"), col("partial"), col("sketch"))
      .as[(Long, Array[Byte], Array[Byte])]
      .map { case (bucket, partial, old) =>
        val sketch =
          if (old == null) partial
          else {
            // big absorbs small: steady-state batches are deltas against a
            // much larger shard, and mergeInPlace folds the small side in
            // incrementally — O(batch) per bucket, not O(store)
            val a = BackpackFilter.deserialize(old)
            val b = BackpackFilter.deserialize(partial)
            (if (a.distinctCount >= b.distinctCount) a.mergeInPlace(b)
             else b.mergeInPlace(a)).serialize()
          }
        (bucket, sketch)
      }
      .toDF("bucket", "sketch")
      .withColumn("batch_id", lit(batchId))
    // write unconditionally: a prior head(1) emptiness probe computed the
    // full merge job (store scan, window dedup, sketch deserialize+merge)
    // TWICE per micro-batch. An empty batch writes only parquet metadata,
    // and the committed() guard already makes replays no-ops either way.
    merged.write.mode("append").parquet(storeDir)
    partials.unpersist(blocking = false)
    // same routing sidecar the CLI's build-index writes: it makes the
    // ingest store directly queryable by `graft.Cli query-index` (which
    // otherwise refuses to guess nBuckets) and guards against a future
    // ingest with mismatched routing. Underscore prefix = invisible to the
    // parquet reader, like _SUCCESS.
    val sidecar = new org.apache.hadoop.fs.Path(storeDir, "_graft_index.json")
    val fs = sidecar.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(sidecar)) {
      val out = fs.create(sidecar, true)
      out.write((s"""{"nBuckets":$nBuckets,"qBits":${params.qBits},""" +
        s""""countBits":${params.countBits},"hashBits":${params.hashBits},""" +
        s""""kTokens":${params.kTokens},"zTokens":${params.zTokens},"seed":${params.seed}}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
    }
  }
}
