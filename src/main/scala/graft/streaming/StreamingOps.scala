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
