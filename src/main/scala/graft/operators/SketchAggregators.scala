package graft.operators

import graft.core.{BackpackFilter, CountMode}
import graft.sketch.{BloomSketch, CountMinSketch, HyperLogLog}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Construction parameters for a distributed BQF build.
  *
  * @param qBits     initial quotient bits of each per-partition shard (they
  *                  auto-resize at 95% load, so this only sets the floor)
  * @param countBits abundance counter bits (saturates at 2^c - 1)
  * @param hashBits  fingerprint width; FP bound = 2^-(hashBits - qBits)
  */
final case class BqfParams(
    qBits: Int = 16,
    countBits: Int = 16,
    hashBits: Int = 48,
    mode: CountMode = CountMode.Exact,
    kTokens: Int = 8,
    zTokens: Int = 2,
    seed: Long = 0L) {
  /** Tokens per inserted s-gram: s = k - z. */
  def sTokens: Int = kTokens - zTokens
  def fresh(): BackpackFilter =
    BackpackFilter(qBits, countBits, hashBits, mode, kTokens, zTokens, seed)
}

/** The central mergeable UDAF of the library: each executor folds the
  * fingerprint arrays of its partition into a local [[BackpackFilter]];
  * Catalyst's partial aggregation merges shard sketches at the shuffle
  * boundary (the signature named by the north star:
  * Aggregator[IN, BQFSketch, OUT]). The buffer lives as a JVM object inside
  * ObjectHashAggregate, serialized only when partials cross the exchange.
  */
class BqfArrayAggregator(params: BqfParams)
    extends Aggregator[Array[Long], BackpackFilter, Array[Byte]] {
  override def zero: BackpackFilter = params.fresh()
  override def reduce(b: BackpackFilter, fps: Array[Long]): BackpackFilter = {
    var i = 0
    while (i < fps.length) { b.add(fps(i), 1L); i += 1 }
    b
  }
  override def merge(a: BackpackFilter, b: BackpackFilter): BackpackFilter =
    if (a.distinctCount >= b.distinctCount) a.mergeInPlace(b) else b.mergeInPlace(a)
  override def finish(r: BackpackFilter): Array[Byte] = r.serialize()
  override def bufferEncoder: Encoder[BackpackFilter] = Encoders.kryo[BackpackFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Weighted variant: rows are (fingerprint, count) pairs — the shape of the
  * reference's counted-s-mer input (/root/reference/src/abstract_bqf.cpp:22-52).
  */
class BqfCountedAggregator(params: BqfParams)
    extends Aggregator[(Long, Long), BackpackFilter, Array[Byte]] {
  override def zero: BackpackFilter = params.fresh()
  override def reduce(b: BackpackFilter, in: (Long, Long)): BackpackFilter = {
    b.add(in._1, in._2); b
  }
  override def merge(a: BackpackFilter, b: BackpackFilter): BackpackFilter =
    if (a.distinctCount >= b.distinctCount) a.mergeInPlace(b) else b.mergeInPlace(a)
  override def finish(r: BackpackFilter): Array[Byte] = r.serialize()
  override def bufferEncoder: Encoder[BackpackFilter] = Encoders.kryo[BackpackFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Merges already-serialized shard sketches (tree-merge / checkpoint resume
  * stages). Null buffer until the first shard avoids paying a fresh filter
  * allocation for empty groups.
  */
class BqfMergeAggregator
    extends Aggregator[Array[Byte], BackpackFilter, Array[Byte]] {
  override def zero: BackpackFilter = null
  override def reduce(b: BackpackFilter, bytes: Array[Byte]): BackpackFilter = {
    val shard = BackpackFilter.deserialize(bytes)
    if (b == null) shard
    else if (b.distinctCount >= shard.distinctCount) b.mergeInPlace(shard)
    else shard.mergeInPlace(b)
  }
  override def merge(a: BackpackFilter, b: BackpackFilter): BackpackFilter = {
    if (a == null) b
    else if (b == null) a
    else if (a.distinctCount >= b.distinctCount) a.mergeInPlace(b)
    else b.mergeInPlace(a)
  }
  override def finish(r: BackpackFilter): Array[Byte] =
    if (r == null) null else r.serialize()
  override def bufferEncoder: Encoder[BackpackFilter] = Encoders.kryo[BackpackFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

class HllArrayAggregator(p: Int) extends Aggregator[Array[Long], HyperLogLog, Long] {
  override def zero: HyperLogLog = new HyperLogLog(p)
  override def reduce(b: HyperLogLog, fps: Array[Long]): HyperLogLog = {
    var i = 0
    while (i < fps.length) { b.addValue(fps(i)); i += 1 }
    b
  }
  override def merge(a: HyperLogLog, b: HyperLogLog): HyperLogLog = a.merge(b)
  override def finish(r: HyperLogLog): Long = r.estimate()
  override def bufferEncoder: Encoder[HyperLogLog] = Encoders.kryo[HyperLogLog]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

class CountMinArrayAggregator(depth: Int, widthBits: Int)
    extends Aggregator[Array[Long], CountMinSketch, Array[Byte]] {
  override def zero: CountMinSketch = new CountMinSketch(depth, widthBits)
  override def reduce(b: CountMinSketch, fps: Array[Long]): CountMinSketch = {
    var i = 0
    while (i < fps.length) { b.add(fps(i)); i += 1 }
    b
  }
  override def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch = a.merge(b)
  override def finish(r: CountMinSketch): Array[Byte] = r.serialize()
  override def bufferEncoder: Encoder[CountMinSketch] = Encoders.kryo[CountMinSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

class BloomArrayAggregator(mBits: Long, k: Int)
    extends Aggregator[Array[Long], BloomSketch, Array[Byte]] {
  override def zero: BloomSketch = new BloomSketch(mBits, k)
  override def reduce(b: BloomSketch, fps: Array[Long]): BloomSketch = {
    var i = 0
    while (i < fps.length) { b.add(fps(i)); i += 1 }
    b
  }
  override def merge(a: BloomSketch, b: BloomSketch): BloomSketch = a.merge(b)
  override def finish(r: BloomSketch): Array[Byte] = r.serialize()
  override def bufferEncoder: Encoder[BloomSketch] = Encoders.kryo[BloomSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

class TDigestAggregator(compression: Double)
    extends Aggregator[Double, graft.sketch.TDigest, Array[Byte]] {
  override def zero: graft.sketch.TDigest = new graft.sketch.TDigest(compression)
  override def reduce(b: graft.sketch.TDigest, x: Double): graft.sketch.TDigest = { b.add(x); b }
  override def merge(a: graft.sketch.TDigest, b: graft.sketch.TDigest): graft.sketch.TDigest = a.merge(b)
  override def finish(r: graft.sketch.TDigest): Array[Byte] = r.serialize()
  override def bufferEncoder: Encoder[graft.sketch.TDigest] = Encoders.kryo[graft.sketch.TDigest]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

class KllAggregator(k: Int)
    extends Aggregator[Double, graft.sketch.KllSketch, Array[Byte]] {
  override def zero: graft.sketch.KllSketch = new graft.sketch.KllSketch(k)
  override def reduce(b: graft.sketch.KllSketch, x: Double): graft.sketch.KllSketch = { b.add(x); b }
  override def merge(a: graft.sketch.KllSketch, b: graft.sketch.KllSketch): graft.sketch.KllSketch = a.merge(b)
  override def finish(r: graft.sketch.KllSketch): Array[Byte] = r.serialize()
  override def bufferEncoder: Encoder[graft.sketch.KllSketch] = Encoders.kryo[graft.sketch.KllSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** udaf(...) registrations — each returns a Column-applicable function. */
object SketchAggregators {
  private implicit val longArrayEnc: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  private implicit val longPairEnc: Encoder[(Long, Long)] = ExpressionEncoder[(Long, Long)]()

  def bqfOverFingerprintArrays(params: BqfParams): UserDefinedFunction =
    udaf(new BqfArrayAggregator(params), longArrayEnc)

  def bqfOverCountedFingerprints(params: BqfParams): UserDefinedFunction =
    udaf(new BqfCountedAggregator(params), longPairEnc)

  def bqfMerge(): UserDefinedFunction =
    udaf(new BqfMergeAggregator, Encoders.BINARY)

  def hllOverFingerprintArrays(p: Int = 14): UserDefinedFunction =
    udaf(new HllArrayAggregator(p), longArrayEnc)

  def countMinOverFingerprintArrays(depth: Int = 5, widthBits: Int = 16): UserDefinedFunction =
    udaf(new CountMinArrayAggregator(depth, widthBits), longArrayEnc)

  def bloomOverFingerprintArrays(mBits: Long, k: Int): UserDefinedFunction =
    udaf(new BloomArrayAggregator(mBits, k), longArrayEnc)

  def tdigest(compression: Double = 100.0): UserDefinedFunction =
    udaf(new TDigestAggregator(compression), Encoders.scalaDouble)

  def kll(k: Int = 200): UserDefinedFunction =
    udaf(new KllAggregator(k), Encoders.scalaDouble)
}
