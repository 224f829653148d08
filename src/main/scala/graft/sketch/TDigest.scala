package graft.sketch

/** Merging t-digest (Dunning & Ertl, "Computing extremely accurate quantiles
  * using t-digests"): centroids sized by the k1 scale function, so accuracy
  * tightens toward the tails. Mergeable: concatenate + recompress —
  * order-insensitive up to the documented approximation bound.
  */
final class TDigest(val compression: Double) extends Serializable {
  require(compression >= 20 && compression <= 1000)

  private var means = new Array[Double](0)
  private var weights = new Array[Double](0)
  private var total = 0.0
  private val bufCap = 256
  private val bufX = new Array[Double](bufCap)
  private val bufW = new Array[Double](bufCap)
  private var bufN = 0
  private var mn = Double.PositiveInfinity
  private var mx = Double.NegativeInfinity

  def add(x: Double, w: Double = 1.0): Unit = {
    if (x.isNaN) return
    if (x < mn) mn = x
    if (x > mx) mx = x
    bufX(bufN) = x; bufW(bufN) = w; bufN += 1
    if (bufN == bufCap) compress()
  }

  def count: Double = { compress(); total }
  def min: Double = mn
  def max: Double = mx

  private def kFn(q: Double): Double = {
    val qq = math.max(0.0, math.min(1.0, q))
    compression * (math.asin(2 * qq - 1) / math.Pi + 0.5)
  }

  private def compress(): Unit = {
    if (bufN == 0) return
    val n = means.length + bufN
    val xs = new Array[Double](n)
    val ws = new Array[Double](n)
    System.arraycopy(means, 0, xs, 0, means.length)
    System.arraycopy(weights, 0, ws, 0, means.length)
    var i = 0
    while (i < bufN) { xs(means.length + i) = bufX(i); ws(means.length + i) = bufW(i); i += 1 }
    bufN = 0
    // sort (mean, weight) pairs by mean
    val idx = (0 until n).sortBy(xs)
    val sx = idx.map(xs).toArray
    val sw = idx.map(ws).toArray
    total = sw.sum

    val om = new scala.collection.mutable.ArrayBuffer[Double](n)
    val ow = new scala.collection.mutable.ArrayBuffer[Double](n)
    var curMean = sx(0)
    var curW = sw(0)
    var wSoFar = 0.0
    var kLeft = kFn(0.0)
    i = 1
    while (i < n) {
      val qRight = (wSoFar + curW + sw(i)) / total
      if (kFn(qRight) - kLeft <= 1.0) {
        // absorb into current centroid
        val w2 = curW + sw(i)
        curMean = curMean + (sx(i) - curMean) * sw(i) / w2
        curW = w2
      } else {
        om += curMean; ow += curW
        wSoFar += curW
        kLeft = kFn(wSoFar / total)
        curMean = sx(i); curW = sw(i)
      }
      i += 1
    }
    om += curMean; ow += curW
    means = om.toArray
    weights = ow.toArray
  }

  /** Quantile estimate by linear interpolation between centroid midpoints. */
  def quantile(q: Double): Double = {
    compress()
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < n) {
      val mid = cum + weights(i) / 2
      if (target < mid) {
        if (i == 0) return math.max(mn, means(0) - (mid - target) / (weights(0) / 2) * (means(0) - mn))
        val prevMid = cum - weights(i - 1) / 2
        val t = (target - prevMid) / (mid - prevMid)
        return means(i - 1) + t * (means(i) - means(i - 1))
      }
      cum += weights(i)
      i += 1
    }
    mx
  }

  def merge(other: TDigest): TDigest = {
    require(other.compression == compression)
    other.compress()
    var i = 0
    while (i < other.means.length) {
      add(other.means(i), other.weights(i))
      i += 1
    }
    if (other.mn < mn) mn = other.mn
    if (other.mx > mx) mx = other.mx
    compress()
    this
  }

  def serialize(): Array[Byte] = {
    compress()
    val bb = java.nio.ByteBuffer.allocate(8 * 4 + 4 + means.length * 16)
    bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putDouble(compression).putDouble(total).putDouble(mn).putDouble(mx)
    bb.putInt(means.length)
    var i = 0
    while (i < means.length) { bb.putDouble(means(i)); bb.putDouble(weights(i)); i += 1 }
    bb.array()
  }
}

object TDigest {
  def deserialize(bytes: Array[Byte]): TDigest = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val t = new TDigest(bb.getDouble)
    t.total = bb.getDouble
    t.mn = bb.getDouble
    t.mx = bb.getDouble
    val n = bb.getInt
    t.means = new Array[Double](n)
    t.weights = new Array[Double](n)
    var i = 0
    while (i < n) { t.means(i) = bb.getDouble; t.weights(i) = bb.getDouble; i += 1 }
    t
  }
}

/** KLL quantile sketch (Karnin, Lang, Liberty 2016): geometrically-shrinking
  * level capacities with pairwise compaction. The compaction coin is a
  * deterministic counter-seeded splitmix64 draw, so builds are reproducible;
  * the expected-error analysis still applies per-stream. Mergeable:
  * concatenate levels + compact.
  */
final class KllSketch(val k: Int) extends Serializable {
  require(k >= 8 && k <= 4096)
  private var levels: Array[scala.collection.mutable.ArrayBuffer[Double]] =
    Array(scala.collection.mutable.ArrayBuffer.empty[Double])
  private var n = 0L
  private var coinState = 0x9042L

  private def cap(level: Int): Int = {
    val numLevels = levels.length
    // capacity k * (2/3)^(depth from top), min 8
    val depth = numLevels - 1 - level
    math.max(8, math.ceil(k * math.pow(2.0 / 3.0, depth)).toInt)
  }

  def add(x: Double): Unit = {
    if (x.isNaN) return
    levels(0) += x
    n += 1
    if (levels(0).length >= cap(0)) compact()
  }

  def count: Long = n

  private def coin(): Boolean = {
    coinState = graft.core.Fingerprint.splitmix64(coinState + n)
    (coinState & 1L) == 1L
  }

  private def compact(): Unit = {
    var lvl = 0
    while (lvl < levels.length) {
      if (levels(lvl).length >= cap(lvl)) {
        if (lvl + 1 == levels.length)
          levels = levels :+ scala.collection.mutable.ArrayBuffer.empty[Double]
        val sorted = levels(lvl).sorted
        val offset = if (coin()) 1 else 0
        var i = offset
        while (i < sorted.length) {
          levels(lvl + 1) += sorted(i)
          i += 2
        }
        levels(lvl).clear()
      }
      lvl += 1
    }
  }

  /** All (value, weight=2^level) pairs. */
  private def weighted(): Array[(Double, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    for (lvl <- levels.indices; x <- levels(lvl)) out += (x -> (1L << lvl))
    out.sortBy(_._1).toArray
  }

  def quantile(q: Double): Double = {
    val w = weighted()
    if (w.isEmpty) return Double.NaN
    val totalW = w.map(_._2).sum
    val target = q * totalW
    var cum = 0L
    var i = 0
    while (i < w.length) {
      cum += w(i)._2
      if (cum >= target) return w(i)._1
      i += 1
    }
    w.last._1
  }

  /** Estimated rank (fraction <= x). */
  def rankOf(x: Double): Double = {
    val w = weighted()
    if (w.isEmpty) return Double.NaN
    val totalW = w.map(_._2).sum
    var cum = 0L
    var i = 0
    while (i < w.length && w(i)._1 <= x) { cum += w(i)._2; i += 1 }
    cum.toDouble / totalW
  }

  def merge(other: KllSketch): KllSketch = {
    require(other.k == k)
    while (levels.length < other.levels.length)
      levels = levels :+ scala.collection.mutable.ArrayBuffer.empty[Double]
    for (lvl <- other.levels.indices) levels(lvl) ++= other.levels(lvl)
    n += other.n
    var lvl = 0
    while (lvl < levels.length) {
      if (levels(lvl).length >= cap(lvl)) compact()
      lvl += 1
    }
    this
  }

  def serialize(): Array[Byte] = {
    val sizes = levels.map(_.length)
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 8 + 4 + sizes.length * 4 + sizes.sum * 8)
    bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(k).putLong(n).putLong(coinState).putInt(levels.length)
    sizes.foreach(bb.putInt)
    levels.foreach(_.foreach(bb.putDouble))
    bb.array()
  }
}

object KllSketch {
  def deserialize(bytes: Array[Byte]): KllSketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val s = new KllSketch(bb.getInt)
    s.n = bb.getLong
    s.coinState = bb.getLong
    val nLevels = bb.getInt
    val sizes = Array.fill(nLevels)(bb.getInt)
    s.levels = Array.fill(nLevels)(scala.collection.mutable.ArrayBuffer.empty[Double])
    for (lvl <- 0 until nLevels; _ <- 0 until sizes(lvl)) s.levels(lvl) += bb.getDouble
    s
  }
}
