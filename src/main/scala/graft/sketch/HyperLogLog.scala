package graft.sketch

import graft.core.Fingerprint

/** Dense HyperLogLog distinct-count sketch (Flajolet et al. 2007, with the
  * standard small-range linear-counting correction). Mergeable: register-wise
  * max. Standard error ~= 1.04 / sqrt(2^p).
  *
  * Companion mergeable UDAF required by the north rule alongside the BQF —
  * the reference tracks exact distinct counts single-node
  * (`elements_inside`, /root/reference/src/rsqf.hpp:169-171); HLL is its
  * bounded-memory distributed analogue.
  */
final class HyperLogLog(val p: Int) extends Serializable {
  require(p >= 4 && p <= 18, s"precision $p out of [4,18]")
  val m: Int = 1 << p
  private val registers = new Array[Byte](m)

  def add(hash: Long): Unit = {
    val idx = (hash >>> (64 - p)).toInt
    val rest = hash << p
    val rank = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rank > registers(idx)) registers(idx) = rank.toByte
  }

  def addValue(v: Long): Unit = add(Fingerprint.hashLong(v, 0x4c1L))

  def merge(other: HyperLogLog): HyperLogLog = {
    require(other.p == p, "precision mismatch")
    var i = 0
    while (i < m) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
    this
  }

  def estimate(): Long = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      // 1.0 / 2^reg: exact power-of-two arithmetic (reg <= 64-p+1 <= 61),
      // summed in register order — every FP op here is reproducible
      // bit-for-bit by the q21 DuckDB oracle's ordered list_sum replay
      sum += 1.0 / (1L << registers(i))
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / sum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else raw
    math.round(est)
  }

  def serialize(): Array[Byte] = {
    val out = new Array[Byte](1 + m)
    out(0) = p.toByte
    System.arraycopy(registers, 0, out, 1, m)
    out
  }
}

object HyperLogLog {
  def deserialize(bytes: Array[Byte]): HyperLogLog = {
    val h = new HyperLogLog(bytes(0).toInt)
    System.arraycopy(bytes, 1, h.registers, 0, h.m)
    h
  }
}

/** Count-min sketch (Cormode & Muthukrishnan 2005): depth x width counter
  * matrix; point estimate = min over rows — an overestimate with error
  * <= eps * N (eps = e / width) at probability 1 - delta (delta = e^-depth).
  * Mergeable: element-wise add.
  */
final class CountMinSketch(val depth: Int, val widthBits: Int) extends Serializable {
  require(depth >= 1 && depth <= 16 && widthBits >= 4 && widthBits <= 28)
  val width: Int = 1 << widthBits
  private val counts = new Array[Long](depth * width)

  @inline private def idx(row: Int, hash: Long): Int =
    row * width + (Fingerprint.hashLong(hash, 0x20c5L + row).toInt & (width - 1))

  def add(hash: Long, c: Long = 1L): Unit = {
    var r = 0
    while (r < depth) { counts(idx(r, hash)) += c; r += 1 }
  }

  def estimate(hash: Long): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = counts(idx(r, hash))
      if (v < best) best = v
      r += 1
    }
    best
  }

  def merge(other: CountMinSketch): CountMinSketch = {
    require(other.depth == depth && other.widthBits == widthBits, "shape mismatch")
    var i = 0
    while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
    this
  }

  def totalAdded: Long = {
    var s = 0L
    var i = 0
    while (i < width) { s += counts(i); i += 1 } // row 0 sums all additions
    s
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + counts.length * 8)
    bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(depth).putInt(widthBits)
    counts.foreach(bb.putLong)
    bb.array()
  }
}

object CountMinSketch {
  def deserialize(bytes: Array[Byte]): CountMinSketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val s = new CountMinSketch(bb.getInt, bb.getInt)
    var i = 0
    while (i < s.counts.length) { s.counts(i) = bb.getLong; i += 1 }
    s
  }
}

/** Classic Bloom filter with double hashing (Kirsch-Mitzenmacher): k probe
  * positions h1 + i*h2 over m bits. Mergeable: bitwise OR. No false
  * negatives; FP ~= (1 - e^{-kn/m})^k.
  */
final class BloomSketch(val mBits: Long, val k: Int) extends Serializable {
  require(k >= 1 && k <= 32 && mBits >= 64 && mBits <= (1L << 36))
  private val words = new Array[Long](((mBits + 63) / 64).toInt)

  @inline private def probes(hash: Long): (Long, Long) = {
    val h1 = Fingerprint.hashLong(hash, 0xb100L)
    val h2 = Fingerprint.hashLong(hash, 0xf17eL) | 1L
    (h1, h2)
  }

  def add(hash: Long): Unit = {
    val (h1, h2) = probes(hash)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, mBits)
      words((bit >>> 6).toInt) |= 1L << (bit & 63L)
      i += 1
    }
  }

  def mightContain(hash: Long): Boolean = {
    val (h1, h2) = probes(hash)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, mBits)
      if (((words((bit >>> 6).toInt) >>> (bit & 63L)) & 1L) == 0L) return false
      i += 1
    }
    true
  }

  def merge(other: BloomSketch): BloomSketch = {
    require(other.mBits == mBits && other.k == k, "shape mismatch")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    this
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + words.length * 8)
    bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(mBits).putInt(k)
    words.foreach(bb.putLong)
    bb.array()
  }
}

object BloomSketch {
  def deserialize(bytes: Array[Byte]): BloomSketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val s = new BloomSketch(bb.getLong, bb.getInt)
    var i = 0
    while (i < s.words.length) { s.words(i) = bb.getLong; i += 1 }
    s
  }

  /** Size for a target false-positive rate: m = -n ln(fp) / ln(2)^2. */
  def sized(expectedN: Long, fpRate: Double): BloomSketch = {
    val m = math.max(64L, math.ceil(-expectedN * math.log(fpRate) / (math.log(2) * math.log(2))).toLong)
    val k = math.max(1, math.round(m.toDouble / expectedN * math.log(2)).toInt)
    new BloomSketch(m, math.min(k, 32))
  }
}
