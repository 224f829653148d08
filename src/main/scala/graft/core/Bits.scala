package graft.core

/** Low-level bit primitives over packed `Array[Long]` word arrays.
  *
  * Semantics mirror the reference bit toolbox
  * (/root/reference/src/additional_methods.cpp:14-127 and
  * src/generic/bitrankasm.hpp, bitselectasm.hpp), re-expressed for the JVM.
  * NB: JVM shifts wrap mod 64 (like x86), so 64-bit shifts need the same
  * explicit guard the reference uses (additional_methods.cpp:23-31).
  */
object Bits {
  final val WordBits = 64

  /** Mask selecting the `n` lowest bits; all-ones for n >= 64. */
  @inline def maskRight(n: Int): Long = if (n >= 64) -1L else (1L << n) - 1L

  /** Mask selecting the `n` highest bits. */
  @inline def maskLeft(n: Int): Long = ~maskRight(64 - n)

  /** Left shift returning 0 when the shift is >= 64 (JVM wraps mod 64). */
  @inline def shl(v: Long, s: Int): Long = if (s >= 64) 0L else v << s

  /** Unsigned right shift returning 0 when the shift is >= 64. */
  @inline def shr(v: Long, s: Int): Long = if (s >= 64) 0L else v >>> s

  /** Word index containing absolute bit/slot position `pos`. */
  @inline def wordOf(pos: Long): Long = pos >>> 6

  /** Offset of `pos` inside its 64-bit word. */
  @inline def bitOf(pos: Long): Int = (pos & 63L).toInt

  /** Number of set bits in `word` at positions [0, pos] (inclusive). */
  @inline def rank(word: Long, pos: Int): Int =
    java.lang.Long.bitCount(word & ((2L << pos) - 1L))

  /** Position of the `rank`-th (1-based) set bit of `word`; 64 when `word`
    * has fewer than `rank` set bits (the select-miss contract the reference
    * unit tests pin down: additional_methods_test.cpp:52-59).
    */
  def select(word: Long, rank: Long): Int = {
    if (rank <= 0L) return 64
    var w = word
    var r = rank
    while (r > 1L && w != 0L) { w &= w - 1L; r -= 1L }
    if (w == 0L) 64 else java.lang.Long.numberOfTrailingZeros(w)
  }

  /** Read `len` (0..64) bits starting at absolute bit `pos`, possibly
    * crossing one word boundary.
    */
  def getBits(a: Array[Long], pos: Long, len: Int): Long = {
    if (len == 0) return 0L
    val w = wordOf(pos).toInt
    val sh = bitOf(pos)
    val m = maskRight(len)
    if (sh + len <= 64) (a(w) >>> sh) & m
    else (a(w) >>> sh) | ((a(w + 1) << (64 - sh)) & m)
  }

  /** Write the low `len` bits of `value` at absolute bit `pos`. */
  def setBits(a: Array[Long], pos: Long, value: Long, len: Int): Unit = {
    if (len == 0) return
    val m = maskRight(len)
    val w = wordOf(pos).toInt
    val sh = bitOf(pos)
    val v = value & m
    a(w) = (a(w) & ~(m << sh)) | (v << sh)
    val stored = 64 - sh
    if (len > stored) {
      a(w + 1) = (a(w + 1) & ~maskRight(len - stored)) | (v >>> stored)
    }
  }

  /** Reassemble a fingerprint from its quotient and remainder:
    * (rem << qBits) | quot.
    */
  @inline def rebuildFingerprint(quot: Long, rem: Long, qBits: Int): Long =
    shl(rem, qBits) | quot
}
