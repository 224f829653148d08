package graft.core

/** Deterministic 64-bit fingerprints for token k-grams.
  *
  * One fingerprint function is used identically at build and query time —
  * the single-fingerprint-function rule the reference follows with its
  * reversible xorshift hash (/root/reference/src/additional_methods.cpp:169-224).
  * We fingerprint integer-token windows instead of 2-bit DNA codes, using
  * the public XXH64 algorithm (Yann Collet, BSD) over the little-endian
  * 4-byte encoding of each token.
  */
object Fingerprint {
  private final val P1 = 0x9e3779b185ebca87L
  private final val P2 = 0xc2b2ae3d27d4eb4fL
  private final val P3 = 0x165667b19e3779f9L
  private final val P4 = 0x85ebca77c2b2ae63L
  private final val P5 = 0x27d4eb2f165667c5L

  @inline private def rotl(v: Long, n: Int): Long = java.lang.Long.rotateLeft(v, n)

  @inline private def round(acc: Long, input: Long): Long =
    rotl(acc + input * P2, 31) * P1

  @inline private def mergeRound(acc: Long, v: Long): Long =
    (acc ^ round(0L, v)) * P1 + P4

  @inline private def avalanche(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P2
    h ^= h >>> 29; h *= P3
    h ^= h >>> 32
    h
  }

  /** XXH64 of tokens(from until from+len) seen as 4·len little-endian bytes. */
  def hashWindow(tokens: Array[Int], from: Int, len: Int, seed: Long): Long = {
    val byteLen = 4L * len
    var i = from
    val end = from + len
    var h: Long = 0L
    if (len >= 8) { // >= 32 bytes: 4 lanes over 8-byte stripes (= int pairs)
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      while (end - i >= 8) {
        v1 = round(v1, pair(tokens, i)); i += 2
        v2 = round(v2, pair(tokens, i)); i += 2
        v3 = round(v3, pair(tokens, i)); i += 2
        v4 = round(v4, pair(tokens, i)); i += 2
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      h = mergeRound(h, v1); h = mergeRound(h, v2)
      h = mergeRound(h, v3); h = mergeRound(h, v4)
    } else {
      h = seed + P5
    }
    h += byteLen
    // tail: full 8-byte chunks (int pairs), then a possible lone int
    while (end - i >= 2) {
      h = rotl(h ^ round(0L, pair(tokens, i)), 27) * P1 + P4
      i += 2
    }
    if (i < end) {
      h = rotl(h ^ ((tokens(i) & 0xffffffffL) * P1), 23) * P2 + P3
      i += 1
    }
    avalanche(h)
  }

  @inline private def pair(t: Array[Int], i: Int): Long =
    (t(i) & 0xffffffffL) | (t(i + 1).toLong << 32)

  /** XXH64 of a single long (8 bytes LE) — used for salting/bucketing. */
  def hashLong(v: Long, seed: Long): Long = {
    var h = seed + P5 + 8L
    h = rotl(h ^ round(0L, v), 27) * P1 + P4
    avalanche(h)
  }

  /** XXH64 over UTF-8 bytes of a string (used for text shingles). */
  def hashBytes(bytes: Array[Byte], seed: Long): Long =
    hashBytes(bytes, 0, bytes.length, seed)

  /** XXH64 over bytes(off until off+len) — the window form the rolling
    * shingle kernels use: ONE byte array per document, one hash call per
    * window, zero per-window allocation (round-2 hot-path finding: a
    * substring+getBytes per shingle was ~2x10^8 short-lived allocations per
    * sf0.1 catalog pass).
    */
  def hashBytes(bytes: Array[Byte], off: Int, len: Int, seed: Long): Long = {
    var i = off
    val end = off + len
    var h: Long = 0L
    @inline def le64(o: Int): Long = {
      var v = 0L; var j = 0
      while (j < 8) { v |= (bytes(o + j) & 0xffL) << (8 * j); j += 1 }
      v
    }
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      while (end - i >= 32) {
        v1 = round(v1, le64(i)); v2 = round(v2, le64(i + 8))
        v3 = round(v3, le64(i + 16)); v4 = round(v4, le64(i + 24))
        i += 32
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      h = mergeRound(h, v1); h = mergeRound(h, v2)
      h = mergeRound(h, v3); h = mergeRound(h, v4)
    } else h = seed + P5
    h += len
    while (end - i >= 8) { h = rotl(h ^ round(0L, le64(i)), 27) * P1 + P4; i += 8 }
    if (end - i >= 4) {
      var v = 0L; var j = 0
      while (j < 4) { v |= (bytes(i + j) & 0xffL) << (8 * j); j += 1 }
      h = rotl(h ^ (v * P1), 23) * P2 + P3
      i += 4
    }
    while (i < end) {
      h = rotl(h ^ ((bytes(i) & 0xffL) * P5), 11) * P1
      i += 1
    }
    avalanche(h)
  }

  /** Sebastiano Vigna's splitmix64 — the deterministic generator behind the
    * synthetic tokens table (FIXTURES.md §1). Public-domain algorithm.
    */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** All s-gram fingerprints of a token sequence, masked to `hashBits`. */
  def windowFingerprints(tokens: Array[Int], s: Int, hashBits: Int, seed: Long): Array[Long] = {
    val n = tokens.length - s + 1
    if (n <= 0) return Array.emptyLongArray
    val out = new Array[Long](n)
    val m = Bits.maskRight(hashBits)
    var i = 0
    while (i < n) {
      out(i) = hashWindow(tokens, i, s, seed) & m
      i += 1
    }
    out
  }
}
