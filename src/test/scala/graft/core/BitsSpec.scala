package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden-value bit-primitive tests, ported from the reference's unit layer
  * (/root/reference/unitary_tests/additional_methods_test.cpp:5-89) — the
  * expected values are language-independent.
  */
class BitsSpec extends AnyFunSuite {
  import Bits._

  test("maskRight golden values") {
    assert(maskRight(0) == 0L)
    assert(maskRight(1) == 1L)
    assert(maskRight(10) == 1023L)
    assert(maskRight(64) == -1L)
  }

  test("maskLeft golden values") {
    assert(maskLeft(0) == 0L)
    assert(maskLeft(1) == java.lang.Long.parseUnsignedLong("9223372036854775808"))
    assert(maskLeft(10) == java.lang.Long.parseUnsignedLong("18428729675200069632"))
    assert(maskLeft(40) == java.lang.Long.parseUnsignedLong("18446744073692774400"))
  }

  test("64-safe shifts (JVM shifts wrap mod 64 without the guard)") {
    assert(shl(0L, 2) == 0L)
    assert(shl(1L, 10) == 1024L)
    assert(shl(122563L, 64) == 0L)
    assert(shr(0L, 2) == 0L)
    assert(shr(1L << 35, 10) == (1L << 35) >>> 10)
    assert(shr(122563L, 64) == 0L)
  }

  test("word/bit position of a slot") {
    assert(wordOf(0L) == 0 && wordOf(63L) == 0 && wordOf(64L) == 1)
    assert(wordOf(63598423L) == 993725)
    assert(bitOf(0L) == 0 && bitOf(63L) == 63 && bitOf(64L) == 0)
    assert(bitOf(63598423L) == 23)
  }

  test("select: position of rank-th set bit, 64 on miss") {
    assert(select(0L, 1) == 64)
    assert(select(0L, 5) == 64)
    assert(select(1L, 1) == 0)
    assert(select(1L, 2) == 64)
    assert(select(2L, 1) == 1)
    assert(select(2L, 2) == 64)
  }

  test("rank: popcount up to and including pos") {
    assert(rank(20L, 0) == 0)
    assert(rank(20L, 2) == 1)
    assert(rank(20L, 4) == 2)
    assert(rank(20L, 60) == 2)
    assert(rank(365L << 10, 14) == 3)
    assert(rank(365L << 10, 20) == 6)
  }

  test("getBits incl. cross-word reads") {
    val v = Array((31L << 25) + 365L, 1023L)
    assert(getBits(v, 0, 0) == 0L)
    assert(getBits(v, 25, 30) == 31L)
    assert(getBits(v, 24, 30) == (31L << 1))
    assert(getBits(v, 0, 64) == (31L << 25) + 365L)
    assert(getBits(v, 50, 64) == 16760832L)
  }

  test("setBits incl. cross-word writes") {
    var v = Array((31L << 25) + 365L, 1023L)
    setBits(v, 11, 15L, 9)
    assert(v(0) == (31L << 25) + (15L << 11) + 365L)
    assert(v(1) == 1023L)

    v = Array((31L << 25) + 365L, 1023L)
    setBits(v, 35, (1L << 63) - 1, 64)
    assert(v(0) == java.lang.Long.parseUnsignedLong("18446744040390001005"))
    assert(v(1) == 17179869183L)
  }

  test("select/rank are inverses on random words") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val w = rng.nextLong()
      val n = java.lang.Long.bitCount(w)
      for (r <- 1 to n) {
        val pos = select(w, r)
        assert(pos < 64 && ((w >>> pos) & 1L) == 1L)
        assert(rank(w, pos) == r)
      }
      assert(select(w, n + 1) == 64)
    }
  }
}

class FingerprintSpec extends AnyFunSuite {
  import Fingerprint._

  test("xxh64 over int windows is deterministic and position-sensitive") {
    val t = Array(1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
    val a = hashWindow(t, 0, 6, 0L)
    val b = hashWindow(t, 0, 6, 0L)
    val c = hashWindow(t, 1, 6, 0L)
    assert(a == b)
    assert(a != c)
    assert(hashWindow(t, 0, 6, 1L) != a)
  }

  test("xxh64 known vectors (empty / 'a' / 8 bytes) via byte form") {
    // Public XXH64 test vectors (seed 0): xxh64("") = 0xEF46DB3751D8E999
    assert(hashBytes(Array.emptyByteArray, 0L) == 0xef46db3751d8e999L)
    // xxh64("a") = 0xD24EC4F1A98C6E5B
    assert(hashBytes("a".getBytes("UTF-8"), 0L) == 0xd24ec4f1a98c6e5bL)
    // xxh64("Hello, world!") with seed 0 = 0xF58336A78B6F9476
    assert(hashBytes("Hello, world!".getBytes("UTF-8"), 0L) == 0xf58336a78b6f9476L)
  }

  test("int-window hash equals byte hash of LE-encoded ints") {
    val rng = new scala.util.Random(7)
    for (len <- List(1, 2, 3, 4, 7, 8, 9, 16, 33)) {
      val ints = Array.fill(len)(rng.nextInt())
      val bytes = java.nio.ByteBuffer.allocate(4 * len)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      ints.foreach(bytes.putInt)
      assert(hashWindow(ints, 0, len, 99L) == hashBytes(bytes.array(), 99L),
        s"mismatch at len=$len")
    }
  }

  test("splitmix64 reference vector") {
    assert(splitmix64(1234567L) == 0x599ed017fb08fc85L)
    assert(splitmix64(1L) != splitmix64(2L))
    assert(splitmix64(0L) != 0L)
  }

  test("windowFingerprints extracts n-s+1 masked windows") {
    val t = Array.tabulate(20)(i => i * 31 + 7)
    val fps = windowFingerprints(t, 6, 44, 0L)
    assert(fps.length == 15)
    assert(fps.forall(fp => (fp & ~Bits.maskRight(44)) == 0L))
    assert(windowFingerprints(Array(1, 2), 6, 44, 0L).isEmpty)
  }
}
