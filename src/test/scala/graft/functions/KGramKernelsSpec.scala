package graft.functions

import graft.core.{Bits, Fingerprint}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r3 rolling shingle kernels (one getBytes per document, windowed
  * XXH64 over (bytes, off, len)) to the definitional recompute: windows over
  * UTF-16 chars, each window's UTF-8 bytes hashed — i.e. exactly the pre-r3
  * substring-per-window kernel, ASCII and non-ASCII alike.
  */
class KGramKernelsSpec extends AnyFunSuite {

  private def refShingles(str: String, n: Int, hashBits: Int, seed: Long): Array[Long] = {
    val count = str.length - n + 1
    if (count <= 0) Array.emptyLongArray
    else (0 until count).map { i =>
      Fingerprint.hashBytes(str.substring(i, i + n).getBytes("UTF-8"), seed) & Bits.maskRight(hashBits)
    }.toArray
  }

  private val alphabets = Seq(
    "abcdefgh xyz",      // pure ASCII (fast path)
    "abé döß", // 2-byte UTF-8 chars (fallback path)
    "a€ béc")  // 3-byte UTF-8 chars
  private def randomText(alpha: String, len: Int, seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    Array.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
  }

  test("hashBytes(bytes, off, len) == hashBytes(copyOfRange)") {
    val rnd = new scala.util.Random(13)
    val bytes = Array.fill(512)(rnd.nextInt().toByte)
    for (off <- Seq(0, 1, 7, 100); len <- Seq(0, 1, 3, 4, 8, 12, 31, 32, 33, 64, 100)) {
      val expect = Fingerprint.hashBytes(java.util.Arrays.copyOfRange(bytes, off, off + len), 5L)
      assert(Fingerprint.hashBytes(bytes, off, len, 5L) == expect, s"off=$off len=$len")
    }
  }

  test("rolling shingleFingerprints == substring recompute") {
    for ((alpha, ai) <- alphabets.zipWithIndex; len <- Seq(0, 5, 8, 9, 33, 200)) {
      val s = randomText(alpha, len, 7 * ai + len)
      val got = KGramKernels.shingleFingerprints(UTF8String.fromString(s), 8, 48, 0L).toLongArray()
      assert(got.sameElements(refShingles(s, 8, 48, 0L)), s"len=$len alpha=$ai")
    }
  }

  test("rolling smShingleFingerprints == substring recompute") {
    // independent per-window recompute of splitmix64(poly31(window) + seed)
    // — the q21 HLL feed and the definition its DuckDB oracle replays
    def ref(str: String, n: Int, seed: Long): Array[Long] =
      (0 to str.length - n).map { i =>
        var base = 0L
        for (j <- i until i + n) base = base * 31L + str.charAt(j).toLong
        Fingerprint.splitmix64(base + seed)
      }.toArray
    for ((alpha, ai) <- alphabets.zipWithIndex; len <- Seq(0, 7, 8, 9, 64, 300)) {
      val s = randomText(alpha, len, 13 * ai + len)
      val got = KGramKernels.smShingleFingerprints(UTF8String.fromString(s), 8, 5L).toLongArray()
      assert(got.sameElements(ref(s, 8, 5L)), s"len=$len alpha=$ai")
    }
  }

  test("HLL register feed: add(fp) direct vs addValue rehash differ, both estimate sanely") {
    // q21 feeds registers directly (rehash = false) so its oracle can
    // replay them; this pins the two paths apart AND the estimator
    // accuracy of the direct path on well-mixed splitmix64 inputs
    val direct = new graft.sketch.HyperLogLog(14)
    val rehashed = new graft.sketch.HyperLogLog(14)
    val n = 200000
    for (i <- 0 until n) {
      val fp = Fingerprint.splitmix64(i.toLong)
      direct.add(fp)
      rehashed.addValue(fp)
    }
    val e1 = direct.estimate(); val e2 = rehashed.estimate()
    assert(math.abs(e1 - n) < n * 0.04, s"direct estimate $e1 vs $n")  // ~3 sigma at p=14
    assert(math.abs(e2 - n) < n * 0.04, s"rehashed estimate $e2 vs $n")
    assert(e1 != e2, "distinct register sets expected")
  }

  test("rolling simhash == substring recompute") {
    // independent per-window recompute of the poly31+splitmix64 feature
    // hash (the oracle-reproducible definition), validating the kernel's
    // rolling update
    def ref(str: String, n: Int, seed: Long): Long = {
      val votes = new Array[Int](64)
      for (i <- 0 to str.length - n) {
        var base = 0L
        for (j <- i until i + n) base = base * 31L + str.charAt(j).toLong
        val h = Fingerprint.splitmix64(base + seed)
        for (b <- 0 until 64) if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
      }
      (0 until 64).foldLeft(0L)((acc, b) => if (votes(b) > 0) acc | (1L << b) else acc)
    }
    for ((alpha, ai) <- alphabets.zipWithIndex; len <- Seq(0, 11, 12, 64, 300)) {
      val s = randomText(alpha, len, 11 * ai + len)
      assert(KGramKernels.simhash(UTF8String.fromString(s), 12, 0L) == ref(s, 12, 0L), s"len=$len alpha=$ai")
    }
  }

  test("floatDot == sequential double reference (the lambda-form order)") {
    val rnd = new scala.util.Random(21)
    for (n <- Seq(0, 1, 7, 64, 129)) {
      val a = Array.fill(n)(rnd.nextFloat() * 2 - 1)
      val b = Array.fill(n)(rnd.nextFloat() * 2 - 1)
      var expect = 0.0
      for (i <- 0 until n) expect += a(i).toDouble * b(i).toDouble
      val got = KGramKernels.floatDot(
        UnsafeArrayData.fromPrimitiveArray(a), UnsafeArrayData.fromPrimitiveArray(b))
      assert(java.lang.Double.doubleToLongBits(got) == java.lang.Double.doubleToLongBits(expect), s"n=$n")
    }
  }

  test("hyperplaneSig: deterministic, negation-antipodal, angle-sensitive") {
    val rnd = new scala.util.Random(23)
    val v = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val a = UnsafeArrayData.fromPrimitiveArray(v)
    val s1 = KGramKernels.hyperplaneSig(a, 64, 0L)
    val s2 = KGramKernels.hyperplaneSig(UnsafeArrayData.fromPrimitiveArray(v.clone()), 64, 0L)
    assert(s1 == s2, "deterministic")
    assert(KGramKernels.hyperplaneSig(a, 64, 1L) != s1, "seed-dependent")
    // -v flips every sign (dot products are nonzero w.p. 1 for random floats)
    val neg = UnsafeArrayData.fromPrimitiveArray(v.map(x => -x))
    assert((KGramKernels.hyperplaneSig(neg, 64, 0L) ^ s1) == -1L, "antipodal")
    // small perturbation flips few bits; an independent vector flips ~half
    val nearV = v.map(x => x + 0.01f * (rnd.nextFloat() - 0.5f))
    val near = java.lang.Long.bitCount(
      KGramKernels.hyperplaneSig(UnsafeArrayData.fromPrimitiveArray(nearV), 64, 0L) ^ s1)
    val otherV = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val far = java.lang.Long.bitCount(
      KGramKernels.hyperplaneSig(UnsafeArrayData.fromPrimitiveArray(otherV), 64, 0L) ^ s1)
    assert(near < 8, s"near vector flipped $near/64 bits")
    assert(far > 16, s"independent vector flipped only $far/64 bits")
    // planes > 64 rejected at construction
    intercept[IllegalArgumentException](HyperplaneSigExpr(null, 65, 0L))
  }

  test("rolling minhashSignature == substring recompute") {
    // independent per-window recompute of the poly31 base (the
    // oracle-reproducible definition), validating the rolling update
    def ref(str: String, n: Int, k: Int, seed: Long): Array[Long] = {
      val sig = Array.fill(k)(Long.MaxValue)
      for (i <- 0 to str.length - n) {
        var base = 0L
        for (j <- i until i + n) base = base * 31L + str.charAt(j).toLong
        base += seed
        for (j <- 0 until k) {
          val h = Fingerprint.splitmix64(base + j * 0x9e3779b97f4a7c15L)
          if (h < sig(j)) sig(j) = h
        }
      }
      sig
    }
    for ((alpha, ai) <- alphabets.zipWithIndex; len <- Seq(0, 11, 12, 64, 300)) {
      val s = randomText(alpha, len, 17 * ai + len)
      val got = KGramKernels.minhashSignature(UTF8String.fromString(s), 12, 16, 0L).toLongArray()
      assert(got.sameElements(ref(s, 12, 16, 0L)), s"len=$len alpha=$ai")
    }
  }
}
