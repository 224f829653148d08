package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class HyperLogLogSpec extends AnyFunSuite {
  test("estimate within 3 standard errors across magnitudes") {
    for (n <- Seq(100, 5000, 200000)) {
      val h = new HyperLogLog(14)
      val rng = new Random(n)
      (1 to n).foreach(_ => h.addValue(rng.nextLong()))
      val se = 1.04 / math.sqrt(1 << 14)
      assert(math.abs(h.estimate() - n).toDouble / n <= 3 * se + 0.01, s"n=$n est=${h.estimate()}")
    }
  }

  test("merge equals union; duplicates collapse") {
    val a = new HyperLogLog(12)
    val b = new HyperLogLog(12)
    val union = new HyperLogLog(12)
    val rng = new Random(7)
    val xs = Vector.fill(20000)(rng.nextLong())
    xs.take(12000).foreach { x => a.addValue(x); union.addValue(x) }
    xs.drop(8000).foreach { x => b.addValue(x); union.addValue(x) } // 4000 overlap
    assert(a.merge(b).estimate() == union.estimate())
    val c = new HyperLogLog(12)
    (1 to 100).foreach(_ => c.addValue(42L))
    assert(c.estimate() == 1L)
  }

  test("serialize round-trip") {
    val h = new HyperLogLog(10)
    (1 to 1000).foreach(i => h.addValue(i.toLong * 31))
    assert(HyperLogLog.deserialize(h.serialize()).estimate() == h.estimate())
  }
}

class CountMinSpec extends AnyFunSuite {
  test("never underestimates; error bounded by eps * N") {
    val cms = new CountMinSketch(5, 12)
    val rng = new Random(3)
    val truth = scala.collection.mutable.Map.empty[Long, Long]
    for (_ <- 1 to 50000) {
      val key = rng.nextInt(3000).toLong
      cms.add(key)
      truth(key) = truth.getOrElse(key, 0L) + 1
    }
    val eps = math.E / cms.width
    var failures = 0
    truth.foreach { case (k, c) =>
      val e = cms.estimate(k)
      assert(e >= c, s"underestimate at $k")
      if (e - c > eps * 50000) failures += 1
    }
    // error bound holds with prob 1 - e^-depth per key
    assert(failures <= truth.size / 100, s"$failures of ${truth.size} above eps*N")
  }

  test("merge adds counts") {
    val a = new CountMinSketch(4, 10)
    val b = new CountMinSketch(4, 10)
    a.add(99L, 5); b.add(99L, 7); b.add(7L, 2)
    val m = a.merge(b)
    assert(m.estimate(99L) >= 12)
    assert(m.estimate(7L) >= 2)
    assert(CountMinSketch.deserialize(m.serialize()).estimate(99L) == m.estimate(99L))
  }
}

class BloomSpec extends AnyFunSuite {
  test("no false negatives; FP near design rate") {
    val n = 50000
    val bloom = BloomSketch.sized(n, 0.01)
    val rng = new Random(5)
    val in = Set.fill(n)(rng.nextLong())
    in.foreach(bloom.add)
    in.foreach(x => assert(bloom.mightContain(x)))
    val out = Iterator.continually(rng.nextLong()).filterNot(in).take(100000)
    val fp = out.count(bloom.mightContain)
    assert(fp < 100000 * 0.03, s"FP rate ${fp / 100000.0} >> 0.01 design") // 3x slack
  }

  test("merge is union") {
    val a = BloomSketch.sized(1000, 0.01)
    val b = BloomSketch.sized(1000, 0.01)
    a.add(1L); b.add(2L)
    val m = a.merge(b)
    assert(m.mightContain(1L) && m.mightContain(2L))
    assert(BloomSketch.deserialize(m.serialize()).mightContain(2L))
  }
}

class TDigestSpec extends AnyFunSuite {
  test("quantiles of uniform data accurate, tails tighter") {
    val t = new TDigest(100)
    val rng = new Random(11)
    val xs = Array.fill(100000)(rng.nextDouble())
    xs.foreach(t.add(_))
    val sorted = xs.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = t.quantile(q)
      val exact = sorted((q * (xs.length - 1)).toInt)
      val tol = if (q <= 0.05 || q >= 0.95) 0.005 else 0.02
      assert(math.abs(est - exact) <= tol, s"q=$q est=$est exact=$exact")
    }
    assert(t.quantile(0.0) >= 0.0 && t.quantile(1.0) <= 1.0)
  }

  test("merge of shards approximates whole") {
    val rng = new Random(13)
    val xs = Array.fill(60000)(rng.nextGaussian() * 10 + 50)
    val whole = new TDigest(100)
    xs.foreach(whole.add(_))
    val shards = xs.grouped(15000).map { part =>
      val t = new TDigest(100); part.foreach(t.add(_)); t
    }.toSeq
    val merged = shards.reduce((a, b) => a.merge(b))
    for (q <- Seq(0.1, 0.5, 0.9)) {
      assert(math.abs(merged.quantile(q) - whole.quantile(q)) <= 0.5,
        s"q=$q merged=${merged.quantile(q)} whole=${whole.quantile(q)}")
    }
    assert(math.abs(merged.count - xs.length) < 1e-6)
    val rt = TDigest.deserialize(merged.serialize())
    assert(rt.quantile(0.5) == merged.quantile(0.5))
  }
}

class KllSpec extends AnyFunSuite {
  test("rank error within ~2/k bound on uniform stream") {
    val s = new KllSketch(200)
    val n = 100000
    (1 to n).foreach(i => s.add(i.toDouble))
    assert(s.count == n)
    for (q <- Seq(0.05, 0.25, 0.5, 0.75, 0.95)) {
      val est = s.quantile(q)
      assert(math.abs(est / n - q) <= 0.03, s"q=$q est=$est")
      assert(math.abs(s.rankOf(q * n) - q) <= 0.03, s"rank at $q")
    }
  }

  test("merge of shards approximates whole; serialize round-trips") {
    val rng = new Random(17)
    val xs = Array.fill(80000)(rng.nextDouble() * 1000)
    val shards = xs.grouped(20000).map { part =>
      val s = new KllSketch(200); part.foreach(s.add); s
    }.toSeq
    val merged = shards.reduce((a, b) => a.merge(b))
    assert(merged.count == xs.length)
    val sorted = xs.sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val exact = sorted((q * (xs.length - 1)).toInt)
      assert(math.abs(merged.quantile(q) - exact) <= 30, s"q=$q")
    }
    val rt = KllSketch.deserialize(merged.serialize())
    assert(rt.quantile(0.5) == merged.quantile(0.5) && rt.count == merged.count)
  }
}
