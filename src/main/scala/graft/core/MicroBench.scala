package graft.core

/** Dev microbenchmark for the sketch hot paths (no Spark): insert throughput
  * vs load factor, merge throughput, query throughput. Run:
  * sbt "runMain graft.core.MicroBench"
  */
object MicroBench {
  private def time[A](label: String, n: Long)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"$label%-40s ${sec}%8.3f s  ${(n / sec / 1e6)}%8.2f Mops/s")
    r
  }

  def main(args: Array[String]): Unit = {
    val n = 1000000
    val rng = new java.util.Random(42)
    val fps = Array.fill(n)(rng.nextLong() & Bits.maskRight(48))

    for (q <- Seq(21, 20)) { // 21 -> ~48% final load, 20 -> ~95% load
      val f = BackpackFilter(qBits = q, countBits = 8, hashBits = 48)
      time(s"insert 1M distinct q0=$q", n) { fps.foreach(f.add(_, 1)) }
      println(s"  final q=${f.quotientBits} load=${f.distinctCount.toDouble / (1L << f.quotientBits)}")
      time(s"query 1M present q=${f.quotientBits}", n) {
        var s = 0L; fps.foreach(fp => s += f.abundance(fp)); s
      }
      time(s"enumerate q=${f.quotientBits}", n) { f.entries().length }
    }

    // merge: 8 shards of 125k -> 1M
    val shards = fps.grouped(n / 8).map { part =>
      val f = BackpackFilter(qBits = 18, countBits = 8, hashBits = 48)
      part.foreach(f.add(_, 1))
      f
    }.toVector
    time("merge 8x125k shards", n) {
      shards.reduce((a, b) => if (a.distinctCount >= b.distinctCount) a.mergeInPlace(b) else b.mergeInPlace(a))
    }

    // bulk build from raw entries (the sorted index path per shard)
    val ones = new Array[Long](n)
    java.util.Arrays.fill(ones, 1L)
    time("fromEntries 1M (start q=7)", n) {
      BackpackFilter.fromEntries(7, 8, 48, CountMode.Exact, 0, 0, 0L, fps, ones, n)
    }
    time("fromEntries 1M (start q=21)", n) {
      BackpackFilter.fromEntries(21, 8, 48, CountMode.Exact, 0, 0, 0L, fps, ones, n)
    }

    // duplicate-heavy: zipfish duplicates (counter bumps, no growth)
    val dupFps = Array.fill(n)(fps(rng.nextInt(100000)))
    val fd = BackpackFilter(qBits = 18, countBits = 8, hashBits = 48)
    time("insert 1M (100k distinct, dup bumps)", n) { dupFps.foreach(fd.add(_, 1)) }
  }
}
