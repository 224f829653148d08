package graft.core

/** Dev bench: 128 shard builds of 1.21M entries each across N threads —
  * reproduces the Spark sorted-index build stage without Spark.
  */
object ParBench {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else 32
    val shards = 128
    val perShard = 1211566
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val futures = (0 until shards).map { s =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val rng = new java.util.Random(s)
          val fps = Array.fill(perShard)(rng.nextLong() & Bits.maskRight(48))
          val ones = new Array[Long](perShard)
          java.util.Arrays.fill(ones, 1L)
          BackpackFilter.fromEntries(7, 8, 48, CountMode.Exact, 0, 0, 0L, fps, ones, perShard)
        }
      })
    }
    futures.foreach(_.get())
    pool.shutdown()
    println(f"threads=$threads shards=$shards total=${(System.nanoTime() - t0) / 1e9}%.1f s")
  }
}
