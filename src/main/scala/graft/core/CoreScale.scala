package graft.core

/** Thread-scaling probe for the library core, no Spark: each thread builds
  * independent shard sketches (generate fingerprints -> radix sort ->
  * canonical single-pass construction via [[BackpackFilter.fromEntries]]),
  * which is exactly the reduce-side work of the sharded index build. This
  * separates what the LIBRARY scales (shard builds are embarrassingly
  * parallel) from what Spark local-mode machinery and the time-shared host
  * add on top — on a real cluster each executor brings its own memory and
  * shuffle service, so the per-executor picture is this probe, not the
  * single-box thread curve.
  *
  * args: threads shardsTotal entriesPerShard
  */
object CoreScale {
  def main(args: Array[String]): Unit = {
    val threads = if (args.length > 0) args(0).toInt else 16
    val shardsTotal = if (args.length > 1) args(1).toInt else 128
    val perShard = if (args.length > 2) args(2).toInt else 1200000
    val next = new java.util.concurrent.atomic.AtomicInteger(0)
    val t0 = System.nanoTime()
    val pool = (0 until threads).map { t =>
      new Thread(() => {
        var shard = next.getAndIncrement()
        while (shard < shardsTotal) {
          val fps = new Array[Long](perShard)
          var i = 0
          var x = shard * 0x9E3779B97F4A7C15L
          while (i < perShard) {
            x = Fingerprint.splitmix64(x)
            fps(i) = x & ((1L << 48) - 1)
            i += 1
          }
          // counts == null: the all-ones keys-only bulk build — the exact
          // path the sharded index's reduce tasks run since r8
          val f = BackpackFilter.fromEntries(7, 8, 48, CountMode.Exact, 8, 2, 0L,
            fps, null, perShard)
          if (f.distinctCount <= 0) throw new IllegalStateException("empty shard")
          shard = next.getAndIncrement()
        }
      })
    }
    // a worker dying (e.g. OOM) must fail the PROBE, not just its thread:
    // join() returns normally either way, and a result line from a run that
    // did less work would silently poison the scaling series
    val failed = new java.util.concurrent.atomic.AtomicBoolean(false)
    pool.foreach(_.setUncaughtExceptionHandler((_, e) => {
      e.printStackTrace(); failed.set(true)
    }))
    pool.foreach(_.start())
    pool.foreach(_.join())
    if (failed.get()) {
      System.err.println("CoreScale: worker thread failed; no result emitted")
      sys.exit(1)
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val total = shardsTotal.toLong * perShard
    println(s"""{"sec":$sec,"entries":$total,"entries_per_sec":${(total / sec).toLong},"threads":$threads,"mode":"core"}""")
  }

  /** Fork a fresh GC-pinned JVM running this probe; returns seconds.
    *
    * The fork is EXECUTOR-SIZED: `ActiveProcessorCount` and the GC thread
    * count scale with the measured thread count, because that is what the
    * north rule's "same job at two cluster sizes" means — a cluster
    * executor pinned to N cores gets N cores for GC and JIT too. A fixed
    * 8-GC-thread / unrestricted-APC fork (rounds 1-4) lends SMALL levels
    * hidden extra parallelism, deflating every measured pair; A/B on this
    * host: level-1 flat, level-4 ~5% faster under its own sizing (8 GC
    * threads oversubscribe a 4-thread workload on a time-shared box).
    */
  def forked(threads: Int, shardsTotal: Int, perShard: Int, heap: String): Double = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq(javaBin,
      s"-Xms$heap", s"-Xmx$heap",
      "-XX:+UseParallelGC", s"-XX:ParallelGCThreads=${math.min(8, math.max(2, threads))}",
      s"-XX:ActiveProcessorCount=$threads",
      "-XX:+AlwaysPreTouch", "-XX:PretenureSizeThreshold=1048576",
      "-cp", System.getProperty("java.class.path"),
      "graft.core.CoreScale", threads.toString, shardsTotal.toString, perShard.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toVector
    proc.waitFor()
    val json = out.find(_.startsWith("""{"sec":"""))
      .getOrElse(throw new RuntimeException(s"CoreScale produced no result; tail: ${out.takeRight(5).mkString(" | ")}"))
    """"sec":([0-9.Ee+-]+)""".r.findFirstMatchIn(json).get.group(1).toDouble
  }
}
