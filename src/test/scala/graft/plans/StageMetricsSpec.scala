package graft.plans

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class StageMetricsSpec extends AnyFunSuite {
  test("listener records completed stages with shuffle volumes") {
    val spark = SparkTestSession.spark
    val m = StageMetrics.attach(spark)
    try {
      import spark.implicits._
      spark.range(0, 100000, 1, 4).map(i => (i % 7, i))
        .toDF("k", "v").groupBy("k").count().collect()
      // listener bus is async (private API); poll for it to drain
      val deadline = System.currentTimeMillis() + 30000
      while (m.all.size < 2 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      val stages = m.all
      assert(stages.nonEmpty)
      assert(stages.map(_.numTasks).sum > 0)
      assert(stages.exists(_.shuffleWriteBytes > 0), "no stage recorded shuffle writes")
      assert(m.jsonLines.forall(l => l.startsWith("{") && l.endsWith("}")))
      assert(m.snapshot(spark).count() == stages.size)
    } finally m.detach(spark)
  }
}
