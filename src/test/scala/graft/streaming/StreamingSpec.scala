package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming second-occurrence filter matches batch HAVING count>=2") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val result = StreamingOps.secondOccurrences(input.toDS(), nShards = 4, qBits = 7)
    val query = result.writeStream.format("memory").queryName("seconds")
      .outputMode("append").start()
    // deterministic stream with duplicates across batches
    val rng = new scala.util.Random(9)
    val all = Vector.fill(3000)(rng.nextInt(500).toLong + 1)
    all.grouped(1000).foreach { batch => input.addData(batch); query.processAllAvailable() }
    query.stop()

    val got = spark.sql("SELECT value FROM seconds").as[Long].collect().toVector
    // each fingerprint emitted at most once, exactly for those seen >= 2 times
    val expect = all.groupBy(identity).collect { case (v, occ) if occ.size >= 2 => v }.toSet
    assert(got.size == got.toSet.size, "fingerprint emitted more than once")
    assert(got.toSet == expect)
    // agrees with the batch formulation
    val batchAnswer = StreamingOps.secondOccurrencesBatch(spark.createDataset(all)).collect().toSet
    assert(got.toSet == batchAnswer)
  }

  test("streaming sessionization: native session windows match the batch gap rule") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val sessions = StreamingOps.sessionize(input.toDS().toDF("user_id", "ts"))
    val query = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // u1: events at 0,10,20 (one session), then 60,65 (second session);
    // u2: single event
    input.addData(Seq(("u1", ts(0)), ("u1", ts(10)), ("u1", ts(20)),
      ("u1", ts(60)), ("u1", ts(65)), ("u2", ts(5))))
    query.processAllAvailable()
    query.stop()
    val rows = spark.sql("SELECT user_id, n_events FROM sess ORDER BY user_id, n_events")
      .as[(String, Long)].collect().toVector
    assert(rows == Vector(("u1", 2L), ("u1", 3L), ("u2", 1L)))
  }

  test("windowed streaming aggregation with watermark over events") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = input.toDS().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), lit(1))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
    val query = agg.writeStream.format("memory").queryName("win")
      .outputMode("complete").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    input.addData(Seq((ts(0), 1.0), (ts(1), 2.0), (ts(6), 3.0), (ts(12), 4.0)))
    query.processAllAvailable()
    query.stop()
    val rows = spark.sql("SELECT n, v FROM win ORDER BY n").collect()
    assert(rows.length == 3) // windows [0,5), [5,10), [10,15)
    assert(rows.map(_.getLong(0)).sum == 4)
  }
}
