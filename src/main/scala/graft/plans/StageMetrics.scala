package graft.plans

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-stage metrics emission (north rule: jobs "emit per-stage metrics"):
  * a SparkListener records every completed stage's task count, wall time,
  * executor CPU time, shuffle read/write and spill volumes; [[snapshot]]
  * exposes them relationally and [[jsonLines]] as one JSON object per stage
  * for log scraping. Listener callbacks are on the event bus — no work is
  * added to the job's own path.
  *
  * Usage: `val m = StageMetrics.attach(spark); <run job>; m.snapshot(spark)`.
  */
final class StageMetrics extends SparkListener {
  import StageMetrics.Stage

  private val stages = new java.util.concurrent.ConcurrentLinkedQueue[Stage]()

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val info = sc.stageInfo
    val m = info.taskMetrics
    val wall = (for { s <- info.submissionTime; c <- info.completionTime } yield c - s).getOrElse(-1L)
    stages.add(Stage(
      info.stageId, info.attemptNumber(), info.name.takeWhile(_ != '\n'), info.numTasks,
      wall, m.executorRunTime, m.executorCpuTime / 1000000L,
      m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
      m.inputMetrics.bytesRead, m.outputMetrics.bytesWritten,
      m.memoryBytesSpilled, m.diskBytesSpilled))
  }

  def all: Seq[Stage] = { import scala.jdk.CollectionConverters._; stages.iterator().asScala.toSeq }

  /** Completed stages as a DataFrame (one row per stage attempt). */
  def snapshot(spark: SparkSession): DataFrame = {
    import spark.implicits._
    all.toDF()
  }

  /** Minimal JSON string escape (quotes, backslashes, control chars) — a
    * stage name is free text and must not break downstream log scrapers.
    */
  private def jstr(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b ++= "\\\""
      case '\\' => b ++= "\\\\"
      case c if c < ' ' => b ++= f"\\u${c.toInt}%04x"
      case c => b += c
    }
    b.toString
  }

  /** One JSON line per stage, for appending to job logs. */
  def jsonLines: Seq[String] = all.map { s =>
    s"""{"stage":${s.stageId},"attempt":${s.attempt},"name":"${jstr(s.name)}"""" +
      s""","tasks":${s.numTasks},"wall_ms":${s.wallMs},"run_ms":${s.executorRunMs}""" +
      s""","cpu_ms":${s.executorCpuMs},"shuffle_read":${s.shuffleReadBytes}""" +
      s""","shuffle_write":${s.shuffleWriteBytes},"input":${s.inputBytes}""" +
      s""","output":${s.outputBytes},"spill_mem":${s.memorySpillBytes},"spill_disk":${s.diskSpillBytes}}"""
  }

  def detach(spark: SparkSession): Unit = spark.sparkContext.removeSparkListener(this)
}

object StageMetrics {
  final case class Stage(stageId: Int, attempt: Int, name: String, numTasks: Int,
                         wallMs: Long, executorRunMs: Long, executorCpuMs: Long,
                         shuffleReadBytes: Long, shuffleWriteBytes: Long,
                         inputBytes: Long, outputBytes: Long,
                         memorySpillBytes: Long, diskSpillBytes: Long)

  def attach(spark: SparkSession): StageMetrics = {
    val m = new StageMetrics
    spark.sparkContext.addSparkListener(m)
    m
  }
}
