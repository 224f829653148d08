package graft.core

import graft.functions.GraftFunctions._
import graft.operators.BqfParams
import graft.plans.BqfPipeline
import graft.sources.TokensTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev bench: decouple cores from bucket count to find the scaling killer. */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("ROWS", "50000").toLong
    val cpusL = sys.env.getOrElse("CPUS","8").toInt
    val bucketsL = sys.env.getOrElse("BUCKETS","32").toInt
    for (cpus <- Seq(cpusL); buckets <- Seq(bucketsL)) {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.ui.enabled", "false")
        .config("spark.kryoserializer.buffer.max", "512m")
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val params = BqfParams(qBits = 16, countBits = 8, hashBits = 48, kTokens = 8, zTokens = 2)
      val df = TokensTable.dataframe(spark, rows, partitions = cpus)
      val fps = sgram_fingerprints(col("tokens"), params.sTokens, params.hashBits, params.seed)
      // warm
      val t1 = System.nanoTime()
      df.select(explode(fps)).count()
      val tFps = (System.nanoTime() - t1) / 1e9
      val t0 = System.nanoTime()
      BqfPipeline.buildSharded(df, fps, col("doc_id"), params, nBuckets = buckets, fanout = 8)
      println(f"cpus=$cpus%2d buckets=$buckets%3d fps-only=${tFps}%6.2f build=${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.stop()
    }
  }
}
