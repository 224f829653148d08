package graft.core

import graft.functions.GraftFunctions._
import graft.operators.{BqfParams, SketchAggregators}
import graft.sources.TokensTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev bench isolating the Spark aggregation overhead around the UDAF. */
object AggBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val params = BqfParams(qBits = 16, countBits = 8, hashBits = 48, kTokens = 8, zTokens = 2)
    val df = TokensTable.dataframe(spark, 20000, partitions = cpus).cache()
    df.count()
    val fps = sgram_fingerprints(col("tokens"), params.sTokens, params.hashBits, params.seed)
    val bqf = SketchAggregators.bqfOverFingerprintArrays(params)

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    time("fingerprints only") { df.select(explode(fps)).count() }
    time("global agg (1 group)") { df.agg(bqf(fps)).head() }
    time("groupBy 4 buckets") {
      df.withColumn("bucket", pmod(xxhash64(col("doc_id")), lit(4)))
        .groupBy("bucket").agg(bqf(fps)).count()
    }
    time("groupBy 32 buckets") {
      df.withColumn("bucket", pmod(xxhash64(col("doc_id")), lit(32)))
        .groupBy("bucket").agg(bqf(fps)).count()
    }
    println("=== global agg plan ===")
    df.agg(bqf(fps)).explain()
    println("=== grouped by literal ===")
    time("groupBy lit(0)") { df.groupBy(lit(0)).agg(bqf(fps)).count() }
    spark.stop()
  }
}
