package graft.tmp
import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false")
      .config("spark.sql.adaptive.enabled","true").config("spark.kryoserializer.buffer.max","512m")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold","4096")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.local.dir", graft.BuildJob.shmLocalDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sm = graft.plans.StageMetrics.attach(spark)
    val fn = graft.SparkEntry.queries(name)
    (1 to (if (args.length > 2) args(2).toInt else 2)).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(s"RUN $i: rows=$n sec=${(System.nanoTime()-t0)/1e9}")
    }
    sm.jsonLines.foreach(l => println(s"[stage] $l"))
    spark.stop()
  }
}
