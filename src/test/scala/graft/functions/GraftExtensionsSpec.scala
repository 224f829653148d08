package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL registrations must agree exactly with the Column API they wrap. */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    GraftExtensions.registerAll(s)
    s
  }
  import spark.implicits._

  test("SQL forms match the Column API bit-for-bit") {
    val df = Seq(("a", "the quick brown fox jumps over it"), ("b", "pack my box with five dozen jugs"))
      .toDF("id", "text")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT id, shingle_fingerprints(text, 8, 48, 0) AS fps,
        |       graft_simhash(text, 12, 0) AS sh,
        |       minhash_signature(text, 12, 16, 0) AS mh,
        |       doc_fingerprint(text, 0) AS dfp
        |FROM ext_docs""".stripMargin).orderBy("id").collect()
    val viaCol = df.select(col("id"),
        GraftFunctions.shingle_fingerprints(col("text"), 8, 48, 0L).as("fps"),
        GraftFunctions.simhash(col("text"), 12, 0L).as("sh"),
        GraftFunctions.minhash_signature(col("text"), 12, 16, 0L).as("mh"),
        GraftFunctions.doc_fingerprint(col("text"), 0L).as("dfp"))
      .orderBy("id").collect()
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("float_dot and sgram_fingerprints work from SQL over typed arrays") {
    val r = spark.sql(
      "SELECT float_dot(array(CAST(1.5 AS FLOAT), CAST(-2 AS FLOAT)), array(CAST(2 AS FLOAT), CAST(0.5 AS FLOAT)))")
      .head().getDouble(0)
    assert(r == 1.5 * 2 + (-2.0) * 0.5)
    val fps = spark.sql("SELECT sgram_fingerprints(array(1,2,3,4), 2, 48, 0)")
      .head().getSeq[Long](0)
    assert(fps.length == 3)
  }

  test("non-constant parameters are rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_fingerprints(text, length(text), 48, 0) FROM ext_docs").collect()
    }
    assert(e.getMessage.contains("constant integer"))
  }

  test("foldable-but-non-literal constants are accepted") {
    val fps = spark.sql("SELECT sgram_fingerprints(array(1,2,3,4), 1+1, 40+8, CAST(0 AS BIGINT))")
      .head().getSeq[Long](0)
    assert(fps.length == 3)
  }

  test("wrong arity fails with a clean arity message, not IndexOutOfBounds") {
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_fingerprints(text) FROM ext_docs").collect()
    }
    assert(e.getMessage.contains("expects 4 arguments"), s"got: ${e.getMessage}")
    val e2 = intercept[Exception] {
      spark.sql("SELECT float_dot(array(CAST(1 AS FLOAT)))").collect()
    }
    assert(e2.getMessage.contains("expects 2 arguments"), s"got: ${e2.getMessage}")
  }

  test("float_dot rejects mismatched array lengths with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT float_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), array(CAST(1 AS FLOAT)))").collect()
    }
    assert(e.getMessage.contains("lengths differ") ||
      Option(e.getCause).exists(_.getMessage.contains("lengths differ")), s"got: ${e.getMessage}")
  }
}
