package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** q35 repetition scoring: exact metrics on hand-built documents, including
  * the short-document edge cases the per-row HOFs must guard.
  */
class RepetitionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(texts: Seq[String]): Map[Long, (Long, Long, Double, Double, Long)] = {
    import spark.implicits._
    val dir = Files.createTempDirectory("repspec").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "unit", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Queries.q35Repetition(spark, dir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
    }.toMap
  }

  test("repetition metrics are exact on known documents") {
    val m = run(Seq(
      // doc 0: "a b c a b c a b" -> 7 2-grams (3 distinct), 6 3-grams (3 distinct),
      // top 3-gram "a b c" occurs 3x? windows: abc bca cab abc bca cab -> abc x2, bca x2, cab x2
      "a b c a b c a b",
      // doc 1: all distinct words -> zero repetition, every gram unique
      "one two three four five",
      // doc 2: two words -> one 2-gram, zero 3-grams
      "hi there",
      // doc 3: one word -> no grams at all
      "solo",
      // doc 4: no [a-z] words at all
      "123 456 !!!"))
    assert(m(0L) == ((7L, 6L, 4.0 / 7, 3.0 / 6, 2L)))
    assert(m(1L) == ((4L, 3L, 0.0, 0.0, 1L)))
    assert(m(2L) == ((1L, 0L, 0.0, 0.0, 0L)))
    assert(m(3L) == ((0L, 0L, 0.0, 0.0, 0L)))
    assert(m(4L) == ((0L, 0L, 0.0, 0.0, 0L)))
  }

  test("heavily repeated text scores near 1") {
    val m = run(Seq(("spam ham " * 50).trim))
    // 100 words -> 99 2-grams, 2 distinct; 98 3-grams, 2 distinct; top run 49
    assert(m(0L) == ((99L, 98L, 97.0 / 99, 96.0 / 98, 49L)))
  }
}
