package graft.sources

import graft.core.Fingerprint.splitmix64
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One row of the Iceberg-shaped pre-tokenized training-sequence table
  * (BASELINE.json input_hint): (doc_id, tokens, n_tok, source).
  */
final case class TokenDoc(doc_id: String, tokens: Array[Int], n_tok: Int, source: String)

/** Deterministic synthesizer of the tokens table (FIXTURES.md §1): every row
  * is a pure function of (seed, rowIndex), so any executor — or a later
  * verification pass — can regenerate a row bit-for-bit. That regeneration
  * is the per-row token-array-equality invariant required by input_hint:
  * [[TokensTable.validated]] asserts it before any sketch update.
  */
object TokensTable {
  val VocabSize = 50257
  val Sources: Array[(String, Int)] = Array(("web", 70), ("books", 85), ("code", 95), ("wiki", 100))

  def rowOf(seed: Long, i: Long): TokenDoc = {
    val len = (64 + Math.floorMod(splitmix64(seed ^ i), 193L)).toInt
    val tokens = new Array[Int](len)
    var j = 0
    while (j < len) {
      tokens(j) = Math.floorMod(splitmix64(seed * 31 + i * 1000003L + j), VocabSize.toLong).toInt
      j += 1
    }
    val bucket = Math.floorMod(splitmix64(seed ^ ~i), 100L)
    val source = Sources.collectFirst { case (s, hi) if bucket < hi => s }.get
    TokenDoc(f"doc$i%08d", tokens, len, source)
  }

  /** The synthetic table as a typed Dataset, deterministically partitioned. */
  def dataset(spark: SparkSession, nRows: Long, seed: Long = 42L, partitions: Int = 32): Dataset[TokenDoc] = {
    import spark.implicits._
    spark.range(0, nRows, 1, partitions).map(i => rowOf(seed, i))
  }

  def dataframe(spark: SparkSession, nRows: Long, seed: Long = 42L, partitions: Int = 32): DataFrame =
    dataset(spark, nRows, seed, partitions).toDF()

  /** Enforce the input_hint per-row invariants *before* sketch updates:
    * n_tok == tokens.length and tokens == regenerated(seed, doc_id). Throws
    * on the first corrupt row (fail-fast, like the reference's first-record
    * s-mer-length guard /root/reference/src/abstract_bqf.cpp:35-39).
    */
  def validated(ds: Dataset[TokenDoc], seed: Long = 42L): Dataset[TokenDoc] = {
    import ds.sparkSession.implicits._
    ds.map { row =>
      require(row.n_tok == row.tokens.length,
        s"${row.doc_id}: n_tok ${row.n_tok} != tokens.length ${row.tokens.length}")
      val i = row.doc_id.stripPrefix("doc").toLong
      val expect = rowOf(seed, i)
      require(java.util.Arrays.equals(expect.tokens, row.tokens),
        s"${row.doc_id}: token array does not match reference input")
      row
    }
  }
}
