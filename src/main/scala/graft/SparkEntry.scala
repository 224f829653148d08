package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator catalog itself lives in [[Queries]].
  */
object SparkEntry {
  /** Flagship: distributed BQF build over sf0.001 document shingles, queried
    * back through the broadcast sketch (build -> merge -> query end-to-end).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.q01BqfAbundance(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for genuinely probabilistic /
    * non-SQL-expressible ops (q06 LSH, q07 simhash, q18 LSH buckets, q21
    * HLL, q22 t-digest/KLL) -> rows-only check; their exactness properties
    * are asserted in the scalatest suites instead.
    */
  def oracleSql: Map[String, String] = Queries.oracles
}
