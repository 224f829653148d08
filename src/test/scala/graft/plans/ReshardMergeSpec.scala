package graft.plans

import graft.SparkTestSession
import graft.core.BackpackFilter
import graft.functions.GraftFunctions._
import graft.operators.BqfParams
import graft.sources.TokensTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed re-shard merge must be a pure repartitioning of sketch
  * contents: every (fingerprint, abundance) entry survives verbatim, output
  * shards nest by fingerprint-range prefix, and collapsing to one shard is
  * value-identical to the serial treeMerge blob.
  */
class ReshardMergeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val params = BqfParams(qBits = 8, countBits = 8, hashBits = 48, kTokens = 8, zTokens = 2)

  private def enumMap(shards: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    BqfPipeline.enumerateIndex(shards).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("reshardMerge preserves every entry and matches the exact multiset") {
    val df = TokensTable.dataframe(spark, 300, partitions = 4)
    val fps = sgram_fingerprints(col("tokens"), params.sTokens, params.hashBits, params.seed)
    val i32 = BqfPipeline.buildIndexSorted(df, fps, params, 32).cache()
    val exact = enumMap(i32)
    val oracle = df.select(explode(fps).as("fp")).groupBy("fp").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact == oracle, "sorted index build disagrees with exact counts")
    for (nOut <- Seq(8, 1)) {
      val merged = BqfPipeline.reshardMerge(i32, params, nOut)
      assert(enumMap(merged) == exact, s"nOut=$nOut")
      assert(merged.select(countDistinct(col("bucket"))).head().getLong(0) <= nOut)
    }
    i32.unpersist()
  }

  test("reshardMerge to one shard == serial treeMerge blob") {
    val df = TokensTable.dataframe(spark, 200, partitions = 4)
    val fps = sgram_fingerprints(col("tokens"), params.sTokens, params.hashBits, params.seed)
    val i16 = BqfPipeline.buildIndexSorted(df, fps, params, 16).cache()
    val one = BqfPipeline.reshardMerge(i16, params, 1).collect()
    assert(one.length == 1)
    val viaReshard = BackpackFilter.deserialize(one(0).getAs[Array[Byte]]("sketch")).enumerate()
    val viaTree = BackpackFilter.deserialize(BqfPipeline.treeMerge(i16, 16, 4)).enumerate()
    assert(viaReshard == viaTree)
    i16.unpersist()
  }
}
