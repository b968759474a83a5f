package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Error bounds for the approximate aggregations (HLL++ distinct counts,
  * t-digest-style percentiles) — the oracle can't hash-compare these, so
  * the specs bound them against the exact answers instead.
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct (HLL++) is within 5% of exact") {
    val li = Tables.lineitem(spark, sfDir)
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"))).head().getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr <= 0.05, s"exact=$exact approx=$approx relErr=$relErr")
  }

  test("approx_percentile is within 2% of the exact percentile") {
    val li = Tables.lineitem(spark, sfDir)
    val exact = li.select(expr("percentile(l_extendedprice, 0.95)")).head().getDouble(0)
    val approx = li.select(approx_percentile(col("l_extendedprice"), lit(0.95), lit(1000)))
      .head().getDouble(0)
    val relErr = math.abs(approx - exact) / exact
    assert(relErr <= 0.02, s"exact=$exact approx=$approx relErr=$relErr")
  }
}
