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

  test("HLL sketch set-ops are within 5% of the exact cohort cardinalities") {
    import graft.queries.Registry
    val exact = Registry.queries("q_set_ops")(spark, sfDir).head()
    val sk = Registry.queries("q_set_ops_sketch")(spark, sfDir).head()
    def rel(est: Long, truth: Long): Double =
      math.abs(est - truth).toDouble / math.max(truth, 1L)
    assert(rel(sk.getLong(sk.fieldIndex("n_click")), exact.getLong(0)) <= 0.05)
    assert(rel(sk.getLong(sk.fieldIndex("n_purchase")), exact.getLong(1)) <= 0.05)
    assert(rel(sk.getLong(sk.fieldIndex("n_either")), exact.getLong(3)) <= 0.05)
    // inclusion–exclusion intersection: looser bound (errors compound)
    assert(rel(sk.getLong(sk.fieldIndex("n_both_est")), exact.getLong(2)) <= 0.15)
  }

  test("sketch rolling actives track the exact DAU/WAU within HLL error") {
    import graft.queries.Registry
    val exact = Registry.queries("q_rolling_active")(spark, sfDir).collect()
      .map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sk = Registry.queries("q_rolling_active_sketch")(spark, sfDir).collect()
    assert(sk.length === exact.size, "sketch twin changed the day grid")
    def rel(est: Long, truth: Long): Double =
      math.abs(est - truth).toDouble / math.max(truth, 1L).toDouble
    sk.foreach { r =>
      val (dau, wau) = exact(r.getTimestamp(0))
      assert(rel(r.getLong(1), dau) <= 0.05,
        s"DAU off at ${r.getTimestamp(0)}: est=${r.getLong(1)} exact=$dau")
      assert(rel(r.getLong(2), wau) <= 0.05,
        s"WAU off at ${r.getTimestamp(0)}: est=${r.getLong(2)} exact=$wau")
    }
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
