package graft

import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Smoke + plan-shape checks over the query registry. Value-level
  * correctness is the driver's DuckDB gate (tools/compare.py); these specs
  * guard the things the oracle can't see: every query planning+running,
  * filters reaching the parquet scan, dims broadcasting.
  */
class CoreQueriesSpec extends SparkSpec {

  test("every registered query runs and keys match oracle keys") {
    val qs = Registry.queries
    assert(qs.nonEmpty)
    Registry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"oracle for unknown query $k"))
    qs.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("approximate (rows-only) queries return rows") {
    val rowsOnly = Registry.all.filter(_.oracle.isEmpty)
    assert(rowsOnly.nonEmpty)
    rowsOnly.foreach { q =>
      assert(q.run(spark, sfDir).count() > 0, s"${q.name} returned no rows")
    }
  }

  test("filters are pushed down to the parquet scan") {
    val df = Registry.queries("q_filter_basic")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    // plan strings truncate long filter lists; match the stable prefix
    assert(plan.contains("GreaterThan(l_quantity,45"), plan)
  }

  test("projection prunes the scan schema") {
    val df = Registry.queries("q_select_project")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // only the 3 selected columns should be read
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double,o_orderpriority:string"), plan)
  }

  test("dimension lookup joins broadcast the small side") {
    val df = Registry.queries("q_lookup_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("top-n group-by plans as TakeOrderedAndProject, not a full sort") {
    val plan = Registry.queries("q_topn_group")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("group-by aggregations combine map-side (partial aggregation)") {
    val plan = Registry.queries("q_agg_groupby")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), plan)
  }

  test("fixed-N sampling plans as TakeOrderedAndProject (no full sort)") {
    val plan = Registry.queries("q_sample_fixed_n")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("upsert-latest aggregates partially map-side, no window exchange") {
    val plan = Registry.queries("q_upsert_latest")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_max_by") || plan.contains("partial_"), plan)
    assert(!plan.contains("Window"), s"window crept back into upsert:\n$plan")
  }

  test("as-of join is one key shuffle, no pair-explosion join node") {
    val plan = Registry.queries("q_asof_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"asof should be a window carry, not a join node:\n$plan")
  }

  test("geo radius join is an equi-join, never cartesian") {
    val plan = Registry.queries("q_geo_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("interval range join decomposes to an equi-join on band buckets") {
    val plan = Registry.queries("q_range_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
