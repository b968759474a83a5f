package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.StarTree

class StarTreeSpec extends SparkSpec {

  test("cube rollup is lossless vs direct aggregation") {
    val li = Tables.lineitem(spark, sfDir)
    val cube = StarTree.buildCube(li,
      dims = Seq("l_returnflag", "l_linestatus"), sumMetrics = Seq("l_quantity"))
    val rolled = StarTree.rollup(cube, Seq("l_returnflag"), Seq("l_quantity"))
      .select(col("l_returnflag"), round(col("s_l_quantity"), 2).as("q"), col("cube_cnt"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val direct = li.groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 2).as("q"), count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(rolled === direct)
  }

  test("cube is much smaller than the fact table") {
    val li = Tables.lineitem(spark, sfDir)
    val cube = StarTree.buildCube(li,
      dims = Seq("l_returnflag", "l_linestatus"), sumMetrics = Seq("l_quantity"))
    assert(cube.count() < li.count() / 100)
  }

  test("registered cube transparently rewrites eligible aggregates") {
    import graft.plans.StarTreeCatalog
    val factPath = s"$sfDir/lineitem.parquet"
    val cubeDir = java.nio.file.Files.createTempDirectory("startree").toString + "/cube"
    def query() = spark.read.parquet(factPath)
      .filter(col("l_linestatus") === "F")
      .groupBy("l_returnflag")
      .agg(
        round(sum("l_quantity"), 2).as("s"),
        count(lit(1)).as("c"),
        round(avg("l_extendedprice"), 2).as("a"))
      .orderBy("l_returnflag")
    val direct = query().collect().map(_.toSeq).toSeq

    StarTree.materializeAndRegister(
      spark.read.parquet(factPath), factPath,
      dims = Seq("l_returnflag", "l_linestatus"),
      sumMetrics = Seq("l_quantity", "l_extendedprice"), cubePath = cubeDir)
    try {
      val rewritten = query()
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("cube"), s"plan still scans the fact table:\n$plan")
      assert(!plan.contains("lineitem.parquet"), plan)
      assert(rewritten.collect().map(_.toSeq).toSeq === direct)
    } finally StarTreeCatalog.clear()

    // after clear(), queries scan the fact table again
    assert(query().queryExecution.executedPlan.toString.contains("lineitem.parquet"))
  }
}
