package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.sources.SegmentWriter

class SegmentWriterSpec extends SparkSpec {

  test("sorted, partitioned segments round-trip and prune on read") {
    val out = Files.createTempDirectory("segments").toString
    val li = Tables.lineitem(spark, sfDir)
      .withColumn("ship_year", year(col("l_shipdate")))
    SegmentWriter.write(li, out, SegmentWriter.Config(
      partitionCols = Seq("ship_year"),
      sortCols = Seq("l_partkey"),
      bloomFilterCols = Seq("l_partkey")))

    val back = spark.read.parquet(out)
    assert(back.count() === li.count())

    // partition pruning: filter on the partition column only lists that dir
    val pruned = back.filter(col("ship_year") === 1996)
    val prunedPlan = pruned.queryExecution.executedPlan.toString
    assert(prunedPlan.contains("PartitionFilters: [isnotnull(ship_year"), prunedPlan)
    assert(pruned.count() ===
      li.filter(year(col("l_shipdate")) === 1996).count())

    // sorted column filter is pushed down (row-group min/max skipping)
    val point = back.filter(col("l_partkey") === 42)
    val pointPlan = point.queryExecution.executedPlan.toString
    assert(pointPlan.contains("PushedFilters: [IsNotNull(l_partkey), EqualTo(l_partkey,42)"), pointPlan)
  }

  test("derived timestamp-index columns materialize and answer DATETRUNC filters") {
    val out = Files.createTempDirectory("segments_ts").toString
    val li = Tables.lineitem(spark, sfDir)
    SegmentWriter.write(li, out, SegmentWriter.Config(
      derivedTimeCols = Seq("l_shipdate" -> "month")))
    val back = spark.read.parquet(out)
    val monthCol = SegmentWriter.derivedName("l_shipdate", "month")
    assert(back.columns.contains(monthCol))
    // the stored column equals on-the-fly truncation, and the filter on it
    // pushes down to the scan (Pinot's timestamp-index fast path)
    val viaDerived = back.filter(col(monthCol) === to_timestamp(lit("1996-03-01")))
    val plan = viaDerived.queryExecution.executedPlan.toString
    assert(plan.contains(s"EqualTo($monthCol,"), plan)
    assert(viaDerived.count() ===
      li.filter(date_trunc("month", col("l_shipdate")) === to_timestamp(lit("1996-03-01"))).count())
  }
}
