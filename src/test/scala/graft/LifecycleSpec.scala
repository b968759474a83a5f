package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.{Ingest, SegmentWriter}
import graft.streaming.{Event, Realtime}

/** End-to-end segment lifecycle — the realtime flow of
  * /root/reference/basics/Architecture.md: a stream lands as many small
  * consuming-segment files, compaction merges them into completed
  * segments, and the compacted table answers the same query as the batch
  * path; plus malformed-record-tolerant batch ingestion.
  */
class LifecycleSpec extends SparkSpec {

  private def ev(id: Long, t: String, user: Long, typ: String, v: Double) =
    Event(id, java.sql.Timestamp.valueOf(t), user, typ, v)

  test("stream lands micro-batch files, compaction merges them, query parity holds") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val consuming = Files.createTempDirectory("consuming").toString
    val completed = Files.createTempDirectory("completed").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    val input = MemoryStream[Event]
    val q = input.toDS().writeStream
      .format("parquet").option("path", consuming)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // three micro-batches -> at least three small files
      input.addData(ev(1, "2024-01-01 00:00:01", 1, "click", 1.0),
        ev(2, "2024-01-01 00:10:00", 2, "view", 2.0))
      q.processAllAvailable()
      input.addData(ev(3, "2024-01-01 01:00:00", 1, "purchase", 30.0))
      q.processAllAvailable()
      input.addData(ev(4, "2024-01-01 02:00:00", 3, "click", 4.0))
      q.processAllAvailable()
    } finally q.stop()

    val stats = SegmentWriter.compact(spark, consuming, completed,
      SegmentWriter.Config(numSegments = 1, sortCols = Seq("ts"),
        derivedTimeCols = Seq("ts" -> "hour")))
    assert(stats.filesBefore >= 3)
    assert(stats.filesAfter === 1)
    assert(stats.rows === 4)

    // the completed segments answer the same aggregation as the raw stream
    // output, and carry the derived timestamp-index column
    val agg = spark.read.parquet(completed)
      .groupBy(col(SegmentWriter.derivedName("ts", "hour")).as("h"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sv"))
      .orderBy("h").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2)))
    assert(agg.toSeq === Seq(
      ("2024-01-01 00:00:00.0", 2L, 3.0),
      ("2024-01-01 01:00:00.0", 1L, 30.0),
      ("2024-01-01 02:00:00.0", 1L, 4.0)))
  }

  test("tolerant json ingestion splits good rows from corrupt lines") {
    val dir = Files.createTempDirectory("jsonl")
    Files.writeString(dir.resolve("part1.json"),
      """{"event_id": 1, "user_id": 10, "value": 1.5}
        |{"event_id": 2, "user_id": 20, "value": 2.5}
        |{"event_id": 3, "user_id": broken !!!
        |not json at all
        |{"event_id": 4, "user_id": 40, "value": 4.5}
        |""".stripMargin)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("event_id", "long").add("user_id", "long").add("value", "double")
    val (good, bad) = Ingest.jsonLinesTolerant(spark, dir.toString, schema)
    assert(good.count() === 3)
    assert(good.agg(sum("event_id")).head().getLong(0) === 7L)
    assert(bad.count() === 2)
    assert(bad.collect().map(_.getString(0)).exists(_.contains("broken")))
  }

  test("orc ingestion round-trips the events table and pushes filters to the scan") {
    val src = graft.engine.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value")
    val dir = Files.createTempDirectory("orc_seg").toString
    src.write.mode("overwrite").orc(dir)
    val back = Ingest.orc(spark, dir)
    assert(back.count() === src.count())
    val a = back.agg(sum("event_id")).head().getLong(0)
    val b = src.agg(sum("event_id")).head().getLong(0)
    assert(a === b, s"orc round-trip changed checksum: $a vs $b")
    // predicate pushdown reaches the ORC scan like it does for parquet
    val plan = back.filter(col("user_id") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]")
      || plan.contains("EqualTo(user_id,7)"), plan.take(800))
  }
}
