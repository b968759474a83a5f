package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{Event, Realtime}

class StreamingSpec extends SparkSpec {

  private def ev(id: Long, t: String, user: Long, typ: String, v: Double) =
    Event(id, Timestamp.valueOf(t), user, typ, v)

  test("watermarked windowed aggregation over a stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = Realtime.windowedAgg(input.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_out").outputMode("complete").start()
    try {
      input.addData(
        ev(1, "2024-01-01 00:10:00", 1, "click", 1.0),
        ev(2, "2024-01-01 00:40:00", 2, "click", 2.0),
        ev(3, "2024-01-01 01:10:00", 1, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows === Set(
        ("2024-01-01 00:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 01:00:00.0", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("file-source streaming ingestion matches the batch aggregation") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("stream_in")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/orders.parquet"),
      dir.resolve("part-0.parquet"))
    val schema = spark.read.parquet(s"$sfDir/orders.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("tp"))
    val q = stream.writeStream.format("memory").queryName("orders_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("orders_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = spark.read.parquet(s"$sfDir/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("tp"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming upsert emits the latest record per key incrementally") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = Realtime.latestByKey(input.toDS())
      .writeStream.format("memory").queryName("upsert_out").outputMode("append").start()
    try {
      input.addData(ev(1, "2024-01-01 00:00:01", 7, "signup", 1.0))
      q.processAllAvailable()
      input.addData(ev(2, "2024-01-01 00:00:05", 7, "click", 2.0))
      q.processAllAvailable()
      // out-of-order stale event must NOT displace the newer state
      input.addData(ev(3, "2024-01-01 00:00:03", 7, "view", 9.0))
      q.processAllAvailable()
      val emitted = spark.table("upsert_out").collect()
        .map(r => (r.getLong(1), r.getString(2)))
      assert(emitted.toSeq === Seq((1L, "signup"), (2L, "click")))
    } finally q.stop()
  }
}
