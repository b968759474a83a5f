package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** §G upsert & hybrid tables — Pinot's realtime upsert table (latest record
  * per primary key) and the hybrid offline+realtime table stitched at a
  * time boundary (reference: /root/reference/basics/Architecture.md,
  * realtime vs offline servers). Batch form here; the streaming form lives
  * in graft.streaming. Latest-per-key is a single hash shuffle on the key
  * (window row_number), which at 100 TB is the minimal repartition any
  * upsert semantics needs.
  */
object UpsertQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_upsert_latest",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(
            col("user_id"),
            col("event_id").as("last_event_id"),
            col("event_type").as("last_type"),
            col("value").as("last_value"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id AS last_event_id, event_type AS last_type,
                     value AS last_value
              FROM (SELECT *, row_number() OVER
                      (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                    FROM events)
              WHERE rn = 1 ORDER BY user_id""")),

    // Hybrid table: queries hit the offline segments before the time
    // boundary and realtime segments after it; the union must equal the
    // whole-table answer (the oracle aggregates the raw table directly).
    QueryDef(
      "q_hybrid_boundary",
      (s, d) => {
        val ev = Tables.events(s, d)
        val boundary = to_timestamp(lit("2024-01-15"))
        val offline = ev.filter(col("ts") < boundary)
        val realtime = ev.filter(col("ts") >= boundary)
        offline.unionByName(realtime)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_val"))
          .orderBy("day")
      },
      Some("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS cnt,
                     round(sum(value), 2) AS sum_val
              FROM events GROUP BY 1 ORDER BY day"""))
  )
}
