package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD TYPE-2 history build — collapse a per-key event changelog into
  * versioned validity intervals [valid_from, valid_to), the current run
  * open-ended (valid_to NULL). The dimension-table form a warehouse
  * derives from a Pinot-style upsert changelog (the history-PRESERVING
  * dual of latest-per-key).
  *
  * Contract: `events` carries (user_id, event_type, ts, event_id); run
  * detection and interval assembly use the per-key (ts, event_id) TOTAL
  * order, so the result is deterministic under any partitioning. One
  * hash shuffle on the key — the minimal movement any per-key history
  * needs; runs then partial-aggregate map-side.
  *
  * Reference: Architecture.md upsert semantics (/root/reference/basics/
  * Architecture.md) — this is the history-keeping counterpart.
  */
object Scd2 {

  def build(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val wv = Window.partitionBy("user_id").orderBy(asc("version"))
    events
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNotNull &&
          lag(col("event_type"), 1).over(w) === col("event_type"), 0L)
          .otherwise(1L))
      .withColumn("version", sum("chg").over(w))
      .groupBy("user_id", "version")
      .agg(
        max(col("event_type")).as("state"),
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .select("user_id", "version", "state", "valid_from", "valid_to", "n_events")
  }
}
