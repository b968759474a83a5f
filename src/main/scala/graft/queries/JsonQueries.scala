package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** §C JSON functions — Pinot's JSON_EXTRACT_SCALAR / JSON_MATCH over a raw
  * JSON string column (reference: /root/reference/basics/indexing/
  * json-index.md). Spark-native: `get_json_object` is a codegen'd path
  * expression; at scale the predicate stays on the scan so only matching
  * rows leave the stage (Pinot's json index analog is column pruning +
  * cheap per-row path evaluation, no shuffle).
  */
object JsonQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_json_extract_scalar",
      (s, d) =>
        Tables.events(s, d)
          .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
          .groupBy("k")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("k"),
      Some("""SELECT CAST(nullif(regexp_extract(props, '"k": ?(-?\d+)', 1), '') AS INT) AS k,
                     count(*) AS cnt
              FROM events GROUP BY 1 ORDER BY k""")),

    QueryDef(
      "q_json_match",
      (s, d) =>
        Tables.events(s, d)
          .filter(get_json_object(col("props"), "$.k").cast("int") >= 50 &&
            col("event_type").isin("click", "purchase"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_val"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sum_val
              FROM events
              WHERE CAST(nullif(regexp_extract(props, '"k": ?(-?\d+)', 1), '') AS INT) >= 50
                AND event_type IN ('click', 'purchase')
              GROUP BY 1 ORDER BY event_type"""))
  )
}
