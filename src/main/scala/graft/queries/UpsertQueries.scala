package graft.queries

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
    // Latest-per-key as an AGGREGATE (max_by over a (ts, event_id) struct
    // key), not a window: hash aggregation partially combines map-side, so
    // only one candidate row per (key, map task) reaches the shuffle —
    // strictly less data movement than the row_number() window form, which
    // shuffles every event.
    QueryDef(
      "q_upsert_latest",
      (s, d) =>
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(max_by(
            struct(col("event_id"), col("event_type"), col("value")),
            struct(col("ts"), col("event_id"))).as("last"))
          .select(
            col("user_id"),
            col("last.event_id").as("last_event_id"),
            col("last.event_type").as("last_type"),
            col("last.value").as("last_value"))
          .orderBy("user_id"),
      Some("""SELECT user_id, event_id AS last_event_id, event_type AS last_type,
                     value AS last_value
              FROM (SELECT *, row_number() OVER
                      (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                    FROM events)
              WHERE rn = 1 ORDER BY user_id""")),

    // Upsert with DELETE semantics (Pinot's delete-on-upsert): the latest
    // record per key wins, and a key whose LATEST record is a tombstone
    // (here: deterministic marker event_id % 50 == 0) disappears from the
    // view entirely — still one partial-aggregating max_by pass.
    QueryDef(
      "q_upsert_delete",
      (s, d) =>
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(max_by(
            struct(col("event_id"), col("event_type"),
              (col("event_id") % 50 === 0).as("del")),
            struct(col("ts"), col("event_id"))).as("last"))
          .filter(!col("last.del"))
          .select(
            col("user_id"),
            col("last.event_id").as("last_event_id"),
            col("last.event_type").as("last_type"))
          .orderBy("user_id"),
      Some("""SELECT user_id, event_id AS last_event_id, event_type AS last_type
              FROM (SELECT *, row_number() OVER
                      (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                    FROM events)
              WHERE rn = 1 AND event_id % 50 <> 0 ORDER BY user_id""")),

    // PARTIAL upsert — Pinot's per-column merge strategies applied in one
    // aggregate pass: OVERWRITE (latest non-null: last purchase amount via
    // max_by with a null-when-absent ordering key), INCREMENT (running
    // sum), APPEND (event count), UNION (distinct type set). All partial
    // aggregates — map-side combine everywhere.
    QueryDef(
      "q_upsert_partial",
      (s, d) =>
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(
            round(sum("value"), 2).as("total_value"),
            count(lit(1)).as("n_events"),
            array_join(array_sort(collect_set(col("event_type"))), ",").as("types_union"),
            max_by(col("value"),
              when(col("event_type") === "purchase",
                struct(col("ts"), col("event_id")))).as("last_purchase_value"))
          .orderBy("user_id"),
      Some("""WITH lastp AS (
                SELECT user_id, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events WHERE event_type = 'purchase')
              SELECT e.user_id,
                     round(sum(e.value), 2) AS total_value,
                     count(*) AS n_events,
                     array_to_string(list_sort(list(DISTINCT e.event_type)), ',') AS types_union,
                     max(lp.value) AS last_purchase_value
              FROM events e
              LEFT JOIN (SELECT user_id, value FROM lastp WHERE rn = 1) lp
                USING (user_id)
              GROUP BY e.user_id ORDER BY e.user_id""")),

    // FUNNEL with a max-step-duration window: users whose first signup is
    // followed by a purchase within 7 days. Range predicate rides on the
    // user_id equi-join (hash join + filter — no cross join); left-semi so
    // each user counts once.
    QueryDef(
      "q_funnel_window",
      (s, d) => {
        val ev = Tables.events(s, d)
        val signup = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts")).as("signup_ts"))
        val purchase = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"))
        signup.join(purchase,
            Seq("user_id"), "inner")
          .filter(col("p_ts") > col("signup_ts") &&
            col("p_ts") <= col("signup_ts") + expr("INTERVAL 7 DAYS"))
          .select("user_id").distinct()
          .agg(count(lit(1)).as("n_converted"))
      },
      Some("""WITH s AS (SELECT user_id, min(ts) AS signup_ts FROM events
                         WHERE event_type = 'signup' GROUP BY 1)
              SELECT count(*) AS n_converted FROM s
              WHERE EXISTS (SELECT 1 FROM events p
                            WHERE p.user_id = s.user_id
                              AND p.event_type = 'purchase'
                              AND p.ts > s.signup_ts
                              AND p.ts <= s.signup_ts + INTERVAL 7 DAY)""")),

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
