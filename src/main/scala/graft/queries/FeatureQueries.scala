package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** §K feature engineering — the tabular feature-preparation passes an ML
  * training pipeline runs over event history before model fitting: lagged
  * / rolling features per entity, smoothed target encoding for
  * categoricals, and leakage-safe temporal splits with an embargo gap.
  * All one-window or one-rollup shapes; every output column is either
  * integer-exact or rounded identically on both engines.
  */
object FeatureQueries {

  val defs: Seq[QueryDef] = Seq(
    // LAG / ROLLING features — the per-entity time-series design matrix
    // (lag-1, lag-2, trailing mean) built in ONE user-partitioned window
    // pass; ties total-ordered on event_id. Restricting to full 3-row
    // frames keeps the trailing mean unambiguous on both engines.
    QueryDef(
      "q_lag_features",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .filter(col("user_id") < 20)
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
          .withColumn("lag1", lag("value", 1).over(w))
          .withColumn("lag2", lag("value", 2).over(w))
          .withColumn("roll3",
            avg("value").over(w.rowsBetween(-2, Window.currentRow)))
          .filter(col("lag2").isNotNull)
          .select(col("user_id"), col("event_id"),
            round(col("value"), 2).as("value"),
            round(col("lag1"), 2).as("lag1"),
            round(col("lag2"), 2).as("lag2"),
            round(col("roll3"), 4).as("roll3"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH w AS (SELECT user_id, event_id, value,
                                lag(value, 1) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id) AS lag1,
                                lag(value, 2) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id) AS lag2,
                                avg(value) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id
                                                 ROWS BETWEEN 2 PRECEDING
                                                 AND CURRENT ROW) AS roll3
                         FROM events WHERE user_id < 20)
              SELECT user_id, event_id,
                     round(value, 2) AS value, round(lag1, 2) AS lag1,
                     round(lag2, 2) AS lag2, round(roll3, 4) AS roll3
              FROM w WHERE lag2 IS NOT NULL
              ORDER BY user_id, event_id""")),

    // Smoothed TARGET ENCODING — the high-cardinality-categorical feature
    // (mean target per category, shrunk toward the global prior by pseudo-
    // count m: enc = (n·mean + m·prior)/(n + m) — raw category means
    // overfit rare categories). The category rollup is dictionary-sized;
    // the single-row prior broadcasts (scalar-N pattern). Sums round to 6
    // before the encoding arithmetic so both engines shrink identical
    // stats.
    QueryDef(
      "q_target_encode",
      (s, d) => {
        val ev = Tables.events(s, d)
        val prior = ev.agg(round(avg("value"), 6).as("prior"))
        val m = 20.0
        ev.groupBy("event_type")
          .agg(count(lit(1)).as("n"), round(avg("value"), 6).as("cat_mean"))
          .crossJoin(broadcast(prior))
          .select(col("event_type"), col("n"),
            col("cat_mean"), col("prior"),
            round((col("n") * col("cat_mean") + lit(m) * col("prior")) /
              (col("n") + lit(m)), 6).as("encoded"))
          .orderBy("event_type")
      },
      Some("""WITH pr AS (SELECT round(avg(value), 6) AS prior FROM events),
                   c AS (SELECT event_type, count(*) AS n,
                                round(avg(value), 6) AS cat_mean
                         FROM events GROUP BY 1)
              SELECT event_type, n, cat_mean, pr.prior,
                     round((n * cat_mean + 20.0 * pr.prior) / (n + 20.0), 6)
                       AS encoded
              FROM c, pr ORDER BY event_type""")),

    // TEMPORAL train/test split with an EMBARGO gap — the leakage-safe
    // time split (q_split_leakage's temporal sibling): train strictly
    // before the cut, test strictly after cut + embargo, the gap rows
    // EXCLUDED so trailing-window features computed at train time cannot
    // peek into test labels. The cut derives from the corpus max day
    // (scalar-N broadcast), so the split is data-relative and
    // reproducible — no wall-clock dependence.
    QueryDef(
      "q_split_temporal",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), date_trunc("day", col("ts")).as("day"))
        val hi = ev.agg(max("day").as("hi"))
        ev.crossJoin(broadcast(hi))
          .withColumn("split",
            when(col("day") < col("hi") - expr("interval 10 days"), "train")
              .when(col("day") >= col("hi") - expr("interval 7 days"), "test")
              .otherwise("embargo"))
          .groupBy("split")
          .agg(count(lit(1)).as("n_events"),
            min("day").cast("date").cast("string").as("first_day"),
            max("day").cast("date").cast("string").as("last_day"))
          .orderBy("split")
      },
      Some("""WITH e AS (SELECT event_id, date_trunc('day', ts) AS day FROM events),
                   hi AS (SELECT max(day) AS hi FROM e),
                   s AS (SELECT event_id, day,
                                CASE WHEN day < hi - INTERVAL 10 DAY THEN 'train'
                                     WHEN day >= hi - INTERVAL 7 DAY THEN 'test'
                                     ELSE 'embargo' END AS split
                         FROM e, hi)
              SELECT split, count(*) AS n_events,
                     CAST(CAST(min(day) AS DATE) AS VARCHAR) AS first_day,
                     CAST(CAST(max(day) AS DATE) AS VARCHAR) AS last_day
              FROM s GROUP BY 1 ORDER BY split"""))
  )
}
