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
              FROM s GROUP BY 1 ORDER BY split""")),

    // CLOSED-FORM MULTI-FEATURE OLS — fit purchase revenue from per-user
    // (clicks, views) by the 3×3 normal equations, the way a 100 TB
    // pipeline fits small linear probes: ONE pass accumulates the nine
    // Gram/moment scalars (Σ1, Σc, Σv, Σc², Σcv, Σv², Σy, Σcy, Σvy — all
    // EXACT LONGS: integer counts × integer cents, bounded well inside
    // int64 at any per-user cardinality), then Cramer's rule solves on
    // the single scalar row. The solve casts each long to double and
    // both engines evaluate the IDENTICAL determinant expressions, so
    // the coefficients are bit-identical — no iterative optimizer, no
    // gradient nondeterminism, nothing leaves the driver row. The model
    // row carries n and det so degenerate fits are visible, and an
    // in-spec residual check proves the fit solves the system.
    QueryDef(
      "q_linreg_multi",
      (s, d) => {
        val per = Tables.events(s, d)
          .groupBy("user_id")
          .agg(
            sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("cl"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("vw"),
            sum(when(col("event_type") === "purchase",
              round(col("value") * 100).cast("long")).otherwise(0L)).as("yc"))
        val g = per.agg(
          count(lit(1)).as("n"), sum("cl").as("sc"), sum("vw").as("sv"),
          sum(col("cl") * col("cl")).as("scc"),
          sum(col("cl") * col("vw")).as("scv"),
          sum(col("vw") * col("vw")).as("svv"),
          sum("yc").as("sy"),
          sum(col("cl") * col("yc")).as("scy"),
          sum(col("vw") * col("yc")).as("svy"))
        def D(c: String) = col(c).cast("double")
        val det =
          D("n") * (D("scc") * D("svv") - D("scv") * D("scv")) -
            D("sc") * (D("sc") * D("svv") - D("scv") * D("sv")) +
            D("sv") * (D("sc") * D("scv") - D("scc") * D("sv"))
        val det0 =
          D("sy") * (D("scc") * D("svv") - D("scv") * D("scv")) -
            D("sc") * (D("scy") * D("svv") - D("scv") * D("svy")) +
            D("sv") * (D("scy") * D("scv") - D("scc") * D("svy"))
        val det1 =
          D("n") * (D("scy") * D("svv") - D("scv") * D("svy")) -
            D("sy") * (D("sc") * D("svv") - D("scv") * D("sv")) +
            D("sv") * (D("sc") * D("svy") - D("scy") * D("sv"))
        val det2 =
          D("n") * (D("scc") * D("svy") - D("scy") * D("scv")) -
            D("sc") * (D("sc") * D("svy") - D("scy") * D("sv")) +
            D("sy") * (D("sc") * D("scv") - D("scc") * D("sv"))
        g.select(col("n"),
          round(det, 4).as("det"),
          round(det0 / det / 100, 6).as("b0_d"),
          round(det1 / det / 100, 6).as("b_clicks_d"),
          round(det2 / det / 100, 6).as("b_views_d"))
      },
      Some("""WITH per AS (SELECT user_id,
                     CAST(sum(CASE WHEN event_type = 'click'
                                   THEN 1 ELSE 0 END) AS BIGINT) AS cl,
                     CAST(sum(CASE WHEN event_type = 'view'
                                   THEN 1 ELSE 0 END) AS BIGINT) AS vw,
                     CAST(sum(CASE WHEN event_type = 'purchase'
                                   THEN CAST(round(value * 100) AS BIGINT)
                                   ELSE 0 END) AS BIGINT) AS yc
              FROM events GROUP BY 1),
                   g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                                CAST(sum(cl) AS BIGINT) AS sc,
                                CAST(sum(vw) AS BIGINT) AS sv,
                                CAST(sum(cl * cl) AS BIGINT) AS scc,
                                CAST(sum(cl * vw) AS BIGINT) AS scv,
                                CAST(sum(vw * vw) AS BIGINT) AS svv,
                                CAST(sum(yc) AS BIGINT) AS sy,
                                CAST(sum(cl * yc) AS BIGINT) AS scy,
                                CAST(sum(vw * yc) AS BIGINT) AS svy
                         FROM per),
                   e AS (SELECT n,
                     CAST(n AS DOUBLE) * (CAST(scc AS DOUBLE) * CAST(svv AS DOUBLE)
                       - CAST(scv AS DOUBLE) * CAST(scv AS DOUBLE))
                     - CAST(sc AS DOUBLE) * (CAST(sc AS DOUBLE) * CAST(svv AS DOUBLE)
                       - CAST(scv AS DOUBLE) * CAST(sv AS DOUBLE))
                     + CAST(sv AS DOUBLE) * (CAST(sc AS DOUBLE) * CAST(scv AS DOUBLE)
                       - CAST(scc AS DOUBLE) * CAST(sv AS DOUBLE)) AS det,
                     CAST(sy AS DOUBLE) * (CAST(scc AS DOUBLE) * CAST(svv AS DOUBLE)
                       - CAST(scv AS DOUBLE) * CAST(scv AS DOUBLE))
                     - CAST(sc AS DOUBLE) * (CAST(scy AS DOUBLE) * CAST(svv AS DOUBLE)
                       - CAST(scv AS DOUBLE) * CAST(svy AS DOUBLE))
                     + CAST(sv AS DOUBLE) * (CAST(scy AS DOUBLE) * CAST(scv AS DOUBLE)
                       - CAST(scc AS DOUBLE) * CAST(svy AS DOUBLE)) AS det0,
                     CAST(n AS DOUBLE) * (CAST(scy AS DOUBLE) * CAST(svv AS DOUBLE)
                       - CAST(scv AS DOUBLE) * CAST(svy AS DOUBLE))
                     - CAST(sy AS DOUBLE) * (CAST(sc AS DOUBLE) * CAST(svv AS DOUBLE)
                       - CAST(scv AS DOUBLE) * CAST(sv AS DOUBLE))
                     + CAST(sv AS DOUBLE) * (CAST(sc AS DOUBLE) * CAST(svy AS DOUBLE)
                       - CAST(scy AS DOUBLE) * CAST(sv AS DOUBLE)) AS det1,
                     CAST(n AS DOUBLE) * (CAST(scc AS DOUBLE) * CAST(svy AS DOUBLE)
                       - CAST(scy AS DOUBLE) * CAST(scv AS DOUBLE))
                     - CAST(sc AS DOUBLE) * (CAST(sc AS DOUBLE) * CAST(svy AS DOUBLE)
                       - CAST(scy AS DOUBLE) * CAST(sv AS DOUBLE))
                     + CAST(sy AS DOUBLE) * (CAST(sc AS DOUBLE) * CAST(scv AS DOUBLE)
                       - CAST(scc AS DOUBLE) * CAST(sv AS DOUBLE)) AS det2
                     FROM g)
              SELECT n, round(det, 4) AS det,
                     round(det0 / det / 100, 6) AS b0_d,
                     round(det1 / det / 100, 6) AS b_clicks_d,
                     round(det2 / det / 100, 6) AS b_views_d
              FROM e""")),

    // WEIGHT-OF-EVIDENCE / INFORMATION VALUE — the classic categorical-
    // feature screening table (credit scoring, churn models): per feature
    // bucket, WoE = ln((good_i/G)/(bad_i/B)) with symmetric +0.5 Laplace
    // smoothing (zero-cell-safe, identical convention on both engines),
    // and the bucket's IV contribution (g_rate − b_rate)·WoE. Shape: one
    // map-side-combined count rollup to the bucket DICTIONARY, then the
    // single-row (G, B) totals broadcast back (scalar-N pattern) — no
    // second corpus pass, no window. Counts are exact longs; the WoE /
    // IV ratios are continuous statistical estimators (class c, s=6).
    QueryDef(
      "q_woe_iv",
      (s, d) => {
        val cell = Tables.events(s, d)
          .groupBy("event_type")
          .agg(
            sum(when(col("value") >= 100.0, 1L).otherwise(0L)).as("n_good"),
            sum(when(col("value") >= 100.0, 0L).otherwise(1L)).as("n_bad"))
        val tot = cell.agg(sum("n_good").as("g_tot"), sum("n_bad").as("b_tot"))
        cell.crossJoin(broadcast(tot))
          .withColumn("g_rate",
            (col("n_good").cast("double") + 0.5) / (col("g_tot").cast("double") + 0.5))
          .withColumn("b_rate",
            (col("n_bad").cast("double") + 0.5) / (col("b_tot").cast("double") + 0.5))
          .withColumn("woe", log(col("g_rate") / col("b_rate")))
          .select(col("event_type"), col("n_good"), col("n_bad"),
            round(col("woe"), 6).as("woe"),
            round((col("g_rate") - col("b_rate")) * col("woe"), 6).as("iv_term"))
          .orderBy("event_type")
      },
      Some("""WITH cell AS (SELECT event_type,
                     CAST(sum(CASE WHEN value >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
                     CAST(sum(CASE WHEN value >= 100 THEN 0 ELSE 1 END) AS BIGINT) AS n_bad
              FROM events GROUP BY 1),
                   tot AS (SELECT CAST(sum(n_good) AS BIGINT) AS g_tot,
                                  CAST(sum(n_bad) AS BIGINT) AS b_tot
                           FROM cell),
                   r AS (SELECT event_type, n_good, n_bad,
                                (CAST(n_good AS DOUBLE) + 0.5)
                                  / (CAST(g_tot AS DOUBLE) + 0.5) AS g_rate,
                                (CAST(n_bad AS DOUBLE) + 0.5)
                                  / (CAST(b_tot AS DOUBLE) + 0.5) AS b_rate
                         FROM cell, tot)
              SELECT event_type, n_good, n_bad,
                     round(ln(g_rate / b_rate), 6) AS woe,
                     round((g_rate - b_rate) * ln(g_rate / b_rate), 6) AS iv_term
              FROM r ORDER BY event_type"""))
  )
}
