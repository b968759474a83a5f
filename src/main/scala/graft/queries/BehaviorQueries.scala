package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** §A+ behavioral / statistical analytics over the events stream — the
  * product-analytics family a Pinot deployment serves next to funnels and
  * retention (reference capability class: multi-stage engine dashboards,
  * basics/Architecture.md): cohort retention matrices, A/B significance
  * tests, per-series forecasting, Markov path transitions, windowed
  * anomaly detection, and market-basket co-occurrence.
  *
  * Scale discipline shared by every query here: one keyed shuffle to an
  * entity-sized rollup (user / series / basket), then all remaining work
  * runs over dictionary-sized aggregates (weeks × offsets, 5×5 transition
  * cells, series × days). Nothing fans out wider than the input and no
  * window runs unpartitioned.
  */
object BehaviorQueries {

  val defs: Seq[QueryDef] = Seq(

    // Cohort retention matrix (signup-week × week-offset): the classic
    // product-analytics triangle. ONE user-keyed shuffle builds each
    // user's (first week, distinct active weeks) in a single aggregate;
    // exploding the per-user week set yields cell counts directly
    // (the set is distinct per user, so count(*) IS count-distinct-users
    // — no second distinct shuffle). The retention denominator comes from
    // a window partitioned BY cohort — weeks are dictionary-sized at any
    // corpus scale. Weeks are Monday-truncated in both engines, so the
    // day difference is an exact multiple of 7.
    QueryDef(
      "q_cohort_matrix",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        val cells = ev.groupBy("user_id")
          .agg(min("wk").as("cohort"), collect_set("wk").as("wks"))
          .select(col("cohort"), explode(col("wks")).as("wk"))
          .select(col("cohort"),
            (datediff(col("wk"), col("cohort")) / 7).cast("int").as("wk_offset"))
          .groupBy("cohort", "wk_offset")
          .agg(count(lit(1)).as("n_users"))
        val base = Window.partitionBy("cohort")
        cells
          .withColumn("retention",
            round(col("n_users") /
              max(when(col("wk_offset") === 0, col("n_users"))).over(base), 4) + lit(0.0))
          .orderBy("cohort", "wk_offset")
      },
      Some("""WITH ev AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
                          FROM events),
                   fu AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY 1),
                   cnt AS (SELECT f.cohort,
                                  CAST(date_diff('day', f.cohort, e.wk) // 7 AS INT)
                                    AS wk_offset,
                                  count(*) AS n_users
                           FROM ev e JOIN fu f USING (user_id)
                           GROUP BY 1, 2)
              SELECT CAST(cohort AS TIMESTAMP) AS cohort, wk_offset, n_users,
                     round(CAST(n_users AS DOUBLE) /
                           max(CASE WHEN wk_offset = 0 THEN n_users END)
                             OVER (PARTITION BY cohort), 4) + 0 AS retention
              FROM cnt ORDER BY cohort, wk_offset""")),

    // Welch's unequal-variance t-test between two event arms — the A/B
    // significance read every metrics dashboard needs. Both engines
    // derive mean and variance from the SAME primitives (n, Σx, Σx²) so
    // the only cross-engine divergence is summation order, absorbed by
    // the rounding; the whole query is one partial-aggregate scan
    // folded to a single row (no shuffle wider than 2 groups).
    // MUTUAL INFORMATION between two categorical columns — the
    // dependence screen feature selection runs (is event type informative
    // about day-of-week?): MI = Σ p_ij·ln(p_ij/(p_i·p_j)) plus both
    // marginal entropies and the normalized MI/√(H_a·H_b). ALL
    // probabilities derive from integer cell counts (one (a, b) rollup;
    // margins are partitioned window sums over the |a|·|b| cell
    // DICTIONARY, ~35 rows here), so the only float work is the final
    // 35-term sum — class-(c) display rounding. At 100 TB the fact scan
    // reduces to the cell dictionary map-side; nothing else grows.
    QueryDef(
      "q_mutual_info",
      (s, d) => {
        val cells = Tables.events(s, d)
          .select(col("event_type").as("t"),
            (dayofweek(col("ts")) - 1).as("dw"))
          .groupBy("t", "dw").agg(count(lit(1)).as("c"))
        val wt = Window.partitionBy("t")
        val wd = Window.partitionBy("dw")
        val wall = Window.partitionBy()
        val m = cells
          .withColumn("ct", sum("c").over(wt))
          .withColumn("cd", sum("c").over(wd))
          .withColumn("n", sum("c").over(wall))
        val pij = col("c").cast("double") / col("n")
        m.agg(
            max(col("n")).as("n"),
            round(sum(pij * log(col("c").cast("double") * col("n") /
              (col("ct").cast("double") * col("cd")))), 6).as("mi"),
            round(-sum(pij * log(col("ct").cast("double") / col("n"))), 6)
              .as("h_type"),
            round(-sum(pij * log(col("cd").cast("double") / col("n"))), 6)
              .as("h_dow"))
          .select(col("n"), col("mi"), col("h_type"), col("h_dow"),
            round(col("mi") / sqrt(col("h_type") * col("h_dow")), 6).as("nmi"))
      },
      Some("""WITH cells AS (SELECT event_type AS t, dayofweek(ts) AS dw,
                                    count(*) AS c
                             FROM events GROUP BY 1, 2),
                   m AS (SELECT t, dw, c,
                           CAST(sum(c) OVER (PARTITION BY t) AS BIGINT) AS ct,
                           CAST(sum(c) OVER (PARTITION BY dw) AS BIGINT) AS cd,
                           CAST(sum(c) OVER () AS BIGINT) AS n
                         FROM cells),
                   agg AS (SELECT CAST(max(n) AS BIGINT) AS n,
                             round(sum((c * 1.0 / n) *
                               ln(c * 1.0 * n / (ct * 1.0 * cd))), 6) AS mi,
                             round(-sum((c * 1.0 / n) * ln(ct * 1.0 / n)), 6)
                               AS h_type,
                             round(-sum((c * 1.0 / n) * ln(cd * 1.0 / n)), 6)
                               AS h_dow
                           FROM m)
              SELECT n, mi, h_type, h_dow,
                     round(mi / sqrt(h_type * h_dow), 6) AS nmi
              FROM agg""")),

    // Two-sample KOLMOGOROV-SMIRNOV test — the distribution-shape
    // companion of q_ab_test (Welch compares means; KS catches variance /
    // shape / tail shifts means miss) and q_psi_drift (PSI needs binning;
    // KS is bin-free). Integer-exact by construction: values quantize to
    // per-row cents, the (cents → per-arm count) dictionary cumulates in
    // one value-ordered window, and the sup statistic maximizes
    // |cum_a·n_b − cum_b·n_a| — all LONG arithmetic, divided exactly once
    // at the end (no float accumulates in any order-dependent way). The
    // global window runs over the cents DICTIONARY, not raw events; the
    // scalar totals broadcast via the audited single-row crossJoin shape.
    QueryDef(
      "q_ks_test",
      (s, d) => {
        val e = Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents"))
        val hist = e.groupBy("cents").agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("ca"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("cb"))
        val tot = hist.agg(sum("ca").as("na"), sum("cb").as("nb"))
        val w = Window.orderBy(asc("cents"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist
          .withColumn("cuma", sum("ca").over(w))
          .withColumn("cumb", sum("cb").over(w))
        cum.crossJoin(broadcast(tot))
          .select(col("na"), col("nb"),
            abs(col("cuma") * col("nb") - col("cumb") * col("na")).as("dn"))
          .groupBy("na", "nb")
          .agg(max("dn").as("dnmax"))
          .select(
            col("na"), col("nb"),
            round(col("dnmax").cast("double") /
              (col("na") * col("nb")).cast("double"), 6).as("d_stat"),
            round(col("dnmax").cast("double") / (col("na") * col("nb")).cast("double") *
              sqrt((col("na") * col("nb")).cast("double") /
                (col("na") + col("nb")).cast("double")), 4).as("ks_lambda"))
      },
      Some("""WITH e AS (SELECT event_type,
                     CAST(round(value * 100) AS BIGINT) AS cents
                   FROM events WHERE event_type IN ('click', 'purchase')),
                   hist AS (SELECT cents,
                              sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
                              sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
                            FROM e GROUP BY 1),
                   tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                                  CAST(sum(cb) AS BIGINT) AS nb FROM hist),
                   cum AS (SELECT cents,
                             CAST(sum(ca) OVER (ORDER BY cents) AS BIGINT) AS cuma,
                             CAST(sum(cb) OVER (ORDER BY cents) AS BIGINT) AS cumb
                           FROM hist),
                   dm AS (SELECT max(abs(cuma * nb - cumb * na)) AS dnmax
                          FROM cum, tot)
              SELECT na, nb,
                     round(CAST(dnmax AS DOUBLE) / (na * nb), 6) AS d_stat,
                     round(CAST(dnmax AS DOUBLE) / (na * nb) *
                           sqrt(CAST(na * nb AS DOUBLE) / (na + nb)), 4) AS ks_lambda
              FROM dm, tot""")),

    // Two-sample MANN-WHITNEY U — the rank-based nonparametric companion
    // (q_ab_test assumes means matter, q_ks_test takes the sup; MWU tests
    // stochastic dominance, the workhorse when values are skewed).
    // Integer-exact by the q_ks_test construction: over the cents
    // DICTIONARY, 2·U_a = Σ_v ca·(2·cumb_before + cb) and the tie term
    // Σ(t³−t) are exact longs under any order; the normal-approximation
    // z (tie-corrected variance) is one identical single-row IEEE
    // expression. The only window rides the cents dictionary.
    QueryDef(
      "q_mwu_test",
      (s, d) => {
        val e = Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents"))
        val hist = e.groupBy("cents").agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("ca"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("cb"))
        val w = Window.orderBy(asc("cents"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist.withColumn("cumb", sum("cb").over(w))
        val sc = cum.agg(
          sum("ca").as("na"), sum("cb").as("nb"),
          sum(col("ca") * (lit(2) * (col("cumb") - col("cb")) + col("cb")))
            .as("u2"),
          sum((col("ca") + col("cb")) * (col("ca") + col("cb")) *
            (col("ca") + col("cb")) - (col("ca") + col("cb"))).as("ties3"))
        val n = col("na") + col("nb")
        val varu = (col("na") * col("nb")).cast("double") / 12 *
          ((n + 1).cast("double") -
            col("ties3").cast("double") / (n * (n - 1)).cast("double"))
        sc.select(col("na"), col("nb"),
          (col("u2").cast("double") / 2).as("u_a"),
          (round((col("u2") - col("na") * col("nb")).cast("double") /
            (lit(2.0) * sqrt(varu)), 4) + lit(0.0)).as("z"))
      },
      Some("""WITH e AS (SELECT event_type,
                                CAST(round(value * 100) AS BIGINT) AS cents
                         FROM events
                         WHERE event_type IN ('click', 'purchase')),
                   hist AS (SELECT cents,
                              sum(CASE WHEN event_type = 'click'
                                       THEN 1 ELSE 0 END) AS ca,
                              sum(CASE WHEN event_type = 'purchase'
                                       THEN 1 ELSE 0 END) AS cb
                            FROM e GROUP BY 1),
                   cum AS (SELECT cents, ca, cb,
                             CAST(sum(cb) OVER (ORDER BY cents) AS BIGINT)
                               AS cumb
                           FROM hist),
                   sc AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                                 CAST(sum(cb) AS BIGINT) AS nb,
                                 CAST(sum(ca * (2 * (cumb - cb) + cb))
                                      AS BIGINT) AS u2,
                                 CAST(sum((ca + cb) * (ca + cb) * (ca + cb)
                                          - (ca + cb)) AS BIGINT) AS ties3
                          FROM cum)
              SELECT na, nb,
                     CAST(u2 AS DOUBLE) / 2 AS u_a,
                     round(CAST(u2 - na * nb AS DOUBLE) /
                           (2.0 * sqrt(CAST(na * nb AS DOUBLE) / 12 *
                             (CAST(na + nb + 1 AS DOUBLE) -
                              CAST(ties3 AS DOUBLE) /
                              CAST((na + nb) * (na + nb - 1) AS DOUBLE)))),
                           4) + 0 AS z
              FROM sc""")),

    // CHI-SQUARE INDEPENDENCE cells — is event mix independent of
    // day-of-week? (the seasonality-of-behavior screen). The deliverable
    // is the per-CELL table: observed o, margins r/c, total n and dof all
    // EXACT LONGS, expected and contribution each ONE identical IEEE
    // expression of those longs per dictionary row — so every row is
    // hash-exact under any accumulation order. The final chi² = Σ contrib
    // stays downstream display work (the q_jackknife discipline: a float
    // re-sum over cells would reintroduce order dependence for zero
    // analytical value — the cells ARE what an analyst inspects).
    // Deviation is squared in DOUBLE (o·n − r·c fits a long at any
    // realistic cardinality; its square does not).
    QueryDef(
      "q_chisq",
      (s, d) => {
        val cells = Tables.events(s, d)
          .select(col("event_type").as("et"), (dayofweek(col("ts")) - 1).as("dow"))
          .groupBy("et", "dow")
          .agg(count(lit(1)).as("o"))
        val rm = cells.groupBy("et").agg(sum("o").as("r"))
        val cm = cells.groupBy("dow").agg(sum("o").as("c"))
        val tot = cells.agg(sum("o").as("n"),
          ((countDistinct("et") - 1) * (countDistinct("dow") - 1)).as("dof"))
        val dev = (col("o") * col("n") - col("r") * col("c")).cast("double")
        cells.join(rm, "et").join(cm, "dow").crossJoin(broadcast(tot))
          .select(col("et"), col("dow"), col("o"), col("r"), col("c"),
            col("n"), col("dof"),
            round((col("r") * col("c")).cast("double") / col("n"), 4)
              .as("expected_d"),
            // denominator widens each factor BEFORE multiplying: the long
            // product n·r·c wraps at n ≈ 3e6 rows (the 100× corpus hit it
            // under ANSI mode); n, r, c are each < 2^53 so the double
            // product is identical IEEE arithmetic on both engines
            round(dev * dev / (col("n").cast("double") *
              col("r").cast("double") * col("c").cast("double")), 8)
              .as("contrib_d"))
          .orderBy("et", "dow")
      },
      Some("""WITH cells AS (SELECT event_type AS et,
                                    CAST(date_part('dow', ts) AS INT) AS dow,
                                    count(*) AS o
                             FROM events GROUP BY 1, 2),
                   rm AS (SELECT et, CAST(sum(o) AS BIGINT) AS r
                          FROM cells GROUP BY 1),
                   cm AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c
                          FROM cells GROUP BY 1),
                   tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                                  (count(DISTINCT et) - 1) *
                                  (count(DISTINCT dow) - 1) AS dof
                           FROM cells)
              SELECT et, dow, o, r, c, n, dof,
                     round(CAST(r * c AS DOUBLE) / n, 4) AS expected_d,
                     round(CAST(o * n - r * c AS DOUBLE) *
                           CAST(o * n - r * c AS DOUBLE) /
                           (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) *
                            CAST(c AS DOUBLE)), 8) AS contrib_d
              FROM cells
              JOIN rm USING (et) JOIN cm USING (dow), tot
              ORDER BY et, dow""")),

    // EXACT AUC of a score separating two classes (value separating
    // purchase from click — the eval-harness primitive a training
    // pipeline runs on every model drop). AUC = P(s⁺>s⁻) + ½P(s⁺=s⁻) =
    // U⁺/(n⁺·n⁻), and the rank-sum U rides the same cents-DICTIONARY
    // construction as q_mwu_test: 2·U⁺ = Σ_v cp·(2·cumn_before + cn) is
    // an exact long under any order, so AUC is ONE IEEE division — the
    // exact-at-any-scale form (the naive pairwise comparison is O(n²);
    // sort-based AUC needs a global sort; the dictionary rollup needs
    // neither).
    QueryDef(
      "q_auc",
      (s, d) => {
        val e = Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents"))
        val hist = e.groupBy("cents").agg(
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("cp"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("cn"))
        val w = Window.orderBy(asc("cents"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist.withColumn("cumn", sum("cn").over(w))
        cum.agg(
          sum("cp").as("n_pos"), sum("cn").as("n_neg"),
          sum(col("cp") * (lit(2) * (col("cumn") - col("cn")) + col("cn")))
            .as("u2"))
          .select(col("n_pos"), col("n_neg"),
            round(col("u2").cast("double") /
              (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
      },
      Some("""WITH e AS (SELECT event_type,
                                CAST(round(value * 100) AS BIGINT) AS cents
                         FROM events
                         WHERE event_type IN ('click', 'purchase')),
                   hist AS (SELECT cents,
                              sum(CASE WHEN event_type = 'purchase'
                                       THEN 1 ELSE 0 END) AS cp,
                              sum(CASE WHEN event_type = 'click'
                                       THEN 1 ELSE 0 END) AS cn
                            FROM e GROUP BY 1),
                   cum AS (SELECT cents, cp, cn,
                             CAST(sum(cn) OVER (ORDER BY cents) AS BIGINT)
                               AS cumn
                           FROM hist)
              SELECT CAST(sum(cp) AS BIGINT) AS n_pos,
                     CAST(sum(cn) AS BIGINT) AS n_neg,
                     round(CAST(sum(cp * (2 * (cumn - cn) + cn)) AS DOUBLE) /
                           (2.0 * CAST(sum(cp) AS BIGINT)
                                * CAST(sum(cn) AS BIGINT)), 6) AS auc
              FROM cum""")),

    // CLASSIFIER EVAL at a fixed threshold — the confusion matrix and
    // its derived metrics (the other half of the eval harness): label =
    // purchase, prediction = value ≥ $50. TP/FP/FN/TN are exact-long
    // conditional sums in ONE scan; accuracy/precision/recall are one
    // IEEE division each, and F1 uses its single-division identity
    // 2TP/(2TP+FP+FN) — no division-of-divisions anywhere, so every
    // metric is bit-identical on both engines.
    QueryDef(
      "q_classifier_eval",
      (s, d) => {
        val e = Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(
            (col("event_type") === "purchase").cast("long").as("y"),
            (round(col("value") * 100).cast("long") >= 5000L)
              .cast("long").as("p"))
        e.agg(
          sum(col("y") * col("p")).as("tp"),
          sum((lit(1) - col("y")) * col("p")).as("fp"),
          sum(col("y") * (lit(1) - col("p"))).as("fn"),
          sum((lit(1) - col("y")) * (lit(1) - col("p"))).as("tn"))
          .select(col("tp"), col("fp"), col("fn"), col("tn"),
            round((col("tp") + col("tn")).cast("double") /
              (col("tp") + col("fp") + col("fn") + col("tn")), 6)
              .as("accuracy"),
            round(col("tp").cast("double") / (col("tp") + col("fp")), 6)
              .as("precision_"),
            round(col("tp").cast("double") / (col("tp") + col("fn")), 6)
              .as("recall"),
            round((lit(2) * col("tp")).cast("double") /
              (lit(2) * col("tp") + col("fp") + col("fn")), 6).as("f1"))
      },
      Some("""WITH e AS (SELECT CASE WHEN event_type = 'purchase'
                                     THEN 1 ELSE 0 END AS y,
                                CASE WHEN CAST(round(value * 100) AS BIGINT)
                                          >= 5000 THEN 1 ELSE 0 END AS p
                         FROM events
                         WHERE event_type IN ('click', 'purchase')),
                   c AS (SELECT CAST(sum(y * p) AS BIGINT) AS tp,
                                CAST(sum((1 - y) * p) AS BIGINT) AS fp,
                                CAST(sum(y * (1 - p)) AS BIGINT) AS fn,
                                CAST(sum((1 - y) * (1 - p)) AS BIGINT) AS tn
                         FROM e)
              SELECT tp, fp, fn, tn,
                     round(CAST(tp + tn AS DOUBLE) /
                           (tp + fp + fn + tn), 6) AS accuracy,
                     round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision_,
                     round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall,
                     round(CAST(2 * tp AS DOUBLE) /
                           (2 * tp + fp + fn), 6) AS f1
              FROM c""")),

    // CALIBRATION BINS — does the score MEAN what it claims? (the third
    // eval-harness member): fixed $20 score bins (top-coded at bin 9),
    // per bin the exact positive count and one-division observed rate
    // plus the exact-cents mean score — the reliability-diagram table.
    // Bin assignment is integer arithmetic on non-negative cents, so
    // banding is bit-identical on both engines; one scan, one
    // dictionary-sized rollup.
    QueryDef(
      "q_calibration_bins",
      (s, d) => {
        val e = Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(
            (col("event_type") === "purchase").cast("long").as("y"),
            round(col("value") * 100).cast("long").as("cents"))
        e.select(col("y"), col("cents"),
          least(floor(col("cents") / 2000L), lit(9L)).as("bin"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
            sum("cents").as("sum_c"))
          .select(col("bin"), col("n"), col("n_pos"),
            round(col("n_pos").cast("double") / col("n"), 6).as("pos_rate"),
            round(col("sum_c").cast("double") / (col("n") * 100), 4)
              .as("mean_score_d"))
          .orderBy("bin")
      },
      Some("""WITH e AS (SELECT CASE WHEN event_type = 'purchase'
                                     THEN 1 ELSE 0 END AS y,
                                CAST(round(value * 100) AS BIGINT) AS cents
                         FROM events
                         WHERE event_type IN ('click', 'purchase')),
                   b AS (SELECT y, cents,
                                least(cents // 2000, 9) AS bin FROM e)
              SELECT bin, count(*) AS n,
                     CAST(sum(y) AS BIGINT) AS n_pos,
                     round(CAST(sum(y) AS BIGINT) / CAST(count(*) AS DOUBLE), 6)
                       AS pos_rate,
                     round(CAST(sum(cents) AS BIGINT) /
                           (count(*) * 100.0), 4) AS mean_score_d
              FROM b GROUP BY 1 ORDER BY bin""")),

    // CUPED variance-reduced experiment metrics (Deng et al., WSDM'13 —
    // the standard pre-period covariate adjustment every large A/B
    // platform applies): Y = user's post-period spend, X = pre-period
    // spend (days < Jan 16), arm = deterministic user_id parity.
    // ONE scan builds per-user (x, y) cents; ONE rollup builds the five
    // global moments and per-arm sums — ALL EXACT LONGS (cents ×
    // cents products bounded well inside int64 at fixture scale;
    // DECIMAL(38) at true 100 TB spend, noted). θ = (n·Sxy − Sx·Sy)/
    // (n·Sxx − Sx²) and each adjusted mean are fixed chains of IEEE ops
    // on those longs — identical on both engines. Deliverable: per-arm
    // raw vs CUPED-adjusted means (the adjusted difference is the
    // experiment read-out).
    QueryDef(
      "q_cuped",
      (s, d) => {
        val cut = lit("2024-01-16").cast("timestamp")
        val per = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(
            sum(when(col("ts") < cut,
              round(col("value") * 100).cast("long")).otherwise(0L)).as("x"),
            sum(when(col("ts") >= cut,
              round(col("value") * 100).cast("long")).otherwise(0L)).as("y"))
          .withColumn("arm", (col("user_id") % 2).cast("int"))
        val g = per.agg(
          count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 0, col("x")).otherwise(0L)).as("sx0"),
          sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("sy0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("sx1"),
          sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("sy1"))
        def D(c: String) = col(c).cast("double")
        val theta = (D("n") * D("sxy") - D("sx") * D("sy")) /
          (D("n") * D("sxx") - D("sx") * D("sx"))
        val xbar = D("sx") / D("n")
        def adj(syA: String, sxA: String, nA: String) =
          D(syA) / D(nA) - theta * (D(sxA) / D(nA) - xbar)
        g.select(
          col("n0"), col("n1"),
          round(D("sy0") / D("n0") / 100, 4).as("raw_mean0_d"),
          round(D("sy1") / D("n1") / 100, 4).as("raw_mean1_d"),
          round(theta, 6).as("theta"),
          round(adj("sy0", "sx0", "n0") / 100, 4).as("cuped_mean0_d"),
          round(adj("sy1", "sx1", "n1") / 100, 4).as("cuped_mean1_d"))
      },
      Some("""WITH per AS (SELECT user_id,
                     CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                       THEN CAST(round(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
                     CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                       THEN CAST(round(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y,
                     CAST(user_id % 2 AS INT) AS arm
              FROM events WHERE event_type = 'purchase'
              GROUP BY user_id),
                   g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                                CAST(sum(x) AS BIGINT) AS sx,
                                CAST(sum(y) AS BIGINT) AS sy,
                                CAST(sum(x * x) AS BIGINT) AS sxx,
                                CAST(sum(x * y) AS BIGINT) AS sxy,
                                CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                                  AS BIGINT) AS n0,
                                CAST(sum(CASE WHEN arm = 0 THEN x ELSE 0 END)
                                  AS BIGINT) AS sx0,
                                CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END)
                                  AS BIGINT) AS sy0,
                                CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                                  AS BIGINT) AS n1,
                                CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END)
                                  AS BIGINT) AS sx1,
                                CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END)
                                  AS BIGINT) AS sy1
                         FROM per),
                   e AS (SELECT n0, n1,
                                CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                                  AS m0,
                                CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                                  AS m1,
                                (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                                (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                  AS theta,
                                CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                                  AS xbar,
                                CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                                  AS x0,
                                CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                                  AS x1
                         FROM g)
              SELECT n0, n1,
                     round(m0 / 100, 4) AS raw_mean0_d,
                     round(m1 / 100, 4) AS raw_mean1_d,
                     round(theta, 6) AS theta,
                     round((m0 - theta * (x0 - xbar)) / 100, 4)
                       AS cuped_mean0_d,
                     round((m1 - theta * (x1 - xbar)) / 100, 4)
                       AS cuped_mean1_d
              FROM e""")),

    // SAMPLE-RATIO-MISMATCH check — the guardrail every experiment
    // platform runs BEFORE reading any metric (a biased assignment
    // invalidates q_ab_test/q_cuped silently): under a 50/50 design,
    // z = (2·n0 − n)/√n; |z| > 3 flags broken bucketing. Counts exact
    // longs, one sqrt + one division — and the same deterministic
    // user_id-parity assignment q_cuped reads, so the two queries
    // audit each other.
    QueryDef(
      "q_srm_check",
      (s, d) => {
        val arms = Tables.events(s, d)
          .select(col("user_id")).distinct()
          .agg(count(lit(1)).as("n"),
            sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n0"))
        arms.select(col("n"), col("n0"), (col("n") - col("n0")).as("n1"),
          round((lit(2) * col("n0") - col("n")).cast("double") /
            sqrt(col("n").cast("double")), 4).as("srm_z"))
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
                   a AS (SELECT CAST(count(*) AS BIGINT) AS n,
                                CAST(sum(CASE WHEN user_id % 2 = 0
                                         THEN 1 ELSE 0 END) AS BIGINT) AS n0
                         FROM u)
              SELECT n, n0, n - n0 AS n1,
                     round(CAST(2 * n0 - n AS DOUBLE) /
                           sqrt(CAST(n AS DOUBLE)), 4) AS srm_z
              FROM a""")),

    // DIFFERENCE-IN-DIFFERENCES — the quasi-experimental read-out when
    // assignment isn't randomized (pre/post × treat/control 2×2): cell
    // sums and counts are EXACT LONGS from one scan; the four cell means
    // and DiD = (m11 − m10) − (m01 − m00) are a fixed IEEE chain on
    // them. Same period cut and parity assignment as q_cuped, so the
    // experiment family shares one auditable design.
    QueryDef(
      "q_did",
      (s, d) => {
        val cut = lit("2024-01-16").cast("timestamp")
        val cells = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select((col("user_id") % 2).cast("int").as("arm"),
            (col("ts") >= cut).cast("int").as("post"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("arm", "post")
          .agg(count(lit(1)).as("n"), sum("cents").as("s"))
        val g = cells.agg(
          sum(when(col("arm") === 0 && col("post") === 0, col("s"))).as("s00"),
          sum(when(col("arm") === 0 && col("post") === 0, col("n"))).as("n00"),
          sum(when(col("arm") === 0 && col("post") === 1, col("s"))).as("s01"),
          sum(when(col("arm") === 0 && col("post") === 1, col("n"))).as("n01"),
          sum(when(col("arm") === 1 && col("post") === 0, col("s"))).as("s10"),
          sum(when(col("arm") === 1 && col("post") === 0, col("n"))).as("n10"),
          sum(when(col("arm") === 1 && col("post") === 1, col("s"))).as("s11"),
          sum(when(col("arm") === 1 && col("post") === 1, col("n"))).as("n11"))
        def m(sc: String, nc: String) =
          col(sc).cast("double") / col(nc)
        g.select(
          col("n00"), col("n01"), col("n10"), col("n11"),
          round(m("s00", "n00") / 100, 4).as("m_ctl_pre_d"),
          round(m("s01", "n01") / 100, 4).as("m_ctl_post_d"),
          round(m("s10", "n10") / 100, 4).as("m_trt_pre_d"),
          round(m("s11", "n11") / 100, 4).as("m_trt_post_d"),
          round(((m("s11", "n11") - m("s10", "n10")) -
            (m("s01", "n01") - m("s00", "n00"))) / 100, 4).as("did_d"))
      },
      Some("""WITH c AS (SELECT CAST(user_id % 2 AS INT) AS arm,
                                CASE WHEN ts >= TIMESTAMP '2024-01-16'
                                     THEN 1 ELSE 0 END AS post,
                                CAST(round(value * 100) AS BIGINT) AS cents
                         FROM events WHERE event_type = 'purchase'),
                   cell AS (SELECT arm, post, count(*) AS n,
                                   CAST(sum(cents) AS BIGINT) AS s
                            FROM c GROUP BY 1, 2),
                   g AS (SELECT
                     CAST(sum(CASE WHEN arm=0 AND post=0 THEN s END) AS BIGINT) AS s00,
                     CAST(sum(CASE WHEN arm=0 AND post=0 THEN n END) AS BIGINT) AS n00,
                     CAST(sum(CASE WHEN arm=0 AND post=1 THEN s END) AS BIGINT) AS s01,
                     CAST(sum(CASE WHEN arm=0 AND post=1 THEN n END) AS BIGINT) AS n01,
                     CAST(sum(CASE WHEN arm=1 AND post=0 THEN s END) AS BIGINT) AS s10,
                     CAST(sum(CASE WHEN arm=1 AND post=0 THEN n END) AS BIGINT) AS n10,
                     CAST(sum(CASE WHEN arm=1 AND post=1 THEN s END) AS BIGINT) AS s11,
                     CAST(sum(CASE WHEN arm=1 AND post=1 THEN n END) AS BIGINT) AS n11
                     FROM cell)
              SELECT n00, n01, n10, n11,
                     round(CAST(s00 AS DOUBLE) / n00 / 100, 4) AS m_ctl_pre_d,
                     round(CAST(s01 AS DOUBLE) / n01 / 100, 4) AS m_ctl_post_d,
                     round(CAST(s10 AS DOUBLE) / n10 / 100, 4) AS m_trt_pre_d,
                     round(CAST(s11 AS DOUBLE) / n11 / 100, 4) AS m_trt_post_d,
                     round(((CAST(s11 AS DOUBLE) / n11 - CAST(s10 AS DOUBLE) / n10)
                          - (CAST(s01 AS DOUBLE) / n01 - CAST(s00 AS DOUBLE) / n00))
                           / 100, 4) AS did_d
              FROM g""")),

    // QUANTILE TREATMENT EFFECTS — how the treatment moves the whole
    // DISTRIBUTION, not just the mean (means hide tail effects): exact
    // discrete quantiles (actual data values at ceil-rank — the
    // dictionary-histogram operator, no interpolation, no global sort)
    // per arm at p25/p50/p75, and the per-quantile arm difference. All
    // value picks are exact cents; the only float work is the /100
    // display division.
    QueryDef(
      "q_qte",
      (s, d) => {
        val base = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select((col("user_id") % 2).cast("int").as("arm"),
            round(col("value") * 100).cast("long").as("cents"))
        val q = graft.operators.Percentiles.discrete(base, Seq("arm"),
          Seq(("q25", "cents", 0.25), ("q50", "cents", 0.5),
            ("q75", "cents", 0.75)))
        val a0 = q.filter(col("arm") === 0)
          .select(col("q25").as("c25"), col("q50").as("c50"),
            col("q75").as("c75"))
        val a1 = q.filter(col("arm") === 1)
          .select(col("q25").as("t25"), col("q50").as("t50"),
            col("q75").as("t75"))
        a0.crossJoin(broadcast(a1))
          .select(
            round(col("c25") / 100, 2).as("ctl_p25_d"),
            round(col("t25") / 100, 2).as("trt_p25_d"),
            round((col("t25") - col("c25")) / 100, 2).as("qte25_d"),
            round(col("c50") / 100, 2).as("ctl_p50_d"),
            round(col("t50") / 100, 2).as("trt_p50_d"),
            round((col("t50") - col("c50")) / 100, 2).as("qte50_d"),
            round(col("c75") / 100, 2).as("ctl_p75_d"),
            round(col("t75") / 100, 2).as("trt_p75_d"),
            round((col("t75") - col("c75")) / 100, 2).as("qte75_d"))
      },
      Some("""WITH b AS (SELECT CAST(user_id % 2 AS INT) AS arm,
                                CAST(round(value * 100) AS BIGINT) AS cents
                         FROM events WHERE event_type = 'purchase'),
                   q AS (SELECT arm,
                                quantile_disc(cents, 0.25) AS q25,
                                quantile_disc(cents, 0.5) AS q50,
                                quantile_disc(cents, 0.75) AS q75
                         FROM b GROUP BY 1),
                   a0 AS (SELECT q25 AS c25, q50 AS c50, q75 AS c75
                          FROM q WHERE arm = 0),
                   a1 AS (SELECT q25 AS t25, q50 AS t50, q75 AS t75
                          FROM q WHERE arm = 1)
              SELECT round(c25 / 100.0, 2) AS ctl_p25_d,
                     round(t25 / 100.0, 2) AS trt_p25_d,
                     round((t25 - c25) / 100.0, 2) AS qte25_d,
                     round(c50 / 100.0, 2) AS ctl_p50_d,
                     round(t50 / 100.0, 2) AS trt_p50_d,
                     round((t50 - c50) / 100.0, 2) AS qte50_d,
                     round(c75 / 100.0, 2) AS ctl_p75_d,
                     round(t75 / 100.0, 2) AS trt_p75_d,
                     round((t75 - c75) / 100.0, 2) AS qte75_d
              FROM a0, a1""")),

    QueryDef(
      "q_ab_test",
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("click", "view"))
          .select(col("event_type"), col("value"))
        val arms = ev.groupBy("event_type").agg(
          count(lit(1)).cast("double").as("n"),
          sum("value").as("sx"),
          sum(col("value") * col("value")).as("sxx"))
        def pick(arm: String, c: String) =
          max(when(col("event_type") === arm, col(c)))
        val wide = arms.agg(
          pick("click", "n").as("n1"), pick("click", "sx").as("sx1"),
          pick("click", "sxx").as("sxx1"),
          pick("view", "n").as("n2"), pick("view", "sx").as("sx2"),
          pick("view", "sxx").as("sxx2"))
        val m1 = col("sx1") / col("n1")
        val m2 = col("sx2") / col("n2")
        val v1 = (col("sxx1") - col("sx1") * col("sx1") / col("n1")) / (col("n1") - 1)
        val v2 = (col("sxx2") - col("sx2") * col("sx2") / col("n2")) / (col("n2") - 1)
        val se1 = v1 / col("n1")
        val se2 = v2 / col("n2")
        val t = (m1 - m2) / sqrt(se1 + se2)
        val df = pow(se1 + se2, 2) /
          (pow(se1, 2) / (col("n1") - 1) + pow(se2, 2) / (col("n2") - 1))
        wide.select(
          col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
          (round(m1, 4) + lit(0.0)).as("mean1"),
          (round(m2, 4) + lit(0.0)).as("mean2"),
          (round(v1, 4) + lit(0.0)).as("var1"),
          (round(v2, 4) + lit(0.0)).as("var2"),
          (round(t, 4) + lit(0.0)).as("t_stat"),
          (round(df, 2) + lit(0.0)).as("df"))
      },
      Some("""WITH arms AS (SELECT event_type,
                                   CAST(count(*) AS DOUBLE) AS n,
                                   sum(value) AS sx, sum(value * value) AS sxx
                            FROM events
                            WHERE event_type IN ('click', 'view')
                            GROUP BY 1),
                   wide AS (SELECT
                     max(CASE WHEN event_type = 'click' THEN n END) AS n1,
                     max(CASE WHEN event_type = 'click' THEN sx END) AS sx1,
                     max(CASE WHEN event_type = 'click' THEN sxx END) AS sxx1,
                     max(CASE WHEN event_type = 'view' THEN n END) AS n2,
                     max(CASE WHEN event_type = 'view' THEN sx END) AS sx2,
                     max(CASE WHEN event_type = 'view' THEN sxx END) AS sxx2
                   FROM arms),
                   c AS (SELECT n1, n2,
                                sx1 / n1 AS m1, sx2 / n2 AS m2,
                                (sxx1 - sx1 * sx1 / n1) / (n1 - 1) AS v1,
                                (sxx2 - sx2 * sx2 / n2) / (n2 - 1) AS v2
                         FROM wide)
              SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                     round(m1, 4) + 0 AS mean1, round(m2, 4) + 0 AS mean2,
                     round(v1, 4) + 0 AS var1, round(v2, 4) + 0 AS var2,
                     round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) + 0 AS t_stat,
                     round(pow(v1 / n1 + v2 / n2, 2) /
                           (pow(v1 / n1, 2) / (n1 - 1) +
                            pow(v2 / n2, 2) / (n2 - 1)), 2) + 0 AS df
              FROM c""")),

    // Brown's double exponential smoothing per series (the one-knob
    // trend forecaster): s1 folds the value sequence, s2 folds the
    // RUNNING s1 sequence — both in ONE sequential struct-state
    // `aggregate` HOF per user, the q_ewma shape with a two-field
    // accumulator. Identical fold order in both engines (ts, event_id)
    // makes the doubles bit-comparable before rounding; the oracle
    // replays the recursion as a recursive CTE (the q_dedup_clusters
    // precedent). Forecast(+1) = level + trend with level = 2·s1 − s2,
    // trend = α/(1−α)·(s1 − s2). Scale: one user-keyed shuffle, then
    // per-row array folds — series length bounded by per-user activity,
    // never corpus-sized.
    QueryDef(
      "q_forecast_des",
      (s, d) => {
        val a = 0.3
        val seq = Tables.events(s, d)
          .filter(col("user_id") < 30)
          .groupBy("user_id")
          .agg(sort_array(collect_list(struct(
            col("ts"), col("event_id"), col("value")))).as("seq"))
          .withColumn("vals", transform(col("seq"), x => x.getField("value")))
        val st = aggregate(
          slice(col("vals"), lit(2), greatest(size(col("vals")) - 1, lit(0))),
          struct(element_at(col("vals"), 1).as("s1"),
            element_at(col("vals"), 1).as("s2")),
          (acc, x) => {
            val s1n = lit(a) * x + lit(1 - a) * acc.getField("s1")
            struct(s1n.as("s1"),
              (lit(a) * s1n + lit(1 - a) * acc.getField("s2")).as("s2"))
          })
        seq.withColumn("st", st)
          .select(
            col("user_id"), size(col("vals")).as("n"),
            (round(col("st.s1"), 4) + lit(0.0)).as("s1"),
            (round(col("st.s2"), 4) + lit(0.0)).as("s2"),
            (round(lit(2.0) * col("st.s1") - col("st.s2") +
              (lit(a / (1 - a))) * (col("st.s1") - col("st.s2")), 4) + lit(0.0))
              .as("forecast"))
          .orderBy("user_id")
      },
      Some("""WITH RECURSIVE
                   seq AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vals
                           FROM events WHERE user_id < 30 GROUP BY 1),
                   t AS (SELECT user_id, generate_subscripts(vals, 1) AS i,
                                unnest(vals) AS v
                         FROM seq),
                   nn AS (SELECT user_id, max(i) AS n FROM t GROUP BY 1),
                   r AS (
                     SELECT user_id, 1 AS i, v AS s1, v AS s2 FROM t WHERE i = 1
                     UNION ALL
                     SELECT t.user_id, r.i + 1,
                            0.3 * t.v + 0.7 * r.s1,
                            0.3 * (0.3 * t.v + 0.7 * r.s1) + 0.7 * r.s2
                     FROM r JOIN t ON t.user_id = r.user_id AND t.i = r.i + 1)
              SELECT r.user_id, CAST(nn.n AS INT) AS n,
                     round(r.s1, 4) + 0 AS s1, round(r.s2, 4) + 0 AS s2,
                     round(2.0 * r.s1 - r.s2 +
                           (0.3 / 0.7) * (r.s1 - r.s2), 4) + 0 AS forecast
              FROM r JOIN nn ON r.user_id = nn.user_id AND r.i = nn.n
              ORDER BY r.user_id""")),

    // First-order Markov transition matrix over per-user event paths:
    // P(next type | current type). One user-partitioned LAG window pass
    // (the q_user_paths shuffle), then everything downstream is the 5×5
    // transition dictionary; the probability denominator is a window
    // partitioned by the source state — dictionary-sized by definition.
    QueryDef(
      "q_markov_transitions",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("prev", lag("event_type", 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev").as("from_type"), col("event_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("p",
            round(col("n") / sum("n").over(Window.partitionBy("from_type")), 4)
              + lit(0.0))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH seq AS (SELECT user_id, event_type,
                                  lag(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev
                           FROM events),
                   c AS (SELECT prev AS from_type, event_type AS to_type,
                                count(*) AS n
                         FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2)
              SELECT from_type, to_type, n,
                     round(CAST(n AS DOUBLE) /
                           sum(n) OVER (PARTITION BY from_type), 4) + 0 AS p
              FROM c ORDER BY from_type, to_type""")),

    // Trailing-window anomaly detection on the per-type daily series:
    // z-score of each day's total against the mean/stddev of the 7 prior
    // days. Daily totals are cents-quantized BEFORE the window stats so
    // both engines window over identical doubles (the parallel-sum last
    // ulp can't leak into the |z| > 1.5 flag decision). The series table
    // is dictionary-sized (types × days) — the window pass costs nothing
    // at any fact scale; the fact table is touched exactly once.
    QueryDef(
      "q_anomaly_series",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
          .agg((round(sum("value"), 2) + lit(0.0)).as("v"))
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-7, -1)
        daily
          .withColumn("ma", avg("v").over(w))
          .withColumn("sd", stddev_samp(col("v")).over(w))
          .withColumn("n_win", count("v").over(w))
          .filter(col("n_win") === 7 && col("sd") > 0)
          .withColumn("z", (col("v") - col("ma")) / col("sd"))
          .filter(abs(col("z")) > 1.5)
          .select(col("event_type"), col("day"), col("v"),
            (round(col("ma"), 2) + lit(0.0)).as("ma"),
            (round(col("z"), 3) + lit(0.0)).as("z"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (SELECT event_type,
                                    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                                    round(sum(value), 2) + 0 AS v
                             FROM events GROUP BY 1, 2),
                   win AS (SELECT event_type, day, v,
                                  avg(v) OVER w AS ma,
                                  stddev_samp(v) OVER w AS sd,
                                  count(v) OVER w AS n_win
                           FROM daily
                           WINDOW w AS (PARTITION BY event_type ORDER BY day
                                        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
              SELECT event_type, day, v, round(ma, 2) + 0 AS ma,
                     round((v - ma) / sd, 3) + 0 AS z
              FROM win
              WHERE n_win = 7 AND sd > 0 AND abs((v - ma) / sd) > 1.5
              ORDER BY event_type, day""")),

    // Market-basket co-occurrence (the "frequently bought together"
    // rollup): top part pairs sharing an order. The basket rollup is one
    // orderkey-keyed shuffle into a sorted distinct-item array (TPC-H
    // baskets are ≤7 items; a production run caps pathological baskets
    // the way q_dedup_ngram_jaccard caps hot shingles); pair generation
    // is then a scan-local index-lambda HOF — C(b,2) structs per basket,
    // never a self-join of the fact table — and the final top-10 is a
    // TakeOrdered over pair counts with full-order tie-breaks.
    QueryDef(
      "q_basket_pairs",
      (s, d) => {
        val baskets = Tables.lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(sort_array(collect_set("l_partkey")).as("items"))
          .filter(size(col("items")) >= 2)
        baskets
          .select(explode(flatten(transform(col("items"), (x, i) =>
            transform(
              slice(col("items"), i + lit(2), size(col("items"))),
              y => struct(x.as("a"), y.as("b")))))).as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"))
          .groupBy("a", "b")
          .agg(count(lit(1)).as("n_baskets"))
          .orderBy(desc("n_baskets"), asc("a"), asc("b"))
          .limit(10)
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
                   p AS (SELECT a.l_partkey AS a, b.l_partkey AS b,
                                count(*) AS n_baskets
                         FROM li a JOIN li b
                           ON a.l_orderkey = b.l_orderkey
                          AND a.l_partkey < b.l_partkey
                         GROUP BY 1, 2)
              SELECT a, b, n_baskets FROM p
              ORDER BY n_baskets DESC, a, b LIMIT 10""")),

    // Funnel TIME-TO-CONVERT by signup-week cohort: how fast do signups
    // become purchases, and does it drift across cohorts? Per user, one
    // aggregate pass yields (first signup, first purchase AFTER it);
    // delays quantize to integer MINUTES (exact microsecond arithmetic,
    // then floor-division — engine-stable), so the per-cohort median/p90
    // run on the dictionary-histogram percentile operator: bounded
    // aggregate state, never a per-cohort value-set reducer. Every
    // window is cohort-partitioned.
    QueryDef(
      "q_funnel_time",
      (s, d) => {
        val ev = Tables.events(s, d)
        val perUser = ev
          .filter(col("event_type").isin("signup", "purchase"))
          .groupBy("user_id")
          .agg(
            min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
            min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
          .filter(col("first_signup").isNotNull)
          .withColumn("cohort", date_trunc("week", col("first_signup")))
          .withColumn("delay_min",
            when(col("first_purchase") >= col("first_signup"),
              floor((unix_micros(col("first_purchase")) -
                unix_micros(col("first_signup"))) / 60000000L)))
        val quantiles = graft.operators.Percentiles.exact(
          perUser.filter(col("delay_min").isNotNull), Seq("cohort"),
          Seq(("med_min", "delay_min", 0.5), ("p90_min", "delay_min", 0.9)))
        val counts = perUser.groupBy("cohort").agg(
          count(lit(1)).as("n_signups"),
          sum(when(col("delay_min").isNotNull, 1L).otherwise(0L)).as("n_converted"))
        counts.join(quantiles, Seq("cohort"), "left")
          .select(col("cohort"), col("n_signups"), col("n_converted"),
            (round(col("n_converted") / col("n_signups"), 4) + lit(0.0)).as("cvr"),
            (round(col("med_min"), 2) + lit(0.0)).as("med_min"),
            (round(col("p90_min"), 2) + lit(0.0)).as("p90_min"))
          .orderBy("cohort")
      },
      Some("""WITH pu AS (SELECT user_id,
                                 min(CASE WHEN event_type = 'signup' THEN ts END)
                                   AS first_signup,
                                 min(CASE WHEN event_type = 'purchase' THEN ts END)
                                   AS first_purchase
                          FROM events
                          WHERE event_type IN ('signup', 'purchase')
                          GROUP BY 1),
                   du AS (SELECT date_trunc('week', first_signup) AS cohort,
                                 CASE WHEN first_purchase >= first_signup THEN
                                   (epoch_us(first_purchase) - epoch_us(first_signup))
                                     // 60000000 END AS delay_min
                          FROM pu WHERE first_signup IS NOT NULL)
              SELECT CAST(cohort AS TIMESTAMP) AS cohort,
                     count(*) AS n_signups,
                     CAST(sum(CASE WHEN delay_min IS NOT NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_converted,
                     round(CAST(sum(CASE WHEN delay_min IS NOT NULL THEN 1 ELSE 0 END)
                                AS DOUBLE) / count(*), 4) + 0 AS cvr,
                     round(quantile_cont(delay_min, 0.5), 2) + 0 AS med_min,
                     round(quantile_cont(delay_min, 0.9), 2) + 0 AS p90_min
              FROM du GROUP BY 1 ORDER BY cohort""")),

    // POSITION-BASED multi-touch attribution (q_attribution's last-touch
    // rule, upgraded to the first/last 50-50 split every marketing stack
    // offers next to it): each purchase credits half its value to the
    // user's FIRST prior touch and half to the LAST — full credit when
    // they coincide, 'direct' when none exist. Both endpoints come from
    // ONE user-partitioned window pass (min/max over (ts, event_id,
    // type) structs — aggregate-over-window, so nulls drop and the
    // (ts, event_id) total order rides inside the struct comparison);
    // credits explode to ≤2 rows per purchase, then a dictionary-sized
    // channel rollup.
    QueryDef(
      "q_attribution_position",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val touch = when(col("event_type") =!= "purchase",
          struct(col("ts"), col("event_id"), col("event_type")))
        val seq = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"), col("value"))
          .withColumn("first_t", min(touch).over(w))
          .withColumn("last_t", max(touch).over(w))
          .filter(col("event_type") === "purchase")
        val credits = seq.select(col("value"), explode(
          when(col("first_t").isNull,
            array(struct(lit("direct").as("channel"), lit(1.0).as("w"))))
            .when(col("first_t") === col("last_t"),
              array(struct(col("first_t.event_type").as("channel"),
                lit(1.0).as("w"))))
            .otherwise(array(
              struct(col("first_t.event_type").as("channel"), lit(0.5).as("w")),
              struct(col("last_t.event_type").as("channel"), lit(0.5).as("w")))))
          .as("c"))
        credits
          .groupBy(col("c.channel").as("channel"))
          .agg(
            // half-credit × cents = 0.005 grid — exactly boundary-capable
            // at 2 dp; per-row exact mills, scalar division at the end
            (round(sum(round(col("c.w") * col("value") * 1000).cast("long"))
              / 1000.0, 2) + lit(0.0)).as("revenue"),
            (round(sum(col("c.w")), 1) + lit(0.0)).as("n_credits"))
          .orderBy("channel")
      },
      Some("""WITH seq AS (SELECT user_id, ts, event_id, event_type, value,
                                  min(CASE WHEN event_type <> 'purchase' THEN
                                        struct_pack(ts := ts, eid := event_id,
                                                    t := event_type) END)
                                    OVER w AS first_t,
                                  max(CASE WHEN event_type <> 'purchase' THEN
                                        struct_pack(ts := ts, eid := event_id,
                                                    t := event_type) END)
                                    OVER w AS last_t
                           FROM events
                           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING)),
                   p AS (SELECT * FROM seq WHERE event_type = 'purchase'),
                   credits AS (
                     -- CAST the credit weights to DOUBLE: bare 1.0/0.5 are
                     -- DECIMAL literals in DuckDB, so sum(w) (and thus
                     -- n_credits) would widen to DECIMAL(38,1) while Spark
                     -- emits double — the banned oracle-output-dtype class
                     -- (0.5/1.0 are exact IEEE, so DOUBLE sums match
                     -- bit-for-bit under any accumulation order)
                     SELECT 'direct' AS channel, CAST(1.0 AS DOUBLE) AS w,
                            value FROM p
                     WHERE first_t IS NULL
                     UNION ALL
                     SELECT first_t.t, CAST(1.0 AS DOUBLE), value FROM p
                     WHERE first_t IS NOT NULL AND first_t = last_t
                     UNION ALL
                     SELECT first_t.t, CAST(0.5 AS DOUBLE), value FROM p
                     WHERE first_t IS NOT NULL AND first_t <> last_t
                     UNION ALL
                     SELECT last_t.t, CAST(0.5 AS DOUBLE), value FROM p
                     WHERE first_t IS NOT NULL AND first_t <> last_t)
              SELECT channel,
                     round(CAST(sum(CAST(round(w * value * 1000) AS BIGINT))
                                AS BIGINT) / 1000.0, 2) + 0 AS revenue,
                     round(sum(w), 1) + 0 AS n_credits
              FROM credits GROUP BY 1 ORDER BY channel""")),

    // RFM customer segmentation (recency / frequency / monetary quartile
    // scores → named segments): one user-keyed rollup computes the three
    // metrics — recency in whole days against the scalar corpus max-day
    // (broadcast, scalar-N pattern), frequency as an event count,
    // monetary QUANTIZED to ten-dollar units so every metric is integral
    // and its quartile edges land on exactly-representable quarter
    // values (the q_mad_outliers discipline — no cross-engine boundary
    // flips). Edges come from the dictionary-histogram percentile
    // operator in one pass over all three metrics and broadcast back;
    // scoring and the segment CASE chain are identical expressions in
    // both engines.
    QueryDef(
      "q_rfm_segments",
      (s, d) => {
        val ev = Tables.events(s, d)
        val maxDay = ev.agg(max(date_trunc("day", col("ts"))).as("max_day"))
        val rfm = ev.groupBy("user_id")
          .agg(
            max(date_trunc("day", col("ts"))).as("last_day"),
            count(lit(1)).as("f"),
            floor(sum("value") / 10.0).cast("long").as("m"))
          .crossJoin(broadcast(maxDay))
          .select(col("user_id"),
            datediff(col("max_day"), col("last_day")).cast("long").as("r"),
            col("f"), col("m"))
          .withColumn("g", lit(1))
        val edges = graft.operators.Percentiles.exact(rfm, Seq("g"),
          Seq(("r25", "r", 0.25), ("r50", "r", 0.5), ("r75", "r", 0.75),
            ("f25", "f", 0.25), ("f50", "f", 0.5), ("f75", "f", 0.75),
            ("m25", "m", 0.25), ("m50", "m", 0.5), ("m75", "m", 0.75)))
        def up(c: String, q: String) =
          lit(1) + when(col(c) > col(s"${q}25"), 1).otherwise(0) +
            when(col(c) > col(s"${q}50"), 1).otherwise(0) +
            when(col(c) > col(s"${q}75"), 1).otherwise(0)
        val scored = rfm.join(broadcast(edges), "g")
          .withColumn("rs", lit(5) - up("r", "r"))
          .withColumn("fs", up("f", "f"))
          .withColumn("ms", up("m", "m"))
          .withColumn("segment",
            when(col("rs") >= 3 && col("fs") >= 3 && col("ms") >= 3, "champion")
              .when(col("rs") <= 2 && col("fs") >= 3, "at_risk")
              .when(col("fs") >= 3, "loyal")
              .when(col("ms") >= 3, "big_spender")
              .when(col("rs") >= 3, "recent")
              .otherwise("hibernating"))
        scored.groupBy("segment")
          .agg(
            count(lit(1)).as("n_users"),
            (round(avg("r"), 2) + lit(0.0)).as("avg_r"),
            (round(avg("f"), 2) + lit(0.0)).as("avg_f"),
            (round(avg("m"), 2) + lit(0.0)).as("avg_m"))
          .orderBy("segment")
      },
      Some("""WITH mx AS (SELECT max(date_trunc('day', ts)) AS max_day FROM events),
                   rfm AS (SELECT user_id,
                                  CAST(date_diff('day',
                                    max(date_trunc('day', ts)),
                                    (SELECT max_day FROM mx)) AS BIGINT) AS r,
                                  count(*) AS f,
                                  CAST(floor(sum(value) / 10.0) AS BIGINT) AS m
                           FROM events GROUP BY 1),
                   e AS (SELECT quantile_cont(r, 0.25) AS r25, quantile_cont(r, 0.5) AS r50,
                                quantile_cont(r, 0.75) AS r75,
                                quantile_cont(f, 0.25) AS f25, quantile_cont(f, 0.5) AS f50,
                                quantile_cont(f, 0.75) AS f75,
                                quantile_cont(m, 0.25) AS m25, quantile_cont(m, 0.5) AS m50,
                                quantile_cont(m, 0.75) AS m75
                         FROM rfm),
                   sc AS (SELECT user_id, r, f, m,
                                 5 - (1 + CASE WHEN r > e.r25 THEN 1 ELSE 0 END
                                        + CASE WHEN r > e.r50 THEN 1 ELSE 0 END
                                        + CASE WHEN r > e.r75 THEN 1 ELSE 0 END) AS rs,
                                 1 + CASE WHEN f > e.f25 THEN 1 ELSE 0 END
                                   + CASE WHEN f > e.f50 THEN 1 ELSE 0 END
                                   + CASE WHEN f > e.f75 THEN 1 ELSE 0 END AS fs,
                                 1 + CASE WHEN m > e.m25 THEN 1 ELSE 0 END
                                   + CASE WHEN m > e.m50 THEN 1 ELSE 0 END
                                   + CASE WHEN m > e.m75 THEN 1 ELSE 0 END AS ms
                          FROM rfm CROSS JOIN e),
                   seg AS (SELECT r, f, m,
                                  CASE WHEN rs >= 3 AND fs >= 3 AND ms >= 3 THEN 'champion'
                                       WHEN rs <= 2 AND fs >= 3 THEN 'at_risk'
                                       WHEN fs >= 3 THEN 'loyal'
                                       WHEN ms >= 3 THEN 'big_spender'
                                       WHEN rs >= 3 THEN 'recent'
                                       ELSE 'hibernating' END AS segment
                           FROM sc)
              SELECT segment, count(*) AS n_users,
                     round(avg(r), 2) + 0 AS avg_r,
                     round(avg(f), 2) + 0 AS avg_f,
                     round(avg(m), 2) + 0 AS avg_m
              FROM seg GROUP BY 1 ORDER BY segment""")),

    // Activity STREAKS (gaps-and-islands): distribution of users' longest
    // runs of consecutive active days. The island anchor is the classic
    // (day-number − row_number) trick — consecutive days share an anchor
    // — computed in one user-partitioned window pass over the distinct
    // (user, day) rollup; everything after is per-user-bounded then a
    // dictionary-sized (streak length) histogram.
    QueryDef(
      "q_streaks",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("dayn")
        val days = Tables.events(s, d)
          .select(col("user_id"),
            (unix_micros(date_trunc("day", col("ts"))) / 86400000000L)
              .cast("long").as("dayn"))
          .distinct()
        days
          .withColumn("anchor", col("dayn") - row_number().over(w))
          .groupBy("user_id", "anchor")
          .agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(max("len").as("max_streak"))
          .groupBy("max_streak")
          .agg(count(lit(1)).as("n_users"))
          .orderBy("max_streak")
      },
      Some("""WITH days AS (SELECT DISTINCT user_id,
                                   epoch_us(date_trunc('day', ts)) // 86400000000
                                     AS dayn
                            FROM events),
                   isl AS (SELECT user_id,
                                  dayn - row_number() OVER (PARTITION BY user_id
                                                            ORDER BY dayn) AS anchor
                           FROM days),
                   runs AS (SELECT user_id, anchor, count(*) AS len
                            FROM isl GROUP BY 1, 2),
                   mx AS (SELECT user_id, max(len) AS max_streak
                          FROM runs GROUP BY 1)
              SELECT max_streak, count(*) AS n_users
              FROM mx GROUP BY 1 ORDER BY max_streak""")),

    // POPULATION-STABILITY-INDEX drift (the ML-monitoring screen between
    // a reference window and the current one: PSI = Σ (q−p)·ln(q/p) over
    // value bands; > 0.2 conventionally flags retraining). The corpus
    // splits at its own temporal midpoint (integer-microsecond arithmetic
    // on the scalar min/max row — data-relative, no wall clock); band
    // edges are the REFERENCE half's deciles from the dictionary-
    // histogram operator, broadcast back over one counting scan per
    // half; bands empty on either side are excluded by the same rule on
    // both engines. Everything is integer counts until the final
    // share-ratio logs.
    QueryDef(
      "q_psi_drift",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), unix_micros(col("ts")).as("us"),
            round(col("value") * 100).cast("long").as("c"))
        val mid = ev.agg(min("us").as("lo_us"), max("us").as("hi_us"))
          .select(expr("(lo_us + hi_us) div 2").as("mid_us"))
        val halves = ev.crossJoin(broadcast(mid))
          .withColumn("half", when(col("us") <= col("mid_us"), "ref").otherwise("cur"))
        val edges0 = graft.operators.Percentiles.exact(
          halves.filter(col("half") === "ref"), Seq("event_type"),
          (1 to 9).map(i => (s"q$i", "c", i / 10.0)))
        // interpolated edges carry engine-specific last-ulp fuzz (the two
        // engines interpolate in different operation orders); rounding to
        // 4 decimals BEFORE the band comparisons makes the cut points
        // bit-identical on both sides
        val edges = edges0.select(col("event_type") +:
          (1 to 9).map(i => round(col(s"q$i"), 4).as(s"q$i")): _*)
        val band = (1 to 9).map(i =>
          when(col("c") >= col(s"q$i"), 1).otherwise(0)).reduce(_ + _) + lit(1)
        val counts = halves.join(broadcast(edges), "event_type")
          .withColumn("band", band)
          .groupBy("event_type", "band")
          .agg(
            sum(when(col("half") === "ref", 1L).otherwise(0L)).as("n_ref"),
            sum(when(col("half") === "cur", 1L).otherwise(0L)).as("n_cur"))
        val totals = counts.groupBy("event_type")
          .agg(sum("n_ref").as("t_ref"), sum("n_cur").as("t_cur"))
        counts.join(broadcast(totals), "event_type")
          .filter(col("n_ref") > 0 && col("n_cur") > 0)
          .withColumn("p", col("n_ref") / col("t_ref"))
          .withColumn("q", col("n_cur") / col("t_cur"))
          .groupBy("event_type")
          .agg(
            first("t_ref").as("n_ref"), first("t_cur").as("n_cur"),
            round(sum((col("q") - col("p")) * log(col("q") / col("p"))), 6)
              .as("psi"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type, epoch_us(ts) AS us,
                                CAST(round(value * 100) AS BIGINT) AS c
                         FROM events),
                   m AS (SELECT (min(us) + max(us)) // 2 AS mid_us FROM e),
                   h AS (SELECT event_type, c,
                                CASE WHEN us <= m.mid_us THEN 'ref'
                                     ELSE 'cur' END AS half
                         FROM e, m),
                   ed AS (SELECT event_type,
                                 round(quantile_cont(c, 0.1), 4) AS q1, round(quantile_cont(c, 0.2), 4) AS q2,
                                 round(quantile_cont(c, 0.3), 4) AS q3, round(quantile_cont(c, 0.4), 4) AS q4,
                                 round(quantile_cont(c, 0.5), 4) AS q5, round(quantile_cont(c, 0.6), 4) AS q6,
                                 round(quantile_cont(c, 0.7), 4) AS q7, round(quantile_cont(c, 0.8), 4) AS q8,
                                 round(quantile_cont(c, 0.9), 4) AS q9
                          FROM h WHERE half = 'ref' GROUP BY 1),
                   b AS (SELECT h.event_type, h.half,
                                1 + (CASE WHEN c >= q1 THEN 1 ELSE 0 END)
                                  + (CASE WHEN c >= q2 THEN 1 ELSE 0 END)
                                  + (CASE WHEN c >= q3 THEN 1 ELSE 0 END)
                                  + (CASE WHEN c >= q4 THEN 1 ELSE 0 END)
                                  + (CASE WHEN c >= q5 THEN 1 ELSE 0 END)
                                  + (CASE WHEN c >= q6 THEN 1 ELSE 0 END)
                                  + (CASE WHEN c >= q7 THEN 1 ELSE 0 END)
                                  + (CASE WHEN c >= q8 THEN 1 ELSE 0 END)
                                  + (CASE WHEN c >= q9 THEN 1 ELSE 0 END) AS band
                         FROM h JOIN ed USING (event_type)),
                   ct AS (SELECT event_type, band,
                                 sum(CASE WHEN half = 'ref' THEN 1 ELSE 0 END) AS n_ref,
                                 sum(CASE WHEN half = 'cur' THEN 1 ELSE 0 END) AS n_cur
                          FROM b GROUP BY 1, 2),
                   tt AS (SELECT event_type, sum(n_ref) AS t_ref, sum(n_cur) AS t_cur
                          FROM ct GROUP BY 1)
              SELECT ct.event_type,
                     CAST(any_value(t_ref) AS BIGINT) AS n_ref,
                     CAST(any_value(t_cur) AS BIGINT) AS n_cur,
                     round(sum((CAST(n_cur AS DOUBLE) / t_cur
                                - CAST(n_ref AS DOUBLE) / t_ref)
                               * ln((CAST(n_cur AS DOUBLE) / t_cur)
                                    / (CAST(n_ref AS DOUBLE) / t_ref))), 6) AS psi
              FROM ct JOIN tt USING (event_type)
              WHERE n_ref > 0 AND n_cur > 0
              GROUP BY 1 ORDER BY event_type""")),

    // PARETO revenue concentration — "what share of revenue comes from
    // the whale decile?": per-user revenue rolls up entity-sized, the
    // p90 cut comes from the dictionary-histogram operator over
    // integer-cent user revenues (never a global user sort), rounded
    // on both sides against interpolation fuzz (the q_psi_drift
    // lesson), and the shares are one broadcast-scalar division. Users
    // AT the cut count into the top bucket on both engines (an exact
    // >= on the rounded edge).
    // GINI COEFFICIENT of per-user revenue — the scalar inequality
    // companion to q_pareto_revenue (pareto answers "how much do the top
    // 10% hold", Gini summarizes the WHOLE Lorenz curve). Entirely exact:
    // over the revenue-cents dictionary, tied ranks contribute
    // v·(c·k + c(c+1)/2) with k the prior cumulative count — exact longs
    // under any order — and G = (2·ΣiX − (n+1)·ΣX) / (n·ΣX) is ONE IEEE
    // division of exact longs (no two-division drift). The only window
    // rides the value dictionary. At true 100 TB cent-scale the same
    // formula runs in DECIMAL(38) — noted, not needed at any realistic
    // per-user revenue.
    QueryDef(
      "q_gini",
      (s, d) => {
        val per = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(sum(round(col("value") * 100).cast("long")).as("rev_c"))
        val hist = per.groupBy("rev_c").agg(count(lit(1)).as("cnt"))
        val w = Window.orderBy(asc("rev_c"))
        val cum = hist.withColumn("k",
          coalesce(sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        cum.agg(
          sum("cnt").as("n_users"),
          sum(col("rev_c") * col("cnt")).as("sx"),
          sum(expr("rev_c * (cnt * k + (cnt * (cnt + 1)) div 2)")).as("six"))
          .select(col("n_users"),
            round(col("sx").cast("double") / 100, 2).as("total_rev_d"),
            round((lit(2) * col("six") - (col("n_users") + 1) * col("sx"))
              .cast("double") / (col("n_users") * col("sx")), 6).as("gini"))
      },
      Some("""WITH per AS (SELECT user_id,
                                  sum(CAST(round(value * 100) AS BIGINT))
                                    AS rev_c
                           FROM events WHERE event_type = 'purchase'
                           GROUP BY 1),
                   hist AS (SELECT rev_c, count(*) AS cnt
                            FROM per GROUP BY 1),
                   cum AS (SELECT rev_c, cnt,
                             CAST(coalesce(sum(cnt) OVER (
                               ORDER BY rev_c ROWS BETWEEN UNBOUNDED
                               PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS k
                           FROM hist),
                   g AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_users,
                                CAST(sum(rev_c * cnt) AS BIGINT) AS sx,
                                CAST(sum(rev_c * (cnt * k +
                                  (cnt * (cnt + 1)) // 2)) AS BIGINT) AS six
                         FROM cum)
              SELECT n_users,
                     round(CAST(sx AS DOUBLE) / 100, 2) AS total_rev_d,
                     round(CAST(2 * six - (n_users + 1) * sx AS DOUBLE) /
                           (n_users * sx), 6) AS gini
              FROM g""")),

    QueryDef(
      "q_pareto_revenue",
      (s, d) => {
        val per = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(sum(round(col("value") * 100).cast("long")).as("rev_c"))
        val cut = graft.operators.Percentiles.exact(
          per.withColumn("g", lit(1)), Seq("g"), Seq(("p90", "rev_c", 0.9)))
          .select(round(col("p90"), 4).as("p90"))
        per.crossJoin(broadcast(cut))
          .agg(
            count(lit(1)).as("n_users"),
            sum(when(col("rev_c") >= col("p90"), 1L).otherwise(0L)).as("n_top"),
            round(sum(when(col("rev_c") >= col("p90"), col("rev_c"))
              .otherwise(0L)).cast("double") / sum("rev_c"), 6).as("top_rev_share"),
            round(first("p90") / 100, 2).as("cut_rev"))
      },
      Some("""WITH per AS (SELECT user_id,
                                  sum(CAST(round(value * 100) AS BIGINT)) AS rev_c
                           FROM events WHERE event_type = 'purchase'
                           GROUP BY 1),
                   cut AS (SELECT round(quantile_cont(rev_c, 0.9), 4) AS p90
                           FROM per)
              SELECT count(*) AS n_users,
                     CAST(sum(CASE WHEN rev_c >= p90 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_top,
                     round(CAST(sum(CASE WHEN rev_c >= p90 THEN rev_c ELSE 0 END)
                                AS DOUBLE) / sum(rev_c), 6) AS top_rev_share,
                     round(any_value(p90) / 100, 2) AS cut_rev
              FROM per, cut""")),

    // TIME-DECAYED customer value (recency-weighted LTV — the ranking a
    // growth dashboard uses where plain revenue overweights long-churned
    // spenders): each purchase decays by half per 7-day age bucket,
    // capped at 2⁻¹⁰. The weights are EXACT negative powers of two and
    // amounts quantize to integer cents, so every decayed term — and
    // therefore the sum, in ANY accumulation order — is an exact multiple
    // of 2⁻¹⁰ cents: bit-identical across engines and partitionings
    // with no rounding trick needed. The single-row corpus max-day
    // broadcasts (scalar-N pattern); everything else is one scan and one
    // per-user rollup.
    QueryDef(
      "q_ltv_decay",
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type") === "purchase" && col("user_id") < 50)
          .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
            round(col("value") * 100).cast("long").as("c"))
        val hi = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .agg(max(date_trunc("day", col("ts"))).as("hi"))
        ev.crossJoin(broadcast(hi))
          .withColumn("k", least(floor(datediff(col("hi"), col("day")) / 7),
            lit(10)).cast("int"))
          .withColumn("dc", col("c").cast("double") * pow(lit(0.5), col("k")))
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_purchases"),
            round(sum("c") / 100.0, 2).as("revenue"),
            round(sum("dc") / 100.0, 2).as("ltv_decayed"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, date_trunc('day', ts) AS day,
                                CAST(round(value * 100) AS BIGINT) AS c
                         FROM events WHERE event_type = 'purchase'),
                   hi AS (SELECT max(day) AS hi FROM e),
                   w AS (SELECT user_id, c,
                                c * power(0.5, least(
                                  date_diff('day', day, hi.hi) // 7, 10)) AS dc
                         FROM e, hi WHERE user_id < 50)
              SELECT user_id, count(*) AS n_purchases,
                     round(sum(c) / 100.0, 2) AS revenue,
                     round(sum(dc) / 100.0, 2) AS ltv_decayed
              FROM w GROUP BY 1 ORDER BY user_id""")),

    // KAPLAN-MEIER life table for time-to-first-purchase — survival
    // analysis, the duration family the funnel/retention queries lack
    // (retention asks "active at +k?", KM asks "how long UNTIL
    // conversion, honestly accounting users we stopped observing").
    // Subjects enter at their first event day; event = first purchase
    // (duration in days), no purchase = CENSORED at last activity.
    // The life table rides the DURATION DICTIONARY (≤ observation span
    // rows): n_risk is a reverse cumulative count (exact longs), hazard
    // d/n one IEEE division per row, and the KM survival estimate is the
    // cumulative Π(1 − d/n) computed as exp(Σ ln(·)) over the ordered
    // dictionary — the JSD/MI transcendental precedent, round(6)
    // absorbing ulp drift; every row keeps its exact integer components
    // (n_risk, d, c) so the float column is auditable from the same row.
    QueryDef(
      "q_survival_km",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
            col("event_type"))
        val per = e.groupBy("user_id").agg(
          min("day").as("d0"), max("day").as("dl"),
          min(when(col("event_type") === "purchase", col("day"))).as("dp"))
        val durs = per.select(
          when(col("dp").isNotNull, datediff(col("dp"), col("d0")))
            .otherwise(datediff(col("dl"), col("d0"))).as("t"),
          col("dp").isNotNull.cast("long").as("observed"))
        val tab = durs.groupBy("t").agg(
          sum("observed").as("d"),
          sum(lit(1L) - col("observed")).as("c"))
        val w = Window.orderBy(asc("t"))
        val risk = tab
          .withColumn("ahead", sum(col("d") + col("c"))
            .over(w.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("n_risk",
            sum(col("d") + col("c")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
              - coalesce(col("ahead"), lit(0L)))
        risk
          // the terminal duration can have n_risk == d (everyone still at
          // risk converts there): survival is exactly 0, and ln(0) must
          // not be evaluated — null it and override the output row
          .withColumn("lnr", when(col("n_risk") > col("d"),
            log((col("n_risk") - col("d")).cast("double") / col("n_risk"))))
          .withColumn("km",
            exp(sum("lnr").over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
          .select(col("t"), col("n_risk"), col("d"), col("c"),
            round(col("d").cast("double") / col("n_risk"), 6).as("hazard_d"),
            when(col("n_risk") === col("d"), lit(0.0))
              .otherwise(round(col("km"), 6) + lit(0.0)).as("survival_d"))
          .orderBy("t")
      },
      Some("""WITH e AS (SELECT user_id, date_trunc('day', ts) AS day,
                                event_type
                         FROM events),
                   per AS (SELECT user_id, min(day) AS d0, max(day) AS dl,
                                  min(CASE WHEN event_type = 'purchase'
                                           THEN day END) AS dp
                           FROM e GROUP BY 1),
                   durs AS (SELECT CASE WHEN dp IS NOT NULL
                                        THEN date_diff('day', d0, dp)
                                        ELSE date_diff('day', d0, dl)
                                   END AS t,
                                   CASE WHEN dp IS NOT NULL
                                        THEN 1 ELSE 0 END AS observed
                            FROM per),
                   tab AS (SELECT t, CAST(sum(observed) AS BIGINT) AS d,
                                  CAST(sum(1 - observed) AS BIGINT) AS c
                           FROM durs GROUP BY 1),
                   risk AS (SELECT t, d, c,
                              CAST(sum(d + c) OVER () AS BIGINT) -
                              CAST(coalesce(sum(d + c) OVER (
                                ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
                            FROM tab),
                   km AS (SELECT t, n_risk, d, c,
                            exp(sum(CASE WHEN n_risk > d THEN
                                  ln(CAST(n_risk - d AS DOUBLE) / n_risk)
                                END)
                                OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                                      PRECEDING AND CURRENT ROW)) AS km
                          FROM risk)
              SELECT t, n_risk, d, c,
                     round(CAST(d AS DOUBLE) / n_risk, 6) AS hazard_d,
                     CASE WHEN n_risk = d THEN 0.0
                          ELSE round(km, 6) + 0 END AS survival_d
              FROM km ORDER BY t""")),

    // RANKING EVALUATION (MRR / nDCG@5 / P@5 / recall@5) with a TEMPORAL
    // HOLDOUT — the recommender/retrieval eval loop: rank each customer's
    // top-5 parts from pre-1999 purchase counts, judge against what they
    // actually bought from 1999 on. Two scale decisions: (1) the per-
    // customer ranking uses the bounded-heap top_k_by aggregate — the
    // group key is CUSTOMER (unbounded cardinality), exactly where a rank
    // window would funnel every (cust, item) rollup row through one
    // reducer per customer; (2) DCG runs on an INTEGER micro-unit grid —
    // the 1/log2(r+1) weights are shared 1e-6-scaled LONG literals, so
    // per-user DCG is an order-invariant integer sum and log2 never
    // executes at query time (runtime log2 is not correctly-rounded in
    // either engine; a shared literal is bit-identical by construction).
    // Every per-user metric is exact-int arithmetic + ONE IEEE division;
    // the corpus averages sum micro-unit longs (order-safe) and divide
    // once. Ties in the run break (count desc, item asc) on both sides.
    QueryDef(
      "q_rank_eval",
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey").as("cust"), col("o_orderdate"))
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey").as("item"))
        val oi = li.join(o, col("l_orderkey") === col("o_orderkey"))
        val train = oi.filter(col("o_orderdate") < lit("1999-01-01"))
          .groupBy("cust", "item").agg(count(lit(1)).as("cnt"))
        val run = train.groupBy("cust")
          .agg(graft.functions.VectorFns.topKBy(
            col("cnt").cast("double"), col("item"), 5).as("hits"))
          .select(col("cust"), posexplode(col("hits")).as(Seq("pos", "hit")))
          .select(col("cust"), (col("pos") + 1).as("rnk"),
            col("hit.cand_id").as("item"))
        val rel = oi.filter(col("o_orderdate") >= lit("1999-01-01"))
          .select("cust", "item").distinct()
        val nrel = rel.groupBy("cust").agg(count(lit(1)).as("n_rel"))
        // 1e6-scaled 1/log2(r+1) weights and their prefix sums (IDCG)
        val wMicros = typedlit(Seq(1000000L, 630930L, 500000L, 430677L, 386853L))
        val idcgMicros = typedlit(Seq(1000000L, 1630930L, 2130930L, 2561607L, 2948460L))
        val perUser = run
          .join(rel.withColumn("hitf", lit(1L)), Seq("cust", "item"), "left")
          .join(nrel, Seq("cust")) // inner: judged customers only
          .groupBy("cust", "n_rel")
          .agg(
            sum(coalesce(col("hitf"), lit(0L))).as("n_hits"),
            min(when(col("hitf") === 1L, col("rnk"))).as("first_rel"),
            sum(when(col("hitf") === 1L,
              element_at(wMicros, col("rnk").cast("int"))).otherwise(0L))
              .as("dcg_micros"))
          .select(
            // micro-unit per-user metrics: exact longs from one division each
            round(when(col("first_rel").isNull, lit(0.0))
              .otherwise(lit(1000000.0) / col("first_rel"))).cast("long").as("mrr_u"),
            (col("n_hits") * 200000L).as("p5_u"),
            round(col("n_hits") * lit(1000000.0) / col("n_rel")).cast("long").as("rec_u"),
            round(col("dcg_micros") * lit(1000000.0) /
              element_at(idcgMicros, least(col("n_rel"), lit(5L)).cast("int")))
              .cast("long").as("ndcg_u"))
        perUser.agg(
          count(lit(1)).as("n_users"),
          round(sum("mrr_u") / (count(lit(1)) * 1000000.0), 4).as("mrr"),
          round(sum("p5_u") / (count(lit(1)) * 1000000.0), 4).as("p_at_5"),
          round(sum("rec_u") / (count(lit(1)) * 1000000.0), 4).as("recall_at_5"),
          round(sum("ndcg_u") / (count(lit(1)) * 1000000.0), 4).as("ndcg_at_5"))
      },
      Some("""WITH oi AS (SELECT o_custkey AS cust, l_partkey AS item, o_orderdate
                          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
                   train AS (SELECT cust, item, count(*) AS cnt FROM oi
                             WHERE o_orderdate < TIMESTAMP '1999-01-01'
                             GROUP BY 1, 2),
                   run AS (SELECT cust, item,
                                  row_number() OVER (PARTITION BY cust
                                                     ORDER BY cnt DESC, item) AS rnk
                           FROM train QUALIFY rnk <= 5),
                   rel AS (SELECT DISTINCT cust, item FROM oi
                           WHERE o_orderdate >= TIMESTAMP '1999-01-01'),
                   nrel AS (SELECT cust, count(*) AS n_rel FROM rel GROUP BY 1),
                   j AS (SELECT r.cust, r.rnk,
                                CASE WHEN rel.item IS NOT NULL THEN 1 ELSE 0 END AS hitf
                         FROM run r LEFT JOIN rel
                           ON r.cust = rel.cust AND r.item = rel.item),
                   pu AS (SELECT j.cust, n.n_rel,
                                 CAST(sum(hitf) AS BIGINT) AS n_hits,
                                 min(CASE WHEN hitf = 1 THEN rnk END) AS first_rel,
                                 CAST(sum(CASE WHEN hitf = 1 THEN
                                        CASE rnk WHEN 1 THEN 1000000 WHEN 2 THEN 630930
                                                 WHEN 3 THEN 500000 WHEN 4 THEN 430677
                                                 ELSE 386853 END
                                      ELSE 0 END) AS BIGINT) AS dcg_micros
                          FROM j JOIN nrel n ON j.cust = n.cust
                          GROUP BY 1, 2),
                   m AS (SELECT
                           CAST(round(CASE WHEN first_rel IS NULL THEN 0.0
                                      ELSE 1000000.0 / first_rel END) AS BIGINT) AS mrr_u,
                           n_hits * 200000 AS p5_u,
                           CAST(round(n_hits * 1000000.0 / n_rel) AS BIGINT) AS rec_u,
                           CAST(round(dcg_micros * 1000000.0 /
                                  CASE WHEN n_rel >= 5 THEN 2948460
                                       WHEN n_rel = 4 THEN 2561607
                                       WHEN n_rel = 3 THEN 2130930
                                       WHEN n_rel = 2 THEN 1630930
                                       ELSE 1000000 END) AS BIGINT) AS ndcg_u
                         FROM pu)
              SELECT count(*) AS n_users,
                     round(CAST(sum(mrr_u) AS BIGINT) / (count(*) * 1000000.0), 4) AS mrr,
                     round(CAST(sum(p5_u) AS BIGINT) / (count(*) * 1000000.0), 4) AS p_at_5,
                     round(CAST(sum(rec_u) AS BIGINT) / (count(*) * 1000000.0), 4) AS recall_at_5,
                     round(CAST(sum(ndcg_u) AS BIGINT) / (count(*) * 1000000.0), 4) AS ndcg_at_5
              FROM m""")),

    // COVARIATE BALANCE CHECK (standardized mean difference) — the
    // pre-experiment diagnostic next to q_srm_check: for each pre-period
    // covariate (clicks, views, spend cents per user) and the
    // deterministic 50/50 assignment (user_id % 2), SMD =
    // (mean_t − mean_c) / sqrt((var_t + var_c)/2); |SMD| > 0.1 is the
    // standard imbalance flag. One per-user rollup (exact longs), a
    // 3-way stack to (covariate, arm) cells, and scalar math on the
    // 6-cell dictionary — sums are integer-exact so both engines divide
    // identical numbers (class-c estimator output at s=6).
    QueryDef(
      "q_balance_check",
      (s, d) => {
        val per = Tables.events(s, d)
          .groupBy("user_id")
          .agg(
            sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicks"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("views"),
            sum(when(col("event_type") === "purchase",
              round(col("value") * 100).cast("long")).otherwise(0L)).as("spend_c"))
          .withColumn("arm", (col("user_id") % 2).cast("int"))
        val long = per.select(col("arm"),
          expr("stack(3, 'clicks', clicks, 'views', views, 'spend_c', spend_c)")
            .as(Seq("covariate", "v")))
        val st = long.groupBy("covariate", "arm").agg(
          count(lit(1)).as("n"), sum("v").as("sv"),
          sum(col("v") * col("v")).as("svv"))
        def pick(a: Int, c: String) = max(when(col("arm") === a, col(c)))
        val w = st.groupBy("covariate").agg(
          pick(0, "n").as("n0"), pick(0, "sv").as("s0"), pick(0, "svv").as("ss0"),
          pick(1, "n").as("n1"), pick(1, "sv").as("s1"), pick(1, "svv").as("ss1"))
        def D(c: String) = col(c).cast("double")
        val m0 = D("s0") / D("n0")
        val m1 = D("s1") / D("n1")
        val v0 = (D("ss0") - D("s0") * D("s0") / D("n0")) / (D("n0") - 1)
        val v1 = (D("ss1") - D("s1") * D("s1") / D("n1")) / (D("n1") - 1)
        w.select(col("covariate"), col("n0"), col("n1"),
            round(m0, 4).as("mean_ctl"), round(m1, 4).as("mean_trt"),
            round((m1 - m0) / sqrt((v0 + v1) / 2), 6).as("smd"))
          .orderBy("covariate")
      },
      Some("""WITH per AS (SELECT user_id,
                     CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
                     CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
                     CAST(sum(CASE WHEN event_type = 'purchase'
                                   THEN CAST(round(value * 100) AS BIGINT)
                                   ELSE 0 END) AS BIGINT) AS spend_c
              FROM events GROUP BY 1),
                   lg AS (SELECT CAST(user_id % 2 AS INT) AS arm, 'clicks' AS covariate, clicks AS v FROM per
                          UNION ALL SELECT CAST(user_id % 2 AS INT), 'views', views FROM per
                          UNION ALL SELECT CAST(user_id % 2 AS INT), 'spend_c', spend_c FROM per),
                   st AS (SELECT covariate, arm, CAST(count(*) AS BIGINT) AS n,
                                 CAST(sum(v) AS BIGINT) AS sv,
                                 CAST(sum(v * v) AS BIGINT) AS svv
                          FROM lg GROUP BY 1, 2),
                   w AS (SELECT covariate,
                                max(CASE WHEN arm = 0 THEN n END) AS n0,
                                max(CASE WHEN arm = 0 THEN sv END) AS s0,
                                max(CASE WHEN arm = 0 THEN svv END) AS ss0,
                                max(CASE WHEN arm = 1 THEN n END) AS n1,
                                max(CASE WHEN arm = 1 THEN sv END) AS s1,
                                max(CASE WHEN arm = 1 THEN svv END) AS ss1
                         FROM st GROUP BY 1),
                   m AS (SELECT covariate, n0, n1,
                                CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m0,
                                CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
                                (CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                                  / (CAST(n0 AS DOUBLE) - 1) AS v0,
                                (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                                  / (CAST(n1 AS DOUBLE) - 1) AS v1
                         FROM w)
              SELECT covariate, n0, n1,
                     round(m0, 4) AS mean_ctl, round(m1, 4) AS mean_trt,
                     round((m1 - m0) / sqrt((v0 + v1) / 2), 6) AS smd
              FROM m ORDER BY covariate""")),

    // MINIMUM DETECTABLE EFFECT — the power-analysis planning row every
    // experimentation platform serves before a test launches: per metric
    // stream (event type), the smallest absolute/relative lift a 50/50
    // split of the observed population detects at α = 0.05 (two-sided)
    // and 80% power: MDE = (z_{0.975} + z_{0.8}) · sqrt(2·s²/(n/2)).
    // Values quantize to cents first, so n/Σx/Σx² are EXACT longs and
    // both engines run identical closed-form scalar math (class c, s=6);
    // the z constants are hard-coded identically on both sides.
    QueryDef(
      "q_mde",
      (s, d) => {
        val g = Tables.events(s, d)
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("vc"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("vc").as("sx"),
            sum(col("vc") * col("vc")).as("sxx"))
        def D(c: String) = col(c).cast("double")
        val mean = D("sx") / D("n")
        val varS = (D("sxx") - D("sx") * D("sx") / D("n")) / (D("n") - 1)
        val nArm = floor(col("n") / 2).cast("double")
        val mdeC = lit(1.959964 + 0.841621) * sqrt(lit(2.0) * varS / nArm)
        g.select(col("event_type"), col("n"),
            round(mean / 100, 4).as("mean_value"),
            round(mdeC / 100, 4).as("mde_abs"),
            round(mdeC / mean, 6).as("mde_rel"))
          .orderBy("event_type")
      },
      Some("""WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sx,
                                CAST(sum(CAST(round(value * 100) AS BIGINT)
                                         * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sxx
                         FROM events GROUP BY 1),
                   m AS (SELECT event_type, n,
                                CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
                                (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                                  / (CAST(n AS DOUBLE) - 1) AS vs,
                                CAST(floor(n / 2) AS DOUBLE) AS n_arm
                         FROM g),
                   e AS (SELECT event_type, n, mean,
                                (1.959964 + 0.841621) * sqrt(2.0 * vs / n_arm) AS mde_c
                         FROM m)
              SELECT event_type, n,
                     round(mean / 100, 4) AS mean_value,
                     round(mde_c / 100, 4) AS mde_abs,
                     round(mde_c / mean, 6) AS mde_rel
              FROM e ORDER BY event_type"""))
  )
}
