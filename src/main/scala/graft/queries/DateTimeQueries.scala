package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** §B datetime functions — Pinot's DATETRUNC / DATETIMECONVERT and the
  * timestamp-index fast path (reference:
  * /root/reference/basics/indexing/timestamp-index.md — Pinot materializes
  * truncated-granularity columns; here the truncation is a codegen'd
  * expression on the scan, and at 100 TB the same shape rides on
  * time-partitioned layout for partition pruning).
  */
object DateTimeQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_datetrunc",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_val"))
          .withColumn("week", date_trunc("week", col("day")))
          .orderBy("day"),
      Some("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS cnt,
                     round(sum(value), 2) AS sum_val,
                     CAST(date_trunc('week', date_trunc('day', ts)) AS TIMESTAMP) AS week
              FROM events GROUP BY date_trunc('day', ts) ORDER BY day""")),

    // DATETIMECONVERT('1:MILLISECONDS:EPOCH' -> '15:MINUTES' buckets):
    // epoch-millis floor-division bucketing, converted back to a timestamp.
    QueryDef(
      "q_datetimeconvert",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(expr("(unix_millis(ts) div 900000) * 900000").as("bucket_ms"))
          .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_val"))
          .withColumn("bucket_ts", expr("timestamp_millis(bucket_ms)"))
          .orderBy("bucket_ms"),
      Some("""SELECT (epoch_ms(ts) // 900000) * 900000 AS bucket_ms,
                     count(*) AS cnt, round(sum(value), 2) AS sum_val,
                     make_timestamp(((epoch_ms(ts) // 900000) * 900000) * 1000) AS bucket_ts
              FROM events GROUP BY 1 ORDER BY bucket_ms""")),

    // SIMPLE_DATE_FORMAT conversions (dateTimeFieldSpec format strings —
    // reference: /root/reference/configuration-reference/schema.md:70).
    QueryDef(
      "q_datetime_format",
      (s, d) =>
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyyMMdd").as("ymd"),
            date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
            year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"),
            dayofmonth(col("o_orderdate")).as("dom"),
            quarter(col("o_orderdate")).as("q"))
          .orderBy("o_orderkey")
          .limit(500),
      Some("""SELECT o_orderkey,
                     strftime(o_orderdate, '%Y%m%d') AS ymd,
                     strftime(o_orderdate, '%Y-%m') AS ym,
                     CAST(year(o_orderdate) AS INT) AS y,
                     CAST(month(o_orderdate) AS INT) AS m,
                     CAST(day(o_orderdate) AS INT) AS dom,
                     CAST(quarter(o_orderdate) AS INT) AS q
              FROM orders ORDER BY o_orderkey LIMIT 500""")),

    // EXTRACT field family (Pinot scalar time functions hour / dayOfWeek /
    // dayOfYear / week / quarter). Normalization: Spark's dayofweek is
    // 1=Sunday, the oracle's dow is 0=Sunday — the query emits the 0-based
    // form; week is ISO on both sides.
    QueryDef(
      "q_extract",
      (s, d) =>
        Tables.events(s, d)
          .filter(col("event_id") < 500)
          .select(
            col("event_id"),
            hour(col("ts")).as("h"),
            (dayofweek(col("ts")) - 1).as("dow"),
            dayofyear(col("ts")).as("doy"),
            weekofyear(col("ts")).as("wk"),
            quarter(col("ts")).as("q"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
                     CAST(extract(hour FROM ts) AS INT) AS h,
                     CAST(extract(dow FROM ts) AS INT) AS dow,
                     CAST(extract(doy FROM ts) AS INT) AS doy,
                     CAST(extract(week FROM ts) AS INT) AS wk,
                     CAST(extract(quarter FROM ts) AS INT) AS q
              FROM events WHERE event_id < 500 ORDER BY event_id""")),

    // Timezone-aware DATETIMECONVERT (Pinot's tz-suffixed output formats):
    // UTC instants bucketed by AMERICA/NEW_YORK local hour-of-day — the
    // "traffic by local hour" dashboard query. The conversion is a codegen'd
    // expression; DST is exercised (the fixture spans both regimes iff the
    // generator does — either way both sides apply the same IANA rules).
    QueryDef(
      "q_datetime_tz",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(hour(from_utc_timestamp(col("ts"), "America/New_York")).as("local_hour"))
          .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_val"))
          .orderBy("local_hour"),
      Some("""SELECT CAST(extract(hour FROM
                       timezone('America/New_York', timezone('UTC', ts))) AS INT) AS local_hour,
                     count(*) AS cnt, round(sum(value), 2) AS sum_val
              FROM events GROUP BY 1 ORDER BY local_hour""")),

    QueryDef(
      "q_timeseries",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(
            count(lit(1)).as("cnt"),
            round(sum("value"), 2).as("sum_val"),
            countDistinct(col("user_id")).as("users"))
          .orderBy("hour", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
                     count(*) AS cnt, round(sum(value), 2) AS sum_val,
                     count(DISTINCT user_id) AS users
              FROM events GROUP BY 1, 2 ORDER BY hour, event_type""")),

    // DAILY PERCENTILE SERIES — the observability staple (p50/p95/p99
    // latency per day, the chart every SLO dashboard renders): one
    // day-keyed DISCRETE percentile pass over the dictionary-histogram
    // operator — ranks SELECT actual data values, no interpolation
    // arithmetic, so no cent-midpoint can sit on a rounding boundary
    // (interpolated daily p95s DO land on exact half-cents; the first cut
    // of this query failed the gate that way). At 100 TB the day×metric
    // dictionary is what crosses the shuffle; q_kll_cube is the
    // sketch-served form of the same series.
    QueryDef(
      "q_percentile_daily",
      (s, d) =>
        graft.operators.Percentiles.discrete(
          Tables.events(s, d)
            .withColumn("day", date_trunc("day", col("ts"))),
          Seq("day"),
          Seq(("p50", "value", 0.5),
            ("p95", "value", 0.95),
            ("p99", "value", 0.99)))
          .select(col("day"),
            round(col("p50"), 2).as("p50"),
            round(col("p95"), 2).as("p95"),
            round(col("p99"), 2).as("p99"))
          .orderBy("day"),
      Some("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                     round(quantile_disc(value, 0.5), 2) AS p50,
                     round(quantile_disc(value, 0.95), 2) AS p95,
                     round(quantile_disc(value, 0.99), 2) AS p99
              FROM events GROUP BY 1 ORDER BY day""")),

    // EWMA smoothing per series — the timeseries-engine smoothing shape
    // (Pinot ships a PromQL-ish timeseries engine; EWMA is its canonical
    // stateful transform). Inherently sequential WITHIN a series and
    // parallel ACROSS series: state is one ordered per-user value list
    // (series-bounded, the sessionize shape), the fold is a codegen'd
    // array `aggregate` — identical left-fold arithmetic to the oracle's
    // `list_reduce` (both seed from the first element), so the doubles
    // match bit-for-bit before rounding.
    QueryDef(
      "q_ewma",
      (s, d) => {
        val alpha = 0.3
        val seq = Tables.events(s, d)
          .filter(col("user_id") < 50)
          .groupBy("user_id")
          .agg(sort_array(collect_list(struct(
            col("ts"), col("event_id"), col("value")))).as("seq"))
          .withColumn("vals", transform(col("seq"), x => x.getField("value")))
        seq.select(
            col("user_id"),
            size(col("vals")).as("n"),
            (round(element_at(col("vals"), -1), 4) + lit(0.0)).as("last_v"),
            (round(
              aggregate(
                slice(col("vals"), lit(2), greatest(size(col("vals")) - 1, lit(0))),
                element_at(col("vals"), 1),
                (acc, x) => lit(alpha) * x + lit(1 - alpha) * acc),
              4) + lit(0.0)).as("ewma"))
          .orderBy("user_id")
      },
      Some("""WITH seq AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vals
                           FROM events WHERE user_id < 50 GROUP BY 1)
              SELECT user_id, CAST(len(vals) AS INT) AS n,
                     round(vals[-1], 4) + 0 AS last_v,
                     round(list_reduce(vals, (acc, x) -> 0.3*x + 0.7*acc), 4) + 0 AS ewma
              FROM seq ORDER BY user_id""")),

    // TIMESTAMP-index serving path (timestamp-index.md: Pinot rewrites
    // datetrunc('DAY', ts) onto the pre-generated $ts$DAY column): the
    // query writes events once per session through SegmentWriter with a
    // derived ts_day column, then runs the SAME date_trunc group-by a
    // user would write — plans.TimestampIndexRewrite transparently swaps
    // the per-row truncation for the stored column (TimestampIndexSpec
    // asserts the plan shape and filter pushdown; here the DuckDB oracle
    // hash-pins that the rewritten path returns exactly the raw-events
    // answer). At 100 TB the derived column carries row-group min/max
    // stats — the reference's "range index on every granularity".
    QueryDef(
      "q_timestamp_rewrite",
      (s, d) =>
        s.read.parquet(tsSegment(s, d))
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_val"))
          .orderBy("day"),
      Some("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS cnt,
                     round(sum(value), 2) AS sum_val
              FROM events GROUP BY 1 ORDER BY day""")),

    // Week-over-week PERCENT CHANGE — the delta column every trend
    // dashboard renders next to a timeseries: weekly per-type revenue,
    // each week compared to the type's previous week via one lag window
    // over the (type, week) DICTIONARY (the corpus-sized work is the
    // weekly rollup; the window input is bounded by types × weeks).
    // Weekly sums round to 2 decimals BEFORE the ratio on both engines,
    // so the derived percentage divides identical numbers.
    QueryDef(
      "q_percent_change",
      (s, d) => {
        val wk = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("week", col("ts")).as("week"))
          .agg(round(sum("value"), 2).as("rev"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("week")
        wk.withColumn("prev", lag("rev", 1).over(w))
          .filter(col("prev").isNotNull && col("prev") =!= 0.0)
          .select(col("event_type"), col("week"), col("rev"),
            round((col("rev") - col("prev")) / col("prev") * 100, 4)
              .as("pct_change"))
          .orderBy("event_type", "week")
      },
      Some("""WITH wk AS (SELECT event_type,
                                 CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
                                 round(sum(value), 2) AS rev
                          FROM events GROUP BY 1, 2),
                   l AS (SELECT event_type, week, rev,
                                lag(rev, 1) OVER (PARTITION BY event_type
                                                  ORDER BY week) AS prev
                         FROM wk)
              SELECT event_type, week, rev,
                     round((rev - prev) / prev * 100, 4) AS pct_change
              FROM l WHERE prev IS NOT NULL AND prev <> 0
              ORDER BY event_type, week""")),

    // Day-of-week × hour ACTIVITY HEATMAP — the usage-rhythm dashboard
    // tile: one scan-local (dow, hour) projection + a ≤168-cell rollup
    // with exact counts; share divides by the scalar total (broadcast).
    QueryDef(
      "q_dow_hour_heatmap",
      (s, d) => {
        val cells = Tables.events(s, d)
          .select((dayofweek(col("ts")) - 1).as("dow"),
            hour(col("ts")).as("hr"))
          .groupBy("dow", "hr")
          .agg(count(lit(1)).as("n_events"))
        val tot = cells.agg(sum("n_events").as("tot"))
        cells.crossJoin(broadcast(tot))
          .select(col("dow"), col("hr"), col("n_events"),
            round(col("n_events") / col("tot"), 6).as("share"))
          .orderBy("dow", "hr")
      },
      Some("""WITH c AS (SELECT CAST(date_part('dow', ts) AS INT) AS dow,
                                CAST(date_part('hour', ts) AS INT) AS hr,
                                count(*) AS n_events
                         FROM events GROUP BY 1, 2),
                   t AS (SELECT sum(n_events) AS tot FROM c)
              SELECT dow, hr, n_events,
                     round(CAST(n_events AS DOUBLE) / tot, 6) AS share
              FROM c, t ORDER BY dow, hr""")),

    // SEASONAL DECOMPOSITION (trend + day-of-week seasonal + residual —
    // the classic additive split a timeseries dashboard overlays): daily
    // revenue in INTEGER CENTS, centered 7-day trend kept as the exact
    // 7-day SUM (so detrended = 7·rev − trend7 stays integer — no 1/7
    // division ever happens), day-of-week seasonal as the average of
    // those integers (exact integer sum, ONE deterministic division,
    // rounded identically). Every window runs over the DAY DICTIONARY
    // (a few thousand rows for years of data), never raw events — the
    // corpus-sized work is the daily rollup (PlanLint exemption
    // documents the sequential-by-definition time axis).
    QueryDef(
      "q_seasonal_decompose",
      (s, d) => {
        // Per-row cents BEFORE the sum: round(double-SUM) is boundary-
        // fragile under accumulation reordering (r8 driver hash-FAIL);
        // summing per-row longs is integer-exact under ANY order.
        val day = Tables.events(s, d)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("rev_c"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("day")
        val trended = day
          .withColumn("trend7_c", sum("rev_c").over(w.rowsBetween(-3, 3)))
          .withColumn("n7", count(lit(1)).over(w.rowsBetween(-3, 3)))
          .filter(col("n7") === 7)
          .withColumn("det_c", col("rev_c") * 7 - col("trend7_c"))
          .withColumn("dow", dayofweek(col("day")) - 1)
        // explicit exact-long-sum / count (not avg) so both engines
        // perform the identical single IEEE division before rounding
        val seasonal = trended.groupBy("dow")
          .agg(round(sum("det_c").cast("double") / count(lit(1)), 4).as("seasonal_c"))
        trended.join(broadcast(seasonal), "dow")
          .select(col("day"), col("rev_c"), col("trend7_c"),
            col("det_c"), col("dow"),
            col("seasonal_c"),
            round(col("det_c") - col("seasonal_c"), 4).as("resid_c"))
          .orderBy("day")
      },
      Some("""WITH day AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                                  sum(CAST(round(value * 100) AS BIGINT)) AS rev_c
                           FROM events GROUP BY 1),
                   t AS (SELECT day, rev_c,
                                sum(rev_c) OVER (ORDER BY day
                                                 ROWS BETWEEN 3 PRECEDING
                                                 AND 3 FOLLOWING) AS trend7_c,
                                count(*) OVER (ORDER BY day
                                               ROWS BETWEEN 3 PRECEDING
                                               AND 3 FOLLOWING) AS n7
                         FROM day),
                   f AS (SELECT day, rev_c, trend7_c,
                                rev_c * 7 - trend7_c AS det_c,
                                date_part('dow', day) AS dow
                         FROM t WHERE n7 = 7),
                   se AS (SELECT dow, round(CAST(sum(det_c) AS DOUBLE) / count(*), 4)
                                        AS seasonal_c
                          FROM f GROUP BY 1)
              SELECT day, rev_c, trend7_c, det_c, CAST(f.dow AS INT) AS dow,
                     seasonal_c,
                     round(det_c - seasonal_c, 4) AS resid_c
              FROM f JOIN se ON f.dow = se.dow
              ORDER BY day"""))
  )

  // Session-scoped timestamp-index segment (the in-session analog of the
  // index Pinot materializes next to its segments): events written ONCE
  // per (session, sfDir) with the ts_day derived column, reused across
  // reps/queries.
  private val tsSegCache =
    scala.collection.concurrent.TrieMap[(org.apache.spark.sql.SparkSession, String), String]()
  private def tsSegment(s: org.apache.spark.sql.SparkSession, d: String): String =
    tsSegCache.getOrElseUpdate((s, d), {
      val dir = java.nio.file.Files.createTempDirectory("graft_tsidx_q").toString
      graft.sources.SegmentWriter.write(
        Tables.events(s, d).select("event_id", "user_id", "ts", "value"), dir,
        graft.sources.SegmentWriter.Config(derivedTimeCols = Seq(("ts", "day"))))
      dir
    })
}
