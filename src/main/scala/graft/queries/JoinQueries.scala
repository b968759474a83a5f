package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.{AsOfJoin, RangeJoin}

/** §F joins — Pinot's lookup join (dim-table enrichment) and multi-stage
  * fact-fact joins. Scale posture: dimension tables are `broadcast()`ed
  * (no shuffle of the 100 TB fact side); fact-fact joins shuffle on the
  * join key with AQE handling skew; semi/anti joins never materialize the
  * right side beyond its keys.
  */
object JoinQueries {

  /** q_idset_filter's bloom set, content-keyed by source dir + mtime:
    * the documented ID_SET deployment (IdSet.scala) is build ONCE over
    * the driving query, then reuse across every downstream scan — so the
    * build action must not repeat per query BUILD (BuildLazinessSpec).
    * Driver state is KBs per entry and the key space is the handful of
    * sf dirs a session touches.
    */
  private val idSetCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_lookup_join",
      (s, d) => {
        val c = Tables.customer(s, d)
        val n = broadcast(Tables.nation(s, d))
        val r = broadcast(Tables.region(s, d))
        c.join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(count(lit(1)).as("cnt"), round(sum("c_acctbal"), 2).as("sum_bal"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name, count(*) AS cnt, round(sum(c_acctbal), 2) AS sum_bal
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    QueryDef(
      "q_join_agg",
      (s, d) => {
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")))
          .select("o_orderkey", "o_orderpriority")
        val l = Tables.lineitem(s, d)
          .select("l_orderkey", "l_extendedprice", "l_discount")
        o.join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy("o_orderpriority")
          .agg(
            countDistinct(col("o_orderkey")).as("n_orders"),
            count(lit(1)).as("n_lines"),
            // 1e-4-grid product sums are boundary-capable at 2 dp: per-row
            // exact longs, one identical scalar division on both engines
            round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * 10000).cast("long")) / 10000.0, 2).as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(DISTINCT o_orderkey) AS n_orders,
                     count(*) AS n_lines,
                     round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                               * 10000) AS BIGINT)) AS BIGINT)
                           / 10000.0, 2) AS revenue
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              GROUP BY 1 ORDER BY o_orderpriority""")),

    // OUTER joins (multi-stage engine join types beyond inner/semi/anti):
    // a left-outer customer⋈orders keeps order-less customers with null
    // order columns; the aggregation counts both sides of the null split
    // per segment. One key shuffle (or broadcast when a side is small) —
    // identical plan shape to the inner form.
    QueryDef(
      "q_outer_join",
      (s, d) => {
        val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
        val o = Tables.orders(s, d)
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("spend"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n_customers"),
            sum(when(col("o_custkey").isNull, 1).otherwise(0)).cast("bigint").as("n_inactive"),
            sum(coalesce(col("n_orders"), lit(0L))).cast("bigint").as("n_orders"),
            round(sum(coalesce(col("spend"), lit(0.0))), 2).as("total_spend"))
          .orderBy("c_mktsegment")
      },
      Some("""WITH o AS (SELECT o_custkey, count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS spend
                   FROM orders GROUP BY 1)
              SELECT c_mktsegment,
                     count(*) AS n_customers,
                     CAST(sum(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_inactive,
                     CAST(sum(coalesce(n_orders, 0)) AS BIGINT) AS n_orders,
                     round(sum(coalesce(spend, 0)), 2) AS total_spend
              FROM customer c LEFT JOIN o ON c.c_custkey = o.o_custkey
              GROUP BY 1 ORDER BY c_mktsegment""")),

    QueryDef(
      "q_semi_anti_join",
      (s, d) => {
        val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
        val ok = Tables.orders(s, d).select("o_custkey")
        val anti = c.join(ok, c("c_custkey") === ok("o_custkey"), "left_anti")
          .groupBy("c_mktsegment").agg(count(lit(1)).as("no_orders"))
        val semi = c.join(ok, c("c_custkey") === ok("o_custkey"), "left_semi")
          .groupBy("c_mktsegment").agg(count(lit(1)).as("with_orders"))
        anti.join(semi, Seq("c_mktsegment"), "full_outer")
          .select(
            col("c_mktsegment"),
            coalesce(col("no_orders"), lit(0L)).as("no_orders"),
            coalesce(col("with_orders"), lit(0L)).as("with_orders"))
          .orderBy("c_mktsegment")
      },
      Some("""WITH t AS (SELECT c_mktsegment,
                     EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_o
                     FROM customer)
              SELECT c_mktsegment,
                     CAST(sum(CASE WHEN has_o THEN 0 ELSE 1 END) AS BIGINT) AS no_orders,
                     CAST(sum(CASE WHEN has_o THEN 1 ELSE 0 END) AS BIGINT) AS with_orders
              FROM t GROUP BY 1 ORDER BY c_mktsegment""")),

    // AS-OF join: attribute each click to the user's latest prior (or
    // same-instant) purchase. graft.operators.AsOfJoin composes it as
    // union + carry-forward window — ONE key shuffle, O(1) state per row,
    // never the (left × earlier-rights) pair explosion. Oracle: DuckDB's
    // native ASOF LEFT JOIN.
    QueryDef(
      "q_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("p_event_id"), col("value").as("p_value"))
        AsOfJoin.asof(clicks, purchases, "user_id", "ts", "ts",
            Seq("p_event_id", "p_value"))
          .select(col("event_id"), col("user_id"), col("p_event_id"), col("p_value"))
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id, l.user_id, r.event_id AS p_event_id,
                     r.value AS p_value
              FROM (SELECT * FROM events WHERE event_type = 'click') l
              ASOF LEFT JOIN (
                -- AsOfJoin's deterministic tie rule: among purchases tied
                -- on (user_id, ts) the greatest payload (event_id is the
                -- leading payload field and unique) wins — DuckDB's native
                -- ASOF pick on such ties is arbitrary, so dedupe first
                SELECT user_id, ts, event_id, value FROM (
                  SELECT user_id, ts, event_id, value,
                         row_number() OVER (PARTITION BY user_id, ts
                                            ORDER BY event_id DESC) AS rn
                  FROM events WHERE event_type = 'purchase') WHERE rn = 1) r
                ON l.user_id = r.user_id AND l.ts >= r.ts
              ORDER BY l.event_id""")),

    // ORDER BACKLOG (the TPC-H Q4 shape — order-priority checking): count
    // H1-1996 orders with at least one lineitem shipped more than 60 days
    // after the order date, per priority. The EXISTS becomes a LEFT SEMI
    // join on the order key with the lateness predicate as the join
    // residual — one fact shuffle, each order emitted at most once no
    // matter how many late lineitems it has (a plain inner join + distinct
    // would materialize every late item first). Date arithmetic is
    // timestamp + literal interval on BOTH engines.
    QueryDef(
      "q_order_backlog",
      (s, d) => {
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1996-07-01"))
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
        o.join(li, col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_late_orders"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n_late_orders
              FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1996-07-01'
                AND EXISTS (SELECT 1 FROM lineitem
                            WHERE l_orderkey = o_orderkey
                              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
              GROUP BY 1 ORDER BY o_orderpriority""")),

    // FORWARD as-of join — time-to-NEXT-purchase per click (the
    // conversion-latency dual of q_asof_join's attribution): earliest
    // purchase at-or-after each click per user, via AsOfJoin.asofForward
    // (the same union + carry construction scanned in descending time —
    // one key shuffle, O(1) state per row, no pair explosion). Lag is
    // exact integer MICROSECONDS (unix_micros both sides), so the output
    // is engine-exact with no float anywhere. Oracle: DuckDB native ASOF
    // with the <= comparison (nearest following row).
    QueryDef(
      "q_asof_join_forward",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("p_event_id"), col("ts").as("p_ts"))
        AsOfJoin.asofForward(clicks, purchases, "user_id", "ts", "ts",
            Seq("p_event_id", "p_ts"))
          .select(col("event_id"), col("user_id"), col("p_event_id"),
            (unix_micros(col("p_ts")) - unix_micros(col("ts"))).as("lag_us"))
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id, l.user_id, r.event_id AS p_event_id,
                     CAST(epoch_us(r.ts) - epoch_us(l.ts) AS BIGINT) AS lag_us
              FROM (SELECT * FROM events WHERE event_type = 'click') l
              ASOF LEFT JOIN (
                -- same deterministic tie rule as q_asof_join: greatest
                -- payload per (user_id, ts) — see AsOfJoin.scala
                SELECT user_id, ts, event_id FROM (
                  SELECT user_id, ts, event_id,
                         row_number() OVER (PARTITION BY user_id, ts
                                            ORDER BY event_id DESC) AS rn
                  FROM events WHERE event_type = 'purchase') WHERE rn = 1) r
                ON l.user_id = r.user_id AND l.ts <= r.ts
              ORDER BY l.event_id""")),

    // NEAREST as-of join — the third member of the as-of family: each
    // click matches its temporally CLOSEST purchase in EITHER direction
    // (sensor-alignment / nearest-snapshot semantics; kdb's `aj` nearest
    // variant). Composed from the two audited directional operators —
    // backward carry + forward carry on the same key — then one
    // left-id-keyed join picks the smaller exact integer-microsecond
    // distance, ties to the backward match (same-instant purchases are a
    // 0-distance backward match on both engines). Distances are integer
    // micros end-to-end: no float anywhere, engine-exact.
    QueryDef(
      "q_asof_join_nearest",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("p_event_id"), col("ts").as("p_ts"))
        val back = AsOfJoin.asof(clicks, purchases, "user_id", "ts", "ts",
            Seq("p_event_id", "p_ts"))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("p_event_id").as("b_id"), col("p_ts").as("b_ts"))
        val fwd = AsOfJoin.asofForward(clicks, purchases, "user_id", "ts", "ts",
            Seq("p_event_id", "p_ts"))
          .select(col("event_id"),
            col("p_event_id").as("f_id"), col("p_ts").as("f_ts"))
        back.join(fwd, Seq("event_id"))
          .withColumn("b_dist", unix_micros(col("ts")) - unix_micros(col("b_ts")))
          .withColumn("f_dist", unix_micros(col("f_ts")) - unix_micros(col("ts")))
          .withColumn("pick_b",
            col("b_ts").isNotNull &&
              (col("f_ts").isNull || col("b_dist") <= col("f_dist")))
          .select(col("event_id"), col("user_id"),
            when(col("pick_b"), col("b_id")).otherwise(col("f_id")).as("p_event_id"),
            when(col("pick_b"), col("b_dist")).otherwise(col("f_dist")).as("dist_us"))
          .orderBy("event_id")
      },
      Some("""WITH r AS (SELECT user_id, ts, event_id FROM (
                     SELECT user_id, ts, event_id,
                            row_number() OVER (PARTITION BY user_id, ts
                                               ORDER BY event_id DESC) AS rn
                     FROM events WHERE event_type = 'purchase') WHERE rn = 1),
                   l AS (SELECT event_id, user_id, ts FROM events
                         WHERE event_type = 'click'),
                   b AS (SELECT l.event_id, r.event_id AS b_id, r.ts AS b_ts
                         FROM l ASOF LEFT JOIN r
                           ON l.user_id = r.user_id AND l.ts >= r.ts),
                   f AS (SELECT l.event_id, r.event_id AS f_id, r.ts AS f_ts
                         FROM l ASOF LEFT JOIN r
                           ON l.user_id = r.user_id AND l.ts <= r.ts)
              SELECT l.event_id, l.user_id,
                     CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL OR
                            epoch_us(l.ts) - epoch_us(b_ts)
                              <= epoch_us(f_ts) - epoch_us(l.ts))
                          THEN b_id ELSE f_id END AS p_event_id,
                     CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL OR
                            epoch_us(l.ts) - epoch_us(b_ts)
                              <= epoch_us(f_ts) - epoch_us(l.ts))
                          THEN CAST(epoch_us(l.ts) - epoch_us(b_ts) AS BIGINT)
                          ELSE CAST(epoch_us(f_ts) - epoch_us(l.ts) AS BIGINT)
                     END AS dist_us
              FROM l JOIN b ON l.event_id = b.event_id
              JOIN f ON l.event_id = f.event_id
              ORDER BY l.event_id""")),

    // Interval (range) join with NO shared key: per-customer price-band
    // order statistics via the range-AGGREGATION decomposition (RangeJoin.
    // intervalAggJoin): points pre-aggregate into a bucket dictionary,
    // intervals consume interior buckets' partials WHOLESALE and check
    // points only in their ≤2 edge buckets — the point×interval pair
    // explosion (every point here sits inside ~n·len/domain bands, so
    // pair counts grow with density even when the answer doesn't) never
    // materializes. The band width self-tunes to interval length/density
    // stats. Order values quantize to per-row cents so bucket partials
    // recombine exactly in any decomposition (bit-identical to DuckDB's
    // direct BETWEEN aggregate). No nested-loop anywhere.
    QueryDef(
      "q_range_join",
      (s, d) => {
        val points = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
        val intervals = Tables.customer(s, d)
          .select(col("c_custkey"),
            ((col("c_custkey") * 137) % 400000).cast("double").as("lo"))
          .withColumn("hi", col("lo") + 5000.0)
        RangeJoin.intervalAggJoin(points, intervals,
            "o_totalprice", "lo", "hi", sumCols = Seq("cents"))
          .select(col("c_custkey"), col("n_points").as("n_orders"),
            round(col("sum_cents") / 100.0, 2).as("sum_price"))
          .orderBy("c_custkey")
      },
      Some("""WITH iv AS (SELECT c_custkey,
                     CAST((c_custkey * 137) % 400000 AS DOUBLE) AS lo,
                     CAST((c_custkey * 137) % 400000 AS DOUBLE) + 5000.0 AS hi
                   FROM customer)
              SELECT c_custkey, count(*) AS n_orders,
                     round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                                AS BIGINT) / 100.0, 2) AS sum_price
              FROM iv JOIN orders
                ON o_totalprice BETWEEN lo AND hi
              GROUP BY 1 ORDER BY c_custkey""")),

    // CORRELATED aggregate subquery (the TPC-H Q17 "small-quantity parts"
    // shape — rows compared against THEIR OWN group's aggregate): the
    // multi-stage engine capability Pinot's single-stage SQL lacks.
    // Spark-first decorrelation: the correlated `WHERE l_quantity <
    // 0.2·avg(qty per part)` becomes one per-part aggregate (dictionary-
    // sized) equi-joined back to the fact rows — no per-row subquery
    // execution. Brand filter rides a broadcast semi-join. l_quantity is
    // integer-valued so sum/count per part is exact on both engines (the
    // threshold double is identical), and revenue sums per-row cents.
    QueryDef(
      "q_correlated_agg",
      (s, d) => {
        val pt = Tables.part(s, d)
          .filter(col("p_brand").startsWith("Brand#1"))
          .select("p_partkey")
        val f = Tables.lineitem(s, d)
          .join(broadcast(pt), col("l_partkey") === col("p_partkey"), "left_semi")
          .select(col("l_partkey"), col("l_quantity"),
            round(col("l_extendedprice") * 100).cast("long").as("price_c"))
        val avgq = f.groupBy("l_partkey")
          .agg((sum("l_quantity") / count(lit(1))).as("avg_qty"))
        f.join(avgq, "l_partkey")
          .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
          .agg(count(lit(1)).as("n_small"),
            round(sum("price_c") / 100.0, 2).as("tot_price"))
      },
      Some("""WITH pt AS (SELECT p_partkey FROM part WHERE p_brand LIKE 'Brand#1%'),
                   f AS (SELECT l_partkey, l_quantity,
                                CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
                         FROM lineitem JOIN pt ON l_partkey = p_partkey),
                   a AS (SELECT l_partkey, sum(l_quantity) / count(*) AS avg_qty
                         FROM f GROUP BY 1)
              SELECT count(*) AS n_small,
                     round(CAST(sum(price_c) AS BIGINT) / 100.0, 2) AS tot_price
              FROM f JOIN a USING (l_partkey)
              WHERE l_quantity < 0.2 * avg_qty""")),

    // Fuzzy (edit-distance ≤ 1) self-join via symmetric-delete blocking
    // (SymSpell): {s} ∪ deletes1(s) as equi-join keys — lev(a,b) ≤ 1
    // GUARANTEES a shared key (spec property-checks the claim under
    // arbitrary insert/delete/substitute mutations), then exact
    // `levenshtein` verifies the candidates. Entity-resolution shape at
    // 100 TB: scan-local key generation, bounded deletion-neighborhood
    // buckets, no cartesian node — vs the O(n²) all-pairs edit scan the
    // oracle runs on the (distinct-name) fixture.
    QueryDef(
      "q_fuzzy_join",
      (s, d) =>
        graft.dedup.FuzzyJoin.nearPairs(Tables.part(s, d), "p_name")
          .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
          .orderBy("a_name", "b_name"),
      Some("""WITH n AS (SELECT DISTINCT p_name FROM part)
              SELECT a.p_name AS a_name, b.p_name AS b_name,
                     CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
              FROM n a JOIN n b
                ON a.p_name < b.p_name AND levenshtein(a.p_name, b.p_name) <= 1
              ORDER BY a_name, b_name""")),

    // Pinot ID_SET / IN_ID_SET: build a compact bloom id-set from the
    // driving query (urgent orders), probe it SCAN-LOCALLY on the fact
    // side, then exact-confirm with a semi-join. The bloom never misses a
    // member, so the semi-join sees a superset and the final answer is
    // exactly the plain semi-join's — but at 100 TB the fact rows that
    // fail the probe never enter the join's shuffle at all (the id-set is
    // KBs of plan state vs shuffling ~N fact rows; Spark's own runtime
    // bloom filters do this opportunistically, ID_SET makes it a
    // reusable, paste-able artifact as in Pinot's API). IdSetSpec bounds
    // the fpp and proves the no-false-negative contract.
    QueryDef(
      "q_idset_filter",
      (s, d) => {
        val urgent = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey")
        val set = idSetCache.computeIfAbsent(
          s"$d@${new java.io.File(s"$d/orders.parquet").lastModified()}",
          _ => graft.operators.IdSet.build(
            urgent, "o_orderkey", expectedItems = 100000L, fpp = 0.01))
        Tables.lineitem(s, d)
          .filter(graft.operators.IdSet.in(col("l_orderkey"), set))
          .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
                     round(sum(l_quantity), 2) AS sum_qty
              FROM lineitem
              WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                   WHERE o_orderpriority = '1-URGENT')
              GROUP BY 1 ORDER BY l_returnflag""")),

    // SIX-TABLE STAR JOIN (the TPC-H Q5 shape — local-supplier revenue by
    // nation): the multi-stage join showcase. Plan economics at 100 TB:
    // region/nation/supplier/customer are DIMENSIONS — Catalyst
    // broadcasts them (and AQE re-plans if stats surprise), so the only
    // row-sized shuffle is lineitem⋈orders on orderkey; the
    // c_nationkey = s_nationkey local-supplier predicate rides the
    // broadcast side for free. Revenue accumulates in DECIMAL (exact,
    // order-independent — the q_decimal_agg discipline), so a six-table
    // double-sum can't drift between engines.
    QueryDef(
      "q_star_join",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(
          col("l_orderkey"), col("l_suppkey"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(BigDecimal(1)) - col("l_discount").cast("decimal(18,4)")))
            .as("rev"))
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1998-01-01"))
          .select("o_orderkey", "o_custkey")
        val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
        val su = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
        val n = Tables.nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
        val r = Tables.region(s, d)
          .filter(col("r_name") === "ASIA").select("r_regionkey")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(
            count(lit(1)).as("n_items"),
            sum("rev").cast("decimal(30,6)").cast("string").as("revenue"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, count(*) AS n_items,
                     CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                                   (1 - CAST(l_discount AS DECIMAL(18,4))))
                               AS DECIMAL(30,6)) AS VARCHAR) AS revenue
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
                           AND c_nationkey = s_nationkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA'
                AND o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1998-01-01'
              GROUP BY 1 ORDER BY n_name""")),

    // TOP UNSHIPPED ORDERS (the TPC-H Q3 shape — shipping-backlog
    // triage): revenue of orders taken before the cut whose lineitems
    // ship after it, top 10. Decimal revenue (exact, order-independent);
    // the top-10 is a TakeOrderedAndProject over the aggregated orders —
    // never a global sort; ties break on o_orderkey so the cut is
    // deterministic on both engines.
    QueryDef(
      "q_top_orders",
      (s, d) => {
        val cut = "1998-01-01"
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") < lit(cut))
          .select("o_orderkey", "o_orderdate", "o_orderpriority")
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") > lit(cut))
          .select(col("l_orderkey"),
            (col("l_extendedprice").cast("decimal(18,2)") *
              (lit(BigDecimal(1)) - col("l_discount").cast("decimal(18,4)")))
              .as("rev"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
          .agg(sum("rev").cast("decimal(30,6)").as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
          .select(col("o_orderkey"),
            col("o_orderdate").cast("date").cast("string").as("o_orderdate"),
            col("o_orderpriority"), col("revenue").cast("string").as("revenue"))
      },
      Some("""SELECT o_orderkey,
                     CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
                     o_orderpriority,
                     CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                                   (1 - CAST(l_discount AS DECIMAL(18,4))))
                               AS DECIMAL(30,6)) AS VARCHAR) AS revenue
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_orderdate < TIMESTAMP '1998-01-01'
                AND l_shipdate > TIMESTAMP '1998-01-01'
              GROUP BY 1, 2, 3
              ORDER BY sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                           (1 - CAST(l_discount AS DECIMAL(18,4)))) DESC,
                       o_orderkey
              LIMIT 10""")),

    // RETURNED-REVENUE customers (the TPC-H Q10 shape — the churn-risk
    // report: who returned the most money?): lineitems flagged 'R' joined
    // through orders to customers, nation broadcast for display, top 20
    // by lost revenue. Same decimal/TakeOrdered discipline as
    // q_top_orders; the only row-sized shuffle is lineitem⋈orders.
    QueryDef(
      "q_returns_by_customer",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"),
            (col("l_extendedprice").cast("decimal(18,2)") *
              (lit(BigDecimal(1)) - col("l_discount").cast("decimal(18,4)")))
              .as("rev"))
        val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        val c = Tables.customer(s, d).select("c_custkey", "c_name", "c_nationkey")
        val n = Tables.nation(s, d).select("n_nationkey", "n_name")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "n_name")
          .agg(count(lit(1)).as("n_returned_items"),
            sum("rev").cast("decimal(30,6)").as("lost_revenue"))
          .orderBy(col("lost_revenue").desc, col("c_custkey"))
          .limit(20)
          .select(col("c_custkey"), col("c_name"), col("n_name"),
            col("n_returned_items"),
            col("lost_revenue").cast("string").as("lost_revenue"))
      },
      Some("""SELECT c_custkey, c_name, n_name,
                     count(*) AS n_returned_items,
                     CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                                   (1 - CAST(l_discount AS DECIMAL(18,4))))
                               AS DECIMAL(30,6)) AS VARCHAR) AS lost_revenue
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              WHERE l_returnflag = 'R'
              GROUP BY 1, 2, 3
              ORDER BY sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                           (1 - CAST(l_discount AS DECIMAL(18,4)))) DESC,
                       c_custkey
              LIMIT 20""")),

    // DENORMALIZED-VIEW join elimination end-to-end (Pinot's ingest-time
    // lookup join: dims resolved INTO fact segments so queries never pay
    // the join — plans/DenormRewrite.scala). The builder materializes the
    // orders⋈customer view ONCE (content-keyed /tmp copies + catalog
    // registration, the q_startree_hll lifecycle) and then declares the
    // RAW join — DenormRewriteRule serves it from the view, so the plan
    // the driver hashes has NO Join node, and the oracle (DuckDB's real
    // join) proves the elimination answer-exact. RewriteBench measures
    // the serving win A/B under spark.graft.denorm.enabled.
    QueryDef(
      "q_denorm_join",
      (s, d) => {
        import graft.plans.DenormCatalog
        import graft.sources.{DenormView, SegmentCatalog}
        val base = "/tmp/graft_denorm_" +
          Integer.toHexString(d.hashCode & 0x7fffffff) +
          "_p" + ProcessHandle.current().pid()
        val factPath = s"$base/fact"
        val dimPath = s"$base/dim"
        val viewPath = s"$base/view"
        if (DenormCatalog.find(Set(factPath), Set(dimPath), "cust_key").isEmpty) {
          Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_custkey").as("cust_key"),
              col("o_totalprice"), col("o_orderpriority"))
            .write.mode("overwrite").parquet(factPath)
          Tables.customer(s, d)
            .select(col("c_custkey").as("cust_key"), col("c_mktsegment"),
              col("c_acctbal"))
            .write.mode("overwrite").parquet(dimPath)
          DenormView.materialize(
            SegmentCatalog.readStableSchema(s, factPath),
            SegmentCatalog.readStableSchema(s, dimPath), "cust_key", viewPath)
          DenormCatalog.register(factPath, dimPath, "cust_key", viewPath)
        }
        SegmentCatalog.readStableSchema(s, factPath)
          .join(SegmentCatalog.readStableSchema(s, dimPath), "cust_key")
          .filter(col("o_orderpriority") =!= "3-MEDIUM")
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n_orders"),
            round(sum("o_totalprice"), 2).as("revenue"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
                     CAST(count(*) AS BIGINT) AS n_orders,
                     round(sum(o_totalprice), 2) AS revenue
              FROM orders JOIN customer ON o_custkey = c_custkey
              WHERE o_orderpriority <> '3-MEDIUM'
              GROUP BY 1 ORDER BY c_mktsegment"""))
  )
}
