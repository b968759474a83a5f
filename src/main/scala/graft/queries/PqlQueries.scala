package graft.queries

import graft.engine.Graft
import graft.sql.PinotSql

/** §A0 Pinot-SQL / PQL dialect front-end — the reference's own query
  * strings run VERBATIM through `graft.sql.PinotSql.translate` and the
  * registered session (reference: /root/reference/Introduction.md:105's
  * `GROUP BY daysSinceEpoch TOP 100` example; timestamp-index.md:50's
  * `Option(timeoutMs=...)`; forward-index.md:214's DISTINCTCOUNT family;
  * text-search-support.md:29 TEXT_MATCH; json-index.md:306 JSON_MATCH).
  *
  * Every query here is hash-verified against a DuckDB oracle that mirrors
  * the TRANSLATED semantics — proving the dialect layer end-to-end, not
  * just the parser. The translated SQL plans through the normal session,
  * so the transparent rewrite rules (star-tree, index, denorm) fire on
  * PQL queries exactly as on DataFrame ones.
  */
object PqlQueries {

  private def pql(s: org.apache.spark.sql.SparkSession, d: String, q: String) = {
    Graft.registerTables(s, d)
    PinotSql.sql(s, q)
  }

  val defs: Seq[QueryDef] = Seq(
    // The Introduction.md:105 shape: aggregation-only SELECT, legacy
    // `GROUP BY key TOP n`. The translator prepends the group key to the
    // output, orders by the first aggregate DESC (ties pinned on the
    // group key) and limits to n.
    QueryDef(
      "q_pql_top",
      (s, d) => pql(s, d,
        """SELECT count(*) AS cnt FROM events
           WHERE ((user_id >= 0)) AND event_type IN ('click', 'view')
           GROUP BY user_id TOP 50"""),
      Some("""SELECT user_id, count(*) AS cnt FROM events
              WHERE user_id >= 0 AND event_type IN ('click', 'view')
              GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 50""")),

    // Pinot function-name aliases (DISTINCTCOUNT / PERCENTILE50 /
    // FIRSTWITHTIME / LASTWITHTIME) + an OPTION clause, all rewritten to
    // the engine's exact builtins. The time key is unique per row
    // (l_linenumber < 10), so FIRST/LASTWITHTIME are deterministic.
    QueryDef(
      "q_pql_fns",
      (s, d) => pql(s, d,
        """SELECT DISTINCTCOUNT(l_suppkey) AS dc_supp,
                  PERCENTILE50(l_quantity) AS p50_qty,
                  FIRSTWITHTIME(l_linestatus, l_orderkey * 10 + l_linenumber, 'LONG') AS first_status,
                  LASTWITHTIME(l_linestatus, l_orderkey * 10 + l_linenumber, 'LONG') AS last_status
           FROM lineitem
           GROUP BY l_returnflag
           ORDER BY l_returnflag
           OPTION(timeoutMs=30000)"""),
      Some("""SELECT l_returnflag, count(DISTINCT l_suppkey) AS dc_supp,
                     quantile_cont(l_quantity, 0.5) AS p50_qty,
                     arg_min(l_linestatus, l_orderkey * 10 + l_linenumber) AS first_status,
                     arg_max(l_linestatus, l_orderkey * 10 + l_linenumber) AS last_status
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // TEXT_MATCH straight from the dialect (text-search-support.md:73's
    // AND-composed term query), combined with TOP — the registered
    // `text_match` session function compiles the query into the same
    // codegen'd token predicates as the Column API.
    QueryDef(
      "q_pql_match",
      (s, d) => pql(s, d,
        """SELECT count(*) AS cnt, DISTINCTCOUNT(lang) AS n_lang
           FROM documents
           WHERE TEXT_MATCH(text, 'spark AND data')
           GROUP BY source TOP 3"""),
      Some("""SELECT source, count(*) AS cnt, count(DISTINCT lang) AS n_lang
              FROM documents
              WHERE list_contains(string_split(lower(text), ' '), 'spark')
                AND list_contains(string_split(lower(text), ' '), 'data')
              GROUP BY source ORDER BY cnt DESC, source LIMIT 3""")),

    // Pinot's DISTINCT-as-a-function select form (`SELECT DISTINCT(a, b)
    // FROM t`) — distinct tuples, a clause-level keyword in SQL, rewritten
    // at the select level rather than as a function alias. ORDER BY passes
    // through for a deterministic, oracle-replayable row order.
    QueryDef(
      "q_pql_select_distinct",
      (s, d) => pql(s, d,
        """SELECT DISTINCT(l_returnflag, l_linestatus) FROM lineitem
           WHERE l_quantity >= 25
           ORDER BY l_returnflag, l_linestatus"""),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
              WHERE l_quantity >= 25
              ORDER BY l_returnflag, l_linestatus""")),

    // The wider Pinot aggregate-alias family: DISTINCTSUM/DISTINCTAVG,
    // MINMAXRANGE, SEGMENTPARTITIONEDDISTINCTCOUNT (exact under Pinot's
    // partitioning assumption; Spark's shuffle makes it exact
    // unconditionally) and DISTINCTCOUNTTHETASKETCH. The theta mapping is
    // hash-exact HERE because every group's distinct count stays below the
    // sketch's 4096 nominal entries at all gated scale factors (theta
    // never decays, so the estimate IS the exact count — the same
    // exact-regime discipline as q_theta_setops_exact); the approximate
    // regime is bounded by ThetaSketchSpec.
    QueryDef(
      "q_pql_distinct_fns",
      (s, d) => pql(s, d,
        """SELECT round(DISTINCTSUM(l_quantity), 2) AS dsum_qty,
                  round(DISTINCTAVG(l_quantity), 2) AS davg_qty,
                  round(MINMAXRANGE(l_extendedprice), 2) AS price_range,
                  SEGMENTPARTITIONEDDISTINCTCOUNT(l_partkey) AS dc_part,
                  DISTINCTCOUNTTHETASKETCH(l_suppkey) AS dc_supp_theta
           FROM lineitem
           GROUP BY l_returnflag
           ORDER BY l_returnflag"""),
      Some("""SELECT l_returnflag,
                     round(sum(DISTINCT l_quantity), 2) AS dsum_qty,
                     round(avg(DISTINCT l_quantity), 2) AS davg_qty,
                     round(max(l_extendedprice) - min(l_extendedprice), 2) AS price_range,
                     count(DISTINCT l_partkey) AS dc_part,
                     count(DISTINCT l_suppkey) AS dc_supp_theta
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // JSON_MATCH (json-index.md:306 condition syntax, schema-free) +
    // DATETIMECONVERT (epoch-day buckets) — the time-series dashboard
    // query Pinot's docs build from these two functions.
    QueryDef(
      "q_pql_json",
      (s, d) => pql(s, d,
        """SELECT DATETIMECONVERT(ts, 'TIMESTAMP', '1:DAYS:EPOCH', '1:DAYS') AS day_num,
                  count(*) AS cnt
           FROM events
           WHERE JSON_MATCH(props, '"$.k" >= 50') AND event_type IN ('click', 'purchase')
           GROUP BY DATETIMECONVERT(ts, 'TIMESTAMP', '1:DAYS:EPOCH', '1:DAYS')
           ORDER BY day_num"""),
      Some("""SELECT ((epoch_ms(ts) // 86400000) * 86400000) // 86400000 AS day_num,
                     count(*) AS cnt
              FROM events
              WHERE CAST(nullif(regexp_extract(props, '"k": ?(-?\d+)', 1), '') AS DOUBLE) >= 50
                AND event_type IN ('click', 'purchase')
              GROUP BY 1 ORDER BY day_num""")))
}
