package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** §E multi-valued columns — Pinot MV fields and complex-type handling
  * (reference: /root/reference/Introduction.md:52 and
  * basics/import-data/complex-type-array-map-handling.md). The embedding
  * column doubles as the MV fixture: explode/UNNEST + array functions.
  */
object MultiValueQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_mv_unnest",
      (s, d) =>
        Tables.embeddings(s, d)
          .select(col("label"), explode(col("embedding")).as("v"))
          .groupBy("label")
          .agg(count(lit(1)).as("n_vals"), round(sum("v"), 2).as("sum_v"))
          .orderBy("label"),
      Some("""SELECT label, count(*) AS n_vals, round(sum(v), 2) AS sum_v
              FROM (SELECT label, unnest(embedding) AS v FROM embeddings)
              GROUP BY label ORDER BY label""")),

    // positional UNNEST (arrayToMV + ordinality): 0-based positions to
    // match Spark's posexplode; DuckDB's generate_subscripts is 1-based.
    QueryDef(
      "q_mv_positions",
      (s, d) =>
        Tables.embeddings(s, d)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
          .filter(col("i") < 3)
          .select(col("vec_id"), col("i"),
            (round(col("v").cast("double"), 4) + lit(0.0)).as("v"))
          .orderBy("vec_id", "i"),
      Some("""SELECT vec_id, i - 1 AS i, round(CAST(v AS DOUBLE), 4) + 0 AS v
              FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                           unnest(embedding) AS v
                    FROM embeddings)
              WHERE i <= 3 ORDER BY vec_id, i""")),

    QueryDef(
      "q_mv_functions",
      (s, d) =>
        Tables.embeddings(s, d)
          .select(
            col("vec_id"),
            size(col("embedding")).as("card"),
            (round(array_max(col("embedding")).cast("double"), 4) + lit(0.0)).as("max_v"),
            (round(array_min(col("embedding")).cast("double"), 4) + lit(0.0)).as("min_v"),
            (round(element_at(col("embedding"), 1).cast("double"), 4) + lit(0.0)).as("first_v"))
          .orderBy("vec_id"),
      Some("""SELECT vec_id, CAST(len(embedding) AS INT) AS card,
                     round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 4) + 0 AS max_v,
                     round(CAST(list_aggregate(embedding, 'min') AS DOUBLE), 4) + 0 AS min_v,
                     round(CAST(embedding[1] AS DOUBLE), 4) + 0 AS first_v
              FROM embeddings ORDER BY vec_id""")),

    // Pinot's MV aggregation function family — SUMMV / COUNTMV / AVGMV /
    // MINMV / MAXMV (Introduction.md:52's multi-valued fields, aggregated).
    // Spark-first shape: each row pre-reduces its array with codegen'd HOFs
    // (aggregate/size/array_min/array_max), so the group-by shuffles ONE row
    // per input row instead of one per array element — at 100 TB with
    // 64-wide arrays that is a 64× smaller exchange than explode-then-agg.
    QueryDef(
      "q_mv_agg",
      (s, d) => {
        val v = col("embedding")
        Tables.embeddings(s, d)
          .select(
            col("label"),
            aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double")).as("row_sum"),
            size(v).cast("long").as("row_n"),
            array_min(v).cast("double").as("row_min"),
            array_max(v).cast("double").as("row_max"))
          .groupBy("label")
          .agg(
            round(sum("row_sum"), 2).as("summv"),
            sum("row_n").as("countmv"),
            (round(sum("row_sum") / sum("row_n"), 4) + lit(0.0)).as("avgmv"),
            (round(min("row_min"), 4) + lit(0.0)).as("minmv"),
            (round(max("row_max"), 4) + lit(0.0)).as("maxmv"))
          .orderBy("label")
      },
      Some("""SELECT label,
                     round(sum(s), 2) AS summv,
                     CAST(sum(n) AS BIGINT) AS countmv,
                     round(sum(s) / sum(n), 4) + 0 AS avgmv,
                     round(min(mn), 4) + 0 AS minmv,
                     round(max(mx), 4) + 0 AS maxmv
              FROM (SELECT label,
                           list_aggregate(CAST(embedding AS DOUBLE[]), 'sum') AS s,
                           len(embedding) AS n,
                           CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS mn,
                           CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS mx
                    FROM embeddings)
              GROUP BY label ORDER BY label""")),

    // MAP columns (complex-type-array-map-handling.md's other half):
    // build a map deterministically, then exercise element_at / map_keys /
    // size — the oracle verifies the SEMANTIC values from plain columns,
    // proving the map round-trip.
    QueryDef(
      "q_map_functions",
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("m", map(
            lit("bucket"), (col("doc_id") % 5).cast("string"),
            lit("chars"), col("n_chars").cast("string")))
          .select(
            col("doc_id"),
            element_at(col("m"), "bucket").cast("int").as("bucket"),
            size(col("m")).as("n_keys"),
            array_join(array_sort(map_keys(col("m"))), ",").as("keys"),
            (element_at(col("m"), "bucket").cast("long") +
              element_at(col("m"), "chars").cast("long")).as("kv_sum"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(doc_id % 5 AS INT) AS bucket,
                     CAST(2 AS INT) AS n_keys,
                     'bucket,chars' AS keys,
                     CAST(doc_id % 5 + n_chars AS BIGINT) AS kv_sum
              FROM documents ORDER BY doc_id""")),

    // MV SET operations (Pinot's arrayUnion/arrayIntersect/arrayDistinct
    // transform family over multi-valued fields): two integer MV columns
    // derived from each embedding's halves, then union / intersection /
    // difference cardinalities plus the sorted union itself. Set contents
    // are compared ORDER-NORMALIZED (numeric sort before stringify) since
    // engines disagree on native set-op element order. Floats are widened
    // to double BEFORE bucketing on both sides so the int sets are
    // engine-exact. All scan-local codegen'd HOFs — no explode, no
    // shuffle before the final ORDER BY.
    QueryDef(
      "q_mv_setops",
      (s, d) => {
        def buckets(c: org.apache.spark.sql.Column) =
          transform(c, x => floor(x.cast("double") * 10).cast("long"))
        Tables.embeddings(s, d)
          .select(col("vec_id"),
            buckets(slice(col("embedding"), 1, 8)).as("a"),
            buckets(slice(col("embedding"), 9, 8)).as("b"))
          .select(
            col("vec_id"),
            size(array_union(col("a"), col("b"))).as("n_union"),
            size(array_distinct(array_intersect(col("a"), col("b")))).as("n_inter"),
            size(array_distinct(array_except(col("a"), col("b")))).as("n_diff"),
            array_join(
              transform(array_sort(array_union(col("a"), col("b"))),
                x => x.cast("string")), ",").as("union_sorted"))
          .orderBy("vec_id")
      },
      Some("""WITH m AS (SELECT vec_id,
                     list_transform(embedding[1:8],
                       x -> CAST(floor(CAST(x AS DOUBLE) * 10) AS BIGINT)) AS a,
                     list_transform(embedding[9:16],
                       x -> CAST(floor(CAST(x AS DOUBLE) * 10) AS BIGINT)) AS b
                   FROM embeddings),
                   ops AS (SELECT vec_id,
                             list_distinct(list_concat(a, b)) AS u,
                             list_distinct(list_filter(a, x -> list_contains(b, x))) AS i,
                             list_distinct(list_filter(a, x -> NOT list_contains(b, x))) AS e
                           FROM m)
              SELECT vec_id,
                     CAST(len(u) AS INT) AS n_union,
                     CAST(len(i) AS INT) AS n_inter,
                     CAST(len(e) AS INT) AS n_diff,
                     array_to_string(list_sort(u), ',') AS union_sorted
              FROM ops ORDER BY vec_id""")),

    // PERCENTILEMV (Pinot's MV percentile aggregate family): exact
    // interpolated percentiles over every element of a multi-valued
    // column per group. Elements are widened float→double BEFORE the
    // percentile on BOTH engines so the interpolation arithmetic is
    // identical. Unlike the pre-reducible SUMMV/MINMV family (q_mv_agg),
    // an exact percentile needs the element population — the explode is
    // semantic, not an implementation shortcut; the approximate scale
    // path for wide arrays is the KLL sketch over exploded values
    // (q_percentile_kll), which pre-reduces per scan task to O(k) state.
    QueryDef(
      "q_mv_percentile",
      (s, d) =>
        Tables.embeddings(s, d)
          .select(col("label"), explode(col("embedding")).as("v0"))
          .select(col("label"), col("v0").cast("double").as("v"))
          .groupBy("label")
          .agg(
            round(expr("percentile(v, 0.5)"), 4).as("p50_v"),
            round(expr("percentile(v, 0.9)"), 4).as("p90_v"),
            count(lit(1)).as("n_vals"))
          .orderBy("label"),
      Some("""SELECT label,
                     round(quantile_cont(CAST(v AS DOUBLE), 0.5), 4) AS p50_v,
                     round(quantile_cont(CAST(v AS DOUBLE), 0.9), 4) AS p90_v,
                     CAST(count(*) AS BIGINT) AS n_vals
              FROM (SELECT label, unnest(embedding) AS v FROM embeddings)
              GROUP BY label ORDER BY label"""))
  )
}
