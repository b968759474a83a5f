package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** §K sampling — the selection stage of a training-data pipeline: carve a
  * reproducible subset out of a 100 TB corpus with per-stratum quotas.
  * Random sampling is useless there (not reproducible across retries,
  * not auditable); these operators hash CONTENT, so the same corpus always
  * yields the same sample on any cluster, any partitioning, any retry —
  * and DuckDB computes the identical md5, so both entries are
  * hash-verified exactly.
  */
object SamplingQueries {

  /** Deterministic Poisson(1) bootstrap weight for (row, replicate).
    *
    * The draw must behave like an INDEPENDENT Poisson(1) variable per
    * (event_id, b) pair: an affine-in-b congruential seed makes the 20
    * draws of one row constant shifts of each other, and a purely
    * MULTIPLICATIVE per-replicate hash equidistributes so well over
    * structured id sets that per-replicate total weights are nearly
    * constant — both defeat variance-of-replicates as an uncertainty
    * estimate. So the mix is NONLINEAR: a per-replicate odd multiplier
    * followed by two quadratic rounds (s → s²+s mod M, the Blum-Blum-
    * Shub-style squaring map) interleaved with MINSTD multiplies.
    * Measured on 20k-row fixtures across id patterns (sequential,
    * arithmetic-progression, random): var(per-replicate total weight) /
    * (n·Var(w)) ∈ [0.58, 1.69] (iid-consistent; χ²₁₉ noise alone spans
    * [0.47, 1.73] at 95%) and max pairwise replicate correlation ≤ 0.03
    * — vs the affine scheme's constant-shift draws (corr up to 0.997,
    * variance ratio ~2e-4). Machine-checked by SamplingDecorrelationSpec.
    *
    * Every intermediate stays inside int64 on BOTH engines (DuckDB
    * errors on BIGINT overflow, Spark wraps silently — neither may
    * happen): the odd multiplier a < 2^31 so (event_id % M)·a < 2^62;
    * s < M = 2^31−1 so s² < 2^62 and s·48271 < 2^47.
    */
  def bootstrapWeight(eventId: org.apache.spark.sql.Column, b: Int): org.apache.spark.sql.Column = {
    val M = 2147483647L
    val a0 = (b.toLong * 2654435761L + 2246822519L) % 2147483648L
    val a = a0 + 1L - (a0 % 2L) // force odd, keep < 2^31
    var s = ((eventId % M) * a + lit(b.toLong * 12345701L)) % M
    for (_ <- 0 until 2) {
      s = (s * s + s) % M
      s = (s * 48271L + a) % M
    }
    val u = s % 10000L
    when(u < 3679, 0L).when(u < 7358, 1L).when(u < 9197, 2L).otherwise(3L)
  }

  val defs: Seq[QueryDef] = Seq(
    // Stratified rate sampling: per-language keep rates (en 25%, others
    // 50%) decided by the first md5 byte of the content — a pure scan
    // predicate: no shuffle, no state, deterministic under retries.
    QueryDef(
      "q_sample_stratified",
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("h", substring(md5(col("text")), 1, 2))
          .filter(when(col("lang") === "en", col("h") < "40").otherwise(col("h") < "80"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_kept"), countDistinct(col("source")).as("n_sources"))
          .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_kept,
                     count(DISTINCT source) AS n_sources
              FROM documents
              WHERE CASE WHEN lang = 'en'
                         THEN substring(md5(text), 1, 2) < '40'
                         ELSE substring(md5(text), 1, 2) < '80' END
              GROUP BY 1 ORDER BY lang""")),

    // Deterministic fixed-N uniform sample: order by content hash, take N.
    // Plans as TakeOrderedAndProject — each partition keeps its local
    // top-N by hash, only N rows per partition reach the driver-side
    // merge; no full sort, no full shuffle.
    QueryDef(
      "q_sample_fixed_n",
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("h", md5(col("text")))
          .orderBy(col("h"), col("doc_id"))
          .limit(50)
          .select(col("doc_id"), col("lang"), col("source"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, source FROM
                (SELECT doc_id, lang, source FROM documents
                 ORDER BY md5(text), doc_id LIMIT 50)
              ORDER BY doc_id""")),

    // Per-stratum fixed-k deterministic sample — the distributed,
    // MERGEABLE replacement for per-group reservoir sampling: the k
    // lexicographically-smallest content-hash keys per language, selected
    // with the bounded top_k_by_str heap (constant score → pure min-k on
    // the key). Each map task keeps ≤ k keys per group, so only
    // (groups × partitions × k) entries cross the shuffle — never a
    // per-group sort window, never a full shuffle of the corpus. doc_id
    // is zero-padded into the key so hash ties (exact duplicate texts)
    // break identically in both engines.
    QueryDef(
      "q_sample_group_k",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("lang"),
            concat(md5(col("text")), lit(":"),
              lpad(col("doc_id").cast("string"), 10, "0")).as("key"))
          .groupBy("lang")
          .agg(graft.functions.VectorFns.topKByStr(lit(0.0), col("key"), 5).as("top"))
          .select(col("lang"), posexplode(col("top")))
          .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
            substring_index(col("col.key"), ":", -1).cast("long").as("doc_id"),
            substring(col("col.key"), 1, 8).as("h8"))
          .orderBy("lang", "rank"),
      Some("""WITH r AS (SELECT lang, doc_id, md5(text) AS h,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY md5(text), doc_id) AS rank
                   FROM documents)
              SELECT lang, CAST(rank AS INT) AS rank, doc_id,
                     substring(h, 1, 8) AS h8
              FROM r WHERE rank <= 5 ORDER BY lang, rank""")),

    // STRATIFIED K-FOLD assignment — the cross-validation / eval-shard
    // split of a training pipeline: within each stratum (language),
    // documents take folds round-robin in a deterministic content order
    // (md5, doc_id-tie-broken), so every fold holds an equal ±1 share of
    // EVERY stratum — the balance plain hash-mod splits only approach in
    // expectation. One stratum-keyed window pass (rank is O(1) state per
    // row); the per-(stratum, fold) rollup is dictionary-sized. The same
    // shape shards eval sets at 100 TB: strata are the co-partition key,
    // the fold id never needs a global pass.
    QueryDef(
      "q_kfold_stratified",
      (s, d) => {
        val w = Window.partitionBy("lang")
          .orderBy(asc("h"), asc("doc_id"))
        Tables.documents(s, d)
          .select(col("lang"), col("doc_id"), col("n_chars"),
            md5(col("text")).as("h"))
          .withColumn("fold", ((row_number().over(w) - 1) % 5).cast("int"))
          .groupBy("lang", "fold")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("n_chars").as("sum_chars"),
            min("doc_id").as("first_doc"))
          .orderBy("lang", "fold")
      },
      Some("""WITH r AS (SELECT lang, doc_id, n_chars,
                     CAST((row_number() OVER (PARTITION BY lang
                       ORDER BY md5(text), doc_id) - 1) % 5 AS INT) AS fold
                   FROM documents)
              SELECT lang, fold, count(*) AS n_docs,
                     CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                     min(doc_id) AS first_doc
              FROM r GROUP BY 1, 2 ORDER BY lang, fold""")),

    // Concat-and-chunk sequence PACKING — the batch-assembly step of a
    // pretraining pipeline: documents are concatenated per language in a
    // deterministic content-hash order and chunked into fixed 512-token
    // context windows. Each doc's window span falls out of a running
    // token-offset window function (one shuffle per stratum, O(1) state
    // per row — no driver-side packing loop, reproducible on any
    // partitioning). Output: per-language packing stats incl. how many
    // docs straddle a window boundary.
    QueryDef(
      "q_pack_sequences",
      (s, d) => {
        val ctx = 512L
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"),
            md5(col("text")).as("h"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy("h", "doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        docs
          .withColumn("end_off", sum("n_tokens").over(w))
          .withColumn("start_off", col("end_off") - col("n_tokens"))
          .withColumn("spans",
            floor((col("end_off") - 1) / ctx) - floor(col("start_off") / ctx) + 1)
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("n_tokens").as("total_tokens"),
            ceil(sum("n_tokens") / lit(ctx.toDouble)).cast("long").as("n_windows"),
            sum(when(col("spans") > 1, 1L).otherwise(0L)).as("n_boundary_docs"),
            max("spans").as("max_spans"))
          .orderBy("lang")
      },
      Some("""WITH t AS (SELECT doc_id, lang,
                                len(string_split(text, ' ')) AS n_tokens,
                                md5(text) AS h
                         FROM documents),
                   o AS (SELECT lang, n_tokens,
                                sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
                                                    ROWS UNBOUNDED PRECEDING) AS end_off
                         FROM t)
              SELECT lang,
                     count(*) AS n_docs,
                     CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                     CAST(ceil(sum(n_tokens) / 512.0) AS BIGINT) AS n_windows,
                     CAST(sum(CASE WHEN floor((end_off - 1) / 512)
                                        - floor((end_off - n_tokens) / 512) + 1 > 1
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs,
                     CAST(max(floor((end_off - 1) / 512)
                              - floor((end_off - n_tokens) / 512) + 1) AS BIGINT) AS max_spans
              FROM o GROUP BY 1 ORDER BY lang""")),

    // The full corpus-curation pipeline as ONE driver-visible entry:
    // exact dedup → MinHash-LSH candidates → exact-Jaccard verify →
    // connected-components keep-one → quality filter → reproducible
    // stratified sampling (graft.pipeline.Curation). Deterministic on any
    // partitioning; rows-only because the MinHash candidate stage is
    // approximate by design (CurationSpec bounds its invariants).
    QueryDef(
      "q_curation",
      (s, d) =>
        graft.pipeline.Curation.curate(
          Tables.documents(s, d),
          graft.pipeline.Curation.Config(
            keepRates = Map("en" -> 0.5), defaultKeepRate = 0.9))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_kept"),
            round(avg("n_tokens"), 2).as("avg_tokens"),
            round(avg("uniq_ratio"), 4).as("avg_uniq"))
          .orderBy("lang"),
      None),

    // q_curation's EXACT-REGIME twin, hash-verified end-to-end: the SAME
    // Curation.curate composition (exact dedup → MinHash-LSH → exact-
    // Jaccard verify → connected components → quality gate → md5
    // stratified sampling), run with numBands = NumHashes — the
    // q_dedup_minhash_exact exhaustive-recall regime, where a J ≥ 0.8
    // pair escapes banding with probability ≤ (1−J)^32 ≤ 4e-23 — so the
    // near-dup stage provably equals its all-pairs answer and the WHOLE
    // pipeline is one DuckDB expression: md5 keep-min window, shingle
    // self-join Jaccard, recursive-CTE components with min-id reps, the
    // token gates, and the documented ('0x' || md5-prefix)/65536 draw.
    QueryDef(
      "q_curation_exact",
      (s, d) =>
        graft.pipeline.Curation.curate(
          Tables.documents(s, d),
          graft.pipeline.Curation.Config(
            keepRates = Map("en" -> 0.5), defaultKeepRate = 0.9,
            numBands = graft.dedup.MinHashLsh.NumHashes))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_kept"),
            round(avg("n_tokens"), 2).as("avg_tokens"),
            round(avg("uniq_ratio"), 4).as("avg_uniq"))
          .orderBy("lang"),
      Some("""WITH RECURSIVE
                   ex AS (SELECT doc_id, text, lang
                          FROM (SELECT doc_id, text, lang,
                                       min(doc_id) OVER (PARTITION BY md5(text)) AS rep
                                FROM documents)
                          WHERE doc_id = rep),
                   wt AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM ex),
                   sh AS (SELECT doc_id,
                                 list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                                FOR i IN range(1, len(w) - 1)]) AS s
                          FROM wt WHERE len(w) >= 3),
                   exsh AS (SELECT doc_id, unnest(s) AS shg FROM sh),
                   prs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
                           FROM exsh a JOIN exsh b
                             ON a.shg = b.shg AND a.doc_id < b.doc_id
                           GROUP BY 1, 2),
                   sizes AS (SELECT doc_id, len(s) AS n FROM sh),
                   jp AS (SELECT a_id, b_id
                          FROM prs p
                          JOIN sizes sa ON p.a_id = sa.doc_id
                          JOIN sizes sb ON p.b_id = sb.doc_id
                          WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8),
                   edges AS (SELECT a_id AS u, b_id AS v FROM jp
                             UNION SELECT b_id, a_id FROM jp),
                   reach(u, v) AS (
                     SELECT DISTINCT u, u FROM edges
                     UNION
                     SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
                   comp AS (SELECT u AS doc_id, min(v) AS cluster_id
                            FROM reach GROUP BY u),
                   losers AS (SELECT doc_id FROM comp WHERE doc_id <> cluster_id),
                   ded AS (SELECT * FROM ex
                           WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
                   q AS (SELECT lang, text,
                                len(string_split(lower(text), ' ')) AS n_tokens,
                                len(list_distinct(string_split(lower(text), ' '))) * 1.0
                                  / greatest(len(string_split(lower(text), ' ')), 1)
                                  AS uniq_ratio
                         FROM ded),
                   f AS (SELECT * FROM q
                         WHERE n_tokens BETWEEN 5 AND 100000
                           AND uniq_ratio >= 0.1
                           AND CAST(('0x' || substr(md5(text), 1, 4)) AS INT) / 65536.0
                               < CASE WHEN lang = 'en' THEN 0.5 ELSE 0.9 END)
              SELECT lang, count(*) AS n_kept,
                     round(avg(n_tokens), 2) AS avg_tokens,
                     round(avg(uniq_ratio), 4) AS avg_uniq
              FROM f GROUP BY 1 ORDER BY lang""")),

    // WEIGHTED (PPS) sampling without replacement — priority sampling
    // (Duffield-Lund-Thorup): priority = w/u with u a deterministic
    // multiplicative-congruential uniform (Knuth) derived from the row
    // id by pure BIGINT arithmetic, so BOTH engines compute bit-identical
    // priorities (the only float ops are one multiply and one divide —
    // IEEE correctly-rounded, engine-independent; no transcendentals, the
    // ln() route of A-ES sampling would tie the sample to libm rounding).
    // Top-k plans as TakeOrderedAndProject: each task keeps its local
    // heap of 50, no global sort — retry-stable, partitioning-invariant,
    // the only way to audit "why is THIS row in the sample?" at 100 TB.
    QueryDef(
      "q_sample_weighted",
      (s, d) =>
        Tables.events(s, d)
          .withColumn("w_c",
            greatest(round(col("value") * 100).cast("long"), lit(1L)))
          // reduce event_id mod 2^31 BEFORE the Knuth multiply: the raw
          // product overflows int64 past event_id ≈ 3.5e9 (Spark would
          // silently wrap negative while DuckDB raises — engine divergence
          // exactly at corpus scale); (2^31−1)·2654435761 < 2^62 is safe
          .withColumn("h",
            ((col("event_id") % lit(2147483648L)) * lit(2654435761L) +
              lit(40503L)) % lit(4294967296L))
          .withColumn("priority",
            col("w_c").cast("double") * lit(4294967296.0) /
              (col("h").cast("double") + lit(0.5)))
          .orderBy(col("priority").desc, col("event_id"))
          .limit(50)
          .select(col("event_id"), col("event_type"), col("w_c"),
            round(col("priority"), 4).as("priority"))
          .orderBy("event_id"),
      Some("""SELECT event_id, event_type, w_c,
                     round(priority, 4) AS priority
              FROM (SELECT event_id, event_type,
                           greatest(CAST(round(value * 100) AS BIGINT), 1) AS w_c,
                           CAST(greatest(CAST(round(value * 100) AS BIGINT), 1)
                                AS DOUBLE) * 4294967296.0 /
                           (CAST((event_id % 2147483648 * 2654435761 + 40503)
                                 % 4294967296
                                 AS DOUBLE) + 0.5) AS priority
                    FROM events
                    ORDER BY priority DESC, event_id LIMIT 50)
              ORDER BY event_id""")),

    // STRATIFIED weighted sampling — q_sample_weighted PER STRATUM (the
    // per-source sample a training-data pipeline actually draws: k docs
    // per source, weighted, reproducible). Same pure-BIGINT
    // Duffield-Lund-Thorup priorities; the per-stratum top-k is the
    // bounded-heap `top_k_by` aggregate, NOT a rank window — the stratum
    // key (source/event_type) can be high-cardinality at corpus scale and
    // a window would funnel every row of a stratum through one reducer,
    // while the heap ships k entries per (stratum, partition). Ties
    // (priority desc, event_id asc) identical in both engines.
    QueryDef(
      "q_sample_weighted_stratified",
      (s, d) => {
        val pri = Tables.events(s, d)
          .withColumn("w_c",
            greatest(round(col("value") * 100).cast("long"), lit(1L)))
          .withColumn("h",
            ((col("event_id") % lit(2147483648L)) * lit(2654435761L) +
              lit(40503L)) % lit(4294967296L))
          .withColumn("priority",
            col("w_c").cast("double") * lit(4294967296.0) /
              (col("h").cast("double") + lit(0.5)))
        pri.groupBy("event_type")
          .agg(graft.functions.VectorFns.topKBy(
            col("priority"), col("event_id"), 10).as("hits"))
          .select(col("event_type"), posexplode(col("hits")).as(Seq("pos", "hit")))
          .select(col("event_type"), (col("pos") + 1).as("rnk"),
            col("hit.cand_id").as("event_id"),
            round(col("hit.sim"), 4).as("priority"))
          .orderBy("event_type", "rnk")
      },
      Some("""WITH pri AS (SELECT event_type, event_id,
                                  CAST(greatest(CAST(round(value * 100) AS BIGINT), 1)
                                       AS DOUBLE) * 4294967296.0 /
                                  (CAST((event_id % 2147483648 * 2654435761 + 40503)
                                        % 4294967296 AS DOUBLE) + 0.5) AS priority
                           FROM events),
                   rk AS (SELECT event_type, event_id, priority,
                                 row_number() OVER (PARTITION BY event_type
                                                    ORDER BY priority DESC, event_id)
                                   AS rnk
                          FROM pri)
              SELECT event_type, rnk, event_id, round(priority, 4) AS priority
              FROM rk WHERE rnk <= 10
              ORDER BY event_type, rnk""")),

    // DELETE-ONE-BLOCK JACKKNIFE over the purchase-value mean — the
    // scalable uncertainty estimate (block-resampling beats bootstrap
    // replication at 100 TB: ONE scan builds the 20-block rollup, every
    // replicate is arithmetic on the block dictionary). Block sums and
    // counts are exact longs under any order; each leave-one-out mean and
    // pseudovalue is computed per DICTIONARY ROW by identical IEEE
    // divisions, so the replicate table is hash-exact — the
    // variance-of-replicates step is deliberately NOT a float re-sum, it
    // stays downstream display work (the q_jackknife rows ARE the
    // deliverable a pipeline stores next to the point estimate).
    QueryDef(
      "q_jackknife",
      (s, d) => {
        val blocks = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .withColumn("block", col("event_id") % 20)
          .groupBy("block")
          .agg(count(lit(1)).as("n_b"),
            sum(round(col("value") * 100).cast("long")).as("s_c"))
        val tot = blocks.agg(sum("n_b").as("n"), sum("s_c").as("tot_c"),
          count(lit(1)).as("g"))
        blocks.crossJoin(broadcast(tot))
          .select(col("block"), col("n_b"),
            round(col("s_c").cast("double") / (col("n_b") * 100), 6)
              .as("block_mean_d"),
            round((col("tot_c") - col("s_c")).cast("double") /
              ((col("n") - col("n_b")) * 100), 6).as("loo_mean_d"),
            round(col("g").cast("double") *
              (col("tot_c").cast("double") / (col("n") * 100)) -
              (col("g") - 1).cast("double") *
              ((col("tot_c") - col("s_c")).cast("double") /
                ((col("n") - col("n_b")) * 100)), 6).as("pseudovalue_d"))
          .orderBy("block")
      },
      Some("""WITH b AS (SELECT event_id % 20 AS block, count(*) AS n_b,
                                sum(CAST(round(value * 100) AS BIGINT)) AS s_c
                         FROM events WHERE event_type = 'purchase'
                         GROUP BY 1),
                   t AS (SELECT sum(n_b) AS n, sum(s_c) AS tot_c,
                                count(*) AS g FROM b)
              SELECT block, n_b,
                     round(CAST(s_c AS DOUBLE) / (n_b * 100), 6)
                       AS block_mean_d,
                     round(CAST(tot_c - s_c AS DOUBLE) /
                           ((n - n_b) * 100), 6) AS loo_mean_d,
                     round(CAST(g AS DOUBLE) *
                             (CAST(tot_c AS DOUBLE) / (n * 100)) -
                           CAST(g - 1 AS DOUBLE) *
                             (CAST(tot_c - s_c AS DOUBLE) /
                              ((n - n_b) * 100)), 6) AS pseudovalue_d
              FROM b, t ORDER BY block""")),

    // POISSON BOOTSTRAP over the purchase-value mean — the resampling
    // uncertainty estimate that actually distributes (Chamandy et al.,
    // "Estimating Uncertainty for Massive Data Streams", Google TR 2012):
    // classical bootstrap needs n draws WITH replacement per replicate
    // (a global operation); the Poisson approximation gives every row an
    // independent per-replicate weight ~ Poisson(1), making each
    // replicate a WEIGHTED SUM computable scan-locally. Weights here are
    // DETERMINISTIC: the nonlinear (event_id, replicate) mix of
    // bootstrapWeight above, pure BIGINT arithmetic thresholded to the
    // Poisson(1) pmf
    // (P(0)=P(1)=.3679, P(2)=.1839, P(3+) lumped =.0803 on a 10000
    // grid), so both engines draw bit-identical weights — reproducible
    // under retries, auditable ("why was this row triple-counted in
    // replicate 7?"), and hash-verifiable. ZERO fan-out: the 20
    // replicates are 40 conditional-sum accumulators in ONE scan
    // (no explode; one HashAggregate), then stack() pivots the single
    // row to the replicate table. The replicate means are each one IEEE
    // division of exact longs; the variance-of-replicates stays
    // downstream display work (the q_jackknife discipline).
    QueryDef(
      "q_bootstrap",
      (s, d) => {
        val base = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("event_id"),
            round(col("value") * 100).cast("long").as("cents"))
        val aggs = (0 until 20).flatMap { b =>
          val w = SamplingQueries.bootstrapWeight(col("event_id"), b)
          Seq(sum(w).as(s"n_$b"), sum(w * col("cents")).as(s"s_$b"))
        }
        val one = base.agg(aggs.head, aggs.tail: _*)
        val stackExpr = (0 until 20).map(b => s"$b, n_$b, s_$b").mkString(", ")
        one.selectExpr(s"stack(20, $stackExpr) as (replicate, n_b, sum_c)")
          .select(col("replicate"), col("n_b"),
            round(col("sum_c").cast("double") / (col("n_b") * 100), 6)
              .as("mean_d"))
          .orderBy("replicate")
      },
      Some("""WITH base AS (SELECT event_id,
                                   CAST(round(value * 100) AS BIGINT) AS cents
                            FROM events WHERE event_type = 'purchase'),
                   reps AS (SELECT CAST(range AS BIGINT) AS b FROM range(0, 20)),
                   ka AS (SELECT b,
                                 ((b * 2654435761 + 2246822519) % 2147483648)
                                   + 1 - (((b * 2654435761 + 2246822519)
                                             % 2147483648) % 2) AS a
                          FROM reps),
                   st1 AS (SELECT b, a, cents,
                                  ((event_id % 2147483647) * a + b * 12345701)
                                    % 2147483647 AS s
                           FROM base, ka),
                   st2 AS (SELECT b, a, cents,
                                  ((s * s + s) % 2147483647 * 48271 + a)
                                    % 2147483647 AS s
                           FROM st1),
                   st3 AS (SELECT b, cents,
                                  ((s * s + s) % 2147483647 * 48271 + a)
                                    % 2147483647 % 10000 AS u
                           FROM st2),
                   w AS (SELECT b,
                                CASE WHEN u < 3679 THEN 0
                                     WHEN u < 7358 THEN 1
                                     WHEN u < 9197 THEN 2
                                     ELSE 3 END AS w,
                                cents
                         FROM st3)
              SELECT CAST(b AS INT) AS replicate,
                     CAST(sum(w) AS BIGINT) AS n_b,
                     round(CAST(sum(w * cents) AS BIGINT) /
                           (CAST(sum(w) AS BIGINT) * 100.0), 6) AS mean_d
              FROM w GROUP BY b ORDER BY replicate"""))
  )
}
