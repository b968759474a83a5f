package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.VectorFns
import graft.similarity.{Ann, IvfAnn}

/** §K similarity search — brute-force cosine top-k (DuckDB-verified) and
  * the LSH-bucketed approximate variant (rows-only; recall bounded in
  * SimilaritySpec).
  */
object SimilarityQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_knn_brute",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Ann.knnBruteForce(e.filter(col("vec_id") < 10), e, k = 5)
          .select(col("q_id"), col("cand_id"), col("rank"), (round(col("sim"), 4) + lit(0.0)).as("sim"))
          .orderBy("q_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                                CAST(unnest(embedding) AS DOUBLE) AS v
                         FROM embeddings),
                   norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY 1),
                   dots AS (SELECT a.vec_id AS q_id, b.vec_id AS cand_id, sum(a.v * b.v) AS dot
                            FROM e a JOIN e b ON a.i = b.i AND a.vec_id <> b.vec_id
                            WHERE a.vec_id < 10
                            GROUP BY 1, 2),
                   sims AS (SELECT q_id, cand_id, dot / (nq.nrm * nc.nrm) AS sim_raw
                            FROM dots
                            JOIN norms nq ON q_id = nq.vec_id
                            JOIN norms nc ON cand_id = nc.vec_id),
                   ranked AS (SELECT q_id, cand_id, sim_raw,
                              row_number() OVER (PARTITION BY q_id
                                                 ORDER BY sim_raw DESC, cand_id) AS rank
                              FROM sims)
              SELECT q_id, cand_id, rank, round(sim_raw, 4) + 0 AS sim
              FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""")),

    QueryDef(
      "q_ann_lsh",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Ann.knnLsh(e.filter(col("vec_id") < 10), e, k = 3)
          .select(col("q_id"), col("cand_id"), col("rank"), round(col("sim"), 4).as("sim"))
          .orderBy("q_id", "rank")
      },
      None),

    // q_ann_lsh's hash-verified twin: probing ALL 2^8 buckets makes
    // bucketed LSH deterministic and EXACT (every candidate is scored, so
    // the result is brute-force kNN routed through the bucket machinery)
    // — the same promotion q_ann_ivf_exact made for IVF's probe-all.
    // Same candidate bucketing, probe join and k-heap as the approximate
    // row; only the probe set differs.
    QueryDef(
      "q_ann_lsh_exact",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Ann.knnLshProbeAll(e.filter(col("vec_id") < 10), e, k = 3)
          .select(col("q_id"), col("cand_id"), col("rank"),
            (round(col("sim"), 4) + lit(0.0)).as("sim"))
          .orderBy("q_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                                CAST(unnest(embedding) AS DOUBLE) AS v
                         FROM embeddings),
                   norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY 1),
                   dots AS (SELECT a.vec_id AS q_id, b.vec_id AS cand_id, sum(a.v * b.v) AS dot
                            FROM e a JOIN e b ON a.i = b.i AND a.vec_id <> b.vec_id
                            WHERE a.vec_id < 10
                            GROUP BY 1, 2),
                   sims AS (SELECT q_id, cand_id, dot / (nq.nrm * nc.nrm) AS sim_raw
                            FROM dots
                            JOIN norms nq ON q_id = nq.vec_id
                            JOIN norms nc ON cand_id = nc.vec_id),
                   ranked AS (SELECT q_id, cand_id, sim_raw,
                              row_number() OVER (PARTITION BY q_id
                                                 ORDER BY sim_raw DESC, cand_id) AS rank
                              FROM sims)
              SELECT q_id, cand_id, rank, round(sim_raw, 4) + 0 AS sim
              FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""")),

    // Multi-probe LSH: probes the base bucket plus the two
    // smallest-margin bit flips per query — recall rises with nProbe at
    // probe-side cost only (SimilaritySpec asserts the monotonicity and
    // the nProbe=1 ≡ single-probe identity).
    QueryDef(
      "q_ann_multiprobe",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Ann.knnLshMultiProbe(e.filter(col("vec_id") < 10), e, k = 3, nProbe = 3)
          .select(col("q_id"), col("cand_id"), col("rank"), round(col("sim"), 4).as("sim"))
          .orderBy("q_id", "rank")
      },
      None),

    // q_ann_multiprobe's EXACT-REGIME twin (the q_ann_lsh_exact
    // construction composed with multiprobe): at numPlanes = 1 there are
    // exactly two buckets and nProbe = 2 probes the base bucket plus its
    // one flip — every candidate is scored through the SAME probe-
    // generation/join/k-heap machinery the approximate row runs, and the
    // result must equal brute-force cosine top-k, hash-verified against
    // the all-pairs DuckDB oracle. Each candidate lives in exactly one
    // bucket, so probe-all introduces no duplicate pairs.
    QueryDef(
      "q_ann_multiprobe_exact",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Ann.knnLshMultiProbe(e.filter(col("vec_id") < 10), e, k = 3,
            nProbe = 2, numPlanes = 1)
          .select(col("q_id"), col("cand_id"), col("rank"),
            (round(col("sim"), 4) + lit(0.0)).as("sim"))
          .orderBy("q_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                                CAST(unnest(embedding) AS DOUBLE) AS v
                         FROM embeddings),
                   norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY 1),
                   dots AS (SELECT a.vec_id AS q_id, b.vec_id AS cand_id, sum(a.v * b.v) AS dot
                            FROM e a JOIN e b ON a.i = b.i AND a.vec_id <> b.vec_id
                            WHERE a.vec_id < 10
                            GROUP BY 1, 2),
                   sims AS (SELECT q_id, cand_id, dot / (nq.nrm * nc.nrm) AS sim_raw
                            FROM dots
                            JOIN norms nq ON q_id = nq.vec_id
                            JOIN norms nc ON cand_id = nc.vec_id),
                   ranked AS (SELECT q_id, cand_id, sim_raw,
                              row_number() OVER (PARTITION BY q_id
                                                 ORDER BY sim_raw DESC, cand_id) AS rank
                              FROM sims)
              SELECT q_id, cand_id, rank, round(sim_raw, 4) + 0 AS sim
              FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""")),

    // Product-quantization ANN: each 64-float vector stored as 8 one-byte
    // codes (32× memory), queries score via an asymmetric distance table
    // — m lookups per candidate, no float vector touched at scan time.
    // Rows-only; PqSpec bounds recall vs exact brute force and pins the
    // compression claim.
    QueryDef(
      "q_ann_pq",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        graft.similarity.Pq.knnPq(e.filter(col("vec_id") < 10), e, k = 3)
          .select(col("q_id"), col("cand_id"), col("rank"), round(col("sim"), 4).as("sim"))
          .orderBy("q_id", "rank")
      },
      None),

    // IVF+PQ composition (the FAISS IVFPQ deployment shape): KMeans cells
    // bound WHICH vectors are scored, byte codes bound WHAT is read per
    // vector, exact rerank touches only the shortlist. Rows-only; PqSpec
    // asserts probe-all ≡ plain PQ and bounds recall at nProbe<cells.
    QueryDef(
      "q_ann_ivfpq",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        graft.similarity.Pq.knnIvfPq(e.filter(col("vec_id") < 10), e, k = 3,
            numCentroids = 16, nProbe = 4)
          .select(col("q_id"), col("cand_id"), col("rank"), round(col("sim"), 4).as("sim"))
          .orderBy("q_id", "rank")
      },
      None),

    // IVFPQ's EXACT-REGIME twin, composing the two existing exact
    // constructions (q_ann_ivf_exact's probe-all + q_ann_pq_exact's
    // covering shortlist): nProbe = numCentroids means every cell is
    // probed, and k·rerankFactor ≥ n−1 at every verified sf means the ADC
    // shortlist covers the whole corpus, so the exact-cosine rerank IS
    // brute force — the full IVF route + PQ codes + ADC + rerank pipeline
    // becomes deterministic and hash-verifiable while exercising exactly
    // the production code path (same cells, codes, distance tables; only
    // the two breadth knobs differ). Oracle mirrors the rerank float
    // path: normalize, then dot of normalized elements.
    QueryDef(
      "q_ann_ivfpq_exact",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        graft.similarity.Pq.knnIvfPq(e.filter(col("vec_id") < 10), e, k = 3,
            numCentroids = 16, nProbe = 16, rerankFactor = 1024)
          .select(col("q_id"), col("cand_id"), col("rank"),
            (round(col("sim"), 4) + lit(0.0)).as("sim"))
          .orderBy("q_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                                CAST(unnest(embedding) AS DOUBLE) AS v
                         FROM embeddings),
                   norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY 1),
                   nv AS (SELECT e.vec_id, e.i, e.v / n.nrm AS v
                          FROM e JOIN norms n ON e.vec_id = n.vec_id),
                   sims AS (SELECT a.vec_id AS q_id, b.vec_id AS cand_id,
                                   sum(a.v * b.v) AS sim_raw
                            FROM nv a JOIN nv b ON a.i = b.i AND a.vec_id <> b.vec_id
                            WHERE a.vec_id < 10
                            GROUP BY 1, 2),
                   ranked AS (SELECT q_id, cand_id, sim_raw,
                              row_number() OVER (PARTITION BY q_id
                                                 ORDER BY sim_raw DESC, cand_id) AS rank
                              FROM sims)
              SELECT q_id, cand_id, rank, round(sim_raw, 4) + 0 AS sim
              FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""")),

    // PQ's EXACT-REGIME twin (the promotion pattern of q_ann_ivf_exact /
    // q_theta_setops_exact): with rerankFactor sized so the ADC shortlist
    // covers the whole corpus (k·factor ≥ n−1 at every verified sf), the
    // exact-cosine rerank IS brute force — the codes stage only orders
    // the shortlist — so the full PQ pipeline (train → encode → ADC →
    // rerank) becomes deterministic and DuckDB-hash-verifiable. The
    // oracle mirrors the rerank's float path exactly: normalized vectors
    // first, then the dot of normalized elements.
    QueryDef(
      "q_ann_pq_exact",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        graft.similarity.Pq.knnPq(e.filter(col("vec_id") < 10), e, k = 3,
            rerankFactor = 1024)
          .select(col("q_id"), col("cand_id"), col("rank"),
            (round(col("sim"), 4) + lit(0.0)).as("sim"))
          .orderBy("q_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                                CAST(unnest(embedding) AS DOUBLE) AS v
                         FROM embeddings),
                   norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY 1),
                   nv AS (SELECT e.vec_id, e.i, e.v / n.nrm AS v
                          FROM e JOIN norms n ON e.vec_id = n.vec_id),
                   sims AS (SELECT a.vec_id AS q_id, b.vec_id AS cand_id,
                                   sum(a.v * b.v) AS sim_raw
                            FROM nv a JOIN nv b ON a.i = b.i AND a.vec_id <> b.vec_id
                            WHERE a.vec_id < 10
                            GROUP BY 1, 2),
                   ranked AS (SELECT q_id, cand_id, sim_raw,
                              row_number() OVER (PARTITION BY q_id
                                                 ORDER BY sim_raw DESC, cand_id) AS rank
                              FROM sims)
              SELECT q_id, cand_id, rank, round(sim_raw, 4) + 0 AS sim
              FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""")),

    QueryDef(
      "q_ann_ivf",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        IvfAnn.knnIvf(e.filter(col("vec_id") < 10), e, k = 3, numCentroids = 16, nProbe = 4)
          .select(col("q_id"), col("cand_id"), col("rank"), round(col("sim"), 4).as("sim"))
          .orderBy("q_id", "rank")
      },
      None),

    // q_ann_ivf's hash-verified twin: probing ALL cells makes IVF
    // deterministic and EXACT (every candidate is scored, so the result
    // is brute-force kNN routed through the cell partition/probe
    // machinery) — the probe-all ≡ brute identity IvfAnnSpec asserts,
    // promoted to a DuckDB-verified registry row. Same cell assignment,
    // probe join and rerank code as the approximate row; only nProbe
    // differs.
    QueryDef(
      "q_ann_ivf_exact",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        IvfAnn.knnIvf(e.filter(col("vec_id") < 10), e, k = 3,
            numCentroids = 16, nProbe = 16)
          .select(col("q_id"), col("cand_id"), col("rank"),
            (round(col("sim"), 4) + lit(0.0)).as("sim"))
          .orderBy("q_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                                CAST(unnest(embedding) AS DOUBLE) AS v
                         FROM embeddings),
                   norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY 1),
                   dots AS (SELECT a.vec_id AS q_id, b.vec_id AS cand_id, sum(a.v * b.v) AS dot
                            FROM e a JOIN e b ON a.i = b.i AND a.vec_id <> b.vec_id
                            WHERE a.vec_id < 10
                            GROUP BY 1, 2),
                   sims AS (SELECT q_id, cand_id, dot / (nq.nrm * nc.nrm) AS sim_raw
                            FROM dots
                            JOIN norms nq ON q_id = nq.vec_id
                            JOIN norms nc ON cand_id = nc.vec_id),
                   ranked AS (SELECT q_id, cand_id, sim_raw,
                              row_number() OVER (PARTITION BY q_id
                                                 ORDER BY sim_raw DESC, cand_id) AS rank
                              FROM sims)
              SELECT q_id, cand_id, rank, round(sim_raw, 4) + 0 AS sim
              FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""")),

    // Symmetric int8 quantization of the embedding column — the
    // compression step that makes a 100 TB ANN index 4× smaller (and
    // SIMD-friendlier) at a measured accuracy cost. Per label: scale =
    // max|x|/127 (computed in one partial-agg pass, broadcast back), then
    // the reconstruction error rides a second scan as a codegen'd array
    // HOF — no explode, no per-element shuffle. Ties in the round are
    // pinned with floor(x+0.5) on BOTH sides so the oracle is exact
    // double arithmetic.
    QueryDef(
      "q_embed_quantize",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val scales = e.groupBy("label")
          .agg((max(aggregate(col("embedding"), lit(0.0d),
            (acc, x) => greatest(acc, abs(x.cast("double"))))) / 127.0d).as("scale"))
        e.join(broadcast(scales), "label")
          .select(
            col("label"), col("scale"),
            aggregate(col("embedding"), lit(0.0d), (acc, x) => {
              val v = x.cast("double")
              val q = floor(v / col("scale") + 0.5d) * col("scale")
              acc + abs(v - q)
            }).as("abs_err"),
            size(col("embedding")).as("dim"))
          .groupBy("label")
          .agg(
            count(lit(1)).as("n_vecs"),
            (round(first(col("scale")), 6) + lit(0.0)).as("scale"),
            (round(sum(col("abs_err")) / sum(col("dim")), 6) + lit(0.0)).as("mean_abs_err"))
          .orderBy("label")
      },
      Some("""WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   s AS (SELECT label,
                                max(list_aggregate(list_transform(v, x -> abs(x)), 'max')) / 127.0 AS scale
                         FROM e GROUP BY 1),
                   err AS (SELECT e.label, s.scale,
                                  list_aggregate(list_transform(v,
                                    x -> abs(x - floor(x / s.scale + 0.5) * s.scale)), 'sum') AS abs_err,
                                  len(v) AS dim
                           FROM e JOIN s USING (label))
              SELECT label,
                     count(*) AS n_vecs,
                     round(min(scale), 6) + 0 AS scale,
                     round(sum(abs_err) / sum(dim), 6) + 0 AS mean_abs_err
              FROM err GROUP BY 1 ORDER BY label""")),

    // Embedding-space outlier detection — the curation signal SemDeDup/
    // prototype-pruning pipelines start from: distance to the class
    // centroid. Centroids come from the O(dim)-state vector_avg aggregate
    // (labels × partitions buffers on the shuffle, never a table row),
    // broadcast back onto one scan; the 3 farthest vectors per label
    // (lowest cosine to centroid) are selected with the bounded top_k_by
    // heap, not a per-label sort window. Exact double math end-to-end —
    // oracle recomputes centroid/cosine from unnested elements.
    QueryDef(
      "q_embed_outliers",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val cents = e.groupBy("label")
          .agg(VectorFns.vectorAvg(col("embedding")).as("centroid"))
        e.join(broadcast(cents), Seq("label"))
          .select(col("label"), col("vec_id"),
            (VectorFns.dot(col("embedding"), col("centroid")) /
              (VectorFns.norm(col("embedding")) * VectorFns.norm(col("centroid"))))
              .as("cos"))
          .groupBy("label")
          .agg(VectorFns.topKBy(-col("cos"), col("vec_id"), 3).as("hits"))
          .select(col("label"), posexplode(col("hits")).as(Seq("pos", "hit")))
          .select(
            col("label"), col("hit.cand_id").as("vec_id"),
            (col("pos") + 1).as("rank"),
            (round(-col("hit.sim"), 4) + lit(0.0)).as("cos"))
          .orderBy("label", "rank")
      },
      Some("""WITH e AS (SELECT label, vec_id, generate_subscripts(embedding, 1) AS i,
                                CAST(unnest(embedding) AS DOUBLE) AS v
                         FROM embeddings),
                   c AS (SELECT label, i, avg(v) AS cv FROM e GROUP BY 1, 2),
                   d AS (SELECT e.label, e.vec_id, sum(e.v * c.cv) AS dot,
                                sqrt(sum(e.v * e.v)) AS ne, sqrt(sum(c.cv * c.cv)) AS nc
                         FROM e JOIN c ON e.label = c.label AND e.i = c.i
                         GROUP BY 1, 2),
                   ranked AS (SELECT label, vec_id, dot / (ne * nc) AS cos,
                                     row_number() OVER (PARTITION BY label
                                       ORDER BY dot / (ne * nc) ASC, vec_id) AS rank
                              FROM d)
              SELECT label, vec_id, rank, round(cos, 4) + 0 AS cos
              FROM ranked WHERE rank <= 3 ORDER BY label, rank""")),

    // Vector DISTANCE transform family (Pinot's VECTOR_SIMILARITY /
    // l2/l1/cosine/inner-product functions): deterministic (a, a+50)
    // pairing keeps the join an equi-join on a computed key — no pair
    // explosion — and all four metrics come off one pass per pair. l2
    // uses the codegen'd |a|²−2ab+|b|² expansion (three vector_dot calls,
    // no intermediate array); l1 is the one genuinely element-wise metric
    // (zip_with+aggregate HOF — nothing loop-invariant inside the
    // lambda). Scan-local at any scale; rounding absorbs the ≤1e-12
    // formula-vs-elementwise double drift.
    QueryDef(
      "q_vector_distance",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val a = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("a_id"), col("embedding").as("va"))
        val b = e.select(col("vec_id").as("b_id"), col("embedding").as("vb"))
        def dd(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
          VectorFns.dot(x, y)
        a.join(b, col("b_id") === col("a_id") + 50)
          .select(col("a_id"), col("b_id"),
            round(sqrt(greatest(
              dd(col("va"), col("va")) - lit(2.0) * dd(col("va"), col("vb"))
                + dd(col("vb"), col("vb")), lit(0.0))), 6).as("l2"),
            round(expr("aggregate(zip_with(va, vb, (x, y) -> " +
              "abs(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0D, (acc, z) -> acc + z)"),
              6).as("l1"),
            round(dd(col("va"), col("vb")) /
              (sqrt(dd(col("va"), col("va"))) * sqrt(dd(col("vb"), col("vb")))), 6)
              .as("cos_sim"),
            round(dd(col("va"), col("vb")), 6).as("dot"))
          .orderBy("a_id")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                         FROM embeddings)
              SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                     round(list_distance(a.v, b.v), 6) AS l2,
                     round(list_sum(list_transform(list_zip(a.v, b.v),
                           x -> abs(x[1] - x[2]))), 6) AS l1,
                     round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim,
                     round(list_dot_product(a.v, b.v), 6) AS dot
              FROM e a JOIN e b ON b.vec_id = a.vec_id + 50
              WHERE a.vec_id < 20 ORDER BY a_id""")),

    // Lloyd's k-means (similarity.Kmeans): deterministic seeding (k
    // smallest ids) + (d2, cid)-lexicographic assignment make a
    // distributed clustering exactly SQL-replayable, so the DuckDB oracle
    // unrolls the same two Lloyd iterations as CTE levels and
    // hash-verifies sizes AND inertia. Scale shape: centroids are k·dim
    // DRIVER doubles folded into the scan as literals — each iteration is
    // one scan-local argmin pass (codegen'd vector_dot expansion, |p|²
    // hoisted) plus a k-row vector_avg collect; no join, no shuffle wider
    // than k×partitions O(dim) buffers. Assignment-flip margins on this
    // fixture are ≥1e-4 — eight orders above cross-engine double drift —
    // so the argmin is engine-stable (KmeansSpec pins determinism under
    // repartition and the empty-cluster path).
    QueryDef(
      "q_kmeans",
      (s, d) =>
        graft.similarity.Kmeans.lloyd(
            Tables.embeddings(s, d), "vec_id", "embedding", k = 4, iters = 2)
          .groupBy("cid")
          .agg(
            count(lit(1)).as("n_points"),
            (round(sum("d2"), 2) + lit(0.0)).as("inertia"),
            (round(avg("d2"), 4) + lit(0.0)).as("avg_d2"))
          .orderBy("cid"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   u AS (SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x
                         FROM e),
                   seeds AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                                      AS cid, v
                             FROM (SELECT * FROM e ORDER BY vec_id LIMIT 4)),
                   su AS (SELECT cid, generate_subscripts(v, 1) AS i, unnest(v) AS cx
                          FROM seeds),
                   d1 AS (SELECT u.vec_id, su.cid,
                                 sum((u.x - su.cx) * (u.x - su.cx)) AS dd
                          FROM u JOIN su ON u.i = su.i GROUP BY 1, 2),
                   a1 AS (SELECT vec_id, cid FROM (
                            SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dd, cid) AS rn FROM d1) WHERE rn = 1),
                   c1 AS (SELECT a1.cid, u.i, avg(u.x) AS cx
                          FROM u JOIN a1 USING (vec_id) GROUP BY 1, 2),
                   d2 AS (SELECT u.vec_id, c1.cid,
                                 sum((u.x - c1.cx) * (u.x - c1.cx)) AS dd
                          FROM u JOIN c1 ON u.i = c1.i GROUP BY 1, 2),
                   a2 AS (SELECT vec_id, cid FROM (
                            SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dd, cid) AS rn FROM d2) WHERE rn = 1),
                   c2 AS (SELECT a2.cid, u.i, avg(u.x) AS cx
                          FROM u JOIN a2 USING (vec_id) GROUP BY 1, 2),
                   d3 AS (SELECT u.vec_id, c2.cid,
                                 sum((u.x - c2.cx) * (u.x - c2.cx)) AS dd
                          FROM u JOIN c2 ON u.i = c2.i GROUP BY 1, 2),
                   a3 AS (SELECT vec_id, cid, dd FROM (
                            SELECT vec_id, cid, dd, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dd, cid) AS rn FROM d3) WHERE rn = 1)
              SELECT cid, CAST(count(*) AS BIGINT) AS n_points,
                     round(sum(dd), 2) + 0 AS inertia,
                     round(avg(dd), 4) + 0 AS avg_d2
              FROM a3 GROUP BY 1 ORDER BY cid""")),

    // Cluster TOPIC LABELING (BERTopic's c-TF-IDF, Grootendorst 2022):
    // k-means cells over the embedding space get human-readable labels
    // from the documents they contain — tf(t, c) · ln(1 + A/f_t) with A
    // the mean tokens per class and f_t the cross-class term frequency.
    // The exact-replayable Kmeans.lloyd assignment makes the WHOLE
    // composition hash-verifiable: the oracle replays the two Lloyd
    // iterations (q_kmeans's CTE) then the c-TF-IDF arithmetic. Shape at
    // 100 TB: assignment is scan-local against driver centroids, the
    // doc join is one id-keyed equi-join, tf/f_t are vocabulary-sized
    // rollups, the scalar A broadcasts (scalar-N pattern), and per-class
    // top-5 terms come off the bounded string heap — no vocab window.
    QueryDef(
      "q_cluster_topics",
      (s, d) => {
        val assign = graft.similarity.Kmeans.lloyd(
            Tables.embeddings(s, d), "vec_id", "embedding", k = 4, iters = 2)
          .select(col("id").as("doc_id"), col("cid"))
        val toks = Tables.documents(s, d)
          .join(assign, "doc_id")
          .select(col("cid"), explode(
            expr("filter(split(lower(text), ' '), w -> length(w) >= 3)")).as("w"))
        val tf = toks.groupBy("cid", "w").agg(count(lit(1)).as("tf"))
        val ft = tf.groupBy("w").agg(sum("tf").as("ft"))
        val a = tf.agg(
          (sum("tf").cast("double") / countDistinct("cid")).as("A"))
        tf.join(ft, "w").crossJoin(broadcast(a))
          .withColumn("score",
            round(col("tf") * log(lit(1.0) + col("A") / col("ft")), 4) + lit(0.0))
          .groupBy("cid")
          .agg(graft.functions.VectorFns.topKByStr(col("score"), col("w"), 5).as("top"))
          .select(col("cid"), posexplode(col("top")))
          .select(col("cid"), (col("pos") + 1).cast("int").as("rank"),
            col("col.key").as("term"), (col("col.score") + lit(0.0)).as("score"))
          .orderBy("cid", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   u AS (SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x
                         FROM e),
                   seeds AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                                      AS cid, v
                             FROM (SELECT * FROM e ORDER BY vec_id LIMIT 4)),
                   su AS (SELECT cid, generate_subscripts(v, 1) AS i, unnest(v) AS cx
                          FROM seeds),
                   d1 AS (SELECT u.vec_id, su.cid,
                                 sum((u.x - su.cx) * (u.x - su.cx)) AS dd
                          FROM u JOIN su ON u.i = su.i GROUP BY 1, 2),
                   a1 AS (SELECT vec_id, cid FROM (
                            SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dd, cid) AS rn FROM d1) WHERE rn = 1),
                   c1 AS (SELECT a1.cid, u.i, avg(u.x) AS cx
                          FROM u JOIN a1 USING (vec_id) GROUP BY 1, 2),
                   d2 AS (SELECT u.vec_id, c1.cid,
                                 sum((u.x - c1.cx) * (u.x - c1.cx)) AS dd
                          FROM u JOIN c1 ON u.i = c1.i GROUP BY 1, 2),
                   a2 AS (SELECT vec_id, cid FROM (
                            SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dd, cid) AS rn FROM d2) WHERE rn = 1),
                   c2 AS (SELECT a2.cid, u.i, avg(u.x) AS cx
                          FROM u JOIN a2 USING (vec_id) GROUP BY 1, 2),
                   d3 AS (SELECT u.vec_id, c2.cid,
                                 sum((u.x - c2.cx) * (u.x - c2.cx)) AS dd
                          FROM u JOIN c2 ON u.i = c2.i GROUP BY 1, 2),
                   a3 AS (SELECT vec_id, cid FROM (
                            SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dd, cid) AS rn FROM d3) WHERE rn = 1),
                   tok AS (SELECT a3.cid,
                                  unnest(list_filter(string_split(lower(doc.text), ' '),
                                                     w -> len(w) >= 3)) AS w
                           FROM documents doc JOIN a3 ON doc.doc_id = a3.vec_id),
                   tf AS (SELECT cid, w, count(*) AS tf FROM tok GROUP BY 1, 2),
                   ftab AS (SELECT w, sum(tf) AS ft FROM tf GROUP BY 1),
                   aa AS (SELECT CAST(sum(tf) AS DOUBLE) / count(DISTINCT cid) AS A
                          FROM tf),
                   sc AS (SELECT tf.cid, tf.w,
                                 round(tf.tf * ln(1.0 + aa.A / ftab.ft), 4) + 0 AS score
                          FROM tf JOIN ftab USING (w) CROSS JOIN aa),
                   rk AS (SELECT cid, w, score,
                                 row_number() OVER (PARTITION BY cid
                                   ORDER BY score DESC, w) AS rank
                          FROM sc)
              SELECT cid, CAST(rank AS INT) AS rank, w AS term, score
              FROM rk WHERE rank <= 5 ORDER BY cid, rank""")),

    // Greedy k-center CORESET (farthest-point-first diverse sampling —
    // the "pick k maximally-spread exemplars" curation op): the selected
    // set is k·dim driver floats, each round is one scan-local distance
    // fold plus a TakeOrdered(1) — k jobs, no N×N matrix (see
    // similarity.Coreset). Oracle replays the same greedy walk as 5
    // unrolled CTE levels with deterministic (dist desc, id) tie-breaks.
    QueryDef(
      "q_coreset_kcenter",
      (s, d) =>
        graft.similarity.Coreset.kCenters(
            Tables.embeddings(s, d), "vec_id", "embedding", k = 5)
          .select(col("pick"), col("id").as("vec_id"),
            (round(col("dist"), 4) + lit(0.0)).as("dist"))
          .orderBy("pick"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                         FROM embeddings),
                   s1 AS (SELECT vec_id, v FROM e
                          WHERE vec_id = (SELECT min(vec_id) FROM e)),
                   d1 AS (SELECT e.vec_id, e.v, list_distance(e.v, s1.v) AS md
                          FROM e, s1),
                   c2 AS (SELECT vec_id, v, md FROM d1
                          ORDER BY md DESC, vec_id LIMIT 1),
                   d2 AS (SELECT d1.vec_id, d1.v,
                                 least(d1.md, list_distance(d1.v, c2.v)) AS md
                          FROM d1, c2),
                   c3 AS (SELECT vec_id, v, md FROM d2
                          ORDER BY md DESC, vec_id LIMIT 1),
                   d3 AS (SELECT d2.vec_id, d2.v,
                                 least(d2.md, list_distance(d2.v, c3.v)) AS md
                          FROM d2, c3),
                   c4 AS (SELECT vec_id, v, md FROM d3
                          ORDER BY md DESC, vec_id LIMIT 1),
                   d4 AS (SELECT d3.vec_id, d3.v,
                                 least(d3.md, list_distance(d3.v, c4.v)) AS md
                          FROM d3, c4),
                   c5 AS (SELECT vec_id, v, md FROM d4
                          ORDER BY md DESC, vec_id LIMIT 1)
              SELECT 1 AS pick, vec_id, 0.0 AS dist FROM s1
              UNION ALL SELECT 2, vec_id, round(md, 4) + 0 FROM c2
              UNION ALL SELECT 3, vec_id, round(md, 4) + 0 FROM c3
              UNION ALL SELECT 4, vec_id, round(md, 4) + 0 FROM c4
              UNION ALL SELECT 5, vec_id, round(md, 4) + 0 FROM c5
              ORDER BY pick""")),

    // Hybrid retrieval with reciprocal-rank fusion (RRF, Cormack et al.
    // 2009 — the standard way lexical+vector search engines merge their
    // two rankings): arm 1 is the q_bm25 lexical scorer, arm 2 is
    // scan-local cosine against one fixed query vector (vec_id 0); each
    // arm keeps its top 20 via the k-bounded top_k_by heap (NO ranking
    // window anywhere), fused as Σ 1/(60+rank). Ranks are computed from
    // ROUNDED scores with id tie-breaks, so both engines derive identical
    // integer ranks and the fused doubles match bit-for-bit. Scale shape:
    // two scan-local passes + two 20-row arrays + a 40-row fuse — the
    // corpus never shuffles (the bm25 stats row broadcasts, scalar-N
    // pattern, lint-allowlisted).
    QueryDef(
      "q_hybrid_rrf",
      (s, d) => {
        val terms = Seq("table", "scan", "merge")
        val k1 = 1.2
        val b = 0.75
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
        val perDoc = toks.select(
          col("doc_id") +: size(col("toks")).cast("long").as("dl") +:
            terms.map(t =>
              size(filter(col("toks"), w => w === lit(t))).cast("long").as(s"tf_$t")): _*)
        val statAggs = count(lit(1)).as("n_docs") +: avg("dl").as("avgdl") +:
          terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
        val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
        val score = terms.map { t =>
          val tf = col(s"tf_$t").cast("double")
          val idf = log(lit(1.0) + (col("n_docs") - col(s"df_$t") + lit(0.5)) /
            (col(s"df_$t") + lit(0.5)))
          idf * (tf * lit(2.2)) /
            (tf + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
        }.reduce(_ + _)
        val lex = perDoc.crossJoin(broadcast(stats))
          .select(col("doc_id"), round(score, 4).as("sc"))
          .filter(col("sc") > 0)
          .agg(VectorFns.topKBy(col("sc"), col("doc_id"), 20).as("h"))
          .select(posexplode(col("h")).as(Seq("pos", "hit")))
          .select(col("hit.cand_id").as("doc_id"),
            (lit(1.0) / (lit(61.0) + col("pos"))).as("c"))

        val e = Tables.embeddings(s, d)
        // The query vector stays IN-PLAN as a broadcast one-row frame
        // (cast to double element-wise, matching the old driver-side
        // Float→Double collect bit-for-bit) instead of a .head() point
        // lookup that cost a Spark job on every build; its norm is the
        // same left-to-right double accumulation VectorFns.dot performs.
        val q0 = e.filter(col("vec_id") === 0)
          .select(transform(col("embedding"),
            x => x.cast("double")).as("__qv"))
        val dense = e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q0))
          .select(col("vec_id").as("doc_id"),
            round(VectorFns.dot(col("embedding"), col("__qv")) /
              (VectorFns.norm(col("embedding")) *
                sqrt(VectorFns.dot(col("__qv"), col("__qv")))), 4).as("sc"))
          .agg(VectorFns.topKBy(col("sc"), col("doc_id"), 20).as("h"))
          .select(posexplode(col("h")).as(Seq("pos", "hit")))
          .select(col("hit.cand_id").as("doc_id"),
            (lit(1.0) / (lit(61.0) + col("pos"))).as("c"))

        lex.unionByName(dense)
          .groupBy("doc_id")
          .agg((round(sum("c"), 6) + lit(0.0)).as("rrf"),
            count(lit(1)).as("n_arms"))
          .orderBy(desc("rrf"), asc("doc_id"))
          .limit(15)
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
                   perdoc AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
                                     CAST(len(list_filter(w, x -> x = 'table')) AS BIGINT) AS tf_table,
                                     CAST(len(list_filter(w, x -> x = 'scan')) AS BIGINT) AS tf_scan,
                                     CAST(len(list_filter(w, x -> x = 'merge')) AS BIGINT) AS tf_merge
                              FROM t),
                   stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl,
                                    CAST(sum(CASE WHEN tf_table > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_table,
                                    CAST(sum(CASE WHEN tf_scan > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_scan,
                                    CAST(sum(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_merge
                             FROM perdoc),
                   scored AS (SELECT doc_id,
                                     round(
                                       ln(1.0 + (n_docs - df_table + 0.5) / (df_table + 0.5))
                                         * (CAST(tf_table AS DOUBLE) * 2.2)
                                         / (CAST(tf_table AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl)) +
                                       ln(1.0 + (n_docs - df_scan + 0.5) / (df_scan + 0.5))
                                         * (CAST(tf_scan AS DOUBLE) * 2.2)
                                         / (CAST(tf_scan AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl)) +
                                       ln(1.0 + (n_docs - df_merge + 0.5) / (df_merge + 0.5))
                                         * (CAST(tf_merge AS DOUBLE) * 2.2)
                                         / (CAST(tf_merge AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl)),
                                       4) AS sc
                              FROM perdoc CROSS JOIN stats),
                   lexr AS (SELECT doc_id, rn FROM (
                              SELECT doc_id, row_number() OVER (ORDER BY sc DESC, doc_id) AS rn
                              FROM scored WHERE sc > 0) WHERE rn <= 20),
                   qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                          WHERE vec_id = 0),
                   den AS (SELECT e.vec_id AS doc_id,
                                  round(list_cosine_similarity(
                                    CAST(e.embedding AS DOUBLE[]), qv.v), 4) AS sc
                           FROM embeddings e, qv WHERE e.vec_id <> 0),
                   denr AS (SELECT doc_id, rn FROM (
                              SELECT doc_id, row_number() OVER (ORDER BY sc DESC, doc_id) AS rn
                              FROM den) WHERE rn <= 20),
                   contrib AS (SELECT doc_id, 1.0 / (60 + rn) AS c FROM lexr
                               UNION ALL
                               SELECT doc_id, 1.0 / (60 + rn) FROM denr)
              SELECT doc_id, round(sum(c), 6) + 0 AS rrf,
                     CAST(count(*) AS BIGINT) AS n_arms
              FROM contrib GROUP BY 1 ORDER BY rrf DESC, doc_id LIMIT 15""")),

    // MMR diversity re-rank (similarity.Mmr, Carbonell & Goldstein 1998):
    // the post-retrieval selector that stops near-duplicate hits from
    // crowding a result set — greedy λ·rel − penalty·max-sim-to-picked
    // over a cosine shortlist. Corpus-sized work is the shortlist
    // TakeOrdered(20) only; the greedy walk runs on the driver over those
    // 20 rows (Coreset's bounded-state class). Every compared value is
    // rounded to 4 decimals with id tie-breaks first, so the DuckDB
    // oracle replays the identical walk as 5 unrolled CTE picks.
    QueryDef(
      "q_topk_diverse",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val qv = e.filter(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0).map(_.toDouble)
        graft.similarity.Mmr.rerank(e, "vec_id", "embedding", qv,
            nCand = 20, k = 5, lambda = 0.7, penalty = 0.3)
          .select(col("pick"), col("id").as("vec_id"),
            (col("rel") + lit(0.0)).as("rel"),
            (col("score") + lit(0.0)).as("score"))
          .orderBy("pick")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                   qv AS (SELECT v FROM e WHERE vec_id = 0),
                   cand AS (SELECT e.vec_id, e.v,
                                   round(list_cosine_similarity(e.v, qv.v), 4) AS rel
                            FROM e, qv
                            ORDER BY rel DESC, e.vec_id LIMIT 20),
                   sims AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                                   round(list_cosine_similarity(a.v, b.v), 4) AS s
                            FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
                   p1 AS (SELECT vec_id, rel, rel AS score FROM cand
                          ORDER BY rel DESC, vec_id LIMIT 1),
                   s2 AS (SELECT c.vec_id, c.rel,
                                 0.7 * c.rel - 0.3 * max(s.s) AS score
                          FROM cand c JOIN sims s ON s.a_id = c.vec_id
                          WHERE s.b_id IN (SELECT vec_id FROM p1)
                            AND c.vec_id NOT IN (SELECT vec_id FROM p1)
                          GROUP BY c.vec_id, c.rel),
                   p2 AS (SELECT vec_id, rel, score FROM s2
                          ORDER BY score DESC, vec_id LIMIT 1),
                   k2 AS (SELECT vec_id FROM p1 UNION ALL SELECT vec_id FROM p2),
                   s3 AS (SELECT c.vec_id, c.rel,
                                 0.7 * c.rel - 0.3 * max(s.s) AS score
                          FROM cand c JOIN sims s ON s.a_id = c.vec_id
                          WHERE s.b_id IN (SELECT vec_id FROM k2)
                            AND c.vec_id NOT IN (SELECT vec_id FROM k2)
                          GROUP BY c.vec_id, c.rel),
                   p3 AS (SELECT vec_id, rel, score FROM s3
                          ORDER BY score DESC, vec_id LIMIT 1),
                   k3 AS (SELECT vec_id FROM k2 UNION ALL SELECT vec_id FROM p3),
                   s4 AS (SELECT c.vec_id, c.rel,
                                 0.7 * c.rel - 0.3 * max(s.s) AS score
                          FROM cand c JOIN sims s ON s.a_id = c.vec_id
                          WHERE s.b_id IN (SELECT vec_id FROM k3)
                            AND c.vec_id NOT IN (SELECT vec_id FROM k3)
                          GROUP BY c.vec_id, c.rel),
                   p4 AS (SELECT vec_id, rel, score FROM s4
                          ORDER BY score DESC, vec_id LIMIT 1),
                   k4 AS (SELECT vec_id FROM k3 UNION ALL SELECT vec_id FROM p4),
                   s5 AS (SELECT c.vec_id, c.rel,
                                 0.7 * c.rel - 0.3 * max(s.s) AS score
                          FROM cand c JOIN sims s ON s.a_id = c.vec_id
                          WHERE s.b_id IN (SELECT vec_id FROM k4)
                            AND c.vec_id NOT IN (SELECT vec_id FROM k4)
                          GROUP BY c.vec_id, c.rel),
                   p5 AS (SELECT vec_id, rel, score FROM s5
                          ORDER BY score DESC, vec_id LIMIT 1)
              SELECT 1 AS pick, vec_id, rel + 0 AS rel, round(score, 4) + 0 AS score FROM p1
              UNION ALL SELECT 2, vec_id, rel + 0, round(score, 4) + 0 FROM p2
              UNION ALL SELECT 3, vec_id, rel + 0, round(score, 4) + 0 FROM p3
              UNION ALL SELECT 4, vec_id, rel + 0, round(score, 4) + 0 FROM p4
              UNION ALL SELECT 5, vec_id, rel + 0, round(score, 4) + 0 FROM p5
              ORDER BY pick""")),

    // kNN CLASSIFICATION — the label-propagation use of the vector index
    // (auto-tagging new documents from their embedded neighbors): each
    // held-out query vector takes the MAJORITY label of its k=5 nearest
    // labeled neighbors by cosine, ties broken toward the smaller label
    // so the vote is deterministic. Plan shape is exactly q_knn_brute's
    // broadcast-bounded probe (queries broadcast, one scan of the labeled
    // corpus, per-query bounded heap) plus a shortlist-sized label join
    // and a 10-row vote rollup — nothing new shuffles at corpus scale.
    QueryDef(
      "q_knn_classify",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val labeled = e.filter(col("vec_id") >= 10)
        val hits = Ann.knnBruteForce(e.filter(col("vec_id") < 10), labeled, k = 5)
        hits.join(labeled.select(col("vec_id").as("cand_id"), col("label")), "cand_id")
          .groupBy("q_id", "label")
          .agg(count(lit(1)).as("votes"))
          .groupBy("q_id")
          .agg(
            max_by(col("label"), col("votes") * 1000L - col("label")).as("pred_label"),
            max("votes").as("n_votes"))
          .orderBy("q_id")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                                CAST(unnest(embedding) AS DOUBLE) AS v
                         FROM embeddings),
                   norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY 1),
                   dots AS (SELECT a.vec_id AS q_id, b.vec_id AS cand_id,
                                   sum(a.v * b.v) AS dot
                            FROM e a JOIN e b ON a.i = b.i
                            WHERE a.vec_id < 10 AND b.vec_id >= 10
                            GROUP BY 1, 2),
                   ranked AS (SELECT q_id, cand_id,
                              row_number() OVER (PARTITION BY q_id
                                ORDER BY dot / (nq.nrm * nc.nrm) DESC, cand_id) AS rank
                              FROM dots
                              JOIN norms nq ON q_id = nq.vec_id
                              JOIN norms nc ON cand_id = nc.vec_id),
                   votes AS (SELECT r.q_id, emb.label, count(*) AS votes
                             FROM ranked r
                             JOIN embeddings emb ON emb.vec_id = r.cand_id
                             WHERE r.rank <= 5 GROUP BY 1, 2)
              SELECT q_id,
                     arg_max(label, votes * 1000 - label) AS pred_label,
                     max(votes) AS n_votes
              FROM votes GROUP BY 1 ORDER BY q_id""")),

    // HARD-NEGATIVE mining — the contrastive-training prep step a
    // retrieval pipeline runs over its labeled corpus: for each anchor,
    // the top-3 most-similar vectors with a DIFFERENT label (the
    // negatives a model most needs to push away; easy random negatives
    // teach it nothing). q_knn_brute's broadcast-probe shape with the
    // label-mismatch predicate fused into the probe join and the same
    // bounded top-k heap — one labeled-corpus scan, no extra shuffle.
    QueryDef(
      "q_hard_negatives",
      (s, d) => {
        import graft.functions.VectorFns
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 10).select(
          col("vec_id").as("q_id"), col("label").as("q_label"),
          col("embedding").as("q_emb"), VectorFns.norm(col("embedding")).as("q_nrm"))
        val c = e.filter(col("vec_id") >= 10).select(
          col("vec_id").as("cand_id"), col("label").as("c_label"),
          col("embedding").as("c_emb"), VectorFns.norm(col("embedding")).as("c_nrm"))
        broadcast(q).join(c, col("q_label") =!= col("c_label"))
          .withColumn("sim",
            VectorFns.dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
          .groupBy("q_id")
          .agg(VectorFns.topKBy(col("sim"), col("cand_id"), 3).as("hits"))
          .select(col("q_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
          .select(col("q_id"), (col("pos") + 1).as("rank"),
            col("hit.cand_id").as("neg_id"),
            (round(col("hit.sim"), 4) + lit(0.0)).as("sim"))
          .orderBy("q_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                                CAST(unnest(embedding) AS DOUBLE) AS v
                         FROM embeddings),
                   norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY 1),
                   dots AS (SELECT a.vec_id AS q_id, b.vec_id AS cand_id,
                                   sum(a.v * b.v) AS dot
                            FROM e a JOIN e b ON a.i = b.i
                            JOIN embeddings qa ON qa.vec_id = a.vec_id
                            JOIN embeddings qb ON qb.vec_id = b.vec_id
                            WHERE a.vec_id < 10 AND b.vec_id >= 10
                              AND qa.label <> qb.label
                            GROUP BY 1, 2),
                   ranked AS (SELECT q_id, cand_id,
                                     dot / (nq.nrm * nc.nrm) AS sim_raw,
                              row_number() OVER (PARTITION BY q_id
                                ORDER BY dot / (nq.nrm * nc.nrm) DESC, cand_id) AS rank
                              FROM dots
                              JOIN norms nq ON q_id = nq.vec_id
                              JOIN norms nc ON cand_id = nc.vec_id)
              SELECT q_id, CAST(rank AS INT) AS rank, cand_id AS neg_id,
                     round(sim_raw, 4) + 0 AS sim
              FROM ranked WHERE rank <= 3 ORDER BY q_id, rank"""))
  )
}
