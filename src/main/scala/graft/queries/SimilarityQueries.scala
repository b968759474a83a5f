package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables
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

    QueryDef(
      "q_ann_ivf",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        IvfAnn.knnIvf(e.filter(col("vec_id") < 10), e, k = 3, numCentroids = 16, nProbe = 4)
          .select(col("q_id"), col("cand_id"), col("rank"), round(col("sim"), 4).as("sim"))
          .orderBy("q_id", "rank")
      },
      None)
  )
}
