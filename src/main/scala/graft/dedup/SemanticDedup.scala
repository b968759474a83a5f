package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.similarity.IvfAnn

/** SemDeDup-style semantic deduplication (public method: Abbas et al.,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", 2023): cluster the embedding space with KMeans, then
  * compare pairs ONLY within a cluster — semantically-near duplicates land
  * in the same cell with high probability, so the all-pairs O(n²) search
  * becomes Σ cells O((n/k)²).
  *
  * This is the CLUSTER-blocked sibling of the sign-LSH-banded
  * q_dedup_embedding (dedup/EmbeddingLsh.scala): LSH blocks by random
  * hyperplanes (recall guarantees, no training), SemDeDup blocks by
  * learned structure (tighter candidate sets on clustered real-world
  * embeddings — the published result on LAION/web corpora). Both verify
  * candidates with EXACT cosine before reporting, so precision is exact
  * by construction; only recall is approximate (pairs straddling a cell
  * boundary are missed).
  *
  * Scale posture: cell count should grow with the corpus (k ≈ n/target
  * cell size, the paper's shape) so within-cell joins stay bounded; the
  * cell assignment reuses the session-cached / materializable IVF index
  * (similarity/IvfAnn.scala) — one KMeans fit, shared by ANN search and
  * dedup, exactly how a production pipeline amortizes it.
  */
object SemanticDedup {

  /** Within-cell duplicate pairs at `threshold` cosine, exact-verified.
    * Output: (a_id, b_id, cell, cos) with a_id < b_id.
    */
  def pairs(
      corpus: DataFrame, threshold: Double,
      numCentroids: Int, seed: Long = 42L): DataFrame = {
    val (assigned, _) = IvfAnn.buildIndexCached(corpus, numCentroids, seed)
    val base = assigned.select(
      col("cell"), col("vec_id"), col("embedding"),
      VectorFns.norm(col("embedding")).as("nrm"))
    val a = base.select(
      col("cell"), col("vec_id").as("a_id"),
      col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = base.select(
      col("cell"), col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    a.join(b, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos",
        VectorFns.dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), col("cell"), col("cos"))
  }

  /** Keep-one-per-duplicate-pair: drop every vector that appears as the
    * HIGHER id of some pair (keep-lowest-id representative — the same
    * deterministic keep rule as dedup/MinHashLsh.keepFirst).
    */
  def keep(
      corpus: DataFrame, threshold: Double,
      numCentroids: Int, seed: Long = 42L): DataFrame = {
    val drop = pairs(corpus, threshold, numCentroids, seed)
      .select(col("b_id").as("vec_id")).distinct()
    corpus.join(drop, Seq("vec_id"), "left_anti")
  }
}
