package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.VectorFns
import graft.functions.expressions.LshBandBuckets

/** Embedding-cosine near-duplicate pairs at scale: banded sign-LSH
  * candidate generation + exact-cosine verification.
  *
  * The naive form — `a JOIN b ON a.id < b.id` then filter on cosine — is a
  * cartesian-class join (BroadcastNestedLoop): O(n²) rows materialized, dead
  * far below 100 TB. Here each vector emits b scan-local band values
  * (LshBandBuckets, one codegen'd pass); candidates come from an EQUI-join
  * on the band value, and only candidates get the exact cosine check. Both
  * stages are plain shuffle-hash joins — no cartesian node anywhere.
  *
  * Recall: a pair at angle θ collides with probability 1-(1-p^r)^b,
  * p = 1-θ/π. The defaults (r=6, b=144) hold miss probability ≤ ~1e-4
  * down to cos 0.4 — deeper bands than the r=4/b=64 alternative, cutting
  * the band-join row volume ~2× for the same recall (verified exhaustive
  * on the fixtures); a production near-dup pass (cos ≥ 0.9) gets the same
  * recall from ~r=8, b=16 at a fraction of the candidate volume.
  * Precision is exact: false candidates are removed by the cosine filter.
  */
object EmbeddingLsh {

  def bandBuckets(emb: Column, r: Int, b: Int, dim: Int, seed: Long): Column =
    ColumnBridge.column(LshBandBuckets(ColumnBridge.expression(emb), r, b, dim, seed))

  /** Distinct candidate (a_id, b_id) pairs sharing ≥1 LSH band value. */
  def candidatePairs(
      emb: DataFrame, idCol: String, embCol: String,
      r: Int, b: Int, dim: Int, seed: Long): DataFrame = {
    val banded = emb.select(
      col(idCol).as("vec_id"),
      explode(bandBuckets(col(embCol), r, b, dim, seed)).as("band"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
      .distinct()
  }

  /** Exact-cosine near-dup pairs ≥ threshold, via LSH candidates.
    *
    * Order of operations matters at scale: the cosine VERIFY runs on the
    * raw band-collision rows BEFORE any dedup — the embedding lookup joins
    * are stats-auto-broadcast when the vector table is small (plain
    * equi-joins at corpus scale) and the dot product is codegen'd, so
    * collisions are filtered as they are produced, and the only wide
    * shuffle left (the final distinct) sees just the surviving true pairs
    * (each duplicated at most `b` times). Deduplicating candidates FIRST
    * would instead shuffle the full collision volume — at a low threshold
    * that is nearly all pairs.
    */
  def nearPairs(
      emb: DataFrame, idCol: String, embCol: String, threshold: Double,
      r: Int = 6, b: Int = 144, dim: Int = 64, seed: Long = 4242L): DataFrame = {
    val v = emb.select(
      col(idCol).as("vec_id"), col(embCol).as("embedding"),
      VectorFns.norm(col(embCol)).as("nrm"))
    val banded = emb.select(
      col(idCol).as("vec_id"),
      explode(bandBuckets(col(embCol), r, b, dim, seed)).as("band"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
      .join(v.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
        col("nrm").as("a_nrm")), Seq("a_id"))
      .join(v.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
        col("nrm").as("b_nrm")), Seq("b_id"))
      .withColumn("sim",
        VectorFns.dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .filter(col("sim") >= threshold)
      .select(col("a_id"), col("b_id"), col("sim"))
      .distinct()
  }
}
