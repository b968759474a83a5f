package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Similarity search over embedding columns.
  *
  * Brute-force top-k: the (small) query set is broadcast against the
  * candidate corpus, cosine is a codegen'd zip_with/aggregate, and top-k
  * per query is a window over (query partition) — at 100 TB the candidate
  * side streams through map tasks; nothing but (queries × k) rows ever
  * shuffle.
  *
  * LSH ANN: 8 fixed random hyperplanes (seeded, deterministic) sign-hash
  * every vector into one of 256 buckets; probes only compare within their
  * bucket, cutting the scanned candidate set ~256× at the cost of recall —
  * bounded against brute force in SimilaritySpec.
  */
object Ann {

  val NumPlanes = 8
  val Dim = 64

  /** Deterministic pseudo-random hyperplanes (fixed seed). */
  private lazy val planes: Seq[Array[Float]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumPlanes)(Array.fill(Dim)(rnd.nextGaussian().toFloat))
  }

  private def planeDot(emb: Column, plane: Array[Float]): Column =
    VectorFns.dot(emb, typedlit(plane))

  /** 0..255 bucket id from the sign pattern of the 8 plane dots. */
  def lshBucket(emb: Column): Column =
    planes.zipWithIndex
      .map { case (p, i) => when(planeDot(emb, p) > 0, lit(1 << i)).otherwise(lit(0)) }
      .reduce(_ + _)

  /** Exact cosine top-k: one row per (query, rank<=k candidate). */
  def knnBruteForce(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      VectorFns.norm(col("embedding")).as("q_nrm"))
    val c = candidates.select(
      col("vec_id").as("cand_id"), col("embedding").as("c_emb"),
      VectorFns.norm(col("embedding")).as("c_nrm"))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("cand_id"))
    broadcast(q).join(c, col("q_id") =!= col("cand_id"))
      .withColumn("sim", VectorFns.dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("cand_id"), col("rank"), col("sim"))
  }

  /** LSH-bucketed ANN top-k: compares only same-bucket pairs. */
  def knnLsh(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      VectorFns.norm(col("embedding")).as("q_nrm"),
      lshBucket(col("embedding")).as("bucket"))
    val c = candidates.select(
      col("vec_id").as("cand_id"), col("embedding").as("c_emb"),
      VectorFns.norm(col("embedding")).as("c_nrm"),
      lshBucket(col("embedding")).as("bucket"))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("cand_id"))
    broadcast(q).join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("sim", VectorFns.dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("cand_id"), col("rank"), col("sim"))
  }
}
