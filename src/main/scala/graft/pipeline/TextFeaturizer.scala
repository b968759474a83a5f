package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.HashBuckets

/** Hashing-trick document featurization — the cheap, vocabulary-free
  * embedding a corpus pipeline computes BEFORE any model exists: token →
  * md5 bucket (the feature-hashing / "hashing vectorizer" trick), term
  * frequencies, L2 normalization. Deterministic by construction (content
  * hash, no learned state, no vocab broadcast), so embeddings are
  * reproducible on any cluster and the output feeds the existing
  * ANN/embedding-dedup family directly.
  *
  * Shape at 100 TB: tokenize + bucket are scan-local codegen; the only
  * shuffles are the per-doc rollup (partial aggregation does the heavy
  * lifting map-side since dim is small and fixed) and the id-keyed join
  * that restores token-less documents as all-zero rows.
  */
object TextFeaturizer {

  /** One row per input doc: (idCol, embedding: Array[Double] of length
    * `dim`, L2-normalized). Empty tokens (split artifacts of empty text /
    * repeated spaces) never hash into a bucket, and documents with no
    * real tokens at all — empty or NULL text — keep their row with an
    * all-zero embedding (the documented "nothing to embed" signal) rather
    * than colliding on a spurious md5('')-bucket unit vector.
    */
  def embed(docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    require(dim >= 1 && dim <= 4096, s"dim out of range: $dim")
    val tok = docs
      .select(col(idCol), explode(split(coalesce(col(textCol), lit("")), " ")).as("w"))
      .filter(col("w") =!= "")
      // same 16-bit md5 bucket arithmetic the DuckDB oracle replays as
      // CAST('0x' || substr(md5(w),1,4) AS INT) % dim
      .withColumn("b", HashBuckets.md5Bucket(col("w"), dim))
    val tf = tok.groupBy(idCol).agg(
      array((0 until dim).map(i =>
        sum(when(col("b") === i, 1.0).otherwise(0.0))): _*).as("tf"))
    val zero = array(Seq.fill(dim)(lit(0.0)): _*)
    val norm = sqrt(aggregate(col("tf"), lit(0.0), (a, x) => a + x * x))
    docs.select(col(idCol))
      .join(tf, Seq(idCol), "left")
      .select(col(idCol),
        when(col("tf").isNull, zero)
          .when(norm > 0.0, transform(col("tf"), v => v / norm))
          .otherwise(col("tf")).as("embedding"))
  }
}
