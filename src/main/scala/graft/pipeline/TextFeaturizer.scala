package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashing-trick document featurization — the cheap, vocabulary-free
  * embedding a corpus pipeline computes BEFORE any model exists: token →
  * md5 bucket (the feature-hashing / "hashing vectorizer" trick), term
  * frequencies, L2 normalization. Deterministic by construction (content
  * hash, no learned state, no vocab broadcast), so embeddings are
  * reproducible on any cluster and the output feeds the existing
  * ANN/embedding-dedup family directly.
  *
  * Shape at 100 TB: tokenize + bucket are scan-local codegen; the only
  * shuffle is the per-doc rollup (one pass, partial aggregation does the
  * heavy lifting map-side since dim is small and fixed).
  */
object TextFeaturizer {

  /** One row per input doc: (idCol, embedding: Array[Double] of length
    * `dim`, L2-normalized; all-zero docs — empty text — stay all-zero).
    */
  def embed(docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    require(dim >= 1 && dim <= 4096, s"dim out of range: $dim")
    val tok = docs.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      // first 16 bits of md5 → bucket; conv's decimal string parses back
      // exactly (max 65535) and the SAME arithmetic replays in DuckDB as
      // CAST('0x' || substr(md5(w),1,4) AS INT) — oracle-comparable.
      .withColumn("b",
        (conv(substring(md5(col("w")), 1, 4), 16, 10).cast("int") % dim))
    val tf = tok.groupBy(idCol).agg(
      array((0 until dim).map(i =>
        sum(when(col("b") === i, 1.0).otherwise(0.0))): _*).as("tf"))
    val norm = sqrt(aggregate(col("tf"), lit(0.0), (a, x) => a + x * x))
    tf.select(col(idCol),
      when(norm > 0.0, transform(col("tf"), v => v / norm))
        .otherwise(col("tf")).as("embedding"))
  }
}
