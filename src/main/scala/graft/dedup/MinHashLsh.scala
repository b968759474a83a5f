package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextShingles

/** MinHash + LSH banding near-duplicate candidate generation.
  *
  * Scale design: the O(n²) pair space is never materialized — per doc we
  * compute `numHashes` min-hashes in ONE hash aggregate over its exploded
  * shingles (map-side partial min), group the signature into bands, and
  * self-join on (band index, band hash). Only docs agreeing on at least
  * one full band ever meet, which is exactly the LSH guarantee: with
  * 8 bands × 4 rows, a pair with Jaccard 0.9 is a candidate with
  * probability 1-(1-0.9⁴)⁸ ≈ 0.997, while J=0.3 pairs survive with
  * ≈ 0.06. Hash functions are seeded xxhash64 — deterministic across
  * runs and executors.
  */
object MinHashLsh {

  val NumHashes = 32
  val NumBands = 8
  val RowsPerBand = 4 // NumHashes / NumBands

  /** doc_id + mh0..mh{n-1} signature columns. Shingles flow as 64-bit
    * hashes; each permutation re-hashes the shingle hash with its seed.
    */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ex = TextShingles.withShingleHashes(docs, idCol, textCol, 3)
      .select(col(idCol), explode(col("sh")).as("sh"))
    val mins = (0 until NumHashes).map(i => min(xxhash64(lit(i), col("sh"))).as(s"mh$i"))
    ex.groupBy(idCol).agg(mins.head, mins.tail: _*)
  }

  /** doc_id, band_idx, band_hash — one row per band. */
  def bands(sig: DataFrame, idCol: String): DataFrame = {
    val bandHashes = (0 until NumBands).map { b =>
      val cols = (0 until RowsPerBand).map(r => col(s"mh${b * RowsPerBand + r}"))
      xxhash64(cols: _*)
    }
    sig.select(col(idCol), posexplode(array(bandHashes: _*)).as(Seq("band_idx", "band_hash")))
  }

  /** Distinct candidate pairs (a_id < b_id) sharing ≥1 band. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val b = bands(signatures(docs, idCol, textCol), idCol)
    val a = b.select(col(idCol).as("a_id"), col("band_idx"), col("band_hash"))
    val c = b.select(col(idCol).as("b_id"), col("band_idx"), col("band_hash"))
    a.join(c, Seq("band_idx", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
  }
}
