package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.TextShingles
import graft.functions.expressions.MinHashBands

/** MinHash + LSH banding near-duplicate candidate generation.
  *
  * Scale design: the O(n²) pair space is never materialized, and neither
  * is a (doc, shingle) shuffle — shingling, the 32-permutation MinHash
  * signature and the band hashes are ONE fused scan-local expression
  * pipeline (WordShingleHashes → MinHashBands, both custom codegen'd
  * expressions). Docs then self-join on (band index, band hash): only
  * docs agreeing on at least one full band ever meet, which is the LSH
  * guarantee — with 8 bands × 4 rows, a Jaccard-0.9 pair is a candidate
  * with probability 1-(1-0.9⁴)⁸ ≈ 0.997 while a J=0.3 pair survives with
  * ≈ 0.06. Everything is deterministic (seeded xxhash64) across runs and
  * executors.
  */
object MinHashLsh {

  val NumHashes = 32
  val NumBands = 8

  /** doc_id, band_idx, band_hash — one row per band. `shingleSize` must
    * match the shingle size of any downstream exact-Jaccard verification
    * (candidates generated on one n and verified on another silently lose
    * recall).
    */
  def bands(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3): DataFrame = {
    val sh = TextShingles.withShingleHashes(docs, idCol, textCol, shingleSize)
    val bandCol = ColumnBridge.column(
      MinHashBands(ColumnBridge.expression(col("sh")), NumHashes, NumBands))
    sh.select(col(idCol), posexplode(bandCol).as(Seq("band_idx", "band_hash")))
  }

  /** Distinct candidate pairs (a_id < b_id) sharing ≥1 band. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3): DataFrame = {
    val b = bands(docs, idCol, textCol, shingleSize)
    val a = b.select(col(idCol).as("a_id"), col("band_idx"), col("band_hash"))
    val c = b.select(col(idCol).as("b_id"), col("band_idx"), col("band_hash"))
    a.join(c, Seq("band_idx", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
  }
}
