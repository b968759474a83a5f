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
      shingleSize: Int = 3, numBands: Int = NumBands): DataFrame =
    bandsFromShingles(
      TextShingles.withShingleHashes(docs, idCol, textCol, shingleSize),
      idCol, numBands)

  /** Bands from an ALREADY-SHINGLED frame (`idCol`, `sh`) — the seam that
    * lets a caller shingle the corpus ONCE and feed both the band join and
    * its exact-Jaccard verify from the same (checkpointed) frame, instead
    * of paying the scan+shingle pipeline per consumer (guide §2.3: don't
    * recompute what you can reuse; the r15 plan audit showed 4 full
    * shingle passes inside q_dedup_minhash_exact).
    */
  def bandsFromShingles(
      sh: DataFrame, idCol: String, numBands: Int = NumBands): DataFrame = {
    val bandCol = ColumnBridge.column(
      MinHashBands(ColumnBridge.expression(col("sh")), NumHashes, numBands))
    sh.select(col(idCol), posexplode(bandCol).as(Seq("band_idx", "band_hash")))
  }

  /** Distinct candidate pairs (a_id < b_id) sharing ≥1 band.
    *
    * numBands = NumHashes is the EXHAUSTIVE-RECALL regime (bands ≡
    * signature length, one minhash per band): a J-similar pair is a
    * candidate unless all NumHashes permutations pick a non-shared
    * element — miss probability (1−J)^NumHashes, ≤ 4e-23 at J = 0.8 —
    * which is what lets the exact-verify twin hash against the all-pairs
    * Jaccard oracle.
    */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numBands: Int = NumBands): DataFrame =
    candidatePairsFromShingles(
      TextShingles.withShingleHashes(docs, idCol, textCol, shingleSize),
      idCol, numBands)

  /** `candidatePairs` over an already-shingled (`idCol`, `sh`) frame —
    * pair it with the `bandsFromShingles` seam so one shingle pass feeds
    * candidates AND verification. `sh` must carry the same shingle size
    * as any downstream exact-Jaccard verification (sharing one frame
    * makes that structural instead of a convention).
    */
  def candidatePairsFromShingles(
      sh: DataFrame, idCol: String, numBands: Int = NumBands): DataFrame = {
    // Pin the band join's parallelism (EmbeddingLsh.pinJoinParallelism's
    // reasoning): AQE's byte-based coalescing folds the small post-explode
    // shuffle to 1-4 partitions while the per-bucket join work is
    // quadratic in occupancy — measured r15 as the dominant 2-task stage
    // of q_dedup_minhash_exact. Explicit repartition at the session's
    // shuffle parallelism is AQE-coalesce-exempt and satisfies the join
    // requirement without an extra exchange.
    val n = sh.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val b = bandsFromShingles(sh, idCol, numBands)
      .repartition(n, col("band_idx"), col("band_hash"))
    // sort-merge pinned on both exploded sides — same discipline as
    // EmbeddingLsh.nearPairs (stats on a post-explode projection are
    // unreliable, and a band side must never be broadcast at scale)
    val a = b.select(col(idCol).as("a_id"), col("band_idx"), col("band_hash"))
      .hint("merge")
    val c = b.select(col(idCol).as("b_id"), col("band_idx"), col("band_hash"))
      .hint("merge")
    a.join(c, Seq("band_idx", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
  }

  /** Materialize a corpus's band index next to its segments — the
    * dedup-index analog of any Pinot index: built once at ingest,
    * partitioned by band_idx so an incremental probe prunes to the bands
    * it touches. Columns: (doc_id, band_idx, band_hash).
    */
  def materializeBands(
      docs: DataFrame, idCol: String, textCol: String, path: String,
      shingleSize: Int = 3, numBands: Int = NumBands): Unit =
    bands(docs, idCol, textCol, shingleSize, numBands)
      .withColumnRenamed(idCol, "doc_id")
      .write.mode("overwrite").partitionBy("band_idx").parquet(path)

  /** Incremental near-dup candidates: NEW docs against an EXISTING
    * corpus's materialized band index — the daily-ingest shape. Only the
    * new batch is shingled/hashed (scan-local expressions); the corpus
    * side is the index read back from disk, so corpus cost is paid once
    * at build, not per batch. Returns (new_id, corpus_id) pairs sharing
    * ≥1 band; verify with exact Jaccard downstream as usual.
    *
    * Join strategy is PINNED, never stats-derived: the batch side is an
    * EXPLODED projection (one row per band), whose size estimate rides
    * the pre-explode scan — the same stats trap that broadcast-OOM'd the
    * r10 band self-join. Default is sort-merge (huge-batch-safe, both
    * sides spill); `broadcastBatch = true` broadcasts the batch bands
    * EXPLICITLY for the streaming micro-batch posture, where batch size
    * is bounded by the trigger and a per-batch shuffle of the
    * corpus-sized index would break the O(batch) contract.
    */
  def candidatePairsAgainst(
      newDocs: DataFrame, idCol: String, textCol: String,
      indexedBands: DataFrame, shingleSize: Int = 3,
      numBands: Int = NumBands, broadcastBatch: Boolean = false): DataFrame =
    candidatePairsAgainstFromShingles(
      TextShingles.withShingleHashes(newDocs, idCol, textCol, shingleSize),
      idCol, indexedBands, numBands, broadcastBatch)

  /** `candidatePairsAgainst` over an already-shingled batch frame
    * (`idCol`, `sh`) — one batch shingle pass serves both the index probe
    * and the downstream exact-Jaccard verify.
    */
  def candidatePairsAgainstFromShingles(
      newSh: DataFrame, idCol: String, indexedBands: DataFrame,
      numBands: Int = NumBands, broadcastBatch: Boolean = false): DataFrame = {
    val n = newSh.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val raw = bandsFromShingles(newSh, idCol, numBands)
      .select(col(idCol).as("new_id"), col("band_idx"), col("band_hash"))
    // same parallelism pin as candidatePairsFromShingles (the index side
    // is co-partitioned to match, so neither side AQE-coalesces under
    // the quadratic-per-bucket probe work); the broadcast posture keeps
    // the original O(batch) shape untouched
    val nb =
      if (broadcastBatch) broadcast(raw)
      else raw.repartition(n, col("band_idx"), col("band_hash")).hint("merge")
    nb.join(indexedBands.select(col("doc_id").as("corpus_id"),
        col("band_idx"), col("band_hash")),
        Seq("band_idx", "band_hash"))
      .filter(col("new_id") =!= col("corpus_id"))
      .select("new_id", "corpus_id")
      .distinct()
  }
}
