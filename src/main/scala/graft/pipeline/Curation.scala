package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.{Clusters, MinHashLsh}
import graft.functions.TextShingles

/** End-to-end corpus curation — the standard LLM training-data pass,
  * composed from the engine's oracle-verified building blocks:
  *
  *   1. exact dedup (content hash, keep min id)
  *   2. near-dup dedup: MinHash-LSH candidates → exact-Jaccard verify →
  *      connected components → keep one doc per cluster
  *   3. quality filter (token count / uniq ratio bounds)
  *   4. reproducible stratified sampling (content-hash keyed)
  *
  * Every stage is a declarative DataFrame transform: the pipeline is one
  * lazy plan per stage boundary, scales exactly as its pieces do (bucket
  * joins, partial aggregates, no cartesian/window scale-killers), and is
  * deterministic end-to-end — same corpus in, same corpus out, on any
  * cluster, any partitioning, any retry.
  */
object Curation {

  final case class Config(
      shingleSize: Int = 3,
      jaccardThreshold: Double = 0.8,
      minTokens: Int = 5,
      maxTokens: Int = 100000,
      minUniqRatio: Double = 0.1,
      /** per-stratum keep rate in [0,1]; strata absent from the map keep
        * `defaultKeepRate` of their docs. */
      keepRates: Map[String, Double] = Map.empty,
      defaultKeepRate: Double = 1.0,
      /** LSH bands for the near-dup candidate stage. The production
        * default trades recall for band-join fan-in; numBands =
        * MinHashLsh.NumHashes (one minhash per band) is the
        * exhaustive-recall regime — any J ≥ threshold pair is missed with
        * probability ≤ (1−J)^NumHashes — which makes the whole pipeline
        * equal its all-pairs oracle (q_curation_exact). */
      numBands: Int = MinHashLsh.NumBands) {
    require(shingleSize > 0, s"shingleSize must be positive, got $shingleSize")
    require(jaccardThreshold > 0.0 && jaccardThreshold <= 1.0,
      s"jaccardThreshold $jaccardThreshold outside (0, 1]")
    require(minTokens >= 0 && maxTokens >= minTokens,
      s"invalid token bounds [$minTokens, $maxTokens]")
    (keepRates.values ++ Seq(defaultKeepRate)).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"keep rate $r outside [0, 1]"))
    require(numBands >= 1 && MinHashLsh.NumHashes % numBands == 0,
      s"numBands $numBands must be >= 1 and divide " +
        s"MinHashLsh.NumHashes (${MinHashLsh.NumHashes})")
  }

  /** Near-dup losers (non-representative cluster members) — MinHash
    * candidates verified by exact Jaccard, clustered by connected
    * components. Returns doc ids to DROP.
    */
  private def nearDupLosers(docs: DataFrame, cfg: Config): DataFrame = {
    // One shingle pass for the whole stage: the lazy localCheckpoint lets
    // the band self-join's two sides and both verify attaches read the
    // same materialized (doc_id, sh) blocks instead of re-running the
    // scan→shingle pipeline per consumer (guide §2.3).
    val sh = TextShingles.withShingleHashes(docs, "doc_id", "text", cfg.shingleSize)
      .localCheckpoint(eager = false)
    val cands = MinHashLsh.candidatePairsFromShingles(sh, "doc_id", cfg.numBands)
    // `inter` projected ONCE per candidate, then a plan barrier before the
    // threshold filter — otherwise the optimizer pushes the jaccard
    // predicate into the verify join and re-evaluates array_intersect
    // three times per pair. Identical arithmetic, identical kept pairs.
    val verified = cands
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        size(col("a_sh")).as("__na"), size(col("b_sh")).as("__nb"),
        size(array_intersect(col("a_sh"), col("b_sh"))).as("inter"))
      .localCheckpoint(eager = false)
      .withColumn("jaccard", col("inter").cast("double") /
        (col("__na") + col("__nb") - col("inter")))
      .filter(col("jaccard") >= cfg.jaccardThreshold)
      .select("a_id", "b_id")
    Clusters.connectedComponents(verified)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("doc_id"))
  }

  /** The curated corpus: docs surviving every stage, plus audit columns
    * (`n_tokens`, `uniq_ratio`). Input needs (doc_id, text, lang) columns.
    */
  def curate(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    // 1. exact dedup — keep the min doc_id per identical content
    val exactKeep = docs
      .withColumn("__rep", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("__rep"))
      .drop("__rep")

    // 2. near-dup dedup
    val deduped = exactKeep.join(nearDupLosers(exactKeep, cfg), Seq("doc_id"), "left_anti")

    // 3. quality filter
    val toks = TextShingles.wordTokens(col("text"))
    val scored = deduped
      .withColumn("n_tokens", size(toks))
      .withColumn("uniq_ratio",
        size(array_distinct(toks)).cast("double") / greatest(size(toks), lit(1)))
      .filter(col("n_tokens").between(cfg.minTokens, cfg.maxTokens) &&
        col("uniq_ratio") >= cfg.minUniqRatio)

    // 4. reproducible stratified sampling on the content hash
    val rate = cfg.keepRates.foldLeft(lit(cfg.defaultKeepRate)) {
      case (acc, (stratum, r)) => when(col("lang") === stratum, lit(r)).otherwise(acc)
    }
    scored.filter(graft.functions.HashBuckets.md5Uniform(col("text")) < rate)
  }
}
