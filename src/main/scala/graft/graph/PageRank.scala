package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over a weighted edge list — the classic
  * link-authority signal a web-crawl curation pipeline uses to weight
  * domains (host-level PageRank is one of the quality features in
  * CommonCrawl-derived corpus builds; cf. reference basics/Architecture.md
  * on derived quality columns feeding ingestion-time filtering).
  *
  * Scale design (the same discipline as dedup/Clusters.scala):
  *   - The graph stays an EDGE LIST — never an adjacency matrix, never
  *     collected. Each iteration is exactly one equi-join (ranks ⋈ edges
  *     on src) plus one hash aggregation (sum of weighted contributions
  *     by dst), both shuffling on the node key: the shape AQE handles at
  *     10⁸-host scale, with skew-split on mega-hubs.
  *   - Out-weight normalization is computed ONCE before the loop, not per
  *     iteration.
  *   - Dangling mass (nodes with no out-edges — crawl frontier leaves) is
  *     collected per iteration as a SCALAR aggregate and redistributed
  *     through the teleport term, so total mass stays 1 without any
  *     single-partition window. That scalar action doubles as the
  *     materializer for the round's lazy localCheckpoint, which truncates
  *     the otherwise per-round-doubling lineage (the Clusters.scala
  *     lesson: analysis cost goes exponential before execution does).
  *   - Fixed iteration count (deterministic output for a fixed input —
  *     oracle-friendly); PageRank converges geometrically at rate d, so
  *     ~20 rounds give 1e-2·d²⁰ ≈ 1e-4 accuracy; callers wanting a
  *     tolerance loop can watch the returned delta of successive runs.
  */
object PageRank {

  /** Ranks for every node of `edges` (columns: src, dst, weight — weight
    * is the link multiplicity or any positive strength). Returns
    * (host, rank) with Σ rank = 1.
    */
  def ranks(
      edges: DataFrame,
      iterations: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e0 = edges.select(
      col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"),
      col("weight").cast("double").as("weight"))

    val nodes = e0.select(col("src").as("host"))
      .unionByName(e0.select(col("dst").as("host")))
      .distinct()
      .localCheckpoint(eager = false)
    // Teleport denominator as an IN-PLAN broadcast scalar (the Hits
    // normalizer pattern): a single-row count aggregate crossJoin-
    // broadcast onto the node frame. Division order matches the old
    // driver-side form exactly — lit(x)/n — so every rank value is
    // bit-identical to the fetched-scalar implementation.
    val nRow = broadcast(nodes.agg(count(lit(1)).cast("double").as("__n")))

    val outW = e0.groupBy("src").agg(sum("weight").as("out_w"))
    val trans = e0.join(outW, "src")
      .select(col("src"), col("dst"), (col("weight") / col("out_w")).as("p"))
      .localCheckpoint(eager = false)

    // Dangling nodes (no out-edges) are a STATIC set — detect them once.
    // Their per-round mass stays IN-PLAN too: a single-row sum aggregate
    // broadcast onto the rank update (when the set is empty the sum
    // coalesces to 0.0 and the teleport term vanishes arithmetically,
    // exactly as the old hasDangling==false branch hard-coded). With no
    // per-iteration driver action, the whole fixed-iteration chain runs
    // as ONE job at the caller's action — on a large cluster that removes
    // `iterations` scheduler round-trips (lazy localCheckpoints still
    // truncate the logical plan per round — they wrap the round in a
    // LogicalRDD immediately; only the RDD lineage waits for the action).
    val danglingNodes = nodes.join(outW, nodes("host") === outW("src"), "left_anti")
      .select(col("host").as("dhost"))
      .localCheckpoint(eager = false)

    var ranks = nodes
      .crossJoin(nRow)
      .select(col("host"), (lit(1.0) / col("__n")).as("rank"))
    var iter = 0
    while (iter < iterations) {
      // Mass sitting on dangling nodes this round: redistributed
      // uniformly via the teleport term — a 1-row broadcast aggregate.
      val dangling = broadcast(
        ranks.join(danglingNodes, ranks("host") === col("dhost"))
          .agg(coalesce(sum("rank"), lit(0.0)).as("__dangling")))
      val inflow = trans.join(ranks, trans("src") === ranks("host"))
        .groupBy(col("dst"))
        .agg(sum(col("p") * col("rank")).as("inflow"))
      ranks = nodes
        .join(inflow, nodes("host") === inflow("dst"), "left_outer")
        .crossJoin(nRow)
        .crossJoin(dangling)
        .select(
          col("host"),
          (lit(1.0 - damping) / col("__n") +
            lit(damping) * col("__dangling") / col("__n") +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
        .localCheckpoint(eager = false)
      iter += 1
    }
    ranks
  }

  /** TrustRank-style SEEDED PageRank (Gyöngyi, Garcia-Molina & Pedersen,
    * "Combating Web Spam with TrustRank", VLDB 2004): the identical power
    * iteration, but the teleport vector is uniform over a trusted SEED
    * set instead of all nodes — trust flows outward from the seeds along
    * links, decaying by the damping factor per hop, and hosts unreachable
    * from any seed converge to 0. This is the crawl-curation standard for
    * propagating a small editorial whitelist to the unlabeled host
    * universe (a per-host quality column, like the reference's derived
    * ingestion-time quality features).
    *
    * Same scale shape as `ranks`: one equi-join + hash aggregation per
    * iteration on the node key, the seed set broadcast onto the node
    * dictionary once, dangling mass recycled through the SEED teleport
    * (trust never leaks to untrusted nodes). Σ rank = 1 every round.
    */
  def seededRanks(
      edges: DataFrame,
      seeds: DataFrame,
      iterations: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e0 = edges.select(
      col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"),
      col("weight").cast("double").as("weight"))
    val nodes = e0.select(col("src").as("host"))
      .unionByName(e0.select(col("dst").as("host")))
      .distinct()
      .localCheckpoint(eager = false)
    val seedSet = seeds.select(col("host").cast("string").as("host")).distinct()
      .localCheckpoint(eager = false)
    // Seed-count teleport normalizer as an IN-PLAN broadcast scalar (the
    // Hits normalizer pattern — no per-build driver action). The empty-
    // seed degradation stays: with |S| = 0 the teleport vector is defined
    // as 0.0 everywhere (the guarded division below), and the power
    // iteration stays at the all-zero fixpoint — exactly what the old
    // early-return hard-coded, now expressed arithmetically.
    val sRow = broadcast(seedSet.agg(count(lit(1)).cast("double").as("__ns")))

    val outW = e0.groupBy("src").agg(sum("weight").as("out_w"))
    val trans = e0.join(outW, "src")
      .select(col("src"), col("dst"), (col("weight") / col("out_w")).as("p"))
      .localCheckpoint(eager = false)
    // Dangling mass stays in-plan per round (see `ranks` above): empty
    // dangling set ⇒ the sum coalesces to 0.0 ⇒ the recycle term is the
    // same 0.0 the old hasDangling==false branch hard-coded.
    val danglingNodes = nodes.join(outW, nodes("host") === outW("src"), "left_anti")
      .select(col("host").as("dhost"))
      .localCheckpoint(eager = false)

    // per-node teleport: 1/|S| on seeds, 0 elsewhere — broadcast-joined
    // onto the node dictionary once, reused every round
    val tele = nodes
      .join(broadcast(seedSet.withColumn("__s", lit(1))), Seq("host"), "left_outer")
      .crossJoin(sRow)
      .select(col("host"),
        when(col("__ns") === 0.0, lit(0.0))
          .otherwise(coalesce(col("__s"), lit(0)).cast("double") / col("__ns"))
          .as("tele"))
      .localCheckpoint(eager = false)

    var ranks = tele.select(col("host"), col("tele").as("rank"))
    var iter = 0
    while (iter < iterations) {
      val dangling = broadcast(
        ranks.join(danglingNodes, ranks("host") === col("dhost"))
          .agg(coalesce(sum("rank"), lit(0.0)).as("__dangling")))
      val inflow = trans.join(ranks, trans("src") === ranks("host"))
        .groupBy(col("dst"))
        .agg(sum(col("p") * col("rank")).as("inflow"))
      ranks = tele
        .join(inflow, tele("host") === inflow("dst"), "left_outer")
        .crossJoin(dangling)
        .select(
          col("host"),
          ((lit(1.0 - damping) + lit(damping) * col("__dangling")) * col("tele") +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
        .localCheckpoint(eager = false)
      iter += 1
    }
    ranks
  }
}
