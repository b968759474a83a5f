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
    // One scalar count for the teleport denominator — an aggregate over
    // the (already small-schema) node set, not a data collect.
    val n = nodes.count().toDouble

    val outW = e0.groupBy("src").agg(sum("weight").as("out_w"))
    val trans = e0.join(outW, "src")
      .select(col("src"), col("dst"), (col("weight") / col("out_w")).as("p"))
      .localCheckpoint(eager = false)

    // Dangling nodes (no out-edges) are a STATIC set — detect them once.
    // When there are none (the common host-graph case: every host that
    // appears also links out), the per-iteration dangling-mass scalar job
    // disappears entirely and the whole fixed-iteration chain runs as ONE
    // job at the caller's action (lazy localCheckpoints still truncate
    // the logical plan per round — they wrap the round in a LogicalRDD
    // immediately; only the RDD lineage waits for the action).
    val danglingNodes = nodes.join(outW, nodes("host") === outW("src"), "left_anti")
      .localCheckpoint(eager = false)
    val hasDangling = danglingNodes.limit(1).count() > 0

    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    var iter = 0
    while (iter < iterations) {
      // Mass sitting on dangling nodes this round: redistributed
      // uniformly via the teleport term. Scalar aggregate — also the
      // action that materializes the previous round's lazy checkpoint.
      val dangling =
        if (!hasDangling) 0.0
        else ranks.join(danglingNodes.select(col("host").as("dhost")),
            ranks("host") === col("dhost"))
          .agg(coalesce(sum("rank"), lit(0.0)))
          .head().getDouble(0)
      val inflow = trans.join(ranks, trans("src") === ranks("host"))
        .groupBy(col("dst"))
        .agg(sum(col("p") * col("rank")).as("inflow"))
      ranks = nodes
        .join(inflow, nodes("host") === inflow("dst"), "left_outer")
        .select(
          col("host"),
          (lit((1.0 - damping) / n) + lit(damping * dangling / n) +
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
    // scalar seed count — the teleport normalizer (seed lists are
    // whitelist-sized by definition; the count also materializes the
    // checkpoint)
    val sCount = seedSet.count().toDouble
    // Degrade like every sibling graph op instead of throwing: an empty
    // edge set (hence empty host/seed universe) — e.g. an id-shifted scale
    // corpus whose modular edge join yields zero edges — returns the
    // all-zero fixpoint over whatever hosts exist (empty hosts → empty
    // result). Mathematically this IS the limit: with no seed mass the
    // teleport vector is zero everywhere and the power iteration stays at
    // zero.
    if (sCount == 0) return nodes.withColumn("rank", lit(0.0))

    val outW = e0.groupBy("src").agg(sum("weight").as("out_w"))
    val trans = e0.join(outW, "src")
      .select(col("src"), col("dst"), (col("weight") / col("out_w")).as("p"))
      .localCheckpoint(eager = false)
    val danglingNodes = nodes.join(outW, nodes("host") === outW("src"), "left_anti")
      .localCheckpoint(eager = false)
    val hasDangling = danglingNodes.limit(1).count() > 0

    // per-node teleport: 1/|S| on seeds, 0 elsewhere — broadcast-joined
    // onto the node dictionary once, reused every round
    val tele = nodes
      .join(broadcast(seedSet.withColumn("__s", lit(1))), Seq("host"), "left_outer")
      .select(col("host"),
        (coalesce(col("__s"), lit(0)).cast("double") / sCount).as("tele"))
      .localCheckpoint(eager = false)

    var ranks = tele.select(col("host"), col("tele").as("rank"))
    var iter = 0
    while (iter < iterations) {
      val dangling =
        if (!hasDangling) 0.0
        else ranks.join(danglingNodes.select(col("host").as("dhost")),
            ranks("host") === col("dhost"))
          .agg(coalesce(sum("rank"), lit(0.0)))
          .head().getDouble(0)
      val inflow = trans.join(ranks, trans("src") === ranks("host"))
        .groupBy(col("dst"))
        .agg(sum(col("p") * col("rank")).as("inflow"))
      ranks = tele
        .join(inflow, tele("host") === inflow("dst"), "left_outer")
        .select(
          col("host"),
          (lit(1.0 - damping + damping * dangling) * col("tele") +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
        .localCheckpoint(eager = false)
      iter += 1
    }
    ranks
  }
}
