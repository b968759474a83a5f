package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pairs: turns pair detection
  * into dedup decisions (cluster id = min doc id in the component; keep
  * that doc, drop the rest).
  *
  * Scale design: iterative min-label propagation — each round is one
  * join + aggregate on the (sparse) edge list, converging in O(component
  * diameter) rounds; near-dup components are tiny (pairs/triples), so a
  * handful of rounds suffice. Each round runs exactly ONE job: a LAZY
  * localCheckpoint marks the round's labels, and the label-sum action
  * (which doubles as the convergence check) materializes the blocks and
  * truncates the plan in the same pass. The truncation is load-bearing:
  * labels feeds the next round twice (self + neighbor-min join), so an
  * uncheckpointed plan doubles in size per round — analysis cost goes
  * exponential long before execution does. Use reliable checkpointing on
  * a cluster where losing an executor's local blocks matters.
  */
object Clusters {

  /** (id, cluster_id) for every node appearing in `pairs` (a_id, b_id).
    * `pairs` must be distinct (a_id < b_id) pairs — the doubled edge list
    * is then duplicate-free by construction, so no distinct shuffle.
    *
    * Convergence strategy: plain propagation rounds are cheapest (one
    * join + one aggregate) and near-dup components are almost always
    * shallow, so the first `plainRounds` rounds run plain; a component
    * still unconverged after that is diameter-deep (a chain), and the
    * loop switches to pointer-halving rounds (label(label(u)) shortcut)
    * that close depth-d chains in O(log d) further rounds. Unconverged at
    * maxIter throws — silently returning partial clusters would merge
    * fewer dups than requested with no signal.
    */
  def connectedComponents(
      pairs: DataFrame, maxIter: Int = 64, plainRounds: Int = 8): DataFrame = {
    val edges = pairs.select(col("a_id").as("u"), col("b_id").as("v"))
      .unionByName(pairs.select(col("b_id").as("u"), col("a_id").as("v")))
      .localCheckpoint(eager = false)
    // Round 1 FUSED into initialization (r15 optimization round): from
    // identity labels, the first propagation round is exactly
    // min(self, neighbors) — one aggregate over the doubled edge list,
    // no label table to join yet. Saves a full join+agg round for every
    // consumer; counted in `iter` so the maxIter bound keeps its meaning.
    var labels = edges.groupBy(col("u"))
      .agg(least(col("u"), min(col("v"))).as("cluster_id"))
      .select(col("u").as("id"), col("cluster_id"))
      .localCheckpoint(eager = false)
    // labels only ever decrease, so the label sum is strictly monotonic:
    // an unchanged sum means a fixpoint — one cheap aggregate per round
    // instead of a self-join diff. The aggregate is also the single action
    // that materializes the round's lazy checkpoint.
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum("cluster_id"), lit(0L))).head().getLong(0)
    var prevSum = labelSum(labels)
    var iter = 1
    var converged = false
    while (!converged && iter < maxIter) {
      // min(self, neighbors) as ONE union+aggregate per round: each edge
      // delivers its source's label to its target and the node's own
      // label rides the union — two wide ops per round where the former
      // groupBy + left-outer-join shape paid three. (Halving EVERY round
      // was measured and lost on shallow graphs — the extra self-join
      // stage per round costs more than the rounds it saves — hence the
      // plain-first hybrid.)
      val prop = edges.join(labels, edges("v") === labels("id"))
        .select(edges("u").as("id"), col("cluster_id"))
        .unionByName(labels)
        .groupBy("id").agg(min("cluster_id").as("cluster_id"))
      val next =
        (if (iter < plainRounds) prop
         else {
           // pointer halving: hop to the label's own label — sound because
           // a label is always a node id of the same component and labels
           // only decrease; closes depth-d chains in O(log d) rounds
           val p = prop.localCheckpoint(eager = false)
           p.as("x")
             .join(p.select(col("id").as("pid"), col("cluster_id").as("plabel")).as("y"),
               col("x.cluster_id") === col("y.pid"), "left_outer")
             .select(
               col("x.id").as("id"),
               least(col("x.cluster_id"), coalesce(col("plabel"), col("x.cluster_id")))
                 .as("cluster_id"))
         })
        .localCheckpoint(eager = false)
      val nextSum = labelSum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels = next
      iter += 1
    }
    require(converged,
      s"connected components did not converge within $maxIter rounds — " +
        "raise maxIter (component diameter exceeds the halving budget)")
    labels
  }
}
