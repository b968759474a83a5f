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
  * handful of rounds suffice. `localCheckpoint` truncates the growing
  * lineage each round (use reliable checkpointing on a cluster).
  */
object Clusters {

  /** (id, cluster_id) for every node appearing in `pairs` (a_id, b_id). */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("a_id").as("u"), col("b_id").as("v"))
      .unionByName(pairs.select(col("b_id").as("u"), col("a_id").as("v")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
      .localCheckpoint(true)
    // labels only ever decrease, so the label sum is strictly monotonic:
    // an unchanged sum means a fixpoint — one cheap aggregate per round
    // instead of a self-join diff.
    def labelSum(df: DataFrame): Long =
      df.agg(sum("cluster_id")).head().getLong(0)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = edges.join(labels, edges("v") === labels("id"))
        .groupBy(edges("u").as("nid"))
        .agg(min("cluster_id").as("nlabel"))
      val next = labels.join(neighborMin, labels("id") === neighborMin("nid"), "left_outer")
        .select(
          col("id"),
          least(col("cluster_id"), coalesce(col("nlabel"), col("cluster_id"))).as("cluster_id"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels = next
      iter += 1
    }
    labels
  }
}
