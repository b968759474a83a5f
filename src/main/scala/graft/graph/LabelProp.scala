package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous LABEL-PROPAGATION community detection (Raghavan et al.
  * 2007) over an edge list — the cheap community pass a host-graph
  * pipeline runs next to PageRank/HITS: every node adopts the MODE of
  * its neighbors' labels each round, ties toward the smallest label, for
  * a FIXED number of synchronous rounds, so the result is deterministic
  * under any partitioning (classic async LPA is run-order-dependent —
  * useless for a reproducible pipeline; fixed-round synchronous updates
  * are the distributed-friendly form, same determinism discipline as the
  * unrolled PageRank).
  *
  * Scale shape per round: one equi-join of the undirected edge list with
  * the label table + two dictionary-sized aggregates — exactly the
  * PageRank shuffle. Label state is one row per node.
  */
object LabelProp {

  /** edges (src, dst) → final (node, lab) after `rounds` synchronous
    * rounds; labels start as each node's own id.
    */
  def propagate(edges: DataFrame, rounds: Int): DataFrame = {
    val ue = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val nodes = ue.select(col("src").as("node")).distinct()
    var labels = nodes.withColumn("lab", col("node"))
    (1 to rounds).foreach { _ =>
      val picked = ue.join(labels, col("src") === col("node"))
        .groupBy(col("dst").as("n2"), col("lab"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("n2")
        .agg(min_by(col("lab"), struct((-col("cnt")).as("nc"), col("lab")))
          .as("newlab"))
      labels = labels.as("L")
        .join(picked, col("L.node") === col("n2"), "left_outer")
        .select(col("L.node").as("node"),
          coalesce(col("newlab"), col("L.lab")).as("lab"))
    }
    labels
  }
}
