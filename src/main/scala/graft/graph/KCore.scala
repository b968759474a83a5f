package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-CORE decomposition peeling over an edge list — the density gate of
  * the graph family (CC finds what is connected, LabelProp what is
  * clustered; k-core finds what is DENSELY EMBEDDED: nodes that survive
  * repeated removal of low-degree periphery — the standard crawl-graph
  * signal separating well-linked hub hosts from one-link leaf spam, cf.
  * reference basics/Architecture.md on derived per-host quality columns).
  *
  * Algorithm: synchronous peeling — each round drops every node whose
  * degree in the CURRENT induced subgraph is below k (and every edge
  * touching one). Run far enough this is exactly the k-core; a BOUNDED
  * round count keeps the operator deterministic and oracle-expressible
  * (the q_pagerank_hosts fixed-round convention: the DuckDB oracle
  * unrolls the same rounds as CTE levels). Peeling is monotone — once
  * the survivor set stops changing it is the true k-core, so callers can
  * size `rounds` to the expected peel depth and spec-pin the fixpoint.
  *
  * Scale shape: per round ONE degree aggregation + two semi-joins of the
  * edge list against the survivor set — the CC/PageRank round shape,
  * shuffling on the node key only; eager localCheckpoint truncates the
  * per-round lineage. Nothing is ever collected.
  */
object KCore {

  /** Survivors of `rounds` peel iterations at threshold k, with their
    * degree in the final induced subgraph. `und` must be the SYMMETRIZED
    * simple edge list (h, nb): both directions present, no self-loops,
    * no duplicates.
    */
  def core(und: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"k=$k rounds=$rounds")
    var edges = und.select(col("h"), col("nb"))
    for (_ <- 1 to rounds) {
      val keep = edges.groupBy("h").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("h")
      edges = edges
        .join(keep, Seq("h"), "left_semi")
        .join(keep.withColumnRenamed("h", "nb"), Seq("nb"), "left_semi")
        .select(col("h"), col("nb"))
        .localCheckpoint()
    }
    edges.groupBy("h").agg(count(lit(1)).as("core_degree"))
  }
}
