package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle enumeration over an undirected edge list — the clustering
  * primitive of the graph-curation family (host-graph triangle density
  * separates organic link neighborhoods from link farms, the same
  * per-host quality signal family as PageRank; reference:
  * /root/reference/basics/Architecture.md derived per-host columns).
  *
  * DEGREE-ORDERED orientation (Schank & Wagner 2005; the standard
  * MapReduce formulation is Cohen 2009, "Graph Twiddling in a MapReduce
  * World"): each edge is directed from its lower-(degree, id) endpoint
  * to the higher, so every triangle is generated exactly once — at its
  * minimum corner under that total order — and the wedge fan-out per
  * node is bounded by its OUT-degree, which the orientation caps at
  * O(√m) (a vertex's out-neighbors all have ≥ its degree, so out-degree
  * above √m would need more than m edge endpoints). Σ outdeg² = O(m^1.5)
  * regardless of skew — the web-scale property: a 10⁷-degree hub under a
  * plain id-order orientation can fan out 10¹⁴ wedges if its id sorts
  * low, while the degree order always points INTO the hub and generates
  * its wedges at the low-degree corners instead.
  *
  * Round shape: two equi-joins (wedge build on the oriented source key,
  * closing-edge probe on the canonical pair key) + one hash aggregation.
  * Nothing is collected; no cross join.
  */
object Triangles {

  /** `ue`: canonical undirected edges — columns (a, b) with a < b,
    * distinct, no self-loops (the caller's contract, same as the inline
    * q_triangles construction). Returns (node, n_triangles) counting
    * each node's triangle memberships; nodes in no triangle are absent.
    */
  def perNodeDegreeOrdered(ue: DataFrame): DataFrame = {
    val deg = ue.select(col("a").as("node"))
      .union(ue.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val da = deg.select(col("node").as("a"), col("deg").as("da"))
    val db = deg.select(col("node").as("b"), col("deg").as("db"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val out = ue.join(da, Seq("a")).join(db, Seq("b"))
      .select(when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"))
    // wedges at the orientation-minimum corner; (w1, w2) kept canonical
    // (by id) so the closing edge probes `ue` directly
    val wedges = out.select(col("src"), col("dst").as("w1"))
      .join(out.select(col("src"), col("dst").as("w2")), Seq("src"))
      .filter(col("w1") < col("w2"))
    val tri = wedges.join(ue,
        col("w1") === col("a") && col("w2") === col("b"))
      .select(col("src").as("x"), col("w1").as("y"), col("w2").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
