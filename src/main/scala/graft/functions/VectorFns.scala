package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns. The dot product is a
  * custom codegen'd Catalyst expression (graft.functions.expressions
  * .VectorDot) — a fused loop inside WholeStageCodegen, ~10× the
  * higher-order-function (`aggregate(zip_with(...))`) formulation it
  * replaced on all-pairs workloads. Elements are widened to double BEFORE
  * multiplying so results are reproducible against any engine doing double
  * math (the DuckDB oracle).
  */
object VectorFns {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  import graft.functions.expressions.VectorDot

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Bounded top-k aggregate: `array<struct<cand_id, sim>>` of the k
    * highest-scoring ids, (score desc, id asc). Partial buffers are
    * k-bounded (graft.functions.expressions.TopKByAgg), so map-side
    * combine keeps all but (groups × partitions × k) rows off the shuffle.
    */
  def topKBy(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      graft.functions.expressions.TopKByAgg(
        ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())

  /** String-keyed bounded top-k aggregate: `array<struct<key, score>>` of
    * the k highest-scoring keys, (score desc, key asc). The exact
    * heavy-hitter-per-group selector — replaces the
    * `row_number() OVER (PARTITION BY g ORDER BY cnt DESC, term)` window
    * that would sort a vocabulary-sized count table in one reducer per
    * group (graft.functions.expressions.TopKByStrAgg).
    */
  def topKByStr(score: Column, key: Column, k: Int): Column =
    ColumnBridge.column(
      graft.functions.expressions.TopKByStrAgg(
        ColumnBridge.expression(score), ColumnBridge.expression(key), k)
        .toAggregateExpression())

  /** Cosine similarity; callers joining many pairs should precompute norms
    * per side once instead of calling this (it recomputes both norms).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Element-wise mean aggregate (`array<double>` centroid) with O(dim)
    * mergeable state (graft.functions.expressions.VectorAvgAgg) — per-label
    * centroids of an arbitrarily large embedding table shuffle only
    * (labels × partitions) fixed-size buffers.
    */
  def vectorAvg(v: Column): Column =
    ColumnBridge.column(
      graft.functions.expressions.VectorAvgAgg(
        ColumnBridge.expression(v)).toAggregateExpression())
}
