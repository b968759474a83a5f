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

  /** Cosine similarity; callers joining many pairs should precompute norms
    * per side once instead of calling this (it recomputes both norms).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
