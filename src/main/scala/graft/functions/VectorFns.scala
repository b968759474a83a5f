package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from codegen'd
  * higher-order functions (`zip_with`/`aggregate`) — no UDFs, so the dot
  * product stays inside WholeStageCodegen. Elements are widened to double
  * BEFORE multiplying so results are reproducible against any engine doing
  * double math (the DuckDB oracle).
  */
object VectorFns {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; callers joining many pairs should precompute norms
    * per side once instead of calling this (it recomputes both norms).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
