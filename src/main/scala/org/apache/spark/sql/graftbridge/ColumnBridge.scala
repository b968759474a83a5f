package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made the Column/Expression
  * conversion `private[sql]` (Columns wrap ColumnNodes now); extension
  * libraries shipping custom Catalyst expressions reach it from inside the
  * `org.apache.spark.sql` namespace — the same approach Spark-native
  * libraries use. Only this file lives in Spark's namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER ColumnNode → Catalyst conversion. `expression` wraps the node
    * lazily (fine when the result flows back through the Dataset API,
    * which runs the converter itself); an Expression handed to the
    * ANALYZER directly — e.g. from a SparkSessionExtensions-registered
    * function builder — must already be a real Catalyst tree, or analysis
    * sees an opaque VOID-typed wrapper.
    */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
