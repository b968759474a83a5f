package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.expressions.VectorDot

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions. Install with
  * `.config("spark.sql.extensions", "graft.engine.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — after that
  * `SELECT vector_dot(a, b)` works from plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (exprs: Seq[Expression]) => VectorDot(exprs.head, exprs(1))))
    // transparent star-tree pre-aggregation (fires only on fact tables
    // registered in graft.plans.StarTreeCatalog)
    ext.injectOptimizerRule(session => new graft.plans.StarTreeRewriteRule(session))
  }
}
