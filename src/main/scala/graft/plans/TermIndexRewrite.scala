package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Transparent TEXT-INDEX rewrite (reference: /root/reference/basics/
  * indexing/native-text-index.md — Pinot tokenizes text columns at
  * ingestion so TEXT_CONTAINS is answered from stored terms, never by
  * re-analyzing documents per row).
  *
  * The Spark-native analog: `SegmentWriter.write(derivedTermCols =
  * Seq("text"))` stores `text__terms` — the column's distinct lowercase
  * whitespace-run tokens — next to the raw text. This optimizer rule
  * rewrites the compiled TEXT_CONTAINS shape
  * `array_contains(split(lower(text), '\s+'), 'term')` into
  * `array_contains(text__terms, 'term')` whenever the scan already
  * carries the stored array:
  *
  *   - the per-row lower+split (the expensive part of a text predicate —
  *     one regex pass and an array build per document) disappears from
  *     the plan;
  *   - the filter reads the narrow token array instead of the full text
  *     column, so a TEXT_CONTAINS-only query never decodes document
  *     bodies at all — the native-text-index serving path.
  *
  * Semantics are identical by construction: the stored array IS the same
  * tokenization computed at write time over the same bytes, and
  * array_contains over the distinct array equals array_contains over the
  * raw one. `spark.graft.termIndex.enabled=false` disables the rule (the
  * parity spec compares rewritten vs raw runs).
  */
class TermIndexRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.termIndex.enabled", "true").toBoolean

  private val SplitPattern = UTF8String.fromString("\\s+")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case node =>
        val available = node.children.flatMap(_.output)
        if (available.isEmpty) node
        else node.transformExpressionsUp {
          case ac @ ArrayContains(
              StringSplit(Lower(text: AttributeReference),
                Literal(p: UTF8String, StringType), Literal(-1, _)),
              term) if p == SplitPattern =>
            val name = graft.sources.SegmentWriter.derivedTermsName(text.name)
            available
              .find(a => a.name.equalsIgnoreCase(name) &&
                a.dataType.isInstanceOf[ArrayType] &&
                a.dataType.asInstanceOf[ArrayType].elementType == StringType)
              .map(terms => ArrayContains(terms, term))
              .getOrElse(ac)
        }
    }
  }
}
