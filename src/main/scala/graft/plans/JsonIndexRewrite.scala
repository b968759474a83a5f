package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Transparent JSON-index rewrite (reference: /root/reference/basics/
  * indexing/json-index.md — Pinot flattens configured JSON paths at
  * ingestion so JSON predicates are answered from the index, never by
  * parsing documents per row).
  *
  * The Spark-native analog: `SegmentWriter.write(derivedJsonCols =
  * Seq(("props", "$.user.id"), ...))` materializes the extracted path as
  * a stored string column next to the raw JSON. This optimizer rule
  * rewrites any `get_json_object(col, '<path>')` whose input scan already
  * CARRIES the matching derived column into a direct reference to it:
  *
  *   - the per-row JSON parse disappears from the plan entirely;
  *   - a filter on the extracted value becomes a plain column predicate,
  *     so it PUSHES DOWN to parquet row-group min/max stats — the
  *     json-index serving path;
  *   - at 100 TB that converts a parse-every-document scan into
  *     stats-pruned reads of one narrow string column.
  *
  * Semantics are identical by construction: the stored column IS
  * `get_json_object(col, path)` computed at write time over the same
  * bytes (including its null behavior on missing paths / malformed
  * docs), so write-time and query-time extraction agree on any input.
  * `spark.graft.jsonIndex.enabled=false` disables the rule (the parity
  * spec compares rewritten vs raw runs).
  */
class JsonIndexRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.jsonIndex.enabled", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case node =>
        val available = node.children.flatMap(_.output)
        if (available.isEmpty) node
        else node.transformExpressionsUp {
          case g @ GetJsonObject(json: AttributeReference,
              Literal(path: UTF8String, StringType)) =>
            val name = graft.sources.SegmentWriter
              .derivedJsonName(json.name, path.toString)
            available
              .find(a => a.name.equalsIgnoreCase(name) && a.dataType == StringType)
              .getOrElse(g)
        }
    }
  }
}
