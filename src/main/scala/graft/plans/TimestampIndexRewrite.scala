package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Transparent TIMESTAMP-index rewrite (reference: /root/reference/basics/
  * indexing/timestamp-index.md — Pinot pre-generates one `$ts$DAY`-style
  * column per configured granularity, then rewrites `datetrunc('DAY', ts)`
  * predicates and group-bys to read the derived column, with a range index
  * on it, instead of transforming every row at query time).
  *
  * The Spark-native analog: `SegmentWriter.write(derivedTimeCols =
  * Seq(("ts", "day"), ...))` materializes `ts_day`-style columns next to
  * the raw timestamp. This optimizer rule rewrites any
  * `date_trunc('<granularity>', ts)` whose input scan already CARRIES the
  * matching derived column into a direct reference to that column:
  *
  *   - the per-row truncation disappears from the plan entirely;
  *   - a filter on the truncated value becomes a plain column predicate,
  *     so it PUSHES DOWN to parquet row-group min/max stats (and prunes
  *     Hive partitions when the derived column is the partition key) —
  *     the "range index on every granularity column" behavior the
  *     reference describes;
  *   - at 100 TB that converts a full-scan transform+filter into stats-
  *     pruned reads, exactly like Pinot's timestamp index.
  *
  * Safety: the rewrite only fires when the node's child output contains a
  * TimestampType column named `SegmentWriter.derivedName(tsCol, gran)` and
  * the granularity literal is one Spark/`date_trunc` spells the same way
  * the writer did. Derived columns are computed at WRITE time under the
  * writer's session timezone — Graft.session pins UTC on both sides, which
  * is what makes write-time and query-time truncation agree (documented
  * engine invariant). `spark.graft.timestampIndex.enabled=false` disables
  * the rule (the parity spec uses this to compare rewritten vs raw runs).
  */
class TimestampIndexRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val granularities =
    Set("year", "quarter", "month", "week", "day", "hour", "minute", "second")

  private def enabled: Boolean =
    spark.conf.get("spark.graft.timestampIndex.enabled", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case node =>
        val available = node.children.flatMap(_.output)
        if (available.isEmpty) node
        else node.transformExpressionsUp {
          case t @ TruncTimestamp(Literal(fmt: UTF8String, StringType),
              ts: AttributeReference, _) =>
            val g = fmt.toString.toLowerCase
            if (!granularities.contains(g)) t
            else {
              val name = graft.sources.SegmentWriter.derivedName(ts.name, g)
              available
                .find(a => a.name.equalsIgnoreCase(name) && a.dataType == TimestampType)
                .getOrElse(t)
            }
        }
    }
  }
}
