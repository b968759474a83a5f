package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant two-stage aggregation. A single hot key at 100 TB pins
  * one reducer; salting fans the key across `saltBuckets` partial groups
  * (map-side friendly), then merges the partials — sums/counts/min/max
  * re-aggregate losslessly. AQE's skew handling covers joins; this covers
  * the aggregation side.
  */
object Salting {

  final case class Metric(col: String, agg: String) // agg: sum|count|min|max

  def saltedAgg(
      df: DataFrame, keys: Seq[String], metrics: Seq[Metric],
      saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 0)
    def partial(m: Metric): Column = m.agg match {
      case "sum" => sum(col(m.col)).as(s"p_${m.agg}_${m.col}")
      case "count" => count(lit(1)).as(s"p_${m.agg}_${m.col}")
      case "min" => min(col(m.col)).as(s"p_${m.agg}_${m.col}")
      case "max" => max(col(m.col)).as(s"p_${m.agg}_${m.col}")
    }
    def merge(m: Metric): Column = {
      val p = col(s"p_${m.agg}_${m.col}")
      (m.agg match {
        case "sum" | "count" => sum(p)
        case "min" => min(p)
        case "max" => max(p)
      }).as(s"${m.agg}_${m.col}")
    }
    // Salt must be DETERMINISTIC per row: a random/row-id salt used as a
    // shuffle key re-deals rows on task retry (SPARK-23207-style lost or
    // doubled updates). Hashing every non-key column keeps hot-key rows
    // spread while staying stable under recomputation.
    val nonKey: Seq[String] = df.columns.toSeq.filterNot(keys.contains)
    val saltSrc: Seq[String] = if (nonKey.nonEmpty) nonKey else df.columns.toSeq
    val salted = df.withColumn("__salt",
      pmod(hash(saltSrc.map(col(_)): _*), lit(saltBuckets)))
    val stage1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial(metrics.head), metrics.tail.map(partial): _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(merge(metrics.head), metrics.tail.map(merge): _*)
  }
}
