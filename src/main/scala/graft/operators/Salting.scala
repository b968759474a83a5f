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

  /** Skew-resistant shuffle join: the fact side's hot key is split into
    * `saltBuckets` sub-keys (deterministic hash of the non-key columns —
    * same retry-safety argument as saltedAgg above) and the dim side is
    * replicated across every bucket, so a key holding 1/3 of a 100 TB
    * fact lands on `saltBuckets` reducers instead of one. Result is
    * row-identical to the plain join (every fact row still meets every
    * matching dim row exactly once — dim replication is keyed, not
    * sampled). Use when the dim is too large to broadcast AND the fact
    * key is skewed; for broadcastable dims prefer `broadcast(dim)`, and
    * note AQE's skew-join handles the sort-merge case adaptively — this
    * operator is the explicit form for when AQE's split heuristics
    * don't fire (e.g. a shuffle-hash join or pre-AQE-partitioned input).
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int = 8): DataFrame = {
    require(saltBuckets > 0)
    val nonKey = fact.columns.toSeq.filterNot(_ == key)
    val saltSrc = if (nonKey.nonEmpty) nonKey else fact.columns.toSeq
    val salted = fact.withColumn("__salt",
      pmod(hash(saltSrc.map(col(_)): _*), lit(saltBuckets)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
