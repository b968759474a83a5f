package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join — match points to [lo, hi] intervals when the
  * two sides share no equi-key. Spark plans the naive
  * `ON point BETWEEN lo AND hi` as BroadcastNestedLoop/cartesian — dead at
  * scale for two large sides.
  *
  * Bucket decomposition turns it into an EQUI-join: pick a band width W,
  * each point lands in bucket floor(point/W), each interval explodes into
  * the buckets it overlaps (ceil((hi-lo)/W)+1 rows — bounded when interval
  * lengths are bounded, the common case), join on the bucket id, then
  * filter the exact BETWEEN. Join fan-out per row is bounded by bucket
  * occupancy; no cartesian node anywhere. Choose W near the typical
  * interval length: larger W = fewer interval replicas but fuller buckets.
  */
object RangeJoin {

  /** @param w band width (same unit as the point/interval columns). */
  def intervalJoin(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      w: Double): DataFrame = {
    require(w > 0, "band width must be positive")
    val p = points.withColumn("__bucket", floor(col(pointCol) / w).cast("long"))
    val i = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / w).cast("long"),
        floor(col(hiCol) / w).cast("long"))))
    p.join(i, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
