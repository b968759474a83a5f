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

  /** Adaptive-width interval join. A fixed W is only right at ONE interval
    * density: when the interval table grows inside the same value domain
    * (the 10×-scale shape), per-bucket occupancy — and therefore the
    * equi-join's intermediate — grows with it even though the true output
    * is bounded by genuine overlap. Two plan-only changes (the exact
    * BETWEEN filter makes the RESULT invariant to both):
    *
    *  1. WIDTH from the interval-length distribution and density: start
    *     at the classic W ≈ mean length, shrink toward meanLen/8 when the
    *     expected per-bucket interval count n·(len+W)/domain exceeds
    *     `targetPerBucket` (finer buckets = fewer false candidates and a
    *     better shuffle spread), and never below maxLen/256 so a single
    *     long interval cannot explode into unbounded replicas.
    *  2. PRUNE points through a broadcast semi-join on the DISTINCT
    *     interval-bucket dictionary (≤ coveredDomain/W + n rows — the
    *     covered-value dictionary, not the corpus): points no interval
    *     can match never enter the shuffle at all. At 100 TB this is the
    *     difference between shuffling every fact row and shuffling only
    *     the coverable ones (the ID_SET economics, applied to ranges).
    *
    * The one-row interval stats aggregate is driver-resident-by-design
    * bounded state (the scalar-N pattern's collect form): count, mean/max
    * length, domain edges — 5 numbers regardless of corpus size.
    */
  /** The width rule, separated for property testing: W solving
    * n·(lmean+W)/domain = targetPerBucket, clamped to [lmean/8, lmean]
    * and to ≥ lmax/256 (replica bound for the longest interval).
    */
  private[graft] def adaptiveWidth(
      n: Long, lmean: Double, lmax: Double, domain: Double,
      targetPerBucket: Int): Double = {
    val nn = math.max(n, 1L).toDouble
    val lm = math.max(lmean, 1e-9)
    val lx = math.max(lmax, lm)
    val dom = math.max(domain, lm)
    val wDensity = targetPerBucket.toDouble * dom / nn - lm
    // the longest-interval replica bound OVERRIDES the mean-length cap —
    // a heavy-tailed length distribution must widen, never explode
    math.max(lx / 256.0, math.min(lm, math.max(lm / 8.0, wDensity)))
  }

  def intervalJoinAuto(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      targetPerBucket: Int = 64): DataFrame = {
    val st = intervals.agg(
      count(lit(1)).as("n"),
      avg(col(hiCol) - col(loCol)).as("lmean"),
      max(col(hiCol) - col(loCol)).as("lmax"),
      min(col(loCol)).as("dlo"),
      max(col(hiCol)).as("dhi")).head()
    if (st.isNullAt(1)) return intervalJoin(
      points, intervals, pointCol, loCol, hiCol, 1.0) // empty intervals
    val w = adaptiveWidth(
      n = st.getLong(0), lmean = st.getDouble(1), lmax = st.getDouble(2),
      domain = st.getDouble(4) - st.getDouble(3),
      targetPerBucket = targetPerBucket)

    val p = points.withColumn("__bucket", floor(col(pointCol) / w).cast("long"))
    val i = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / w).cast("long"),
        floor(col(hiCol) / w).cast("long"))))
    val coveredBuckets = i.select("__bucket").distinct()
    p.join(broadcast(coveredBuckets), Seq("__bucket"), "left_semi")
      .join(i, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval-AGGREGATION join: per-interval COUNT + SUMs of the matching
    * points, WITHOUT materializing the point×interval pair explosion.
    *
    * When every point is covered by many intervals (dense bands), even a
    * perfectly bucketed pair join must produce |true pairs| intermediate
    * rows before the aggregate collapses them — inherently super-linear
    * work for a linearly-growing aggregate answer. The decomposition that
    * avoids it: a bucket b strictly INSIDE an interval's bucket span
    * (floor(lo/W) < b < floor(hi/W)) is fully covered BY CONSTRUCTION
    * (every point with floor(v/W)=b has b·W ≤ v < (b+1)·W ⊆ [lo, hi] —
    * integer bucket logic, no float fuzz), so the interval can consume
    * that bucket's pre-aggregated (count, sums) row wholesale; only the
    * ≤2 EDGE buckets per interval need point-level BETWEEN checks. Work:
    * one corpus→bucket-dictionary rollup (map-side combined) + an
    * equi-join of interval interior replicas against the dictionary + an
    * edge join touching ~2·(points per bucket) rows per interval — vs
    * |true pairs| for any pair-producing plan.
    *
    * `sumCols` must be INTEGRAL (long) columns: bucket partials then
    * recombine exactly in any order (the per-row cents discipline), so
    * the decomposed sum is bit-identical to a direct aggregation.
    */
  def intervalAggJoin(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      sumCols: Seq[String],
      targetPerBucket: Int = 64): DataFrame = {
    val st = intervals.agg(
      count(lit(1)).as("n"),
      avg(col(hiCol) - col(loCol)).as("lmean"),
      max(col(hiCol) - col(loCol)).as("lmax"),
      min(col(loCol)).as("dlo"),
      max(col(hiCol)).as("dhi")).head()
    val w =
      if (st.isNullAt(1)) 1.0
      else adaptiveWidth(
        n = st.getLong(0), lmean = st.getDouble(1), lmax = st.getDouble(2),
        domain = st.getDouble(4) - st.getDouble(3),
        targetPerBucket = targetPerBucket)

    val ivCols = intervals.columns.toSeq
    val aggExprs = (count(lit(1)).cast("long").as("n_points") +:
      sumCols.map(c => sum(col(c)).as(s"sum_$c")))
    val partialExprs = (sum(col("n_points")).as("n_points") +:
      sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")))

    val p = points.withColumn("__bucket", floor(col(pointCol) / w).cast("long"))
    val iv = intervals
      .withColumn("__bl", floor(col(loCol) / w).cast("long"))
      .withColumn("__bh", floor(col(hiCol) / w).cast("long"))

    // corpus → bucket dictionary (one map-side-combined rollup)
    val bagg = p.groupBy("__bucket").agg(aggExprs.head, aggExprs.tail: _*)

    // interior buckets consume dictionary partials wholesale
    val interior = iv.filter(col("__bh") - col("__bl") >= 2)
      .withColumn("__bucket",
        explode(sequence(col("__bl") + 1, col("__bh") - 1)))
      .join(bagg, Seq("__bucket"))
      .select((ivCols.map(col) :+ col("n_points")) ++
        sumCols.map(c => col(s"sum_$c")): _*)

    // edge buckets get exact point-level checks; prune the point scan to
    // the edge-bucket dictionary first (broadcast semi — ≤ 2·|intervals|
    // distinct ids; dimension-class when intervals are)
    val edgeIv = iv.withColumn("__bucket",
      explode(array_distinct(array(col("__bl"), col("__bh")))))
    val pEdge = p.join(
      broadcast(edgeIv.select("__bucket").distinct()), Seq("__bucket"), "left_semi")
    val edges = edgeIv.join(pEdge, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .groupBy(ivCols.map(col): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
      .select((ivCols.map(col) :+ col("n_points")) ++
        sumCols.map(c => col(s"sum_$c")): _*)

    interior.unionByName(edges)
      .groupBy(ivCols.map(col): _*)
      .agg(partialExprs.head, partialExprs.tail: _*)
  }
}
