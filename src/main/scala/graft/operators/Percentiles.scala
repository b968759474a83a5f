package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles (quantile_cont semantics) via a value
  * histogram instead of Spark's built-in exact `percentile` aggregate.
  *
  * Scale design: the built-in collects a value→count map PER GROUP in a
  * single reducer — with TPC-H-style few-group aggregations that is one
  * task holding a whole group's value set, the classic 100 TB killer.
  * Here the heavy pass is an ordinary partial-aggregating groupBy on
  * (group, value) — map-side combined, any number of reducers — and the
  * ranking work happens on the HISTOGRAM, whose size is the number of
  * distinct values (for Pinot-style dictionary-encoded metrics, tiny).
  * The interpolation positions h = p·(n−1) land in exactly one
  * cumulative-count interval each; one conditional aggregate per
  * percentile picks the bracketing values. This mirrors how Pinot
  * answers PERCENTILE over a dictionary/range index without re-sorting
  * rows (/root/reference/basics/indexing/forward-index.md — dictionary
  * encoding is the default layout).
  */
object Percentiles {

  /** One output row per group: `grpCols ++ specs.map(_._1)`.
    * Each spec is (outputName, valueColumn, percentile in [0,1]).
    * Matches DuckDB `quantile_cont` / Spark `percentile` exactly
    * (linear interpolation at h = p·(n−1); nulls excluded).
    */
  def exact(df: DataFrame, grpCols: Seq[String], specs: Seq[(String, String, Double)]): DataFrame = {
    require(grpCols.nonEmpty && specs.nonEmpty, "need grouping columns and percentile specs")
    specs.foreach { case (name, _, p) =>
      require(p >= 0.0 && p <= 1.0, s"percentile $name=$p outside [0, 1]")
    }
    require(specs.map(_._1).distinct.size == specs.size, "duplicate output names")
    val grp = grpCols.map(col)
    val perValueCol = specs.groupBy(_._2).toSeq.map { case (valCol, ss) =>
      val hist = df.filter(col(valCol).isNotNull)
        .groupBy(grp :+ col(valCol).cast("double").as("__v"): _*)
        .agg(count(lit(1)).as("__cnt"))
      interpolate(hist, grpCols, ss.map { case (name, _, p) => (name, p) })
    }
    perValueCol.reduce { (a, b) => a.join(b, grpCols, "full_outer") }
      .select(grpCols.map(col) ++ specs.map(s => col(s._1)): _*)
  }

  /** Cumulative ranking over a value HISTOGRAM (`grpCols ++ (__v, __cnt)`)
    * — adds `__start`/`__end` (0-based cumulative-count interval of each
    * distinct value within its group, ordered by `__v`) and `__n` (group
    * total). TWO-PHASE BUCKETED ranking (r15 optimization round): the
    * group's value dictionary is range-banded into `spark.sql.shuffle.
    * partitions` buckets (band edges from an in-plan per-group min/max
    * aggregate — monotonic in `__v`, so bucket order ≡ value order), the
    * per-bucket totals rank on a bucket-count-sized frame, and the
    * per-value cumulative sum runs ONE WindowExec partitioned by
    * (group, bucket) — parallel across the dictionary, where the previous
    * Window.partitionBy(group) sorted each group's WHOLE dictionary in a
    * single task (with few groups: single-digit parallelism regardless of
    * cluster size — the last per-group-serial stage in the engine).
    * Bit-identical to the one-window form: counts are longs, a bucket's
    * offset is the exact sum of all lower buckets' counts, and addition
    * of longs is associative — every (__start, __end, __n) triple equals
    * the single-window value. The explicit fixed-N repartition before the
    * window is AQE-coalesce-exempt (a few-MB dictionary shuffle would
    * otherwise fold back to one task) and tracks the session's shuffle
    * parallelism, not a local constant.
    */
  private[graft] def cumulative(hist: DataFrame, grpCols: Seq[String]): DataFrame = {
    val grp = grpCols.map(col)
    val nb = hist.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val stats = hist.groupBy(grp: _*)
      .agg(min("__v").as("__blo"), max("__v").as("__bhi"))
    // floor((v−lo)/w) is monotonic non-decreasing in v for w>0, so bucket
    // id order refines value order; hi==lo (single distinct value) and
    // the v==hi edge both clamp into the last bucket.
    val banded = hist.join(broadcast(stats), grpCols)
      .withColumn("__b",
        when(col("__bhi") === col("__blo"), lit(0))
          .otherwise(least(
            floor((col("__v") - col("__blo")) /
              ((col("__bhi") - col("__blo")) / nb)), lit(nb - 1)))
          .cast("int"))
      .drop("__blo", "__bhi")
    val bw = Window.partitionBy(grp: _*).orderBy("__b")
    val bwAll = Window.partitionBy(grp: _*).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = banded.groupBy((grp :+ col("__b")): _*)
      .agg(sum("__cnt").as("__bc"))
      .withColumn("__off", sum("__bc").over(bw) - col("__bc"))
      .withColumn("__n", sum("__bc").over(bwAll))
      .select((grp :+ col("__b") :+ col("__off") :+ col("__n")): _*)
    val wv = Window.partitionBy((grp :+ col("__b")): _*).orderBy("__v")
    banded.join(broadcast(offsets), grpCols :+ "__b")
      .repartition(nb, (grp :+ col("__b")): _*)
      .withColumn("__end", col("__off") + sum("__cnt").over(wv))
      .withColumn("__start", col("__end") - col("__cnt"))
      .drop("__b", "__off")
  }

  /** Interpolated percentiles over an already-built value HISTOGRAM —
    * columns `grpCols ++ (__v double, __cnt long)`, one row per distinct
    * value per group. This is the piece pre-aggregated quantile state
    * (StarTree hist metrics, materialized segment histograms) shares with
    * the raw-scan path above: histograms merge by value-wise count
    * addition, so the same ranking math serves both.
    */
  private[graft] def interpolate(
      hist: DataFrame, grpCols: Seq[String], ss: Seq[(String, Double)]): DataFrame = {
    val grp = grpCols.map(col)
    val cum = cumulative(hist, grpCols)
    val aggs = ss.flatMap { case (name, p) =>
      val h = (col("__n") - 1) * lit(p)
      val lo = floor(h)
      val hi = ceil(h)
      Seq(
        max(when(lo >= col("__start") && lo < col("__end"), col("__v"))).as(s"__lo_$name"),
        max(when(hi >= col("__start") && hi < col("__end"), col("__v"))).as(s"__hi_$name"),
        max(h).as(s"__h_$name"))
    }
    val out = ss.map { case (name, _) =>
      (col(s"__lo_$name") +
        (col(s"__h_$name") - floor(col(s"__h_$name"))) *
          (col(s"__hi_$name") - col(s"__lo_$name"))).as(name)
    }
    cum.groupBy(grp: _*).agg(aggs.head, aggs.tail: _*)
      .select(grp ++ out: _*)
  }

  /** DISCRETE percentiles (percentile_disc / Pinot PERCENTILEEST
    * semantics: the smallest DATA VALUE whose cumulative share reaches p
    * — never interpolated). Same dictionary-histogram shape as `exact`:
    * the heavy pass is the partial-aggregating (group, value) count, the
    * pick is one conditional aggregate over the histogram — the value
    * whose cumulative interval contains rank ⌈p·n⌉.
    */
  def discrete(df: DataFrame, grpCols: Seq[String], specs: Seq[(String, String, Double)]): DataFrame = {
    require(grpCols.nonEmpty && specs.nonEmpty, "need grouping columns and percentile specs")
    val grp = grpCols.map(col)
    val perValueCol = specs.groupBy(_._2).toSeq.map { case (valCol, ss) =>
      val hist = df.filter(col(valCol).isNotNull)
        .groupBy(grp :+ col(valCol).cast("double").as("__v"): _*)
        .agg(count(lit(1)).as("__cnt"))
      val cum = cumulative(hist, grpCols)
      val aggs = ss.map { case (name, _, p) =>
        // 0-based rank of the picked element: ⌈p·n⌉ − 1 (p = 0 → first)
        val r = greatest(ceil(col("__n") * lit(p)) - 1, lit(0.0))
        max(when(r >= col("__start") && r < col("__end"), col("__v"))).as(name)
      }
      cum.groupBy(grp: _*).agg(aggs.head, aggs.tail: _*)
    }
    perValueCol.reduce { (a, b) => a.join(b, grpCols, "full_outer") }
      .select(grpCols.map(col) ++ specs.map(s => col(s._1)): _*)
  }

  /** All percentiles over ONE column, returned long-form:
    * (grpCols…, pos, q) with pos = index into `ps` — the multi-quantile
    * PERCENTILE shape.
    */
  def exactMulti(df: DataFrame, grpCols: Seq[String], valCol: String, ps: Seq[Double]): DataFrame = {
    val named = ps.zipWithIndex.map { case (p, i) => (s"__q_$i", valCol, p) }
    val wide = exact(df, grpCols, named)
    wide.select(grpCols.map(col) :+
      posexplode(array(named.map(n => col(n._1)): _*)).as(Seq("pos", "q")): _*)
  }

  /** WEIGHTED discrete percentiles: the smallest data value whose
    * cumulative WEIGHT reaches p·W (each row counts `weightCol` times —
    * the quantity-weighted median of a price, the token-weighted median
    * of a quality score). Identical plan shape to `discrete` with the
    * histogram's count replaced by a weight sum: the heavy pass is still
    * one partial-aggregating (group, value) rollup, the pick one
    * conditional aggregate over the dictionary-sized histogram. Integral
    * weights keep every cumulative comparison integer-exact.
    */
  def weightedDiscrete(
      df: DataFrame, grpCols: Seq[String], valCol: String, weightCol: String,
      specs: Seq[(String, Double)]): DataFrame = {
    require(grpCols.nonEmpty && specs.nonEmpty, "need grouping columns and percentile specs")
    val grp = grpCols.map(col)
    val hist = df.filter(col(valCol).isNotNull && col(weightCol).isNotNull)
      .groupBy(grp :+ col(valCol).cast("double").as("__v"): _*)
      .agg(sum(col(weightCol).cast("long")).as("__cnt"))
    val cum = cumulative(hist, grpCols)
    val aggs = specs.map { case (name, p) =>
      val r = greatest(ceil(col("__n") * lit(p)) - 1, lit(0.0))
      max(when(r >= col("__start") && r < col("__end"), col("__v"))).as(name)
    }
    cum.groupBy(grp: _*).agg(aggs.head, aggs.tail: _*)
      .select(grp ++ specs.map(s => col(s._1)): _*)
  }
}
