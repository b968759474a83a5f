package graft

import org.apache.spark.sql.functions._
import graft.functions.SketchFns._
import graft.functions.expressions.KllState

/** KLL-style mergeable quantile sketch: exact-below-k contract, empirical
  * rank-error bound for the compacting regime, mergeability, the
  * rank/quantile inverse relation, and the SQL registration.
  */
class KllSpec extends SparkSpec {

  private def refRank(sorted: Array[Double], q: Double): Double = {
    val target = math.max(1L, math.ceil(q * sorted.length).toLong).toInt
    sorted(target - 1)
  }

  private def trueRankFraction(sorted: Array[Double], v: Double): Double = {
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (sorted(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toDouble / sorted.length
  }

  // deterministic pseudo-random stream (no Math.random in specs)
  private def stream(n: Int, seed: Long): Array[Double] = {
    var x = seed
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 11).toDouble / (1L << 53).toDouble) * 1000.0
    }
  }

  test("exact below k: the sketch is the sorted multiset, quantiles are true order statistics") {
    val data = stream(5000, seed = 7)
    val st = new KllState(8192)
    data.foreach(st.add)
    val sorted = data.sorted
    for (q <- Seq(0.01, 0.25, 0.5, 0.9, 0.99))
      assert(st.quantile(q) === refRank(sorted, q), s"q=$q")
  }

  test("exact regime is merge-order invariant (partials over arbitrary splits)") {
    val data = stream(4000, seed = 11)
    val sorted = data.sorted
    // 7 uneven splits merged in a scrambled order
    val splits = data.grouped(613).toSeq
    val partials = splits.map { chunk =>
      val p = new KllState(8192); chunk.foreach(p.add); p }
    val merged = new KllState(8192)
    partials.reverse.foreach(merged.mergeFrom)
    for (q <- Seq(0.1, 0.5, 0.77))
      assert(merged.quantile(q) === refRank(sorted, q), s"q=$q")
  }

  test("compacting regime: rank error bounded, with and without merge") {
    val data = stream(20000, seed = 3)
    val sorted = data.sorted
    val direct = new KllState(256)
    data.foreach(direct.add)
    // split-and-merge build (the shuffle partial path)
    val merged = new KllState(256)
    data.grouped(3001).foreach { chunk =>
      val p = new KllState(256); chunk.foreach(p.add); merged.mergeFrom(p) }
    for (st <- Seq(direct, merged); q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
      val got = st.quantile(q)
      val err = math.abs(trueRankFraction(sorted, got) - q)
      assert(err <= 0.08, s"rank error $err at q=$q (k=256, n=20000)")
    }
  }

  test("kll_rank inverts kll_quantile within the same error band") {
    val data = stream(20000, seed = 19)
    val st = new KllState(256)
    data.foreach(st.add)
    for (q <- Seq(0.2, 0.5, 0.8)) {
      val r = st.rankOf(st.quantile(q))
      assert(math.abs(r - q) <= 0.08, s"rank(quantile($q)) = $r")
    }
  }

  test("sketch state stays O(k) while n grows (the shuffle-size contract)") {
    val st = new KllState(256)
    stream(100000, seed = 23).foreach(st.add)
    val retained = st.levels.map(_.length).sum
    assert(retained <= 4 * 256, s"retained $retained items for k=256, n=100k")
  }

  test("SQL registration: kll functions work from plain SQL and match the Column API") {
    val df = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), col("value"))
    df.createOrReplaceTempView("kll_ev")
    val viaSql = spark.sql(
      """SELECT event_type,
          kll_quantile(kll_sketch_agg(value, 65536), 0.5D) AS p50
         FROM kll_ev GROUP BY 1 ORDER BY 1""").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaApi = df.groupBy("event_type")
      .agg(kllQuantile(kllSketch(col("value"), 65536), lit(0.5)).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaSql === viaApi)
    assert(viaSql.nonEmpty)
    // scalar kll_union from SQL: folding the per-type sketches pairwise must
    // agree with the one-shot global sketch (exact regime, so equality is exact)
    val global = spark.sql(
      """SELECT kll_quantile(kll_sketch_agg(value, 65536), 0.5D) FROM kll_ev""")
      .head().getDouble(0)
    val folded = spark.sql(
      """SELECT kll_quantile(kll_union_agg(sk, 65536), 0.5D) FROM (
           SELECT kll_union(sk, sk2) AS sk FROM (
             SELECT kll_sketch_agg(value, 65536) AS sk,
                    kll_sketch_agg(CAST(NULL AS DOUBLE), 65536) AS sk2
             FROM kll_ev GROUP BY event_type))""")
      .head().getDouble(0)
    assert(folded === global)
  }
}
