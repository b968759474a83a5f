package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin}

class JoinOperatorsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof matches the latest right row at or before each left row") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05")),
      (2L, 10L, ts("2024-01-01 00:00:10")),
      (3L, 10L, ts("2024-01-01 00:00:01")), // before any right row
      (4L, 20L, ts("2024-01-01 00:00:07"))
    ).toDF("l_id", "key", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 00:00:03"), 3.0),
      (101L, 10L, ts("2024-01-01 00:00:05"), 5.0), // tie with l_id=1: matches
      (102L, 10L, ts("2024-01-01 00:00:09"), 9.0),
      (103L, 20L, ts("2024-01-01 00:00:06"), 6.0)
    ).toDF("r_id", "key", "ts", "v")
    val got = AsOfJoin.asof(left, right, "key", "ts", "ts", Seq("r_id", "v"))
      .select("l_id", "r_id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_ => (r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got(1L) === Some((101L, 5.0)), "same-instant right row must match")
    assert(got(2L) === Some((102L, 9.0)))
    assert(got(3L) === None, "left row before all right rows gets nulls")
    assert(got(4L) === Some((103L, 6.0)))
  }

  test("asofForward matches the earliest right row at or after each left row") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05")),
      (2L, 10L, ts("2024-01-01 00:00:10")), // after all right rows on key 10
      (3L, 10L, ts("2024-01-01 00:00:01")),
      (4L, 20L, ts("2024-01-01 00:00:07"))
    ).toDF("l_id", "key", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 00:00:03"), 3.0),
      (101L, 10L, ts("2024-01-01 00:00:05"), 5.0), // tie with l_id=1: matches
      (102L, 10L, ts("2024-01-01 00:00:09"), 9.0),
      (103L, 20L, ts("2024-01-01 00:00:06"), 6.0)  // before l_id=4: no match
    ).toDF("r_id", "key", "ts", "v")
    val got = AsOfJoin.asofForward(left, right, "key", "ts", "ts", Seq("r_id", "v"))
      .select("l_id", "r_id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_ => (r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got(1L) === Some((101L, 5.0)), "same-instant right row must match forward too")
    assert(got(2L) === None, "left row after all right rows gets nulls")
    assert(got(3L) === Some((100L, 3.0)), "earliest following right row wins")
    assert(got(4L) === None)
  }

  test("asofForward on a time-reversed axis equals asof (duality)") {
    import spark.implicits._
    // negating the time axis turns earliest-at-or-after into
    // latest-at-or-before — the two directions must be exact duals
    val left = Seq((1L, 1L, 5L), (2L, 1L, 10L), (3L, 1L, 1L), (4L, 2L, 7L))
      .toDF("l_id", "key", "t")
    val right = Seq((100L, 1L, 3L), (101L, 1L, 5L), (102L, 1L, 9L), (103L, 2L, 6L))
      .toDF("r_id", "key", "t")
    def ts(df: org.apache.spark.sql.DataFrame, neg: Boolean) =
      df.withColumn("ts", timestamp_seconds(if (neg) -col("t") else col("t")))
    val fwd = AsOfJoin.asofForward(ts(left, neg = false), ts(right, neg = false),
        "key", "ts", "ts", Seq("r_id"))
      .select("l_id", "r_id").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val dual = AsOfJoin.asof(ts(left, neg = true), ts(right, neg = true),
        "key", "ts", "ts", Seq("r_id"))
      .select("l_id", "r_id").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fwd === dual)
  }

  test("asof ties on (key, ts) resolve to the greatest payload, deterministically") {
    import spark.implicits._
    // three right rows on the SAME (key, ts): without a payload
    // tiebreaker in the carry window's sort, the pick depends on
    // partitioning (a latent hash-flake); the documented rule is
    // lexicographically greatest payload struct
    // right rows at the SAME instant as the left row, so both directions
    // tie-match and the (key, ts) tie rule is what decides
    val left = Seq((1L, 10L, ts("2024-01-01 00:00:05"))).toDF("l_id", "key", "ts")
    val right = Seq(
      (101L, 10L, ts("2024-01-01 00:00:05"), 1.0),
      (103L, 10L, ts("2024-01-01 00:00:05"), 3.0),
      (102L, 10L, ts("2024-01-01 00:00:05"), 2.0)
    ).toDF("r_id", "key", "ts", "v")
    for (parts <- Seq(1, 3, 7)) {
      val r = right.repartition(parts)
      val back = AsOfJoin.asof(left, r, "key", "ts", "ts", Seq("r_id", "v"))
        .select("r_id", "v").collect().head
      assert((back.getLong(0), back.getDouble(1)) === ((103L, 3.0)),
        s"backward pick must be max payload at $parts partitions")
      val fwd = AsOfJoin.asofForward(left, r, "key", "ts", "ts", Seq("r_id", "v"))
        .select("r_id", "v").collect().head
      assert((fwd.getLong(0), fwd.getDouble(1)) === ((103L, 3.0)),
        s"forward pick must be max payload at $parts partitions")
    }
  }

  test("interval join equals the naive BETWEEN join on small data") {
    import spark.implicits._
    val points = Seq((1L, 3.0), (2L, 7.5), (3L, 12.0), (4L, 25.0))
      .toDF("p_id", "v")
    val intervals = Seq((10L, 0.0, 5.0), (11L, 5.0, 10.0), (12L, 7.0, 20.0))
      .toDF("i_id", "lo", "hi")
    val got = RangeJoin.intervalJoin(points, intervals, "v", "lo", "hi", w = 4.0)
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(intervals)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive)
    assert(naive === Set((1L, 10L), (2L, 11L), (2L, 12L), (3L, 12L)))
  }

  test("adaptive interval join equals the naive BETWEEN join (outliers, uncoverable points)") {
    import spark.implicits._
    // mixed lengths incl. one long outlier; points far outside the covered
    // domain exercise the broadcast bucket-dictionary prune
    val points = Seq((1L, 3.0), (2L, 7.5), (3L, 12.0), (4L, 25.0),
      (5L, -50.0), (6L, 1e6), (7L, 19.9))
      .toDF("p_id", "v")
    val intervals = Seq((10L, 0.0, 5.0), (11L, 5.0, 10.0), (12L, 7.0, 20.0),
      (13L, 2.0, 2.5), (14L, -10.0, 90.0))
      .toDF("i_id", "lo", "hi")
    val got = RangeJoin.intervalJoinAuto(points, intervals, "v", "lo", "hi")
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(intervals)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive)
    assert(naive.contains((7L, 12L)) && !naive.exists(_._1 == 6L))
  }

  test("interval-aggregation join equals the naive BETWEEN join + groupBy") {
    import spark.implicits._
    // dense coverage (every point in several bands), a sub-bucket
    // interval, an empty band (must be absent), negative values, and
    // duplicate point values — the decomposition's edge inventory
    val points = (1L to 60L).map(i => (i, (i % 30).toDouble - 5.0, (i % 30) - 5L))
      .toDF("p_id", "v", "cents")
    val intervals = Seq(
      (10L, 0.0, 20.0), (11L, -5.0, 25.0), (12L, 3.0, 3.4),
      (13L, 100.0, 200.0), (14L, 17.0, 18.0), (15L, -100.0, -50.0))
      .toDF("i_id", "lo", "hi")
    val got = RangeJoin.intervalAggJoin(
        points, intervals, "v", "lo", "hi", sumCols = Seq("cents"))
      .select("i_id", "n_points", "sum_cents").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val naive = points.crossJoin(intervals)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .groupBy("i_id")
      .agg(count(lit(1)).as("n"), sum("cents").as("s")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === naive)
    assert(!got.contains(13L) && !got.contains(15L),
      "empty bands must be absent (inner-join semantics)")
    assert(got(11L)._1 === 60L, "full-coverage band counts every point")
  }

  test("adaptive width shrinks with interval density and respects its bounds") {
    val lmean = 5000.0; val domain = 400000.0
    // sparse: the classic W ≈ mean length
    assert(RangeJoin.adaptiveWidth(100L, lmean, lmean, domain, 64) === lmean)
    // dense (the 10×-growth shape): width shrinks to spread the buckets…
    val dense = RangeJoin.adaptiveWidth(15000L, lmean, lmean, domain, 64)
    assert(dense < lmean && dense >= lmean / 8.0)
    // …monotonically in n, never below the floor
    val denser = RangeJoin.adaptiveWidth(150000L, lmean, lmean, domain, 64)
    assert(denser <= dense && denser >= lmean / 8.0)
    // a single long outlier cannot explode into unbounded replicas
    val outlier = RangeJoin.adaptiveWidth(1000000L, 10.0, 100000.0, 1e9, 64)
    assert(outlier >= 100000.0 / 256.0)
  }
}
