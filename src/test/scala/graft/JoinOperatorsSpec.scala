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
}
