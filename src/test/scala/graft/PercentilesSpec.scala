package graft

import org.apache.spark.sql.functions._
import graft.operators.Percentiles

class PercentilesSpec extends SparkSpec {

  test("histogram percentiles equal the built-in exact percentile") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // duplicate-heavy (dictionary-like) and continuous columns, plus nulls
    val rows = (1 to 5000).map { i =>
      val g = Seq("a", "b", "c")(i % 3)
      val dict = (rnd.nextInt(40) + 1).toDouble
      val cont = rnd.nextDouble() * 1e6
      (g, dict, if (i % 11 == 0) None else Some(cont))
    }
    val df = rows.toDF("g", "dict", "cont")
    val got = Percentiles.exact(df, Seq("g"),
      Seq(("d50", "dict", 0.5), ("d90", "dict", 0.9),
        ("c25", "cont", 0.25), ("c95", "cont", 0.95)))
      .orderBy("g").collect()
    val want = df.groupBy("g").agg(
      expr("percentile(dict, 0.5)").as("d50"),
      expr("percentile(dict, 0.9)").as("d90"),
      expr("percentile(cont, 0.25)").as("c25"),
      expr("percentile(cont, 0.95)").as("c95"))
      .orderBy("g").collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (a, b) =>
      assert(a.getString(0) === b.getString(0))
      (1 to 4).foreach { i =>
        assert(math.abs(a.getDouble(i) - b.getDouble(i)) < 1e-6,
          s"col $i group ${a.getString(0)}: ${a.getDouble(i)} vs ${b.getDouble(i)}")
      }
    }
  }

  test("single-row and single-value groups interpolate to the value itself") {
    import spark.implicits._
    val df = Seq(("a", 5.0), ("b", 1.0), ("b", 1.0), ("b", 1.0)).toDF("g", "v")
    val out = Percentiles.exact(df, Seq("g"), Seq(("p50", "v", 0.5), ("p99", "v", 0.99)))
      .orderBy("g").collect()
    assert(out(0).getDouble(1) === 5.0 && out(0).getDouble(2) === 5.0)
    assert(out(1).getDouble(1) === 1.0 && out(1).getDouble(2) === 1.0)
  }

  test("exactMulti emits one (pos, q) row per requested percentile") {
    import spark.implicits._
    val df = (1 to 101).map(i => ("g", i.toDouble)).toDF("g", "v")
    val out = Percentiles.exactMulti(df, Seq("g"), "v", Seq(0.0, 0.25, 1.0))
      .orderBy("pos").collect()
    assert(out.map(_.getInt(1)).toSeq === Seq(0, 1, 2))
    assert(out.map(_.getDouble(2)).toSeq === Seq(1.0, 26.0, 101.0))
  }
}
