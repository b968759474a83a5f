package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.queries.Registry

/** Property evidence for the newest window/graph operators: the
  * interval-union island decomposition must equal a brute-force union
  * length on arbitrary interval sets, and label propagation must be
  * partitioning-invariant (the determinism its fixed-round synchronous
  * design exists to provide).
  */
class IntervalGraphSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(60)
      .withInitialSeed(org.scalacheck.rng.Seed(47L))
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  /** The window-island decomposition, applied to an arbitrary (st, en)
    * list — same logic as q_interval_overlap's plan.
    */
  private def sparkUnionLen(iv: Seq[(Long, Long)]): Long = {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("u").orderBy("st", "en", "i")
    iv.zipWithIndex.map { case ((s, e), i) => (1L, i.toLong, s, e) }
      .toDF("u", "i", "st", "en")
      .withColumn("pmax", max("en").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni", when(col("pmax").isNull || col("st") > col("pmax"), 1L).otherwise(0L))
      .withColumn("isl", sum("ni").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("u", "isl").agg((max("en") - min("st")).as("len"))
      .agg(sum("len")).head().getLong(0)
  }

  test("interval-union islands equal the brute-force union length (ScalaCheck)") {
    val interval = for {
      s <- Gen.chooseNum(0L, 200L)
      len <- Gen.chooseNum(1L, 50L)
    } yield (s, s + len)
    check(Prop.forAll(Gen.nonEmptyListOf(interval)) { iv =>
      // brute force: count covered integer points via a boolean axis
      val covered = Array.ofDim[Boolean](300)
      iv.foreach { case (s, e) =>
        (s until e).foreach(p => covered(p.toInt) = true)
      }
      sparkUnionLen(iv) == covered.count(identity).toLong
    })
  }

  test("q_interval_overlap totals are internally consistent") {
    val rows = Registry.queries("q_interval_overlap")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nIv, nIsl, covered) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nIsl >= 1 && nIsl <= nIv, s"islands $nIsl vs intervals $nIv")
      assert(covered > 0)
    }
    // merging must actually occur somewhere in the fixture (non-vacuous)
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)),
      "no user's intervals merged — the overlap logic is untested by this fixture")
  }

  test("label propagation is partitioning-invariant and labels come from the graph") {
    val spark2 = spark
    import spark2.implicits._
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("a", "c"),           // triangle community
      ("x", "y"), ("y", "z"), ("x", "z"),           // second triangle
      ("c", "x"))                                   // one bridge
      .toDF("src", "dst")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.graph.LabelProp.propagate(df, rounds = 3)
        .collect().map(r => (r.getString(0), r.getString(1))).toMap
    val base = run(edges)
    assert(run(edges.repartition(5)) === base)
    // every label is a node of the graph and each triangle is uniform
    val nodes = Set("a", "b", "c", "x", "y", "z")
    assert(base.keySet === nodes)
    base.values.foreach(l => assert(nodes.contains(l)))
    assert(Set(base("a"), base("b")).size == 1 || Set(base("b"), base("c")).size == 1)
  }
}
