package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.engine.Tables
import graft.functions.SketchFns._
import graft.functions.expressions.ThetaState

/** Theta-sketch (KMV) correctness: exactness below k, split-invariant
  * merging for arbitrary streams, algebraic consistency of the set ops,
  * and fixture error bounds for every estimate q_theta_setops emits.
  */
class ThetaSketchSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(200)
      .withInitialSeed(org.scalacheck.rng.Seed(47L))
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  private def stateOf(k: Int, xs: Iterable[Long]): ThetaState = {
    val st = new ThetaState(k)
    xs.foreach(v => st.addHash(ThetaState.hash63(v)))
    st
  }

  test("sketch is exact while untrimmed (distinct count < k)") {
    val st = stateOf(256, (1L to 200L) ++ (1L to 200L))
    assert(st.theta == Long.MaxValue)
    assert(math.round(st.estimate) == 200L)
  }

  test("merge is split-invariant for arbitrary streams (ScalaCheck)") {
    val values = Gen.listOf(Gen.chooseNum(0L, 5000L))
    check(Prop.forAll(values, Gen.chooseNum(2, 6)) { (xs, nParts) =>
      val whole = stateOf(64, xs)
      val parts = Seq.fill(nParts)(new ThetaState(64))
      xs.zipWithIndex.foreach { case (v, i) =>
        parts(i % nParts).addHash(ThetaState.hash63(v))
      }
      val merged = new ThetaState(64)
      parts.foreach(merged.mergeFrom)
      merged.theta == whole.theta &&
        merged.hashes.equals(whole.hashes)
    })
  }

  test("KMV estimate is within 3/sqrt(k) of truth for uniform streams") {
    // deterministic pseudo-random values; truth = distinct count
    val xs = (0 until 20000).map(i => (i * 2654435761L) % 15000)
    val truth = xs.distinct.size
    val st = stateOf(1024, xs.map(_.toLong))
    val rel = math.abs(st.estimate - truth) / truth
    assert(rel <= 3.0 / math.sqrt(1024), s"truth=$truth est=${st.estimate} rel=$rel")
  }

  test("set algebra: estimate(A∩B) + estimate(A\\B) == estimate(A) when untrimmed") {
    val spark2 = spark
    import spark2.implicits._
    val a = (1L to 150L).toDF("v")
    val b = (100L to 250L).toDF("v")
    val ska = a.agg(thetaSketch(col("v"), 512).as("sk"))
    val skb = b.agg(thetaSketch(col("v"), 512).as("sk"))
    val row = ska.crossJoin(skb.withColumnRenamed("sk", "sk2"))
      .select(
        thetaEstimate(col("sk")).as("na"),
        thetaEstimate(thetaIntersect(col("sk"), col("sk2"))).as("nboth"),
        thetaEstimate(thetaANotB(col("sk"), col("sk2"))).as("nonly"),
        thetaEstimate(thetaUnion(col("sk"), col("sk2"))).as("neither"))
      .head()
    assert(row.getLong(0) == 150L)
    assert(row.getLong(1) == 51L)  // 100..150
    assert(row.getLong(2) == 99L)  // 1..99
    assert(row.getLong(3) == 250L) // 1..250
  }

  test("aggregate is partitioning-invariant on the fixture") {
    val o = Tables.orders(spark, sfDir).select(col("o_custkey"))
    def est(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(thetaSketch(col("o_custkey"), 128).as("sk"))
        .select(thetaEstimate(col("sk"))).head().getLong(0)
    assert(est(o) == est(o.repartition(7)))
  }

  test("q_theta_setops estimates are within KMV error of the exact counts") {
    import graft.queries.Registry
    val o = Tables.orders(spark, sfDir)
      .withColumn("yr", expr("year(o_orderdate)"))
      .filter(col("yr").isin(1996, 1997))
      .select("yr", "o_custkey")
    val a = o.filter(col("yr") === 1996).select("o_custkey").distinct()
    val b = o.filter(col("yr") === 1997).select("o_custkey").distinct()
    val na = a.count(); val nb = b.count()
    val nBoth = a.intersect(b).count()
    val nOnly = a.exceptAll(b.distinct()).count()
    val nEither = a.union(b).distinct().count()

    val est = Registry.queries("q_theta_setops")(spark, sfDir).head()
    def rel(got: Long, truth: Long): Double =
      math.abs(got - truth).toDouble / math.max(truth, 1L)
    // KMV with k=256: rse ≈ 1/sqrt(k-1) ≈ 6.3%; 2σ single-sketch bound,
    // wider for intersection/difference whose error scales with the
    // (larger) union's theta rather than the result size.
    assert(rel(est.getLong(est.fieldIndex("n_1996")), na) <= 0.13, s"n_1996 $est vs $na")
    assert(rel(est.getLong(est.fieldIndex("n_1997")), nb) <= 0.13, s"n_1997 $est vs $nb")
    assert(rel(est.getLong(est.fieldIndex("n_either")), nEither) <= 0.13)
    assert(rel(est.getLong(est.fieldIndex("n_both")), nBoth) <= 0.25)
    assert(rel(est.getLong(est.fieldIndex("n_only_1996")), nOnly) <= 0.25)
  }

  test("cube rollup: union of cell sketches is byte-identical to the direct sketch") {
    val ev = Tables.events(spark, sfDir)
    val cells = ev
      .groupBy(col("event_type"), expr("date_trunc('day', ts)").as("day"))
      .agg(thetaSketch(col("user_id"), 64).as("sk"))
    val rolled = cells.groupBy("event_type")
      .agg(thetaUnionAgg(col("sk"), 64).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val direct = ev.groupBy("event_type")
      .agg(thetaSketch(col("user_id"), 64).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(rolled.keySet === direct.keySet)
    // k=64 forces trimming on the fixture, so this pins the strong
    // KMV invariant: k-smallest-of-union == k-smallest, regardless of
    // how the rows were grouped into cells first
    rolled.foreach { case (t, sk) => assert(sk === direct(t), s"cube rollup differs for $t") }
    // and the registry query serves plausible estimates from the cells
    val est = graft.queries.Registry.queries("q_theta_cube")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (t, e) =>
      val rel = math.abs(e - exact(t)).toDouble / math.max(exact(t), 1L)
      assert(rel <= 0.13, s"$t: est=$e exact=${exact(t)}")
    }
  }

  test("q_theta_jaccard estimates bound the exact cohort Jaccard per pair") {
    import graft.queries.Registry
    val ev = Tables.events(spark, sfDir).select("event_type", "user_id")
    val cohorts = ev.collect().groupBy(_.getString(0))
      .map { case (t, rows) => t -> rows.map(_.getLong(1)).toSet }
    val rows = Registry.queries("q_theta_jaccard")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (cohorts(r.getString(0)), cohorts(r.getString(1)))
      val exact = a.intersect(b).size.toDouble / a.union(b).size
      val est = r.getDouble(2)
      // intersection error dominates (scales with union's theta); the
      // ratio of two estimates gets an additive bound, not relative
      assert(math.abs(est - exact) <= 0.25,
        s"${r.getString(0)}/${r.getString(1)}: est=$est exact=$exact")
    }
  }
}
