package graft

import org.apache.spark.sql.functions._
import graft.operators.{IdSet, Salting}

/** Contracts behind q_idset_filter and q_salted_join: the bloom id-set
  * never loses a member (false negatives would lose ROWS, not pruning),
  * its false-positive rate stays near the build-time fpp (that bounds how
  * much useless data reaches the exact confirm join), and the salted join
  * is row-identical to the plain join it replaces.
  */
class IdSetSpec extends SparkSpec {

  test("id-set has no false negatives and fpp-bounded false positives") {
    import spark.implicits._
    val members = (0L until 5000L).map(_ * 3L)
    val df = members.toDF("id")
    val set = IdSet.build(df, "id", expectedItems = 5000L, fpp = 0.01)

    // every member passes (probe through the same codegen'd expression
    // the query uses, not the driver-side sketch object)
    val kept = df.filter(IdSet.in(col("id"), set)).count()
    assert(kept === members.size.toLong, "bloom id-set must never drop a member")

    // non-members (ids ≡ 1 mod 3 — disjoint from members) pass at ~fpp
    val nonMembers = (0L until 5000L).map(_ * 3L + 1L).toDF("id")
    val fp = nonMembers.filter(IdSet.in(col("id"), set)).count()
    assert(fp <= 5000L * 0.05,
      s"false-positive rate ${fp / 5000.0} far above the 0.01 build fpp")
  }

  test("id-set round-trips through base64 and the SQL function") {
    import spark.implicits._
    val df = (0L until 100L).toDF("id")
    val set = IdSet.build(df, "id", expectedItems = 100L, fpp = 0.01)
    val b64 = IdSet.toBase64(set)
    assert(IdSet.fromBase64(b64).toSeq === set.toSeq)

    // the paste-able Pinot shape: IN_ID_SET from plain SQL with the
    // base64 string inlined
    df.createOrReplaceTempView("idset_probe")
    val n = spark.sql(
      s"SELECT count(*) AS n FROM idset_probe WHERE in_id_set(id, unbase64('$b64'))")
      .head().getLong(0)
    assert(n === 100L)
  }

  test("idset probe filters the fact scan below the confirm join") {
    val df = graft.SparkEntry.queries("q_idset_filter")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val joinAt = plan.indexOf("Join")
    val probeAt = plan.indexOf("in_id_set")
    assert(joinAt >= 0 && probeAt >= 0, s"expected a join and the probe in:\n$plan")
    // top-down print: the probe must sit BELOW the join (scan side), so
    // non-member fact rows are dropped before the join's exchange
    assert(probeAt > joinAt,
      "in_id_set must filter the fact scan under the semi-join, not above it")
  }

  test("salted join returns exactly the plain join's rows") {
    import spark.implicits._
    // skewed fact: one key holds ~90% of rows
    val fact = ((1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("b", i.toDouble))).toDF("k", "v")
    val dim = Seq(("hot", 1L), ("a", 2L), ("b", 3L), ("unmatched", 4L))
      .toDF("k", "code")
    val salted = Salting.saltedJoin(fact, dim, "k", saltBuckets = 8)
      .select("k", "v", "code")
    val plain = fact.join(dim, Seq("k")).select("k", "v", "code")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salted join must be row-identical (multiset) to the plain join")
  }
}
