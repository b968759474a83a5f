package graft

import graft.queries.Registry

/** Plan lint over the ENTIRE query registry: no operator offered by the
  * engine may plan a cartesian product or a broadcast nested-loop join.
  * This is the spec form of SURVEY §4's "never cross joins" claim — it
  * sweeps every registry entry (so a future operator that quietly plans an
  * O(n²) join fails CI here), instead of trusting per-operator review.
  *
  * Allowlist: queries that cross-join two SINGLE-ROW aggregate results
  * (a 1×1 cartesian is how Spark combines two scalar subqueries; constant
  * cost at any corpus scale).
  */
class PlanLintSpec extends SparkSpec {

  private val scalarCrossJoinOk = Set("q_funnel", "q_set_ops", "q_set_ops_sketch",
    "q_set_ops_diff", "q_funnel_window", "q_dedup_image")

  /** Broadcast-bounded by construction: one side is a dictionary-sized
    * set the operator broadcasts ON PURPOSE, so the "nested loop" is a
    * single pass over the big side with a constant-size probe table —
    * linear in the corpus, not O(n²).
    *  - q_knn_brute: the brute-force baseline's DEFINITION is every
    *    (query, candidate) pair; the bounded query set broadcasts.
    *  - q_ann_ivf: probe selection crosses queries × the centroid table
    *    (numCentroids rows); the corpus join below it is an equi-join on
    *    `cell`.
    *  - q_tfidf_top: the corpus-size scalar N (one row) broadcasts onto
    *    the scored term table; everything else is an equi-join.
    */
  private val broadcastBoundedOk = Set("q_knn_brute", "q_ann_ivf", "q_tfidf_top")

  test("no registry query plans a cartesian or nested-loop join (scalar combines excepted)") {
    val allowed = scalarCrossJoinOk ++ broadcastBoundedOk
    val offenders = Registry.all.flatMap { q =>
      val plan = q.run(spark, sfDir).queryExecution.executedPlan.toString
      val hasCartesian = plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")
      if (hasCartesian && !allowed.contains(q.name)) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"queries planning cartesian/nested-loop joins: ${offenders.mkString(", ")}")
  }

  test("broadcast-bounded exemptions broadcast the small side (no shuffle cartesian)") {
    broadcastBoundedOk.foreach { name =>
      Registry.all.find(_.name == name).foreach { q =>
        val plan = q.run(spark, sfDir).queryExecution.executedPlan.toString
        // a CartesianProduct would shuffle BOTH sides; these must stay
        // broadcast-shaped
        assert(!plan.contains("CartesianProduct"),
          s"$name degraded to a shuffle cartesian")
      }
    }
  }

  test("allowlisted scalar cross joins really do combine single-row inputs") {
    // each allowlisted query must produce at most a handful of rows — the
    // cross join is between already-aggregated scalars, not data tables
    scalarCrossJoinOk.foreach { name =>
      Registry.all.find(_.name == name).foreach { q =>
        val n = q.run(spark, sfDir).count()
        assert(n <= 4, s"$name returned $n rows; scalar-cross-join exemption invalid")
      }
    }
  }
}
