package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.similarity.Kmeans

class KmeansSpec extends SparkSpec {

  import spark.implicits._

  test("lloyd assignment matches a brute-force argmin recomputation") {
    val e = Tables.embeddings(spark, sfDir)
    val out = Kmeans.lloyd(e, "vec_id", "embedding", k = 3, iters = 1)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap

    // replay: seeds = 3 smallest ids, one assign, one mean update, re-assign
    val pts = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    var cents = pts.keys.toSeq.sorted.take(3).zipWithIndex
      .map { case (id, i) => i -> pts(id) }.toMap
    def assign() = pts.map { case (id, v) =>
      id -> cents.map { case (c, cv) => (d2(v, cv), c) }.minBy(x => (x._1, x._2))
    }
    val a1 = assign()
    cents = cents.map { case (c, old) =>
      val members = a1.collect { case (id, (_, `c`)) => pts(id) }.toSeq
      c -> (if (members.isEmpty) old
            else {
              val s = members.reduce((x, y) => x.zip(y).map(t => t._1 + t._2))
              s.map(_ / members.size)
            })
    }
    val a2 = assign()

    assert(out.keySet === pts.keySet)
    a2.foreach { case (id, (dd, c)) =>
      assert(out(id)._1 === c, s"vec $id assigned ${out(id)._1}, expected $c")
      assert(math.abs(out(id)._2 - dd) < 1e-6,
        s"vec $id d2 ${out(id)._2} vs replay $dd")
    }
  }

  test("lloyd is deterministic under repartitioning") {
    val e = Tables.embeddings(spark, sfDir)
    val base = Kmeans.lloyd(e, "vec_id", "embedding", k = 4, iters = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1)))
    val shuffled = Kmeans.lloyd(e.repartition(7), "vec_id", "embedding", k = 4, iters = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(base.toSeq === shuffled.toSeq)
  }

  test("a cluster that loses every point keeps its centroid and arity stays k") {
    // ids 0 and 1 are IDENTICAL points, so they seed two coincident
    // centroids; the (d2, cid)-lexicographic tie-break routes every
    // coincident point to the smaller cid, starving cluster 1 from the
    // first assignment on. Its centroid must be retained stale (stable
    // ids, arity k, no crash), never renumbered.
    val pts = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0f, 0f)), (2L, Array(5f, 5f)),
      (3L, Array(5f, 5.1f)), (4L, Array(0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Kmeans.lloyd(pts, "vec_id", "embedding", k = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.keySet === Set(0L, 1L, 2L, 3L, 4L))
    assert(out(2L) === 2 && out(3L) === 2, "far group should hold cluster 2")
    assert(out(0L) === 0 && out(1L) === 0 && out(4L) === 0,
      "coincident points collapse onto the smaller cid")
    assert(out.values.toSet === Set(0, 2), "cluster 1 is empty, not renumbered")
  }

  test("each iteration is scan-local: no join and no window in the plan") {
    val e = Tables.embeddings(spark, sfDir)
    val plan = Kmeans.lloyd(e, "vec_id", "embedding", k = 4, iters = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"assignment must not join:\n$plan")
    assert(!plan.contains("Window"), s"assignment must not window:\n$plan")
  }
}
