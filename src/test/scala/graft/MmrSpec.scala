package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.similarity.Mmr

class MmrSpec extends SparkSpec {

  import spark.implicits._

  private def qvec: Array[Double] = Tables.embeddings(spark, sfDir)
    .filter(col("vec_id") === 0).select("embedding")
    .head().getSeq[Float](0).map(_.toDouble).toArray

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("picks are distinct, the first pick is the relevance argmax") {
    val out = Mmr.rerank(Tables.embeddings(spark, sfDir), "vec_id", "embedding",
      qvec, nCand = 20, k = 5, lambda = 0.7, penalty = 0.3)
      .orderBy("pick").collect()
    assert(out.length === 5)
    assert(out.map(_.getLong(1)).distinct.length === 5, "duplicate picks")
    // pick 1 maximizes relevance, so its rel dominates every later pick's
    assert(out.tail.forall(r => r.getDouble(2) <= out.head.getDouble(2)))
    // and its score IS its relevance (nothing picked yet to penalize)
    assert(out.head.getDouble(3) === out.head.getDouble(2))
  }

  test("MMR skips a near-duplicate of an already-picked hit that plain top-k keeps") {
    // ids 1,2,3: near-identical high-relevance cluster; 4,5: genuinely
    // different directions with lower relevance. Plain top-3 = {1,2,3};
    // a diversity-heavy lambda must pick ONE of the cluster then jump to
    // the diverse items (cluster sims ~0.9999 vs cross sims ~0.56, so the
    // 0.7 penalty dominates the ~0.36 relevance gap).
    val pts = Seq(
      (1L, Array(0.99f, 0.10f, 0f)), (2L, Array(0.99f, 0.11f, 0f)),
      (3L, Array(0.98f, 0.10f, 0.01f)),
      (4L, Array(0.60f, -0.70f, 0.20f)), (5L, Array(0.50f, 0.40f, -0.70f)))
      .toDF("vec_id", "embedding")
    val q = Seq(1.0, 0.0, 0.0)
    val picks = Mmr.rerank(pts, "vec_id", "embedding", q,
        nCand = 5, k = 3, lambda = 0.3, penalty = 0.7)
      .orderBy("pick").collect().map(_.getLong(1)).toSeq
    assert(picks.head === 1L, s"first pick should be the top hit: $picks")
    assert(picks.toSet.intersect(Set(2L, 3L)).isEmpty,
      s"MMR kept a near-duplicate of pick 1: $picks")
    assert(picks.toSet === Set(1L, 4L, 5L), s"expected the diverse set: $picks")
  }

  test("lambda=1 with zero penalty degenerates to plain top-k by relevance") {
    val q = qvec
    val topk = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r4(cos(r.getSeq[Float](1).map(_.toDouble).toArray, q))))
      .sortBy { case (id, rel) => (-rel, id) }.take(5).map(_._1).toSeq: Seq[Long]
    val mmr = Mmr.rerank(Tables.embeddings(spark, sfDir), "vec_id", "embedding",
      q, nCand = 20, k = 5, lambda = 1.0, penalty = 0.0)
      .orderBy("pick").collect().map(_.getLong(1)).toSeq
    assert(mmr === topk, s"lambda=1 should equal top-k: $mmr vs $topk")
  }
}
