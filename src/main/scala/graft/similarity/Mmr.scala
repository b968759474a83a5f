package graft.similarity

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}

import graft.functions.VectorFns

/** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998) —
  * the diversity-aware selector run AFTER retrieval: from a relevance
  * shortlist, greedily pick k items maximizing
  * λ·relevance − (1−λ)·max-similarity-to-already-picked, so near-duplicate
  * hits don't crowd the final answer set.
  *
  * Distributed shape: the corpus-sized work is the shortlist selection —
  * scan-local cosine + TakeOrdered(nCand), no shuffle wider than the
  * nCand-bounded top-k. The greedy walk itself runs on the DRIVER over
  * the collected shortlist (nCand ≤ tens of rows — the same bounded-state
  * class as Coreset/Kmeans's driver-held centers; the collect is
  * shortlist-sized by construction, never corpus-sized).
  *
  * Determinism: relevance and pairwise similarities are ROUNDED to 4
  * decimals before any comparison, and every argmax breaks ties by
  * smaller id — so the greedy walk is exactly replayable in SQL (the
  * DuckDB oracle unrolls the k picks as CTE levels over the same rounded
  * values).
  */
object Mmr {

  /** Re-rank `points(idCol, vecCol)` against `query`: shortlist the
    * nCand highest-cosine items, then greedily select k by MMR. Returns
    * (pick, id, rel, score): 1-based pick order, the item's rounded
    * relevance, and its MMR score at selection time (= rel for the first
    * pick).
    */
  def rerank(points: DataFrame, idCol: String, vecCol: String,
             query: Seq[Double], nCand: Int, k: Int,
             lambda: Double, penalty: Double): DataFrame = {
    // penalty is passed EXPLICITLY instead of derived as 1-lambda: the
    // Scala double `1 - 0.7` (0.30000000000000004) is not the same double
    // as a parsed "0.3" — the q_bm25 "2.2, not k1+1" literal discipline.
    require(k >= 1 && nCand >= k, s"need nCand >= k >= 1, got nCand=$nCand k=$k")
    val spark = points.sparkSession
    val qn = math.sqrt(query.foldLeft(0.0)((acc, x) => acc + x * x))
    val shortlist = points
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        round(VectorFns.dot(col(vecCol), typedlit(query)) /
          (VectorFns.norm(col(vecCol)) * lit(qn)), 4).as("rel"))
      .orderBy(desc("rel"), asc("id"))
      .limit(nCand)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getDouble(2)))

    // HALF_UP, matching Spark's round() and DuckDB's round() — rint's
    // banker's rounding would disagree exactly at the .00005 boundaries
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      r4(dot / (math.sqrt(na) * math.sqrt(nb))) // same 4-decimal rounding as the scan side
    }

    var picked = Vector.empty[(Long, Array[Double], Double, Double)] // id, v, rel, score
    var remaining = shortlist.toVector
    while (picked.size < k && remaining.nonEmpty) {
      val scored = remaining.map { case (id, v, rel) =>
        val ms = if (picked.isEmpty) 0.0 else picked.map(p => cos(v, p._2)).max
        val score = if (picked.isEmpty) rel else lambda * rel - penalty * ms
        (id, v, rel, score)
      }
      val best = scored.minBy { case (id, _, _, score) => (-score, id) }
      picked = picked :+ best
      remaining = remaining.filterNot(_._1 == best._1)
    }

    val rows = picked.zipWithIndex.map { case ((id, _, rel, score), i) =>
      Row(i + 1, id, rel, r4(score))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("pick", IntegerType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("rel", DoubleType, nullable = false),
        StructField("score", DoubleType, nullable = false))))
  }
}
