package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Lloyd's k-means over an `array<float>` embedding column with
  * deterministic seeding — the clustering primitive behind semantic dedup
  * (SemDeDup's cell blocking), corpus topic balancing, and IVF coarse
  * quantizers. Unlike the spark.ml KMeans used by `IvfAnn` (random init,
  * sampled sharded fitting), this variant is exactly reproducible: seeds
  * are the k smallest ids, every assignment breaks distance ties by the
  * smaller centroid id, and the whole walk is replayable in plain SQL —
  * which is what lets the DuckDB oracle hash-verify a distributed
  * clustering end-to-end.
  *
  * Distributed shape (the `Coreset` discipline): centroids live on the
  * DRIVER as k·dim doubles — k is tens, never corpus-sized — and are
  * folded into the scan as typed literals. Each iteration is ONE pass:
  * every point computes its squared distance to each centroid scan-locally
  * (codegen'd vector_dot via the |p|² − 2p·c + |c|² expansion, |p|²
  * hoisted out of the per-centroid terms), takes the lexicographic min of
  * (d2, cid) structs — no join, no shuffle — and the k-row centroid
  * update aggregates O(dim) mergeable `vector_avg` state. At 100 TB each
  * iteration is a full scan + a k-row collect; callers cache the input
  * between iterations if the source is remote.
  *
  * A cluster that loses every point keeps its previous centroid (so the
  * output arity stays k and ids stay stable) — KmeansSpec pins that path.
  */
object Kmeans {

  /** Run `iters` Lloyd iterations (assign → update centroids) on
    * `points(idCol, vecCol)`, then assign once against the final
    * centroids. Returns one row per point: (id, cid, d2) — cluster id in
    * [0, k) and squared distance to the final centroid (clamped at 0
    * against expansion-formula rounding).
    */
  def lloyd(points: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): DataFrame = {
    require(k >= 1, "k-means needs k >= 1")
    require(iters >= 0, "k-means needs iters >= 0")
    val base = points.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))

    val seedRows = base.orderBy("id").limit(k).collect()
    require(seedRows.nonEmpty, "k-means needs a non-empty point set")
    var cents: Seq[(Int, Seq[Double])] = seedRows.zipWithIndex.map {
      case (r, i) => i -> r.getSeq[Float](1).map(_.toDouble)
    }

    def assign(): DataFrame = {
      val candidates: Seq[Column] = cents.map { case (cid, c) =>
        val cc = c.foldLeft(0.0)((acc, x) => acc + x * x)
        struct(
          (col("vv") - lit(2.0) * VectorFns.dot(col("v"), typedlit(c)) + lit(cc)).as("d2"),
          lit(cid).as("cid"))
      }
      base
        .withColumn("vv", VectorFns.dot(col("v"), col("v")))
        .withColumn("best", array_min(array(candidates: _*)))
        .select(col("id"), col("v"),
          col("best.cid").as("cid"),
          greatest(col("best.d2"), lit(0.0)).as("d2"))
    }

    var it = 0
    while (it < iters) {
      val updated = assign()
        .groupBy("cid")
        .agg(VectorFns.vectorAvg(col("v")).as("c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1))
        .toMap
      // empty cluster → keep the stale centroid (arity and ids stay fixed)
      cents = cents.map { case (cid, old) => cid -> updated.getOrElse(cid, old) }
      it += 1
    }
    assign().drop("v")
  }
}
