package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}

/** Greedy k-center (farthest-point-first) coreset selection — the
  * diverse-subset sampler a training-data pipeline runs when it wants k
  * maximally-spread exemplars rather than k random rows (Gonzalez'
  * 2-approximation to the k-center objective; the standard seed for
  * diversity-aware finetuning-data selection and for IVF/k-means init).
  *
  * Distributed shape: the selected set lives on the DRIVER (k·dim floats —
  * k is tens, never corpus-sized) and each round is ONE scan: every point
  * computes its distance to the newest center scan-locally (codegen'd
  * vector_dot via the |p|² − 2p·c + |c|² expansion), folds it into its
  * running min-distance, and a TakeOrdered(1) picks the farthest point —
  * no shuffle beyond the k-bounded top-1, no N×N distance matrix, k jobs
  * total. At 100 TB each round is a full scan; callers cache/checkpoint
  * the (id, vec, min-dist) frame between rounds if the input is remote.
  *
  * Ties on the argmax break by smaller id, so selection is deterministic
  * on any partitioning (the DuckDB oracle replays the same greedy walk).
  */
object Coreset {

  /** Select k centers from `points(idCol, vecCol)` (vecCol:
    * array<float>). Returns (pick, id, dist): 1-based selection order and
    * the point's min-distance to the previously-selected set at the time
    * it was chosen (0 for the seed = smallest id).
    */
  def kCenters(points: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, "k-center needs k >= 1")
    val spark = points.sparkSession
    val base = points.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    require(!base.isEmpty, "k-center needs a non-empty point set")

    def dot(a: Column, b: Column): Column = graft.functions.VectorFns.dot(a, b)
    def distTo(center: Seq[Float], centerNorm2: Double): Column = {
      val c = typedlit(center)
      sqrt(greatest(dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), c)
        + lit(centerNorm2), lit(0.0)))
    }

    val seedRow = base.orderBy("id").limit(1)
      .select(col("id"), col("v")).head()
    var picks = Vector((seedRow.getLong(0), seedRow.getSeq[Float](1), 0.0))

    // running min-distance folds one new center per round; re-deriving it
    // from scratch each round (least over all picked centers) keeps the
    // loop stateless across jobs — k is small, so the k² dot terms stay
    // trivially cheap next to the scan itself
    while (picks.size < k) {
      val mins = picks.map { case (_, vec, _) =>
        val norm2 = vec.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
        distTo(vec, norm2)
      }
      val md = mins.reduce(least(_, _))
      // exclude already-selected ids: with duplicate points every
      // remaining min-dist can be 0 and the deterministic (dist desc, id)
      // tie-break would otherwise re-pick the same smallest id forever
      val next = base
        .filter(!col("id").isin(picks.map(_._1): _*))
        .select(col("id"), col("v"), md.as("md"))
        .orderBy(col("md").desc, col("id"))
        .limit(1).collect().headOption
      next match {
        case Some(r) =>
          picks = picks :+ ((r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
        case None =>
          // fewer distinct ids than k: return what exists rather than loop
          return buildResult(spark, picks)
      }
    }

    buildResult(spark, picks)
  }

  private def buildResult(
      spark: org.apache.spark.sql.SparkSession,
      picks: Vector[(Long, Seq[Float], Double)]): DataFrame = {
    val rows = picks.zipWithIndex.map { case ((id, _, d), i) => Row(i + 1, id, d) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("pick", IntegerType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("dist", DoubleType, nullable = false))))
  }
}
