package graft

import org.apache.spark.sql.functions._
import graft.queries.SamplingQueries

/** Machine-checks that q_bootstrap's per-replicate Poisson weights are
  * statistically DECORRELATED — the property the operator exists for
  * (variance-of-replicates ≈ sampling uncertainty) and the one a
  * hash-parity gate structurally cannot catch: a broken hash that both
  * engines replay identically is hash-green and statistically useless.
  * The r10 affine-in-b seed was exactly that failure mode: one constant
  * shift between consecutive replicates, pairwise weight correlations up
  * to 0.997, replicate-total variance ~3.4 where independent Poisson(1)
  * weights give ~n·Var(w) ≈ 2e4.
  *
  * Two assertions, on 20k-row deterministic id fixtures:
  *  1. var(per-replicate total weight) within [0.5, 2]× of n·Var(w)
  *     (iid-consistency of the replicate totals);
  *  2. max pairwise correlation between replicate weight vectors < 0.1.
  * Both on two id shapes (sequential and arithmetic-progression) so an
  * equidistribution artifact on structured ids cannot hide.
  */
class SamplingDecorrelationSpec extends SparkSpec {

  private val R = 20
  private val N = 20000L

  /** Materialize the R replicate weight vectors for the given id column. */
  private def weightMatrix(ids: org.apache.spark.sql.DataFrame): Array[Array[Double]] = {
    val cols = (0 until R).map(b => SamplingQueries.bootstrapWeight(col("event_id"), b).as(s"w_$b"))
    val rows = ids.select(cols: _*).collect()
    (0 until R).map(b => rows.map(_.getLong(b).toDouble).toArray).toArray
  }

  private def check(label: String, ids: org.apache.spark.sql.DataFrame): Unit = {
    val w = weightMatrix(ids)
    val n = w(0).length
    // pooled moments of the weight distribution
    val all = w.flatten
    val mean = all.sum / all.length
    val varW = all.map(x => (x - mean) * (x - mean)).sum / all.length
    // 1. replicate-total variance vs n·Var(w)
    val totals = w.map(_.sum)
    val tMean = totals.sum / R
    val tVar = totals.map(t => (t - tMean) * (t - tMean)).sum / (R - 1)
    val expected = n * varW
    val ratio = tVar / expected
    assert(ratio > 0.5 && ratio < 2.0,
      s"$label: replicate-total variance ratio $ratio outside [0.5, 2] " +
        s"(tVar=$tVar, n·Var(w)=$expected) — replicates are not iid-like")
    // 2. max pairwise correlation between replicate weight vectors
    val means = w.map(v => v.sum / n)
    val sds = w.zip(means).map { case (v, m) =>
      math.sqrt(v.map(x => (x - m) * (x - m)).sum / n)
    }
    var maxCorr = 0.0
    for (i <- 0 until R; j <- (i + 1) until R) {
      val cov = w(i).zip(w(j)).map { case (a, b) =>
        (a - means(i)) * (b - means(j))
      }.sum / n
      val corr = math.abs(cov / (sds(i) * sds(j)))
      if (corr > maxCorr) maxCorr = corr
    }
    assert(maxCorr < 0.1,
      s"$label: max pairwise replicate correlation $maxCorr >= 0.1 — " +
        "replicate draws are dependent")
  }

  test("bootstrap replicate weights are decorrelated on sequential ids") {
    check("seq", spark.range(N).select(col("id").as("event_id")))
  }

  test("bootstrap replicate weights are decorrelated on arithmetic-progression ids") {
    check("ap", spark.range(N).select((col("id") * 7 + 13).as("event_id")))
  }

  test("bootstrap weights follow the Poisson(1) pmf grid") {
    // the thresholds 3679/7358/9197 encode P(0)=P(1)=.3679, P(2)=.1839,
    // P(3+)=.0803; the hash must hit them uniformly
    val w = weightMatrix(spark.range(N).select(col("id").as("event_id")))
    val all = w.flatten
    val p0 = all.count(_ == 0.0).toDouble / all.length
    val p1 = all.count(_ == 1.0).toDouble / all.length
    val p2 = all.count(_ == 2.0).toDouble / all.length
    assert(math.abs(p0 - 0.3679) < 0.01, s"P(w=0)=$p0")
    assert(math.abs(p1 - 0.3679) < 0.01, s"P(w=1)=$p1")
    assert(math.abs(p2 - 0.1839) < 0.01, s"P(w=2)=$p2")
  }
}
