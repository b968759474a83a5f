package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted mixture sampling with epoch replication — the
  * data-mixture assembly step of a pretraining pipeline: each stratum
  * (source/domain) gets a target rate; rate 2.5 means every doc appears
  * in 2 full epochs plus a 50% hash-sampled third, rate 0.25 means a 25%
  * hash-sampled single epoch. Decisions hash CONTENT (md5(text#epoch)),
  * so the mixture is reproducible on any cluster, any retry, any
  * partitioning — and auditable (the same md5 replays anywhere).
  *
  * Shape at 100 TB: the epoch explode is scan-local with bounded fan-out
  * (ceil(max rate)) and the keep decision is a pure per-row predicate —
  * no shuffle, no state, no driver participation.
  */
object Mixture {

  /** Replicate-and-sample `docs` to the target per-stratum rates.
    * Output = input columns + an `epoch` column (1-based copy index);
    * a doc with stratum rate r appears floor(r) times deterministically
    * plus once more with probability frac(r) decided by content hash.
    */
  def sample(
      docs: DataFrame,
      textCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 100.0),
      s"rates must be in [0, 100]: $rates default=$defaultRate")
    val rate: Column = rates.foldLeft(when(lit(false), lit(0.0))) {
      case (acc, (stratum, r)) => acc.when(col(stratumCol) === stratum, r)
    }.otherwise(defaultRate)
    replicate(docs.withColumn("__rate", rate), textCol).drop("__rate")
  }

  /** Temperature-scaled mixture (the multi-source rebalancing recipe:
    * stratum probability ∝ n^alpha, alpha<1 flattening the source
    * distribution toward uniform while preserving total corpus size):
    * rate_s = (n_s^alpha / Σ n^alpha) · N / n_s, then the same
    * replicate-and-hash-sample machinery as `sample`. Rates round to 6
    * decimals so the floor/threshold arithmetic is engine-stable (the
    * q_zscore_outliers convention). Output keeps the applied rate as
    * `mix_rate` plus the 1-based `epoch`.
    *
    * Shape at 100 TB: the rate table is dictionary-sized (one row per
    * source), computed in one partial-agg pass and broadcast back; the
    * replication itself stays scan-local with bounded fan-out.
    */
  def sampleTemperature(
      docs: DataFrame,
      textCol: String,
      stratumCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1]: $alpha")
    val counts = docs.groupBy(stratumCol)
      .agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__w", pow(col("__n"), lit(alpha)))
    val tot = counts.agg(sum("__n").as("__N"), sum("__w").as("__W"))
    // tot derives from counts, so the cross join is a self-join — qualify
    // every reference through the aliases to keep resolution unambiguous
    val ratesDf = counts.alias("c").crossJoin(broadcast(tot.alias("t")))
      .select(col("c." + stratumCol),
        round(col("c.__w") / col("t.__W") * col("t.__N") / col("c.__n"), 6).as("__rate"))
    replicate(docs.join(broadcast(ratesDf), Seq(stratumCol)), textCol)
      .withColumnRenamed("__rate", "mix_rate")
  }

  /** Epoch-replicate rows by their `__rate` column: floor(r) full copies
    * plus one more kept when the content hash clears the frac(r)
    * threshold (16-bit hex compare — replayable in any engine).
    */
  private def replicate(docs: DataFrame, textCol: String): DataFrame = {
    val fracThreshold = lpad(lower(hex(
      floor((col("__rate") - floor(col("__rate"))) * 65536).cast("long"))), 4, "0")
    docs
      .filter(col("__rate") > 0.0)
      .withColumn("epoch", explode(sequence(lit(1), ceil(col("__rate")).cast("int"))))
      .filter(col("epoch") <= floor(col("__rate")) ||
        substring(md5(concat(col(textCol), lit("#"), col("epoch"))), 1, 4) < fracThreshold)
  }
}
