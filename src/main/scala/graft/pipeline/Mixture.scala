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
    // frac(rate) in 16-bit hex, zero-padded, lowercase — comparable
    // against the first 4 hex chars of md5 in any engine.
    val fracThreshold = lpad(lower(hex(
      floor((col("__rate") - floor(col("__rate"))) * 65536).cast("long"))), 4, "0")
    docs
      .withColumn("__rate", rate)
      .filter(col("__rate") > 0.0)
      .withColumn("epoch", explode(sequence(lit(1), ceil(col("__rate")).cast("int"))))
      .filter(col("epoch") <= floor(col("__rate")) ||
        substring(md5(concat(col(textCol), lit("#"), col("epoch"))), 1, 4) < fracThreshold)
      .drop("__rate")
  }
}
