package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM quality scoring with a materializable vocabulary — the
  * incremental-corpus form of q_lm_quality (CCNet-style perplexity
  * filter), completing the trilogy with the dedup band index
  * (MinHashLsh.materializeBands) and the TF-IDF DF index
  * (Tfidf.materializeDf): the corpus-wide token frequency table is
  * computed once and persisted; a new ingest batch scores against the
  * stored vocabulary WITHOUT rescanning the corpus that defined the LM.
  *
  * Shape at 100 TB: the vocabulary table is dictionary-sized and
  * broadcast onto one scan of the batch; unseen tokens take a
  * smoothed count of 1 (they cannot be dropped — a batch full of
  * out-of-vocabulary noise is exactly what the filter must flag, and
  * count 1 gives it the maximum rarity penalty the stored LM can
  * express).
  */
object LmScore {

  /** One row per token — and, via explode_outer, one (id, w=null) row
    * for a null-text document, so unscoreable docs SURFACE in score()
    * (n_tokens=0, avg_nll=null) instead of silently vanishing from the
    * output and slipping past any avg_nll gate.
    */
  private def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode_outer(split(col(textCol), " ")).as("w"))

  /** The corpus LM: (w, cnt) token frequencies + single-row total. */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    tokens(docs, idCol, textCol).filter(col("w").isNotNull)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Persist the LM for incremental scoring: `path/vocab` (token table,
    * vocabulary-sized) and `path/meta` (single-row total token count).
    * The total is summed from the just-written vocab parquet — one
    * corpus tokenize+aggregate, not two (the unmaterialized plan would
    * otherwise re-run for the meta row).
    */
  def materializeVocab(
      docs: DataFrame, idCol: String, textCol: String, path: String): Unit = {
    val v = vocabulary(docs, idCol, textCol)
    v.write.mode("overwrite").parquet(s"$path/vocab")
    v.sparkSession.read.parquet(s"$path/vocab")
      .agg(sum("cnt").as("total")).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Per-doc average negative log-likelihood of `docs` under an explicit
    * LM (vocab + total): score = ln(total) - mean(ln(count(w))) over the
    * doc's tokens; unseen tokens score with smoothed count 1. A null-text
    * doc still gets a row, with n_tokens=0 and avg_nll=null — callers
    * gating a batch on avg_nll see it as unscoreable instead of it
    * passing through unscored.
    * Output: (idCol, n_tokens, avg_nll).
    */
  def score(
      docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, meta: DataFrame): DataFrame =
    tokens(docs, idCol, textCol)
      .join(broadcast(vocab), Seq("w"), "left_outer")
      .withColumn("cnt",
        when(col("w").isNull, lit(null).cast("long"))
          .otherwise(coalesce(col("cnt"), lit(1L))))
      .crossJoin(broadcast(meta))
      .groupBy(idCol)
      .agg(
        count(col("w")).as("n_tokens"),
        round(first(log(col("total").cast("double"))) - avg(log(col("cnt"))), 3)
          .as("avg_nll"))

  /** Incremental scoring against a materialized LM directory. */
  def scoreIndexed(
      spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      lmPath: String): DataFrame =
    score(docs, idCol, textCol,
      graft.sources.SegmentCatalog.readStableSchema(spark, s"$lmPath/vocab"),
      graft.sources.SegmentCatalog.readStableSchema(spark, s"$lmPath/meta"))
}
