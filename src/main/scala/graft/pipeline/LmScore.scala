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

  private def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("w"))

  /** The corpus LM: (w, cnt) token frequencies + single-row total. */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    tokens(docs, idCol, textCol).groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Persist the LM for incremental scoring: `path/vocab` (token table,
    * vocabulary-sized) and `path/meta` (single-row total token count).
    */
  def materializeVocab(
      docs: DataFrame, idCol: String, textCol: String, path: String): Unit = {
    val v = vocabulary(docs, idCol, textCol)
    v.write.mode("overwrite").parquet(s"$path/vocab")
    v.agg(sum("cnt").as("total")).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Per-doc average negative log-likelihood of `docs` under an explicit
    * LM (vocab + total): score = ln(total) - mean(ln(count(w))) over the
    * doc's tokens; unseen tokens score with smoothed count 1.
    * Output: (idCol, n_tokens, avg_nll).
    */
  def score(
      docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, meta: DataFrame): DataFrame =
    tokens(docs, idCol, textCol)
      .join(broadcast(vocab), Seq("w"), "left_outer")
      .withColumn("cnt", coalesce(col("cnt"), lit(1L)))
      .crossJoin(broadcast(meta))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        round(first(log(col("total").cast("double"))) - avg(log(col("cnt"))), 3)
          .as("avg_nll"))

  /** Incremental scoring against a materialized LM directory. */
  def scoreIndexed(
      spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      lmPath: String): DataFrame =
    score(docs, idCol, textCol,
      spark.read.parquet(s"$lmPath/vocab"),
      spark.read.parquet(s"$lmPath/meta"))
}
