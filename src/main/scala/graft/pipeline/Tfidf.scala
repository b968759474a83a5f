package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction with a materializable document-frequency
  * index — the incremental-corpus shape (same pattern as the dedup band
  * index): the expensive corpus-wide statistic (per-term DF + corpus
  * size) is computed once and persisted; a new batch of documents scores
  * against the stored index WITHOUT rescanning the corpus.
  *
  * Shape at 100 TB: tokenize is scan-local; TF is one (doc, term)
  * shuffle over the batch only; the DF side is vocabulary-sized; the
  * corpus-size scalar rides a single-row broadcast; top-k ranking is a
  * window over per-doc partitions bounded by document length. Ranking
  * uses the ROUNDED score so rank order is reproducible across engines.
  */
object Tfidf {

  private def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("w"))

  /** The per-term document-frequency table of a corpus: (w, df). */
  def docFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    tokens(docs, idCol, textCol).groupBy("w")
      .agg(countDistinct(col(idCol)).as("df"))

  /** Single-row (n) corpus size. */
  def corpusSize(docs: DataFrame, idCol: String): DataFrame =
    docs.agg(countDistinct(col(idCol)).as("n"))

  /** Persist the DF index for incremental scoring: `path/df` (term table,
    * vocabulary-sized) and `path/meta` (single-row corpus size).
    */
  def materializeDf(docs: DataFrame, idCol: String, textCol: String, path: String): Unit = {
    docFrequencies(docs, idCol, textCol).write.mode("overwrite").parquet(s"$path/df")
    corpusSize(docs, idCol).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Top-k TF-IDF terms per document of `docs`, scored against an
    * explicit DF table + corpus size (either freshly computed or read
    * back from `materializeDf` output). Terms absent from the DF table
    * are dropped (a new batch's unseen terms have no meaningful IDF until
    * the index is refreshed). Output: (idCol, term, rk, score).
    */
  def topTerms(
      docs: DataFrame, idCol: String, textCol: String,
      df: DataFrame, n: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = tokens(docs, idCol, textCol)
      .groupBy(idCol, "w").agg(count(lit(1)).as("tf"))
    val scored = tf.join(df, "w").crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n").cast("double") / col("df")), 4))
    val w = Window.partitionBy(idCol).orderBy(desc("score"), asc("w"))
    scored
      .select(
        col(idCol), col("w").as("term"),
        row_number().over(w).as("rk"),
        (col("score") + lit(0.0)).as("score"))
      .filter(col("rk") <= k)
  }

  /** Incremental scoring against a materialized index directory. */
  def topTermsIndexed(
      spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, k: Int): DataFrame =
    topTerms(docs, idCol, textCol,
      graft.sources.SegmentCatalog.readStableSchema(spark, s"$indexPath/df"),
      graft.sources.SegmentCatalog.readStableSchema(spark, s"$indexPath/meta"), k)
}
