package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized INVERTED TEXT INDEX — the native-text-index analog
  * (reference: /root/reference/basics/indexing/native-text-index.md and
  * inverted-index.md: Pinot stores term → posting lists so TEXT_CONTAINS
  * never scans documents). The fifth incremental index, joining the
  * dedup band index, TF-IDF DF index, LM vocabulary, and frequent-terms
  * sketches.
  *
  * Layout: one parquet dataset of (term, doc_id) posting rows,
  * hash-distributed BY TERM and sorted (term, doc_id) within files — a
  * term-equality probe pushes an In/EqualTo filter to the scan and
  * row-group min/max stats skip every file segment not covering the
  * term. That is the columnar analog of a posting-list seek: query cost
  * scales with the matched postings, not the corpus text. Documents are
  * tokenized once at build (lowercase whitespace tokens, the
  * TEXT_CONTAINS convention) and distinct-ed per doc, so posting rows =
  * Σ per-doc distinct terms.
  *
  * Query: AND-of-terms = read the ≤|terms| posting lists, group by doc,
  * keep docs matching all |terms| (OR: any). No text column is ever
  * read at query time.
  */
object TextIndex {

  /** Build the posting table at `path`. */
  def materialize(
      docs: DataFrame, idCol: String, textCol: String, path: String): Unit =
    docs
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(array_remove(
          split(lower(col(textCol)), " "), ""))).as("term"))
      .repartition(col("term"))
      .sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").parquet(path)

  /** Posting-list search: doc_ids containing ALL (`requireAll=true`) or
    * ANY of `terms`. refreshByPath first so a serving loop sees a
    * re-materialized index on its next call (the IvfAnn hot-swap lesson).
    */
  def searchIndexed(
      spark: SparkSession, path: String, terms: Seq[String],
      requireAll: Boolean = true): DataFrame = {
    require(terms.nonEmpty, "need at least one search term")
    spark.catalog.refreshByPath(path)
    val hits = spark.read.parquet(path)
      .filter(col("term").isin(terms.map(_.toLowerCase): _*))
    if (!requireAll) hits.select("doc_id").distinct()
    else hits
      .groupBy("doc_id")
      .agg(countDistinct("term").as("__nt"))
      .filter(col("__nt") === terms.map(_.toLowerCase).distinct.size)
      .select("doc_id")
  }
}
