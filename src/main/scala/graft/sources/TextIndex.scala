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
          split(lower(col(textCol)), "\\s+"), ""))).as("term"))
      .repartition(col("term"))
      .sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").parquet(path)

  /** Build the POSITIONAL posting table at `path` — (term, doc_id,
    * positions) with 0-based token positions, the Lucene-style layout
    * phrase queries need. Tokenization normalizes whitespace RUNS
    * (`\s+`, the TEXT_CONTAINS / textMatch-phrase convention — a
    * single-space split would leave empty interior slots and break
    * adjacency across multi-space runs, diverging from the scan path's
    * padded() normalization; the only possible empty token is a leading
    * one, whose removal shifts every position uniformly and so never
    * changes a position-chain difference). Then the same
    * term-distributed (term, doc_id)-sorted layout as `materialize`.
    */
  def materializeWithPositions(
      docs: DataFrame, idCol: String, textCol: String, path: String): Unit =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), "\\s+")).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .groupBy("term", "doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
      .repartition(col("term"))
      .sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").parquet(path)

  /** PHRASE search over a positional index: doc_ids where the exact
    * token sequence `phrase` occurs. Reads only the |phrase| probed
    * posting lists, joins them by doc (each join shrinks the candidate
    * set), then verifies adjacency with a scan-local position-chain HOF:
    * a start position survives if every following term has position
    * start+i. No text is read; cost scales with the rarest term's
    * posting list.
    */
  def searchPhraseIndexed(
      spark: SparkSession, path: String, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "need a non-empty phrase")
    spark.catalog.refreshByPath(path)
    val idx = SegmentCatalog.readStableSchema(spark, path)
    val parts = phrase.map(_.toLowerCase).zipWithIndex.map { case (t, i) =>
      idx.filter(col("term") === t)
        .select(col("doc_id"), col("positions").as(s"__p$i"))
    }
    val joined = parts.reduce(_.join(_, "doc_id"))
    val chain = (1 until phrase.size).foldLeft(col("__p0")) { (acc, i) =>
      filter(acc, p => array_contains(col(s"__p$i"), p + i))
    }
    joined.filter(size(chain) > 0).select("doc_id")
  }

  /** BOOLEAN search over a POSITIONAL index: evaluate a parsed
    * TEXT_MATCH tree (graft.functions.TextSearch.parseQuery — the same
    * grammar the scan path compiles) as posting-list SET ALGEBRA:
    * exact terms probe one posting list, quoted phrases run the
    * position-chain join, AND intersects by semi-join, OR unions,
    * NOT subtracts from the caller-supplied doc universe (the corpus id
    * set — the index alone cannot see term-less documents, which a
    * scan-side NOT would match). Wildcard/fuzzy/regex/proximity terms
    * are scan-family predicates and are rejected loudly — Pinot's split
    * too: the native text index serves term/phrase/boolean, everything
    * else scans.
    */
  def searchBool(
      spark: SparkSession, path: String,
      node: graft.functions.TextSearch.QNode,
      universe: DataFrame): DataFrame = {
    import graft.functions.TextSearch._
    spark.catalog.refreshByPath(path)
    val idx = SegmentCatalog.readStableSchema(spark, path)
    val Phrase = "\"([^\"]*)\"".r
    def eval(n: QNode): DataFrame = n match {
      case QTerm(raw) =>
        raw.toLowerCase match {
          case Phrase(p) =>
            val ws = p.split("\\s+").filter(_.nonEmpty).toSeq
            if (ws.isEmpty) universe.select(col("doc_id")).limit(0)
            else if (ws.size == 1) idx.filter(col("term") === ws.head)
              .select("doc_id").distinct()
            else searchPhraseIndexed(spark, path, ws)
          case t =>
            require(!t.exists("*?~/".contains(_)),
              s"term '$t' needs the scan path (wildcard/fuzzy/regex are not index-servable)")
            idx.filter(col("term") === t).select("doc_id").distinct()
        }
      case QAnd(l, r) => eval(l).join(eval(r), Seq("doc_id"), "left_semi")
      case QOr(l, r) => eval(l).union(eval(r)).distinct()
      case QNot(c) =>
        universe.select(col("doc_id")).join(eval(c), Seq("doc_id"), "left_anti")
    }
    eval(node).distinct()
  }

  /** Posting-list search: doc_ids containing ALL (`requireAll=true`) or
    * ANY of `terms`. refreshByPath first so a serving loop sees a
    * re-materialized index on its next call (the IvfAnn hot-swap lesson).
    */
  def searchIndexed(
      spark: SparkSession, path: String, terms: Seq[String],
      requireAll: Boolean = true): DataFrame = {
    require(terms.nonEmpty, "need at least one search term")
    spark.catalog.refreshByPath(path)
    val hits = SegmentCatalog.readStableSchema(spark, path)
      .filter(col("term").isin(terms.map(_.toLowerCase): _*))
    if (!requireAll) hits.select("doc_id").distinct()
    else hits
      .groupBy("doc_id")
      .agg(countDistinct("term").as("__nt"))
      .filter(col("__nt") === terms.map(_.toLowerCase).distinct.size)
      .select("doc_id")
  }
}
