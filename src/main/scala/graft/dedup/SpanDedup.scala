package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-corpus SPAN-level dedup — the C4/MassiveText line-dedup shape
  * generalized to fixed token windows: every document is chunked into
  * `spanLen`-token spans and a span occurrence survives only if it is the
  * FIRST occurrence of that exact span corpus-wide (ordered by doc id,
  * then position). Catches boilerplate shared across documents that
  * whole-doc dedup (exact or near) misses.
  *
  * Shape at 100 TB: chunking is scan-local (one transform per row); the
  * only shuffle is the hash-partition by span for the keep-first window —
  * one pass, no joins. A span occurring k times costs k rows in one
  * partition; if a production corpus has mega-duplicated boilerplate
  * spans, cap them by document frequency first (the maxShingleDf pattern
  * in MinHashLsh) — the fixture needs no cap.
  */
object SpanDedup {

  /** One row per span occurrence: (idCol, span_idx, span, kept). */
  def markSpans(
      docs: DataFrame, idCol: String, textCol: String,
      spanLen: Int = 10): DataFrame = {
    require(spanLen >= 1, s"spanLen must be >= 1: $spanLen")
    // The token array is materialized in its own projection FIRST: a
    // `split` Column inlined into the `transform` lambda would be
    // re-evaluated per span in the interpreted HOF path — O(tokens²/len)
    // per doc instead of one split per doc.
    val toks = col("__toks")
    val nSpans = ceil(size(toks) / lit(spanLen.toDouble)).cast("int")
    val spans = transform(sequence(lit(0), nSpans - 1), i =>
      struct(i.cast("int").as("span_idx"),
        concat_ws(" ", slice(toks, i * spanLen + 1, lit(spanLen))).as("span")))
    val firstWin = Window.partitionBy("span").orderBy(idCol, "span_idx")
    docs
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), explode(spans).as("s"))
      .select(col(idCol), col("s.span_idx").as("span_idx"), col("s.span").as("span"))
      .withColumn("kept", row_number().over(firstWin) === 1)
  }

  /** The deduped corpus: each document reassembled from only its surviving
    * spans, in original order (documents whose every span was seen earlier
    * come back as empty text — the caller drops or keeps them by policy).
    */
  def dedupText(
      docs: DataFrame, idCol: String, textCol: String,
      spanLen: Int = 10): DataFrame =
    markSpans(docs, idCol, textCol, spanLen)
      .groupBy(idCol)
      .agg(
        concat_ws(" ",
          transform(
            array_sort(collect_list(when(col("kept"),
              struct(col("span_idx"), col("span"))))),
            s => s.getField("span"))).as(textCol),
        count(lit(1)).as("n_spans"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
}
