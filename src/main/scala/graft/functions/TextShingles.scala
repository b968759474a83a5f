package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

/** Word-level n-gram shingling for near-dup detection. Tokenization is a
  * plain single-space split (matching DuckDB `string_split(lower(x), ' ')`
  * so shingle-based operators stay oracle-comparable); shingles are built
  * with codegen'd higher-order functions, no UDF.
  */
object TextShingles {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def wordTokens(text: Column): Column = split(lower(text), " ")

  /** Misra–Gries heavy hitters: `array<struct<item, est_count>>` of the
    * ≤ k most frequent strings; counts are lower bounds, error ≤ n/(k+1).
    * Mergeable O(k) state — the scan-friendly alternative to a full
    * distinct-count shuffle for TOP-K term statistics.
    */
  def frequentItems(item: Column, k: Int): Column =
    ColumnBridge.column(
      graft.functions.expressions.FrequentItemsAgg(
        ColumnBridge.expression(item), k).toAggregateExpression())

  /** Distinct word n-gram shingles; empty array when the doc is shorter
    * than n tokens. NOTE: prefer `withShingleHashes` in plans — this
    * inline form re-splits the text per element access inside the lambda
    * (see shingleHashesFromTokens); it is kept for small-data/API use.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = wordTokens(text)
    when(
      size(toks) >= n,
      array_distinct(
        transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(k => get(toks, i + lit(k))): _*))))
      .otherwise(lit(Array.empty[String]).cast(ArrayType(StringType)))
  }

  /** Distinct shingles as 64-bit hashes (custom codegen'd expression —
    * see graft.functions.expressions.WordShingleHashes for why the
    * declarative transform/lambda form is O(words²) and this is O(words)).
    * Near-dup joins only compare shingles for equality, so joining 8-byte
    * longs instead of strings also cuts the inverted-index join cost;
    * xxhash64 collisions are negligible (~n²/2⁶⁴).
    */
  def shingleHashes(text: Column, n: Int = 3): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.expressions.WordShingleHashes(
        ColumnBridge.expression(wordTokens(text)), n))
  }

  /** id + `sh` (distinct shingle-hash array) per row. */
  def withShingleHashes(
      df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, n: Int = 3): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), shingleHashes(col(textCol), n).as("sh"))
}
