package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Word-level n-gram shingling for near-dup detection. Tokenization is a
  * plain single-space split (matching DuckDB `string_split(lower(x), ' ')`
  * so shingle-based operators stay oracle-comparable); shingles are built
  * with codegen'd higher-order functions, no UDF.
  */
object TextShingles {

  def wordTokens(text: Column): Column = split(lower(text), " ")

  /** Distinct word n-gram shingles; empty array when the doc is shorter
    * than n tokens.
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
}
