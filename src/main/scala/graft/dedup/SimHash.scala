package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.TextShingles
import graft.functions.expressions.{SimHash64 => SimHash64Expr}

/** SimHash near-duplicate detection: 64-bit signature where bit i is the
  * sign of the sum over tokens of ±1 (token hash's bit i), so documents
  * with mostly-shared token multisets land within a small Hamming
  * distance.
  *
  * Scale design: the signature is a scan-local custom codegen'd
  * expression (graft.functions.expressions.SimHash64) — no (doc, token)
  * shuffle; pairing uses the pigeonhole principle: split the 64 bits into
  * 4 chunks of 16 — any pair within Hamming distance 3 must agree exactly
  * on ≥1 chunk, so a self-join on (chunk index, chunk value) finds all
  * such pairs without O(n²) work.
  */
object SimHash {

  /** doc_id + 64-bit `simhash` column. Token-less docs are dropped: their
    * signature would be the constant 0, making every empty doc a Hamming-0
    * "near-dup" of every other — a quadratic false-pair blowup at scale.
    * `split("", " ")` yields `[""]`, so empty strings must be removed
    * BEFORE the size guard or empty/whitespace-only docs slip through it.
    */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        array_remove(TextShingles.wordTokens(col(textCol)), "").as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(
        col(idCol),
        ColumnBridge.column(SimHash64Expr(
          ColumnBridge.expression(col("__toks")))).as("simhash"))

  /** Pairs (a_id, b_id, hamming) with Hamming distance ≤ maxHamming
    * (must be ≤ 3 for the 4-chunk pigeonhole to be exhaustive).
    */
  def nearPairs(docs: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding only guarantees recall for hamming <= 3")
    val sig = signatures(docs, idCol, textCol)
    val chunks = (0 until 4).map(j => shiftright(col("simhash"), j * 16).bitwiseAND(lit(0xFFFFL)))
    val banded = sig.select(
      col(idCol), col("simhash"),
      posexplode(array(chunks: _*)).as(Seq("chunk_idx", "chunk_val")))
    val a = banded.select(col(idCol).as("a_id"), col("simhash").as("a_sig"),
      col("chunk_idx"), col("chunk_val"))
    val b = banded.select(col(idCol).as("b_id"), col("simhash").as("b_sig"),
      col("chunk_idx"), col("chunk_val"))
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
