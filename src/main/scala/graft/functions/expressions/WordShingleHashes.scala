package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64

/** One-pass helper shared by interpreted eval and codegen. */
object ShingleOps {
  /** Distinct xxhash64 values of the word n-grams of a token array. */
  def shingleHashes(toks: ArrayData, n: Int): ArrayData = {
    val numToks = toks.numElements()
    if (numToks < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[java.lang.Long](numToks * 2)
    val out = new Array[Long](numToks - n + 1)
    var outLen = 0
    var i = 0
    while (i <= numToks - n) {
      var h = 42L
      var k = 0
      while (k < n) {
        val w = if (toks.isNullAt(i + k)) null else toks.getUTF8String(i + k)
        h =
          if (w == null) XXH64.hashLong(0L, h)
          else XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes, h)
        k += 1
      }
      if (seen.add(h)) { out(outLen) = h; outLen += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outLen))
  }
}

/** Distinct 64-bit word-n-gram shingle hashes of an `array<string>` token
  * column — the shingling primitive behind n-gram-Jaccard and MinHash
  * dedup.
  *
  * Why a custom expression: the declarative formulation
  * (`array_distinct(transform(sequence(...), i -> xxhash64(toks[i], ...)))`)
  * re-evaluates the token-producing expression inside the lambda on every
  * element access (subexpression elimination does not reach lambda
  * bodies), making shingling O(words²) per document — measured 18s vs
  * <1s over 5k docs at sf0.1. This is a single fused pass: O(words),
  * one array allocation, identical output semantics (distinct hashes,
  * first-occurrence order).
  */
case class WordShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hashes requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.shingleHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.ShingleOps.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "word_shingle_hashes"
}
