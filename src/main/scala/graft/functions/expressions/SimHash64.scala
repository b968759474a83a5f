package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

object SimHashOps {
  /** 64-bit SimHash of a token array in one pass: per token hash, bit i
    * votes ±1; the signature's bit i is the vote's sign.
    */
  def simhash(toks: ArrayData, seed: Long): Long = {
    val counts = new Array[Int](64)
    val n = toks.numElements()
    var j = 0
    while (j < n) {
      val h =
        if (toks.isNullAt(j)) XXH64.hashLong(0L, seed)
        else {
          val w = toks.getUTF8String(j)
          XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes, seed)
        }
      var i = 0
      while (i < 64) {
        counts(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

/** SimHash64 over an `array<string>` token column — replaces the
  * explode → 64-conditional-sum aggregate (a shuffle of every
  * (doc, token) row) with a scan-local per-row loop; like MinHashBands,
  * the only shuffle left in SimHash dedup is the chunk-bucket join.
  */
case class SimHash64(child: Expression, seed: Long = 42L) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHashOps.simhash(input.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.SimHashOps.simhash($c, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}
