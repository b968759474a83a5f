package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

object MinHashOps {
  /** LSH band hashes of a MinHash signature computed in ONE pass over the
    * shingle-hash array: permutation i of shingle s is XXH64(s, seed=i);
    * band b's value combines its rows' minima.
    */
  def bands(shingles: ArrayData, numHashes: Int, numBands: Int): ArrayData = {
    val rowsPerBand = numHashes / numBands
    val n = shingles.numElements()
    // A shingle-less doc has no MinHash signature. Emitting the "empty"
    // band hashes would make every short/empty doc collide with every
    // other in ALL bands — a quadratic false-candidate blowup at corpus
    // scale. No shingles → no bands → no candidates.
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = shingles.getLong(j)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashLong(s, i)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var h = 9001L
      var r = 0
      while (r < rowsPerBand) {
        h = XXH64.hashLong(mins(b * rowsPerBand + r), h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** MinHash + LSH banding fused into one per-row pass: `array<long>` of
  * shingle hashes in, `array<long>` of band hashes out.
  *
  * Replaces the explode → 32-way min-aggregate → band-hash pipeline
  * (a full shuffle of every (doc, shingle) row) with a scan-local
  * expression: at 100 TB the ONLY shuffle left in MinHash dedup is the
  * band-bucket join itself.
  */
case class MinHashBands(child: Expression, numHashes: Int, numBands: Int)
  extends UnaryExpression {
  require(numHashes % numBands == 0, "numBands must divide numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashOps.bands(input.asInstanceOf[ArrayData], numHashes, numBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.MinHashOps.bands($c, $numHashes, $numBands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)

  override def prettyName: String = "minhash_bands"
}
