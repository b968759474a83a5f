package graft.functions.expressions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

object LshOps {
  private val planeCache =
    new ConcurrentHashMap[(Int, Int, Int, Long), Array[Array[Float]]]()

  /** r·b seeded Gaussian hyperplanes of dimension dim (deterministic:
    * java.util.Random Box–Muller under a fixed seed).
    */
  def planes(r: Int, b: Int, dim: Int, seed: Long): Array[Array[Float]] =
    planeCache.computeIfAbsent((r, b, dim, seed), _ => {
      val rnd = new scala.util.Random(seed)
      Array.fill(r * b)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    })

  /** One band value per band: (bandIndex << 32) | sign-bit bucket of the
    * band's r plane dots. Embedding all-pass: one loop, no allocation
    * beyond the output array.
    */
  def bandBuckets(emb: ArrayData, r: Int, b: Int, dim: Int, seed: Long): ArrayData = {
    val ps = planes(r, b, dim, seed)
    val n = emb.numElements()
    val out = new Array[Long](b)
    var band = 0
    while (band < b) {
      var bucket = 0L
      var j = 0
      while (j < r) {
        val p = ps(band * r + j)
        val m = math.min(n, p.length)
        var dot = 0.0
        var i = 0
        while (i < m) {
          if (!emb.isNullAt(i)) dot += emb.getFloat(i).toDouble * p(i)
          i += 1
        }
        if (dot > 0) bucket |= (1L << j)
        j += 1
      }
      out(band) = (band.toLong << 32) | bucket
      band += 1
    }
    new GenericArrayData(out)
  }
}

/** Banded sign-LSH for cosine similarity: `array<float>` embedding in,
  * `array<long>` of b band values out, where two vectors collide on band i
  * iff all r of that band's hyperplane dots agree in sign.
  *
  * P(candidate) = 1 - (1 - p^r)^b with p = 1 - θ/π; r and b tune the
  * recall/cost point per threshold (r=4, b=64 gives ~1-2e-5 miss at
  * cos 0.4; high-threshold near-dup regimes can use far fewer bands).
  * Scan-local — the only shuffle a near-dup join needs afterwards is the
  * equi-join on the band value itself. Reference capability:
  * /root/reference/basics/indexing/README.md:22 (similarity indexes are
  * segment-local structures; queries touch only colliding buckets).
  */
case class LshBandBuckets(child: Expression, r: Int, b: Int, dim: Int, seed: Long)
  extends UnaryExpression {

  // The band index lives in the high 32 bits and the r sign bits in the low
  // 32; r > 32 would silently overlap them (cross-band value collisions).
  require(r > 0 && r <= 32, s"lsh_band_buckets: r must be in 1..32, got $r")
  require(b > 0, s"lsh_band_buckets: b must be positive, got $b")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_band_buckets requires array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    LshOps.bandBuckets(input.asInstanceOf[ArrayData], r, b, dim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.LshOps.bandBuckets($c, $r, $b, $dim, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): LshBandBuckets =
    copy(child = newChild)

  override def prettyName: String = "lsh_band_buckets"
}
