package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** KLL-style mergeable quantile sketch (public algorithm: Karnin, Lang &
  * Liberty, FOCS'16 — the family Pinot ships as PERCENTILEKLL, reference:
  * configuration-reference/schema.md sketch column families; Apache
  * DataSketches' quantile workhorse). Simplified level structure, same
  * contract:
  *
  *  - level i holds items of weight 2^i; inserts land in level 0;
  *  - when total size exceeds the budget, the lowest over-capacity level
  *    is SORTED and every other item is promoted to level i+1 (weight
  *    doubles), the rest discarded — the classic compaction step. The
  *    even/odd choice alternates via a deterministic counter instead of a
  *    random coin (reproducible runs; the unbiasedness argument is
  *    unchanged for adversary-free data);
  *  - per-level capacity follows the KLL (2/3)^depth taper: the top level
  *    keeps ~k items, lower levels geometrically fewer, so total state is
  *    O(k) and rank error ~O(1/k) regardless of n.
  *
  * While NOTHING has compacted (n ≤ level-0 capacity = k), the sketch is
  * EXACT: the state is simply the sorted multiset, and quantile queries
  * return the true rank-ceil(q·n) order statistic — the exact-regime twin
  * q_percentile_kll_exact hash-verifies that path, and the same property
  * makes untrimmed sketch CUBES roll up exactly (q_kll_cube).
  *
  * Scale shape: O(k) mergeable partial state per group per map task —
  * the theta/frequent-items contract; only ~k doubles cross the shuffle
  * regardless of input size, vs the per-group value map of Spark's exact
  * `percentile` that q_percentile_dict exists to avoid.
  */
final class KllState(val k: Int) extends Serializable {
  var n: Long = 0L
  var parity: Long = 0L
  /** levels(i) = items of weight 2^i; level 0 unsorted until compaction. */
  var levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])

  private def cap(i: Int): Int = {
    // top level ~k, tapering by 2/3 per level below it
    val depthFromTop = levels.length - 1 - i
    math.max(8, math.ceil(k * math.pow(2.0 / 3.0, depthFromTop)).toInt)
  }

  private def totalSize: Int = {
    var s = 0; var i = 0
    while (i < levels.length) { s += levels(i).length; i += 1 }
    s
  }

  private def budget: Int = {
    var b = 0; var i = 0
    while (i < levels.length) { b += cap(i); i += 1 }
    b
  }

  def add(v: Double): Unit = {
    levels(0) += v
    n += 1
    compress()
  }

  private def compress(): Unit = {
    var guard = 0
    while (totalSize > budget && guard < 64) {
      // lowest level over ITS OWN capacity; falling back to the lowest
      // with ≥2 items (a merge can exceed the budget while every level is
      // individually under cap)
      var idx = -1
      var i = 0
      while (idx < 0 && i < levels.length) {
        if (levels(i).length >= 2 && levels(i).length > cap(i)) idx = i
        i += 1
      }
      if (idx < 0) idx = levels.indexWhere(_.length >= 2)
      if (idx < 0) return
      compactLevel(idx)
      guard += 1
    }
  }

  private def compactLevel(i: Int): Unit = {
    if (i == levels.length - 1) levels += ArrayBuffer.empty[Double]
    val sorted = levels(i).sorted
    val start = (parity % 2).toInt
    parity += 1
    val promoted = ArrayBuffer.empty[Double]
    var j = start
    while (j < sorted.length) { promoted += sorted(j); j += 2 }
    levels(i) = ArrayBuffer.empty[Double]
    levels(i + 1) ++= promoted
  }

  def mergeFrom(other: KllState): Unit = {
    while (levels.length < other.levels.length) levels += ArrayBuffer.empty[Double]
    var i = 0
    while (i < other.levels.length) { levels(i) ++= other.levels(i); i += 1 }
    n += other.n
    parity += other.parity
    compress()
  }

  /** Weighted order statistic at rank ceil(q·n) (1-indexed); q≤0 → min. */
  def quantile(q: Double): Double = {
    if (n == 0) return Double.NaN
    val items = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.length) {
      val w = 1L << i
      levels(i).foreach(v => items += ((v, w)))
      i += 1
    }
    val sorted = items.sortBy(_._1)
    val totalW = sorted.iterator.map(_._2).sum
    val target = math.max(1L, math.ceil(q * totalW).toLong)
    var cum = 0L
    var j = 0
    while (j < sorted.length) {
      cum += sorted(j)._2
      if (cum >= target) return sorted(j)._1
      j += 1
    }
    sorted.last._1
  }

  /** Estimated rank fraction of x: weight(items ≤ x) / weight(all). */
  def rankOf(x: Double): Double = {
    if (n == 0) return Double.NaN
    var below = 0L
    var total = 0L
    var i = 0
    while (i < levels.length) {
      val w = 1L << i
      levels(i).foreach { v => total += w; if (v <= x) below += w }
      i += 1
    }
    below.toDouble / total.toDouble
  }

  def serialized: Array[Byte] = {
    var sz = 4 + 8 + 8 + 4
    levels.foreach(l => sz += 4 + 8 * l.length)
    val bb = java.nio.ByteBuffer.allocate(sz)
    bb.putInt(k).putLong(n).putLong(parity).putInt(levels.length)
    levels.foreach { l => bb.putInt(l.length); l.foreach(bb.putDouble) }
    bb.array()
  }
}

object KllState {
  def deserialize(bytes: Array[Byte]): KllState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val st = new KllState(bb.getInt())
    st.n = bb.getLong()
    st.parity = bb.getLong()
    val nl = bb.getInt()
    st.levels = ArrayBuffer.fill(nl)(ArrayBuffer.empty[Double])
    var i = 0
    while (i < nl) {
      val sz = bb.getInt()
      var j = 0
      while (j < sz) { st.levels(i) += bb.getDouble(); j += 1 }
      i += 1
    }
    st
  }
}

private[expressions] trait KllAggBase extends TypedImperativeAggregate[KllState] {
  def k: Int
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): KllState = new KllState(k)
  override def merge(buffer: KllState, other: KllState): KllState = {
    buffer.mergeFrom(other); buffer
  }
  override def eval(buffer: KllState): Any = buffer.serialized
  override def serialize(buffer: KllState): Array[Byte] = buffer.serialized
  override def deserialize(bytes: Array[Byte]): KllState = KllState.deserialize(bytes)
}

/** `kll_sketch_agg(col, k)` → binary quantile-sketch blob. */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends KllAggBase with UnaryLike[Expression] {

  require(k >= 16, s"kll_sketch_agg requires k >= 16, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg requires a numeric column, got ${other.catalogString}")
  }

  override def update(buffer: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) {
      val d = v match {
        case d: Double => d
        case f: Float => f.toDouble
        case l: Long => l.toDouble
        case i: Int => i.toDouble
        case other => other.toString.toDouble
      }
      buffer.add(d)
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_sketch_agg"
}

/** `kll_union_agg(sketch, k)` — merge PRE-BUILT sketch blobs: the rollup
  * aggregate that makes quantile CUBES servable (per-cell sketches union
  * to any coarser grouping without rescanning raw rows — Pinot's
  * PERCENTILEKLL star-tree metric). When nothing has ever compacted the
  * union is the exact sorted multiset of the united inputs, which
  * q_kll_cube hash-verifies.
  */
case class KllUnionAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends KllAggBase with UnaryLike[Expression] {

  require(k >= 16, s"kll_union_agg requires k >= 16, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_union_agg requires binary sketches, got ${other.catalogString}")
  }

  override def update(buffer: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) buffer.mergeFrom(KllState.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllUnionAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_union_agg"
}

/** `kll_union(a, b)` → merged sketch blob (scalar form, for folding a
  * micro-batch delta into a materialized cube cell). Weight-ADDITIVE —
  * unlike theta's set-idempotent union, re-merging the same blob
  * double-counts; streaming sinks must pair this with a replay guard.
  */
case class KllUnion(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_union requires two binary sketches, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = KllState.deserialize(l.asInstanceOf[Array[Byte]])
    a.mergeFrom(KllState.deserialize(r.asInstanceOf[Array[Byte]]))
    a.serialized
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllUnion =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "kll_union"
}

/** `kll_quantile(sketch, q)` → estimated order statistic (exact while the
  * sketch never compacted). Runs on grouped output — CodegenFallback.
  */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantile requires (binary sketch, double), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(l: Any, r: Any): Any =
    KllState.deserialize(l.asInstanceOf[Array[Byte]])
      .quantile(r.asInstanceOf[Double])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "kll_quantile"
}

/** `kll_rank(sketch, x)` → estimated rank fraction of x (the quantile
  * query's inverse).
  */
case class KllRank(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_rank requires (binary sketch, double), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(l: Any, r: Any): Any =
    KllState.deserialize(l.asInstanceOf[Array[Byte]])
      .rankOf(r.asInstanceOf[Double])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllRank =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "kll_rank"
}
