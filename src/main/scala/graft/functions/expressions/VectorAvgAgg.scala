package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise running sum + row count — the centroid state. O(dim)
  * doubles per group per map task, mergeable by element-wise add: the
  * per-label centroid of a 100-TB embedding table shuffles (labels ×
  * partitions) fixed-size buffers, never a row of the table itself.
  */
final class VecSumState extends Serializable {
  var sum: Array[Double] = null
  var n: Long = 0L

  def add(v: ArrayData, isDouble: Boolean): Unit = {
    val m = v.numElements()
    if (sum == null) sum = new Array[Double](m)
    val d = math.min(m, sum.length)
    var i = 0
    while (i < d) {
      if (!v.isNullAt(i))
        sum(i) += (if (isDouble) v.getDouble(i) else v.getFloat(i).toDouble)
      i += 1
    }
    n += 1
  }

  def mergeFrom(o: VecSumState): Unit = {
    if (o.sum != null) {
      if (sum == null) sum = new Array[Double](o.sum.length)
      val d = math.min(sum.length, o.sum.length)
      var i = 0
      while (i < d) { sum(i) += o.sum(i); i += 1 }
    }
    n += o.n
  }
}

/** `vector_avg(embedding)` → `array<double>` element-wise mean (the group
  * centroid); null for an all-null/empty group. Accepts `array<float>` or
  * `array<double>` input; accumulates in double.
  */
case class VectorAvgAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumState] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_avg requires array<float|double>, got ${other.catalogString}")
  }

  private def childIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): VecSumState = new VecSumState

  override def update(buffer: VecSumState, input: InternalRow): VecSumState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[ArrayData], childIsDouble)
    buffer
  }

  override def merge(buffer: VecSumState, other: VecSumState): VecSumState = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: VecSumState): Any =
    if (buffer.sum == null || buffer.n == 0L) null
    else new GenericArrayData(buffer.sum.map(_ / buffer.n))

  override def serialize(buffer: VecSumState): Array[Byte] = {
    val dim = if (buffer.sum == null) 0 else buffer.sum.length
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + 8 * dim)
    bb.putLong(buffer.n).putInt(dim)
    var i = 0
    while (i < dim) { bb.putDouble(buffer.sum(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val st = new VecSumState
    st.n = bb.getLong()
    val dim = bb.getInt()
    if (dim > 0) {
      st.sum = new Array[Double](dim)
      var i = 0
      while (i < dim) { st.sum(i) = bb.getDouble(); i += 1 }
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvgAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvgAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorAvgAgg =
    copy(child = newChild)
  override def prettyName: String = "vector_avg"
}
