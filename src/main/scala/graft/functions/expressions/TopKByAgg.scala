package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: a size-k min-heap rooted at the WORST kept entry
  * (lowest score; ties broken so the higher id is worse — i.e. the global
  * order is (score desc, id asc), matching `ORDER BY sim DESC, cand_id`).
  *
  * Memory is O(k) regardless of input size, so the aggregate's partial
  * (map-side) buffers stay k-bounded and only (groups × partitions × k)
  * rows ever cross the shuffle.
  */
final class TopKHeap(val k: Int) extends Serializable {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // "a is worse than b" under (score desc, id asc)
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        val s = scores(i); val d = ids(i)
        scores(i) = scores(p); ids(i) = ids(p)
        scores(p) = s; ids(p) = d
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      val s = scores(i); val d = ids(i)
      scores(i) = scores(m); ids(i) = ids(m)
      scores(m) = s; ids(m) = d
      i = m
    }
  }

  def insert(score: Double, id: Long): Unit = {
    if (score.isNaN) return // zero-norm / corrupt vectors never rank
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown()
    }
  }

  def mergeFrom(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** (id, score) pairs best-first: (score desc, id asc). */
  def sortedPairs: Array[(Long, Double)] = {
    val out = Array.tabulate(size)(i => (ids(i), scores(i)))
    out.sortBy { case (id, s) => (-s, id) }
  }
}

/** `top_k_by(score, id, k)` — aggregate collecting the k highest-scoring
  * (id, score) entries as `array<struct<cand_id:bigint, sim:double>>`,
  * best-first with ties broken by ascending id.
  *
  * This is the scale-safe replacement for
  * `row_number() OVER (PARTITION BY q_id) <= k`: the window form shuffles
  * EVERY (query, candidate, sim) row into one reducer per query, while
  * this aggregate's partial buffers are k-bounded per group per map task
  * (ObjectHashAggregate partial mode), so a 100 TB corpus scan shuffles
  * only (queries × partitions × k) entries. Reference capability:
  * /root/reference/basics/getting-started/frequent-queries.md (top-k
  * selection queries).
  */
case class TopKByAgg(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  require(k > 0, s"top_k_by requires k > 0, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by requires (double, bigint), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("cand_id", LongType, nullable = false),
      StructField("sim", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedPairs.map { case (id, s) =>
      InternalRow(id, s)
    })

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.size * 16)
    bb.putInt(buffer.k).putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i)).putLong(buffer.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val heap = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val s = bb.getDouble(); val id = bb.getLong()
      heap.insert(s, id)
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByAgg =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "top_k_by"
}
