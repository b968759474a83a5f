package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k state over STRING keys: a size-k min-heap rooted at the
  * worst kept entry under the global order (score desc, key asc). The key
  * comparison is UTF8String's byte-wise order — identical to binary-collated
  * `ORDER BY cnt DESC, term` in SQL engines, so results are engine-exact.
  *
  * Memory is O(k · key bytes) regardless of input size: the partial
  * (map-side) buffers stay k-bounded, so only (groups × partitions × k)
  * entries ever cross the shuffle — the heavy-hitter-per-group twin of
  * TopKHeap's long-id form.
  */
final class TopKStrHeap(val k: Int) extends Serializable {
  val scores = new Array[Double](k)
  val keys = new Array[UTF8String](k)
  var size = 0

  // "a is worse than b" under (score desc, key asc)
  @inline private def worse(sa: Double, ka: UTF8String, sb: Double, kb: UTF8String): Boolean =
    sa < sb || (sa == sb && ka.compareTo(kb) > 0)

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); val d = keys(i)
    scores(i) = scores(j); keys(i) = keys(j)
    scores(j) = s; keys(j) = d
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), keys(i), scores(p), keys(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && worse(scores(l), keys(l), scores(m), keys(m))) m = l
      if (r < size && worse(scores(r), keys(r), scores(m), keys(m))) m = r
      if (m == i) return
      swap(i, m)
      i = m
    }
  }

  def insert(score: Double, key: UTF8String): Unit = {
    if (score.isNaN || key == null) return
    if (size < k) {
      // clone: the incoming UTF8String may view a buffer Spark reuses row-to-row
      scores(size) = score; keys(size) = key.clone(); size += 1
      siftUp(size - 1)
    } else if (k > 0 && worse(scores(0), keys(0), score, key)) {
      scores(0) = score; keys(0) = key.clone()
      siftDown()
    }
  }

  def mergeFrom(other: TopKStrHeap): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.keys(i)); i += 1 }
  }

  /** (key, score) pairs best-first: (score desc, key asc). */
  def sortedPairs: Array[(UTF8String, Double)] = {
    val out = Array.tabulate(size)(i => (keys(i), scores(i)))
    out.sortWith { case ((ka, sa), (kb, sb)) =>
      sa > sb || (sa == sb && ka.compareTo(kb) < 0)
    }
  }
}

/** `top_k_by_str(score, key, k)` — aggregate collecting the k
  * highest-scoring (key, score) entries as
  * `array<struct<key:string, score:double>>`, best-first with ties broken
  * by ascending key (byte order).
  *
  * This is the scale-safe replacement for
  * `row_number() OVER (PARTITION BY group ORDER BY cnt DESC, term) <= k`
  * over a counted term table: the window form shuffles the ENTIRE
  * vocabulary-sized count table into one reducer per group and sorts it,
  * while this aggregate's partial buffers are k-bounded per group per map
  * task (ObjectHashAggregate partial mode). Reference capability: Pinot's
  * per-group TOP-N term selection (Introduction.md:105 TOP queries,
  * FREQUENTSTRINGSSKETCH family) done exactly.
  */
case class TopKByStrAgg(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrHeap] with BinaryLike[Expression] {

  require(k > 0, s"top_k_by_str requires k > 0, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by_str requires (double, string), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKStrHeap = new TopKStrHeap(k)

  override def update(buffer: TopKStrHeap, input: InternalRow): TopKStrHeap = {
    val s = left.eval(input)
    val key = right.eval(input)
    if (s != null && key != null)
      buffer.insert(s.asInstanceOf[Double], key.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: TopKStrHeap, other: TopKStrHeap): TopKStrHeap = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKStrHeap): Any =
    new GenericArrayData(buffer.sortedPairs.map { case (key, s) =>
      InternalRow(key, s)
    })

  override def serialize(buffer: TopKStrHeap): Array[Byte] = {
    var bytes = 0
    var i = 0
    while (i < buffer.size) { bytes += buffer.keys(i).numBytes(); i += 1 }
    val bb = ByteBuffer.allocate(8 + buffer.size * 12 + bytes)
    bb.putInt(buffer.k).putInt(buffer.size)
    i = 0
    while (i < buffer.size) {
      val kb = buffer.keys(i).getBytes
      bb.putDouble(buffer.scores(i)).putInt(kb.length).put(kb)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val heap = new TopKStrHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val s = bb.getDouble()
      val kb = new Array[Byte](bb.getInt())
      bb.get(kb)
      heap.insert(s, UTF8String.fromBytes(kb))
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByStrAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByStrAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByStrAgg =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "top_k_by_str"
}
