package graft.functions.expressions

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary: at most k counters; a miss on a full
  * summary decrements every counter (dropping zeros) instead of evicting.
  * Guarantee: any item with true frequency > n/(k+1) is retained, and each
  * reported count understates the true count by at most n/(k+1).
  */
final class FreqSketch(val k: Int) extends Serializable {
  val counters: mutable.LinkedHashMap[String, Long] = mutable.LinkedHashMap.empty
  var seen: Long = 0L

  /** Shrink back to ≤ k counters by subtracting the (k+1)-th largest
    * count from all and dropping non-positive ones — the standard
    * mergeable-summaries reduction (Agarwal et al., "Mergeable
    * Summaries", PODS'12). For a single insert overflow (size = k+1)
    * the cut is simply the minimum counter, i.e. classic Misra–Gries.
    */
  private def shrink(): Unit =
    if (counters.size > k) {
      val sorted = counters.values.toArray.sorted(Ordering[Long].reverse)
      val cut = sorted(k) // (k+1)-th largest
      val dead = mutable.ArrayBuffer[String]()
      counters.mapValuesInPlace { (_, c) => c - cut }
      counters.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(counters.remove)
      // at most k entries can exceed the (k+1)-th largest, so size ≤ k now
    }

  def add(item: String, weight: Long = 1L): Unit = {
    seen += weight
    counters.update(item, counters.getOrElse(item, 0L) + weight)
    shrink()
  }

  def mergeFrom(other: FreqSketch): Unit = {
    seen += other.seen
    other.counters.foreach { case (item, c) =>
      counters.update(item, counters.getOrElse(item, 0L) + c)
    }
    shrink()
  }

  /** (item, lower-bound count) sorted by count desc, then item asc. */
  def sorted: Seq[(String, Long)] =
    counters.toSeq.sortBy { case (item, c) => (-c, item) }
}

/** `frequent_items(col, k)` — approximate TOP-K heavy hitters as a
  * mergeable aggregate (Pinot's FREQUENTSTRINGSSKETCH family analog;
  * /root/reference/configuration-reference/schema.md:48 names the sketch
  * aggregation families). State is O(k) per group per map task, so the
  * partial/merge path shuffles k counters instead of one row per distinct
  * value — the difference between a heavy-hitters scan and a full
  * distinct-count shuffle at 100 TB. Counts are lower bounds with error
  * ≤ n/(k+1); FrequentItemsSpec bounds them against exact counts.
  */
case class FrequentItemsAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch] with UnaryLike[Expression] {

  require(k > 0, s"frequent_items requires k > 0, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"frequent_items requires a string column, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est_count", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): FreqSketch = new FreqSketch(k)

  override def update(buffer: FreqSketch, input: InternalRow): FreqSketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: FreqSketch, other: FreqSketch): FreqSketch = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: FreqSketch): Any =
    new GenericArrayData(buffer.sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    })

  override def serialize(buffer: FreqSketch): Array[Byte] = {
    val entries = buffer.counters.toSeq
    val payloads = entries.map { case (s, _) => s.getBytes(StandardCharsets.UTF_8) }
    val size = 4 + 8 + 4 + payloads.map(_.length + 4 + 8).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(buffer.k).putLong(buffer.seen).putInt(entries.size)
    entries.zip(payloads).foreach { case ((_, c), bytes) =>
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqSketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val sketch = new FreqSketch(bb.getInt())
    sketch.seen = bb.getLong()
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val buf = new Array[Byte](len)
      bb.get(buf)
      sketch.counters.update(new String(buf, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    sketch
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItemsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItemsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): FrequentItemsAgg =
    copy(child = newChild)

  override def prettyName: String = "frequent_items"
}
