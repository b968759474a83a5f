package graft.operators

import java.io.ByteArrayOutputStream
import java.util.Base64

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.expressions.InIdSet

/** Pinot-style query-time id-sets: `ID_SET(col)` builds a compact
  * serialized membership sketch from one query's result; `IN_ID_SET(col,
  * set)` filters another query with it — the cross-query "join by paste"
  * Pinot exposes when a real join is too expensive (reference
  * /root/reference/basics/indexing/bloom-filter.md for the sketch;
  * Pinot's IdSet API is the query-side twin).
  *
  * Spark re-expression: `build` runs a distributed bloom-filter aggregate
  * (`df.stat.bloomFilter` — map-side partial filters OR-merged on the
  * driver, never a row collect), yielding KBs–MBs of driver state for any
  * fact size; `in` wraps the codegen'd InIdSet expression so the
  * membership probe runs scan-local inside WholeStageCodegen. At 100 TB
  * the picture is: build once over the driving query (a ~1.2 GB filter
  * covers 10⁹ keys at 1% fpp — size it with `expectedItems`/`fpp`), then
  * every downstream scan prunes candidate rows BEFORE its shuffle; a
  * trailing exact semi-join (see q_idset_filter) removes the bounded
  * false positives, so the bloom only ever shrinks the shuffle, never the
  * answer. Base64 round-trip mirrors Pinot's paste-able IdSet strings.
  */
object IdSet {

  /** Distributed build: serialized bloom filter over `column`'s non-null
    * int/long values. `expectedItems` and `fpp` size the filter — at scale
    * pass the driving query's estimated cardinality, not the fact's.
    */
  def build(df: DataFrame, column: String, expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val bloom = df.stat.bloomFilter(column, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** Scan-local membership probe (no false negatives; fpp-bounded false
    * positives). The set ships inside the plan as a binary literal.
    */
  def in(value: Column, set: Array[Byte]): Column =
    ColumnBridge.column(InIdSet(ColumnBridge.expression(value), Literal(set)))

  /** Pinot returns ID_SET results as paste-able strings; same here. */
  def toBase64(set: Array[Byte]): String = Base64.getEncoder.encodeToString(set)
  def fromBase64(s: String): Array[Byte] = Base64.getDecoder.decode(s)

  /** Expected-membership count helper for specs/sizing: the deserialized
    * filter's own estimate machinery is not exposed, so just re-probe.
    */
  private[graft] def deserialize(set: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(set))
}
