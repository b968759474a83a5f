package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership test against a serialized bloom-filter id-set — the Spark
  * re-expression of Pinot's `IN_ID_SET(col, idset)` transform (reference
  * /root/reference/basics/indexing/bloom-filter.md describes the
  * segment-side analog; the query-side IdSet is Pinot's ID_SET/IN_ID_SET
  * pair). The set is built once (driver-side, KB–MB sized) by
  * `graft.operators.IdSet.build` and shipped to executors inside the plan,
  * so a 100 TB fact scan filters candidate rows SCAN-LOCALLY before any
  * shuffle: no false negatives ever (a bloom never misses a member), false
  * positives bounded by the build-time fpp and removed by the exact
  * semi-join that follows in `q_idset_filter`.
  *
  * Codegen: the deserialized filter is attached as a plan reference object
  * — one instance per executor plan, a single `mightContainLong` call per
  * row inside WholeStageCodegen.
  */
case class InIdSet(child: Expression, setBytes: Expression)
  extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = setBytes

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!setBytes.foldable)
      TypeCheckResult.TypeCheckFailure(
        "in_id_set requires a literal (foldable) serialized id-set")
    else (child.dataType, setBytes.dataType) match {
      case (LongType | IntegerType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (c, s) => TypeCheckResult.TypeCheckFailure(
        s"in_id_set requires (int|bigint, binary), got " +
          s"${c.catalogString} and ${s.catalogString}")
    }
  }

  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: BloomFilter = {
    val bytes = setBytes.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "in_id_set: id-set bytes must not be null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(v: Any, _bytes: Any): Any = v match {
    case i: Int => bloom.mightContainLong(i.toLong)
    case l: Long => bloom.mightContainLong(l)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("idsetBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $bloomRef.mightContainLong((long) $v);")
  }

  override def prettyName: String = "in_id_set"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InIdSet =
    copy(child = newLeft, setBytes = newRight)
}
