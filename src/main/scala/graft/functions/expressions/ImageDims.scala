package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

object ImageDimsOps {
  /** Null when the bytes are not a recognizable png/jpeg/gif/bmp header. */
  def dims(bytes: Array[Byte]): InternalRow =
    graft.multimodal.MediaCodec.sniffDims(bytes) match {
      case Some((fmt, w, h)) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))
      case None => null
    }
}

/** `image_dims(binary)` → `struct<format:string,width:int,height:int>`:
  * scan-local, codegen'd image header decode (PNG IHDR, JPEG SOF marker
  * scan, GIF screen descriptor, BMP info header — graft.multimodal.
  * MediaCodec, pure JDK). NULL for unrecognized/corrupt bytes, so a
  * malformed blob filters out instead of failing a 100 TB job. The
  * metadata-extraction step of a multimodal ingest pipeline as a plain
  * column expression — no UDF, no external codec process.
  */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_dims requires binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ImageDimsOps.dims(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.expressions.ImageDimsOps.dims($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ImageDims =
    copy(child = newChild)

  override def prettyName: String = "image_dims"
}
