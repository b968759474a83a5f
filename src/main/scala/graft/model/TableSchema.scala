package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pinot-style table schema (reference: /root/reference/
  * configuration-reference/schema.md): dimension / metric / dateTime field
  * specs with per-type default null values (Pinot has no native nulls;
  * schema.md:27 lists the internal defaults this mirrors). Maps onto a
  * Spark StructType; `withNullDefaults` rewrites a DataFrame so nulls
  * carry the Pinot defaults, which keeps aggregates over sparse columns
  * Pinot-equivalent.
  */
sealed trait FieldSpec {
  def name: String
  def dataType: DataType
  def defaultNullValue: Any
}

/** singleValue=false models Pinot multi-valued columns (arrays). */
final case class DimensionField(
    name: String,
    dataType: DataType,
    singleValue: Boolean = true,
    defaultOverride: Option[Any] = None)
  extends FieldSpec {
  def defaultNullValue: Any = defaultOverride.getOrElse(dataType match {
    case IntegerType => Int.MinValue
    case LongType => Long.MinValue
    case FloatType => Float.NegativeInfinity
    case DoubleType => Double.NegativeInfinity
    case BooleanType => false
    case TimestampType => java.sql.Timestamp.valueOf("1970-01-01 00:00:00")
    case StringType => "null"
    case BinaryType => Array.empty[Byte]
    case _ => null
  })
}

final case class MetricField(
    name: String,
    dataType: DataType,
    defaultOverride: Option[Any] = None)
  extends FieldSpec {
  def defaultNullValue: Any = defaultOverride.getOrElse(dataType match {
    case IntegerType => 0
    case LongType => 0L
    case FloatType => 0f
    case DoubleType => 0.0
    case _: DecimalType => BigDecimal(0)
    case BinaryType => Array.empty[Byte]
    case _ => null
  })
}

/** format follows Pinot's `timeSize:timeUnit:timeFormat` (schema.md:70),
  * granularity `size:unit`.
  */
final case class DateTimeField(
    name: String,
    dataType: DataType,
    format: String = "1:MILLISECONDS:EPOCH",
    granularity: String = "1:MILLISECONDS")
  extends FieldSpec {
  def defaultNullValue: Any = dataType match {
    case LongType => Long.MinValue
    case IntegerType => Int.MinValue
    case TimestampType => java.sql.Timestamp.valueOf("1970-01-01 00:00:00")
    case StringType => "null"
    case _ => null
  }
}

final case class TableSchema(
    schemaName: String,
    dimensions: Seq[DimensionField] = Seq.empty,
    metrics: Seq[MetricField] = Seq.empty,
    dateTimes: Seq[DateTimeField] = Seq.empty) {

  def fields: Seq[FieldSpec] = dimensions ++ metrics ++ dateTimes

  def toStructType: StructType = StructType(fields.map { f =>
    val dt = f match {
      case DimensionField(_, t, false, _) => ArrayType(t)
      case other => other.dataType
    }
    StructField(f.name, dt, nullable = true)
  })

  /** Replace nulls with Pinot's internal default null values. */
  def withNullDefaults(df: DataFrame): DataFrame =
    fields.filter(f => df.columns.contains(f.name)).foldLeft(df) { (acc, f) =>
      f match {
        // MV columns: a null list becomes the single-element
        // [defaultNullValue] (schema.md:25's multi-valued default)
        case d @ DimensionField(n, t, false, _) if d.defaultNullValue != null =>
          acc.withColumn(n,
            coalesce(col(n), array(lit(d.defaultNullValue).cast(t))))
        case DimensionField(_, _, false, _) => acc
        case _ if f.defaultNullValue == null => acc
        case _ =>
          acc.withColumn(f.name,
            coalesce(col(f.name), lit(f.defaultNullValue).cast(f.dataType)))
      }
    }
}
