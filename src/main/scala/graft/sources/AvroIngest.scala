package graft.sources

import scala.collection.JavaConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro batch ingestion (reference: /root/reference/Introduction.md:46 —
  * the reference's batch ingest formats prominently include Avro) WITHOUT
  * the spark-avro connector jar: this environment's classpath carries only
  * Avro core (org.apache.avro — the same public library spark-avro wraps),
  * so the reader is built directly on Avro's object-container API.
  *
  * Scale shape: the schema is read ONCE on the driver from the first
  * container file's header (no data scanned), then files decode in
  * parallel — one task per file, the same parallelism unit as the
  * reference's segments. The reader schema is the driver's schema, so
  * later files written with compatible evolved schemas project onto it
  * (Avro's standard reader/writer resolution). All decode work is
  * executor-side streaming (DataFileReader is an iterator — no file is
  * ever materialized whole).
  */
object AvroIngest {

  /** Avro → Spark type mapping (logical types: date, timestamp-millis/
    * micros, decimal; unions only in the nullable [null, T] form — the
    * shape every schema-registry pipeline emits).
    */
  def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "date") DateType
      else IntegerType
    case Schema.Type.LONG =>
      s.getLogicalType match {
        case lt if lt != null && lt.getName == "timestamp-millis" => TimestampType
        case lt if lt != null && lt.getName == "timestamp-micros" => TimestampType
        case _ => LongType
      }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      s.getLogicalType match {
        case d: org.apache.avro.LogicalTypes.Decimal =>
          DecimalType(d.getPrecision, d.getScale)
        case _ => BinaryType
      }
    case Schema.Type.ARRAY => ArrayType(sparkType(s.getElementType))
    case Schema.Type.MAP => MapType(StringType, sparkType(s.getValueType))
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map(f =>
        StructField(f.name, sparkType(f.schema), nullable = true)))
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
      require(nonNull.size == 1,
        s"only nullable [null, T] unions are supported, got $s")
      sparkType(nonNull.head)
    case Schema.Type.NULL => NullType
    case other => throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  def sparkSchema(record: Schema): StructType =
    sparkType(record).asInstanceOf[StructType]

  private def convert(v: Any, s: Schema): Any = {
    if (v == null) return null
    s.getType match {
      case Schema.Type.UNION =>
        val nonNull = s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
        convert(v, nonNull.head)
      case Schema.Type.STRING | Schema.Type.ENUM => v.toString
      case Schema.Type.BYTES =>
        s.getLogicalType match {
          case d: org.apache.avro.LogicalTypes.Decimal =>
            val bb = v.asInstanceOf[java.nio.ByteBuffer].duplicate()
            val bytes = new Array[Byte](bb.remaining()); bb.get(bytes)
            BigDecimal(new java.math.BigInteger(bytes), d.getScale)
          case _ =>
            val bb = v.asInstanceOf[java.nio.ByteBuffer].duplicate()
            val bytes = new Array[Byte](bb.remaining()); bb.get(bytes)
            bytes
        }
      case Schema.Type.FIXED =>
        v.asInstanceOf[GenericData.Fixed].bytes().clone()
      case Schema.Type.INT if s.getLogicalType != null &&
          s.getLogicalType.getName == "date" =>
        java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case Schema.Type.LONG if s.getLogicalType != null &&
          s.getLogicalType.getName == "timestamp-millis" =>
        java.sql.Timestamp.from(
          java.time.Instant.ofEpochMilli(v.asInstanceOf[Long]))
      case Schema.Type.LONG if s.getLogicalType != null &&
          s.getLogicalType.getName == "timestamp-micros" =>
        val micros = v.asInstanceOf[Long]
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L))
      case Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
          .map(convert(_, s.getElementType))
      case Schema.Type.MAP =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map {
          case (k, mv) => k.toString -> convert(mv, s.getValueType)
        }.toMap
      case Schema.Type.RECORD => toRow(v.asInstanceOf[GenericRecord], s)
      case _ => v
    }
  }

  private def toRow(rec: GenericRecord, s: Schema): Row =
    Row.fromSeq(s.getFields.asScala.toSeq.map(f =>
      convert(rec.get(f.pos), f.schema)))

  private def listAvroFiles(spark: SparkSession, path: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val statuses: Array[FileStatus] =
      if (fs.getFileStatus(p).isDirectory) fs.listStatus(p)
      else fs.globStatus(p)
    statuses.toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(_.getPath.toString)
      .sorted
  }

  private def openReader(conf: org.apache.hadoop.conf.Configuration,
      file: String, reader: Schema): DataFileReader[GenericRecord] = {
    val datum = new GenericDatumReader[GenericRecord]()
    if (reader != null) datum.setExpected(reader)
    new DataFileReader[GenericRecord](
      new FsInput(new Path(file), conf), datum)
  }

  /** Read the writer schema from the first file's header (driver-side,
    * no data scanned).
    */
  def schemaOf(spark: SparkSession, path: String): Schema = {
    val files = listAvroFiles(spark, path)
    require(files.nonEmpty, s"no avro files under $path")
    val r = openReader(spark.sparkContext.hadoopConfiguration, files.head, null)
    try r.getSchema finally r.close()
  }

  /** Strict read: any undecodable file fails the job. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val avroSchema = schemaOf(spark, path)
    val schema = sparkSchema(avroSchema)
    val schemaJson = avroSchema.toString
    val files = listAvroFiles(spark, path)
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .mapPartitions { it =>
        // SerializableConfiguration is private[spark]; a fresh default
        // Configuration resolves the same filesystems for the supported
        // URI schemes (local/HDFS-default) without shipping driver state.
        val conf = new org.apache.hadoop.conf.Configuration()
        it.flatMap { file =>
          val s = new Schema.Parser().parse(schemaJson)
          val r = openReader(conf, file, s)
          new Iterator[Row] {
            def hasNext: Boolean = { val h = r.hasNext; if (!h) r.close(); h }
            def next(): Row = toRow(r.next(), s)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Malformed-tolerant read, the jsonLinesTolerant contract for Avro:
    * (good rows, dead-letter files). A file whose header or blocks fail
    * to decode lands (path, error) on the dead-letter side; every healthy
    * file's rows stream through untouched. The decoded stream is
    * persisted once so the two sides don't re-open every file.
    */
  def readTolerant(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val avroSchema = schemaOf(spark, path)
    val schema = sparkSchema(avroSchema)
    val schemaJson = avroSchema.toString
    val files = listAvroFiles(spark, path)
    val decoded = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration()
        it.flatMap { file =>
          val s = new Schema.Parser().parse(schemaJson)
          try {
            val r = openReader(conf, file, s)
            val buf = scala.collection.mutable.ArrayBuffer[Either[(String, String), Row]]()
            try {
              while (r.hasNext) buf += Right(toRow(r.next(), s))
            } catch {
              case e: Exception =>
                buf += Left((file, s"decode failed mid-file: ${e.getMessage}"))
            } finally r.close()
            buf.iterator
          } catch {
            case e: Exception =>
              Iterator(Left((file, s"open failed: ${e.getMessage}")): Either[(String, String), Row])
          }
        }
      }
      .persist()
    val good = spark.createDataFrame(
      decoded.flatMap(_.toOption), schema)
    val badSchema = StructType(Seq(
      StructField("file", StringType), StructField("error", StringType)))
    val bad = spark.createDataFrame(
      decoded.flatMap(_.left.toOption.map { case (f, e) => Row(f, e) }), badSchema)
    (good, bad)
  }

  /** Driver-side container-file writer for fixtures and small exports
    * (the write path a test or a sample export needs; bulk writes stay on
    * parquet segments per SegmentWriter).
    */
  def writeFile(rows: Seq[Row], schema: Schema, file: java.io.File): Unit = {
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    writer.create(schema, file)
    try rows.foreach { row =>
      val rec = new GenericData.Record(schema)
      schema.getFields.asScala.foreach { f =>
        val v = row.get(f.pos) match {
          case bd: java.math.BigDecimal => bd // not expected in fixtures
          case other => other
        }
        rec.put(f.pos, v)
      }
      writer.append(rec)
    } finally writer.close()
  }
}
