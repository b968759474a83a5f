package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch ingestion (reference: /root/reference/Introduction.md:7 — the
  * reference ingests batch data from HDFS/S3/ADLS/GCS in multiple
  * formats). Spark-native: `spark.read` already speaks every needed
  * format and filesystem; these helpers pin the engine's conventions
  * (explicit schema for text formats — schema inference is a full extra
  * scan at 100 TB — and ingestion lands as sorted/partitioned segments
  * via SegmentWriter).
  */
object Ingest {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Ingest + land as query-optimized segments in one step. */
  def toSegments(df: DataFrame, path: String, cfg: SegmentWriter.Config): Unit =
    SegmentWriter.write(df, path, cfg)
}
