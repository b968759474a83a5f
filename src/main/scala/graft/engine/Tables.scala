package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch "segment" loader (reference: /root/reference/basics/Concepts.md:17
  * — Pinot tables are collections of columnar segments). Each table is a
  * parquet dataset under the driver-provided scale-factor directory
  * (TESTDATA.md). All access goes through these helpers so scans stay
  * declarative: Catalyst pushes filters and column pruning into the parquet
  * scan, which is the Spark-native analog of Pinot's per-segment
  * inverted/range indexes and is what makes a 100 TB scan viable.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark only reads as a
    * raw long (spark.sql.legacy.parquet.nanosAsLong=true, set by
    * Verify/Bench/specs). Convert to a microsecond timestamp here —
    * truncating division, matching DuckDB's ns→us cast — so every query
    * downstream sees a normal timestamp column.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
