package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.model._

class TableSchemaSpec extends SparkSpec {

  test("schema maps to StructType with MV columns as arrays") {
    val schema = TableSchema("t",
      dimensions = Seq(
        DimensionField("country", StringType),
        DimensionField("skills", StringType, singleValue = false)),
      metrics = Seq(MetricField("clicks", LongType)),
      dateTimes = Seq(DateTimeField("ts_ms", LongType, "1:MILLISECONDS:EPOCH", "15:MINUTES")))
    val st = schema.toStructType
    assert(st.fieldNames.toSeq === Seq("country", "skills", "clicks", "ts_ms"))
    assert(st("skills").dataType === ArrayType(StringType))
  }

  test("null defaults follow the reference's internal default-null table") {
    val schema = TableSchema("t",
      dimensions = Seq(DimensionField("name", StringType), DimensionField("age", IntegerType)),
      metrics = Seq(MetricField("score", DoubleType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row("x", null, null), Row(null, 3, 1.5)),
      StructType(Seq(
        StructField("name", StringType, true),
        StructField("age", IntegerType, true),
        StructField("score", DoubleType, true))))
    val out = schema.withNullDefaults(df).collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(out.toSet === Set(("x", Int.MinValue, 0.0), ("null", 3, 1.5)))
  }

  test("null MV columns default to the single-element default list") {
    val schema = TableSchema("t",
      dimensions = Seq(
        DimensionField("id", IntegerType),
        DimensionField("skills", StringType, singleValue = false),
        DimensionField("scores", IntegerType, singleValue = false)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1, Seq("a", "b"), null),
        Row(2, null, Seq(7))),
      StructType(Seq(
        StructField("id", IntegerType, true),
        StructField("skills", ArrayType(StringType), true),
        StructField("scores", ArrayType(IntegerType), true))))
    val out = schema.withNullDefaults(df).collect()
      .map(r => (r.getInt(0), r.getSeq[String](1).toList, r.getSeq[Int](2).toList)).toSet
    // schema.md:25: MV default null value is the one-element [default]
    assert(out === Set(
      (1, List("a", "b"), List(Int.MinValue)),
      (2, List("null"), List(7))))
  }
}
