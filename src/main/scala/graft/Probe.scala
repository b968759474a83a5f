package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.TextShingles

/** Ad-hoc plan/perf probe (not part of the driver contract). */
object Probe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = TextShingles.withShingleHashes(Tables.documents(spark, sfDir), "doc_id", "text", 3)
    time("docs+shingles")(docs.count())
    time("docs+shingles again")(docs.count())
    val ex = docs.select(col("doc_id"), explode(col("sh")).as("sh"))
    time("explode")(ex.count())
    val pairs = ex.as("a")
      .join(ex.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    time("pairs join+groupBy")(pairs.count())
    val full = graft.queries.Registry.queries("q_dedup_ngram_jaccard")(spark, sfDir)
    time("full query")(full.count())
    full.explain("formatted")
    spark.stop()
  }
}
