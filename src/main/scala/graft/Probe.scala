package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables

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

    val docs = Tables.documents(spark, sfDir)
    time("warm")(docs.count())
    import graft.functions.TextSearch
    val filt = docs.filter(TextSearch.textMatch(col("text"), "spark AND data OR \"table scan\""))
    time("tm filter count")(filt.count())
    time("tm filter count again")(filt.count())
    val q = graft.queries.Registry.queries("q_text_match")(spark, sfDir)
    time("tm full noop")(q.write.format("noop").mode("overwrite").save())
    time("tm full noop again")(q.write.format("noop").mode("overwrite").save())
    time("percentile noop")(graft.queries.Registry.queries("q_percentile")(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    time("percentile again")(graft.queries.Registry.queries("q_percentile")(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    time("ann_ivf")(graft.queries.Registry.queries("q_ann_ivf")(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    time("ann_ivf again")(graft.queries.Registry.queries("q_ann_ivf")(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    time("timeseries")(graft.queries.Registry.queries("q_timeseries")(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    time("dedup_keep")(graft.queries.Registry.queries("q_dedup_keep")(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
