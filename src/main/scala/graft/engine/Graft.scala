package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-call session factory with the engine's recommended configuration.
  * `shufflePartitions` should track cluster parallelism (≈2-3× total
  * cores on a real cluster; the test rigs pass their local thread count).
  */
object Graft {

  def session(
      master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors,
      appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Register every sf-dir table as a temp view so the whole engine
    * surface is reachable from `spark.sql(...)` (the reference is queried
    * over SQL; so is this).
    */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach { t =>
        // Route through each table's dedicated loader so SQL views see the
        // same schema as the DataFrame API (events: nanos-long → timestamp).
        val df = t match {
          case "events" => Tables.events(spark, dir)
          case other => Tables(spark, dir, other)
        }
        df.createOrReplaceTempView(t)
      }
}
