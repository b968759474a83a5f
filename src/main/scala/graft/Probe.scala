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

    val emb = Tables.embeddings(spark, sfDir)
    time("warm")(emb.count())
    val pairs = graft.dedup.EmbeddingLsh.nearPairs(emb, "vec_id", "embedding", 0.4)
    pairs.explain("formatted")
    val pairsP = pairs.select("a_id", "b_id").persist()
    val nPairs = time("pairs materialize")(pairsP.count())
    println(s"[probe] n pairs = $nPairs")
    val t0 = System.nanoTime()
    val cc = graft.dedup.Clusters.connectedComponents(pairsP)
    println(f"[probe] CC total ${(System.nanoTime() - t0) / 1e9}%8.2f s, clusters = ${cc.count()}")
    spark.stop()
  }
}
