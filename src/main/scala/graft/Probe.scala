package graft

/** Scratch single-query profiler (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = graft.engine.Graft.session(
      master = "local[32]", shufflePartitions = 32,
      appName = "graft-probe", extraConf = Map("spark.ui.enabled" -> "false"))
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"PROBE $name rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
