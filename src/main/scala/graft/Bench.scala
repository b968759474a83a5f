package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Benchmark the ENGINE's recommended session configuration (AQE,
    // broadcast threshold, split sizes — graft.engine.Graft), not a bare
    // default session.
    val spark = graft.engine.Graft.session(
      master = s"local[$cpus]", shufflePartitions = cpus.toInt,
      appName = "graft-bench", extraConf = Map("spark.ui.enabled" -> "false"))
    // Warm the JVM/codegen/IO paths once so the first timed query isn't
    // charged for session bring-up (Pinot servers are long-lived too).
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    catch { case _: Throwable => () }
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: full materialization of every output row/column (count()
      // lets Spark prune the final project, under-timing wide results).
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // 3-decimal times keep the one-line JSON under the driver's tail-buffer
    // size (full-precision doubles pushed the 80+-query line past it, and the
    // truncated line failed to parse in round 2).
    def f3(v: Double): String = "%.3f".format(v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","failed":${failed.size}}""")
    spark.stop()
    // A broken query must bench as broken, not as "fast".
    if (failed.nonEmpty) sys.exit(1)
  }
}
