package graft

/** Scratch single-query profiler (not part of the driver contract).
  *
  * Usage: runMain graft.Probe <name>[,<name>...] [sfDir] [reps]
  * Each query is timed `reps` times through the noop sink; the formatted
  * physical plan is printed and — when SPARK_GRAFT_PLAN_OUT names a
  * directory — also written to <dir>/<name>.txt so plan evidence can be
  * committed (the plans/r15 before/after files).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val planOut = sys.env.get("SPARK_GRAFT_PLAN_OUT")
    val spark = graft.engine.Graft.session(
      master = "local[32]", shufflePartitions = 32,
      appName = "graft-probe", extraConf = Map("spark.ui.enabled" -> "false"))
    // SPARK_GRAFT_STAGES=1: per-stage wall/executor-time breakdown of the
    // LAST rep, from a listener (stage name ≈ the operator line).
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    if (sys.env.get("SPARK_GRAFT_STAGES").contains("1"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val wall = for {
              s <- si.submissionTime; c <- si.completionTime
            } yield c - s
            stageLog.add(f"STAGE ${si.stageId}%4d tasks=${si.numTasks}%3d " +
              f"wall=${wall.getOrElse(-1L)}%5dms ${si.name.takeWhile(_ != '\n').take(90)}")
          }
        })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        stageLog.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"PROBE $name rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      stageLog.forEach(l => println(s"$name $l"))
      val df = fn(spark, sfDir)
      // SPARK_GRAFT_PLAN_FINAL=1: execute THIS QueryExecution (internal
      // RDD count — no rows to the driver) so the dumped plan is the
      // final AQE plan with ReusedExchange / AQEShuffleRead visible.
      if (sys.env.get("SPARK_GRAFT_PLAN_FINAL").contains("1"))
        df.queryExecution.toRdd.count()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      planOut match {
        case Some(dir) =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"$name.txt"),
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"PROBE $name plan -> $dir/$name.txt")
        case None => println(plan)
      }
    }
    spark.stop()
  }
}
