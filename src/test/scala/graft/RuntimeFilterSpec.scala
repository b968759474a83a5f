package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Runtime bloom-filter semi-join reduction — the Spark-native analog of
  * Pinot's IN_ID_SET / ID_SET pushdown: a selective predicate on one join
  * side becomes a bloom filter applied to the OTHER side before its
  * shuffle. Graft.session enables it; this spec proves the optimizer
  * actually injects the filter for the join shapes the engine cares about
  * (fact-fact joins too big to broadcast).
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective build side injects a bloom filter on the probe side of a shuffle join") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // force the shuffle-join regime (on the fixtures everything fits
      // broadcast; at 100 TB a filtered fact side often does not)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val orders = Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT")
      val li = Tables.lineitem(spark, sfDir)
      val joined = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .groupBy("l_returnflag").agg(round(sum("l_quantity"), 2).as("s"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$optimized")
      // and the filtered result is still exact
      val expect = li.join(
          Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT"),
          li("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").agg(round(sum("l_quantity"), 2).as("s"))
        .collect().map(_.toSeq).toSet
      assert(joined.collect().map(_.toSeq).toSet === expect)
    }
  }
}
