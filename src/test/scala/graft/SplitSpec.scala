package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** The leakage invariant behind q_split_leakage: a train/valid/test split
  * keyed on the near-dup CLUSTER representative can never put two
  * near-duplicate documents on opposite sides of the train/eval boundary.
  */
class SplitSpec extends SparkSpec {

  private def splitAssignment(threshold: Double) = {
    val docs = Tables.documents(spark, sfDir)
    val pairs = graft.queries.DedupQueries.jaccardPairs(spark, sfDir, threshold)
    val cl = graft.dedup.Clusters
      .connectedComponents(pairs.select("a_id", "b_id"))
      .select(col("id").as("doc_id"), col("cluster_id"))
    val b = graft.functions.HashBuckets.md5Bucket(col("group_id").cast("string"), 10)
    val assigned = docs.join(cl, Seq("doc_id"), "left_outer")
      .withColumn("group_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split",
        when(b < 8, "train").when(b === 8, "valid").otherwise("test"))
    (assigned, pairs)
  }

  test("no near-dup pair straddles two splits") {
    val (assigned, pairs) = splitAssignment(0.8)
    val s = assigned.select(col("doc_id"), col("split"))
    val straddlers = pairs
      .join(s.withColumnRenamed("doc_id", "a_id").withColumnRenamed("split", "sa"), "a_id")
      .join(s.withColumnRenamed("doc_id", "b_id").withColumnRenamed("split", "sb"), "b_id")
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(straddlers === 0L, s"$straddlers near-dup pairs crossed the split boundary")
  }

  test("every document lands in exactly one split and all splits are nonempty") {
    val (assigned, _) = splitAssignment(0.8)
    val total = Tables.documents(spark, sfDir).count()
    assert(assigned.count() === total, "split assignment dropped or duplicated docs")
    val bySplit = assigned.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "valid", "test"))
    assert(bySplit.values.sum === total)
    // 80/10/10 on md5 buckets: train strictly dominates on any real corpus
    assert(bySplit("train") > bySplit("valid") && bySplit("train") > bySplit("test"))
  }

  test("naive per-document hashing DOES leak on this corpus (the invariant is not vacuous)") {
    val (_, pairs) = splitAssignment(0.8)
    val docs = Tables.documents(spark, sfDir)
    val b = graft.functions.HashBuckets.md5Bucket(col("doc_id").cast("string"), 10)
    val naive = docs.select(col("doc_id"),
      when(b < 8, "train").when(b === 8, "valid").otherwise("test").as("split"))
    val straddlers = pairs
      .join(naive.withColumnRenamed("doc_id", "a_id").withColumnRenamed("split", "sa"), "a_id")
      .join(naive.withColumnRenamed("doc_id", "b_id").withColumnRenamed("split", "sb"), "b_id")
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(straddlers > 0L,
      "fixture has no cross-split near-dup pairs under naive hashing — invariant untestable")
  }
}
