package graft

import org.apache.spark.sql.functions._
import graft.dedup.{MinHashLsh, SimHash}
import graft.engine.Tables
import graft.queries.Registry

class DedupSpec extends SparkSpec {

  private def exactPairs(minJaccard: Double): Set[(Long, Long)] =
    Registry.queries("q_dedup_ngram_jaccard")(spark, sfDir)
      .filter(col("jaccard") >= minJaccard)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash LSH recalls high-Jaccard pairs") {
    val exact = exactPairs(0.9)
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    val cands = MinHashLsh.candidatePairs(Tables.documents(spark, sfDir), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(cands.contains).toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall over ${exact.size} exact pairs")
  }

  test("simhash finds near-dups within the hamming bound") {
    val pairs = SimHash.nearPairs(Tables.documents(spark, sfDir), "doc_id", "text", 3).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(2) <= 3, s"hamming ${r.getInt(2)} > 3")
    }
    // planted 0.98+-Jaccard twins should overlap substantially with simhash hits
    val exact = exactPairs(0.95)
    val simSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = exact.count(simSet.contains).toDouble / math.max(exact.size, 1)
    assert(hit >= 0.5, s"simhash found only $hit of near-identical pairs")
  }

  test("exact dedup keeps one representative per distinct content") {
    val docs = Tables.documents(spark, sfDir)
    val out = Registry.queries("q_dedup_exact")(spark, sfDir)
    assert(out.agg(sum("n_copies")).head().getLong(0) === docs.count())
  }
}
