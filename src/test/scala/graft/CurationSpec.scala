package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.pipeline.Curation
import graft.queries.Registry

class CurationSpec extends SparkSpec {

  test("curation pipeline dedups, filters and samples deterministically") {
    val docs = Tables.documents(spark, sfDir)
    val cfg = Curation.Config(keepRates = Map("en" -> 0.5), defaultKeepRate = 1.0)
    val out = Curation.curate(docs, cfg)
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty && kept.size < docs.count())

    // no two surviving docs share identical content
    assert(out.groupBy(md5(col("text"))).count().filter(col("count") > 1).count() === 0)

    // exact-Jaccard >= 0.8 near-dup pairs never BOTH survive
    val pairs = Registry.queries("q_dedup_ngram_jaccard")(spark, sfDir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(!(kept.contains(a) && kept.contains(b)), s"near-dup pair ($a,$b) both kept")
    }

    // quality bounds hold on every survivor
    out.select("n_tokens", "uniq_ratio").collect().foreach { r =>
      assert(r.getInt(0) >= cfg.minTokens)
      assert(r.getDouble(1) >= cfg.minUniqRatio)
    }

    // deterministic end-to-end: a second run yields the identical corpus
    val again = Curation.curate(docs, cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === kept)

    // stratified rate is honored within a loose binomial tolerance
    val en = out.filter(col("lang") === "en").count().toDouble
    val enTotal = docs.filter(col("lang") === "en").count().toDouble
    assert(en / enTotal < 0.75, s"en keep rate ${en / enTotal} far above 0.5")
  }
}
