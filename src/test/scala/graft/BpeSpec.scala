package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.pipeline.Bpe

/** BPE trainer correctness: the distributed dictionary-loop trainer must
  * reproduce, merge for merge, an independent in-memory reference
  * implementation of the published algorithm — and the greedy
  * left-to-right single-pair rewrite must handle overlap and word
  * boundaries exactly.
  */
class BpeSpec extends SparkSpec {

  /** Plain-Scala reference BPE (word-histogram form of Sennrich et al.):
    * no Spark, no sharing with the production code path.
    */
  private def refTrain(words: Map[String, Long], k: Int)
      : (Seq[(String, String, Long)], Map[Vector[String], Long]) = {
    var dict: Map[Vector[String], Long] =
      words.map { case (w, c) => (w.map(_.toString).toVector :+ "</w>") -> c }
    val out = Seq.newBuilder[(String, String, Long)]
    var step = 0
    var stop = false
    while (step < k && !stop) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach { p => pairs(p) = pairs.getOrElse(p, 0L) + c }
      }
      if (pairs.isEmpty) stop = true
      else {
        val ((a, b), c) = pairs.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((a, b, c))
        dict = dict.map { case (syms, cnt) =>
          val acc = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              acc += (a + b); i += 2
            } else { acc += syms(i); i += 1 }
          }
          acc.result() -> cnt
        } // merged keys can collide only if two words had identical symbol
          // sequences — impossible: the sequence spells the word
        step += 1
      }
    }
    (out.result(), dict)
  }

  test("distributed trainer reproduces the reference merge sequence on the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val words = Bpe.wordCounts(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (expected, _) = refTrain(words, 8)
    val (got, finalDict) = Bpe.train(docs, "text", 8)
    assert(got.map { case (_, a, b, c) => (a, b, c) } === expected)
    // steps number 1..k in order
    assert(got.map(_._1) === (1 to got.length))
    // the final dictionary really applied every merge: each learned fused
    // symbol appears somewhere, and no adjacent (a, b) of the LAST merge
    // survives in any word
    val (_, la, lb, _) = got.last
    val leftover = finalDict
      .select(col("syms"))
      .withColumn("n", size(col("syms")))
      .filter(col("n") >= 2)
      .select(explode(expr(
        "zip_with(slice(syms, 1, n - 1), slice(syms, 2, n - 1), (a, b) -> struct(a, b))"))
        .as("p"))
      .filter(col("p.a") === la && col("p.b") === lb)
      .count()
    assert(leftover === 0L, s"unmerged ($la, $lb) pairs remain")
  }

  test("encodeStats totals equal the reference dictionary's arithmetic") {
    val docs = Tables.documents(spark, sfDir)
    val words = Bpe.wordCounts(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (_, refDict) = refTrain(words, 8)
    // reference: word → encoded length (the sequence spells the word)
    val refLen: Map[String, Int] =
      refDict.keys.map(syms => syms.mkString("").stripSuffix("</w>") -> syms.length).toMap
    // expected per-source totals from a driver-side word walk
    val perSource = docs.select(col("source"), col("text")).collect()
      .flatMap { r =>
        "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).map(w => (r.getString(0), w))
      }
    val expected = perSource.groupBy(_._1).map { case (src, ws) =>
      val nWords = ws.length.toLong
      val charSyms = ws.map { case (_, w) => (w.length + 1).toLong }.sum
      val bpeSyms = ws.map { case (_, w) => refLen(w).toLong }.sum
      src -> ((nWords, charSyms, bpeSyms))
    }
    val (_, dict) = Bpe.train(docs, "text", 8)
    val got = Bpe.encodeStats(docs, "text", "source", dict).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    // merges only ever shrink the encoding
    got.values.foreach { case (_, chars, bpe) => assert(bpe <= chars && bpe > 0) }
  }

  test("trainer is partitioning-invariant") {
    val docs = Tables.documents(spark, sfDir)
    val (a, _) = Bpe.train(docs, "text", 4)
    val (b, _) = Bpe.train(docs.repartition(7), "text", 4)
    assert(a === b)
  }

  test("mergePair equals a reference greedy merge on arbitrary symbol runs (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val spark2 = spark
    import spark2.implicits._
    def refMerge(syms: List[String], a: String, b: String): List[String] = {
      val out = List.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val sym = Gen.oneOf("a", "b", "ab", "x")
    val prop = Prop.forAll(Gen.listOf(sym), sym, sym) { (syms, a, b) =>
      val got = Seq(Tuple1(syms)).toDF("syms")
        .select(Bpe.mergePair(org.apache.spark.sql.functions.col("syms"), a, b).as("m"))
        .head().getSeq[String](0).toList
      got == refMerge(syms, a, b)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(80)
        .withInitialSeed(org.scalacheck.rng.Seed(47L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("mergePair is greedy left-to-right and respects word boundaries") {
    val spark2 = spark
    import spark2.implicits._
    def merge(syms: Seq[String], a: String, b: String): Seq[String] =
      Seq(syms).toDF("syms")
        .select(Bpe.mergePair(col("syms"), a, b).as("m"))
        .head().getSeq[String](0)
    // overlapping run: non-overlapping left-to-right ("a a a" -> "aa a")
    assert(merge(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(merge(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    // interior merge keeps neighbors
    assert(merge(Seq("x", "a", "b", "y"), "a", "b") === Seq("x", "ab", "y"))
    // no occurrence -> unchanged
    assert(merge(Seq("x", "y"), "a", "b") === Seq("x", "y"))
    // pair at the very end, incl. the </w> marker position
    assert(merge(Seq("t", "h", "e", "</w>"), "e", "</w>") === Seq("t", "h", "e</w>"))
    // single symbol untouched
    assert(merge(Seq("a"), "a", "a") === Seq("a"))
  }
}
