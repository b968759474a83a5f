package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFns
import graft.functions.expressions.{TopKHeap, TopKStrHeap, LshOps, MinHashOps}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Unit coverage for the round-2 custom expressions: the bounded top-k
  * heap (ordering, merge, serialization semantics) and the banded-LSH /
  * MinHash empty-input contracts.
  */
class ExpressionSpec extends SparkSpec {

  test("vector_avg computes the exact element-wise mean and ignores null rows") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (1, Some(Array(1.0f, 2.0f, 3.0f))),
      (1, Some(Array(3.0f, 4.0f, 5.0f))),
      (1, None),
      (2, Some(Array(10.0f, 0.0f, -2.0f))))
      .toDF("g", "v")
    val out = df.groupBy("g").agg(VectorFns.vectorAvg(col("v")).as("c"))
      .orderBy("g").collect()
    assert(out(0).getSeq[Double](1) === Seq(2.0, 3.0, 4.0))
    assert(out(1).getSeq[Double](1) === Seq(10.0, 0.0, -2.0))
    // an all-null group yields null, not a zero vector
    val empty = Seq((1, Option.empty[Array[Float]])).toDF("g", "v")
      .groupBy("g").agg(VectorFns.vectorAvg(col("v")).as("c")).collect()
    assert(empty(0).isNullAt(1))
  }

  test("vector_avg is partitioning-invariant on the fixture (merge path)") {
    val e = graft.engine.Tables.embeddings(spark, sfDir)
    def cents(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("label").agg(VectorFns.vectorAvg(col("embedding")).as("c"))
        .orderBy("label").collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).map(x => math.round(x * 1e10)))
    assert(cents(e).toSeq === cents(e.repartition(13)).toSeq)
  }

  test("vector_dot handles double arrays on either side") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(0.5, 0.25))).toDF("f", "d")
    val r = df.select(
      VectorFns.dot(col("f"), col("d")).as("fd"),
      VectorFns.dot(col("d"), col("d")).as("dd")).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 0.3125)
  }

  test("TopKHeap keeps exactly the k best under (score desc, id asc)") {
    val rnd = new scala.util.Random(7)
    val entries = Seq.tabulate(500)(i => (rnd.nextDouble(), i.toLong))
    val heap = new TopKHeap(10)
    entries.foreach { case (s, id) => heap.insert(s, id) }
    val expect = entries.sortBy { case (s, id) => (-s, id) }.take(10)
      .map { case (s, id) => (id, s) }
    assert(heap.sortedPairs.toSeq === expect)
  }

  test("TopKHeap ties break by ascending id and merge equals single-pass") {
    val heap = new TopKHeap(3)
    Seq((1.0, 5L), (1.0, 2L), (1.0, 9L), (1.0, 1L)).foreach((heap.insert _).tupled)
    assert(heap.sortedPairs.toSeq === Seq((1L, 1.0), (2L, 1.0), (5L, 1.0)))
    // merging partial heaps must equal one global heap
    val parts = Seq.tabulate(4)(_ => new TopKHeap(3))
    val all = new TopKHeap(3)
    val rnd = new scala.util.Random(13)
    for (i <- 0 until 200) {
      val s = rnd.nextDouble()
      parts(i % 4).insert(s, i.toLong)
      all.insert(s, i.toLong)
    }
    val merged = new TopKHeap(3)
    parts.foreach(merged.mergeFrom)
    assert(merged.sortedPairs.toSeq === all.sortedPairs.toSeq)
  }

  test("TopKHeap skips NaN scores and handles k > n") {
    val heap = new TopKHeap(5)
    heap.insert(Double.NaN, 1L)
    heap.insert(0.5, 2L)
    assert(heap.sortedPairs.toSeq === Seq((2L, 0.5)))
  }

  test("top_k_by aggregate equals a window-sorted ground truth on real data") {
    val e = graft.engine.Tables.events(spark, sfDir)
    val got = e.groupBy("event_type")
      .agg(VectorFns.topKBy(col("value"), col("event_id"), 5).as("hits"))
      .select(col("event_type"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("event_type"), col("hit.cand_id").as("id"), col("pos"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val want = e.select(col("event_type"), col("event_id"), col("value"))
      .collect().groupBy(_.getString(0))
      .flatMap { case (t, rows) =>
        rows.toSeq.map(r => (r.getLong(1), r.getDouble(2)))
          .sortBy { case (id, v) => (-v, id) }.take(5).zipWithIndex
          .map { case ((id, _), pos) => (t, id, pos) }
      }.toSet
    assert(got === want)
  }

  test("TopKStrHeap orders (score desc, key asc) and merge equals single-pass") {
    def u(s: String) = UTF8String.fromString(s)
    val heap = new TopKStrHeap(3)
    Seq((1.0, "pear"), (1.0, "apple"), (1.0, "zebra"), (1.0, "bee"))
      .foreach { case (s, k) => heap.insert(s, u(k)) }
    assert(heap.sortedPairs.toSeq.map { case (k, s) => (k.toString, s) } ===
      Seq(("apple", 1.0), ("bee", 1.0), ("pear", 1.0)))
    // merging partial heaps must equal one global heap (random scores/keys)
    val rnd = new scala.util.Random(23)
    val parts = Seq.tabulate(4)(_ => new TopKStrHeap(5))
    val all = new TopKStrHeap(5)
    for (i <- 0 until 300) {
      val s = rnd.nextInt(20).toDouble // many ties to stress the key order
      val k = u(f"term_${rnd.nextInt(50)}%03d")
      parts(i % 4).insert(s, k)
      all.insert(s, k)
    }
    val merged = new TopKStrHeap(5)
    parts.foreach(merged.mergeFrom)
    assert(merged.sortedPairs.toSeq === all.sortedPairs.toSeq)
  }

  test("top_k_by_str aggregate equals a window-sorted ground truth on real data") {
    val docs = graft.engine.Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(lower(col("text")), " ")).as("term"))
      .groupBy("lang", "term").agg(count(lit(1)).as("cnt"))
    val got = docs.groupBy("lang")
      .agg(VectorFns.topKByStr(col("cnt").cast("double"), col("term"), 4).as("top"))
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), col("col.key"), col("col.score").cast("long"), col("pos"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    val want = docs.collect().groupBy(_.getString(0))
      .flatMap { case (lang, rows) =>
        rows.toSeq.map(r => (r.getString(1), r.getLong(2)))
          .sortBy { case (t, c) => (-c, t) }.take(4).zipWithIndex
          .map { case ((t, c), pos) => (lang, t, c, pos) }
      }.toSet
    assert(got === want)
  }

  test("lsh band buckets are deterministic, band-tagged, and length b") {
    val emb = new GenericArrayData(Array.tabulate(64)(i => (i * 0.01f) - 0.3f))
    val a = LshOps.bandBuckets(emb, 4, 64, 64, 4242L)
    val b = LshOps.bandBuckets(emb, 4, 64, 64, 4242L)
    assert(a.numElements() === 64)
    assert((0 until 64).forall(i => a.getLong(i) === b.getLong(i)))
    // band index lives in the high bits => values collide only within a band
    assert((0 until 64).forall(i => (a.getLong(i) >> 32) === i.toLong))
  }

  test("frequent_items retains every true heavy hitter within the MG bound") {
    import graft.engine.Tables
    import graft.functions.TextShingles
    val toks = Tables.documents(spark, sfDir)
      .select(explode(TextShingles.wordTokens(col("text"))).as("w"))
    val n = toks.count()
    val k = 20
    val exact = toks.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sketch = toks.agg(TextShingles.frequentItems(col("w"), k).as("f"))
      .select(explode(col("f")).as("e"))
      .select(col("e.item"), col("e.est_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.size <= k)
    val bound = n / (k + 1)
    // every item with true count > n/(k+1) must be present...
    exact.filter(_._2 > bound).foreach { case (w, c) =>
      assert(sketch.contains(w), s"heavy hitter '$w' (count $c > $bound) missing")
    }
    // ...and estimates are lower bounds within the additive error
    sketch.foreach { case (w, est) =>
      val truth = exact.getOrElse(w, 0L)
      assert(est <= truth, s"'$w' overestimated: $est > $truth")
      assert(truth - est <= bound, s"'$w' error ${truth - est} > $bound")
    }
  }

  test("frequent_items merge path equals the guarantee under partitioning") {
    val parts = Seq.tabulate(8)(_ => new graft.functions.expressions.FreqSketch(5))
    val all = new graft.functions.expressions.FreqSketch(5)
    val rnd = new scala.util.Random(99)
    val stream = Seq.fill(2000)(s"w${math.abs(rnd.nextInt(40))}") ++
      Seq.fill(500)("hot1") ++ Seq.fill(400)("hot2")
    stream.zipWithIndex.foreach { case (w, i) => parts(i % 8).add(w); all.add(w) }
    val merged = new graft.functions.expressions.FreqSketch(5)
    parts.foreach(merged.mergeFrom)
    val bound = stream.size / 6
    Seq("hot1", "hot2").foreach { hot =>
      assert(merged.counters.contains(hot), s"$hot lost in merge")
      val truth = stream.count(_ == hot).toLong
      assert(truth - merged.counters(hot) <= bound)
    }
  }

  test("empty inputs emit no minhash bands (no false candidates)") {
    val none = MinHashOps.bands(new GenericArrayData(Array.emptyLongArray), 32, 8)
    assert(none.numElements() === 0)
    val some = MinHashOps.bands(new GenericArrayData(Array(42L)), 32, 8)
    assert(some.numElements() === 8)
  }
}
