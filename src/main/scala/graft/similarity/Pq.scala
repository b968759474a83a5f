package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Product quantization (PQ, Jégou et al. 2011) — the memory path that
  * makes billion-vector ANN fit a cluster: split each d-dim vector into
  * `m` subvectors, k-means each subspace into `kCodes` centroids, and
  * store each vector as m ONE-BYTE codes (kCodes ≤ 256). A 64-float
  * embedding (256 bytes) becomes m=8 bytes — 32×. Queries score against
  * codes with an asymmetric distance table (ADC): m·kCodes exact partial
  * dot products per query, then every candidate's approximate similarity
  * is m table lookups — no float vector is ever touched at scan time.
  *
  * Scale posture: codebooks are TINY (m·kCodes·(d/m) floats — driver/
  * broadcast class, like IvfAnn's centroid table) and in production train
  * on a corpus SAMPLE; encoding is one corpus scan against the broadcast
  * codebooks; the per-query distance table is nq·m·kCodes rows (broadcast
  * back); scoring is a scan-local array-HOF over the codes column plus
  * the k-bounded top_k_by heap — the exact q_knn_brute shape with 32×
  * less data moved. Vectors are L2-normalized before encoding so the ADC
  * dot IS the approximate cosine.
  */
object Pq {

  /** Session-scoped codebook+codes cache — the registry query would
    * otherwise re-fit per run (a real deployment materializes codes with
    * the segments, like the IVF index). Keyed by corpus plan hash +
    * parameters; invalidate after the underlying files change.
    */
  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Int, Int, Long), (DataFrame, DataFrame)]

  def invalidateCache(): Unit = {
    cache.values.foreach { case (cb, codes) =>
      cb.unpersist(blocking = false); codes.unpersist(blocking = false)
    }
    cache.clear()
  }

  /** L2-normalize (norm hoisted OUT of the transform lambda — an
    * aggregate referenced inside a HOF re-evaluates per element, the
    * loop-invariant trap PlanLintSpec closes registry-wide).
    */
  private def normalized(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol),
        VectorFns.norm(col(vecCol)).as("__nrm"))
      .select(
        col(idCol),
        transform(col(vecCol), x => x.cast("double") / col("__nrm")).as("nvec"))

  private def subSlice(vec: Column, sub: Column, subDim: Int): Column =
    slice(vec, sub * subDim + 1, lit(subDim))

  /** Per-subspace codebooks: (sub, cid, cvec), trained by ONE joint Lloyd
    * loop over all m subspaces at once (the `Kmeans.lloyd` discipline,
    * generalized): the corpus explodes once into (sub, svec) slice rows,
    * the m·kCodes centroids live on the DRIVER (m·kCodes·subDim doubles —
    * for 8×16 over 64-dim, 1 KiB), and each iteration is ONE scan-local
    * assignment pass (chained per-sub CASE so a row evaluates only its own
    * subspace's kCodes candidates, |s|² hoisted) plus an m·kCodes-row
    * `vector_avg` collect. maxIter iterations cost maxIter scans total —
    * the previous per-subspace MLlib fits cost m independent fit loops
    * (~m·maxIter jobs) over the same bytes, 8× the scheduling for the
    * identical asymptotic work. Seeding is deterministic (each subspace
    * seeds from the kCodes smallest-id slices), so codebooks — and
    * therefore codes and ADC scores — are exactly reproducible across
    * runs, sessions, and partitionings; `seed` remains in the signature
    * for cache-key/API compatibility only. Empty cells keep their stale
    * centroid (output arity is always m·kCodes, like Kmeans.lloyd).
    */
  def trainCodebooks(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, kCodes: Int, seed: Long = 42L, maxIter: Int = 10): DataFrame = {
    require(kCodes <= 256, "PQ codes must fit one byte (kCodes <= 256)")
    val spark = corpus.sparkSession
    val n = normalized(corpus, idCol, vecCol)
    val dim = n.select(size(col("nvec"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m

    val subRows = n
      .select(col(idCol).cast("long").as("id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("nvec"))
      .select(col("id"), col("sub"),
        subSlice(col("nvec"), col("sub"), subDim).as("svec"))
      .persist()
    try {
      // Deterministic seeds: the kCodes smallest ids' slices, per subspace
      // (m·kCodes rows collected — broadcast-class, never corpus-sized).
      val seedIds = subRows.select(col("id")).distinct()
        .orderBy("id").limit(kCodes).collect().map(_.getLong(0))
      require(seedIds.nonEmpty, "PQ training needs a non-empty corpus")
      val idRank = seedIds.sorted.zipWithIndex.toMap
      var cents: Map[(Int, Int), Seq[Double]] = subRows
        .filter(col("id").isin(seedIds: _*)).collect()
        .map(r => (r.getInt(1), idRank(r.getLong(0))) -> r.getSeq[Double](2))
        .toMap
      // Short corpora seed fewer than kCodes cells; pad by cycling so the
      // codebook arity stays m·kCodes (duplicates merge to one live cell).
      cents = (0 until m).flatMap { s =>
        (0 until kCodes).map(c => (s, c) -> cents((s, c % idRank.size)))
      }.toMap

      def assigned(): DataFrame = {
        val perSub = (0 until m).map { s =>
          val cands = (0 until kCodes).map { c =>
            val cv = cents((s, c))
            val cc = cv.foldLeft(0.0)((acc, x) => acc + x * x)
            struct(
              (col("ss") - lit(2.0) * VectorFns.dot(col("svec"), typedlit(cv)) + lit(cc))
                .as("d2"),
              lit(c).as("cid"))
          }
          s -> array_min(array(cands: _*))
        }
        val best = perSub.tail.foldLeft(
          when(col("sub") === perSub.head._1, perSub.head._2)) {
          case (acc, (s, e)) => acc.when(col("sub") === s, e)
        }
        subRows
          .withColumn("ss", VectorFns.dot(col("svec"), col("svec")))
          .withColumn("best", best)
          .select(col("sub"), col("best.cid").as("cid"), col("svec"))
      }

      var it = 0
      while (it < maxIter) {
        val updated = assigned()
          .groupBy("sub", "cid")
          .agg(VectorFns.vectorAvg(col("svec")).as("c"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2))
          .toMap
        cents = cents.map { case (k, old) => k -> updated.getOrElse(k, old) }
        it += 1
      }
      import spark.implicits._
      cents.toSeq
        .map { case ((s, c), v) => (s, c, v) }
        .sortBy(t => (t._1, t._2))
        .toDF("sub", "cid", "cvec")
    } finally subRows.unpersist(blocking = false)
  }

  /** Encode every corpus vector as m codes: (id, codes array<int>). One
    * scan: explode to m subvector rows, nearest centroid per subspace
    * via broadcast join + min_by, reassemble in subspace order.
    */
  def encode(
      corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, m: Int): DataFrame = {
    val n = normalized(corpus, idCol, vecCol)
    val subDim = codebooks.select(size(col("cvec"))).head().getInt(0)
    val l2 = aggregate(
      zip_with(col("svec"), col("cvec"), (a, b) => (a - b) * (a - b)),
      lit(0.0d), (acc, x) => acc + x)
    n.select(col(idCol), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("nvec"))
      .select(col(idCol), col("sub"),
        subSlice(col("nvec"), col("sub"), subDim).as("svec"))
      .join(broadcast(codebooks), "sub")
      .groupBy(col(idCol), col("sub"))
      .agg(min_by(col("cid"), l2).as("code"))
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        s => s.getField("code")).as("codes"))
  }

  private def buildCached(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, kCodes: Int, seed: Long): (DataFrame, DataFrame) =
    cache.getOrElseUpdate(
      (corpus.sparkSession,
        corpus.queryExecution.analyzed.semanticHash().toString, m, kCodes, seed), {
        val cb = trainCodebooks(corpus, idCol, vecCol, m, kCodes, seed).persist()
        val codes = encode(corpus, idCol, vecCol, cb, m).persist()
        (cb, codes)
      })

  /** ADC top-k: (q_id, cand_id, rank, sim). Self-matches are excluded,
    * ordering is (sim desc, cand_id asc) like every other knn* operator.
    *
    * With `rerankFactor` > 1 (the production shape) the ADC pass only
    * SHORTLISTS k·rerankFactor candidates per query; the shortlist —
    * queries·k·factor rows, broadcast class — then joins back to the
    * float vectors for exact cosine, and the final top-k is exact over
    * the shortlist. The corpus scan still touches only codes; the full
    * vectors are fetched for a per-query handful of ids (in a deployment,
    * a point-lookup against the vector store). rerankFactor = 1 is pure
    * ADC — lowest latency, lossiest.
    */
  def knnPq(
      queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 8, kCodes: Int = 16, seed: Long = 42L,
      rerankFactor: Int = 8): DataFrame = {
    val (codebooks, codes) = buildCached(corpus, "vec_id", "embedding", m, kCodes, seed)
    val q = normalized(queries, "vec_id", "embedding")
      .select(col("vec_id").as("q_id"), col("nvec").as("qvec"))
    val dtab = adcTable(q, codebooks)
    // Scan-local scoring: m array lookups per (candidate, query).
    val sims = codes.crossJoin(broadcast(dtab))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"), adcScore.as("sim"))
    finishTopK(sims, q, corpus, k, rerankFactor)
  }

  /** Per-query ADC table: dtab[sub][cid] = dot(q_sub, centroid) — built
    * from a tiny cross of (queries × m·kCodes centroids), broadcast back.
    */
  private def adcTable(q: DataFrame, codebooks: DataFrame): DataFrame = {
    val subDim = codebooks.select(size(col("cvec"))).head().getInt(0)
    q.crossJoin(broadcast(codebooks))
      .select(col("q_id"), col("sub"), col("cid"),
        VectorFns.dot(subSlice(col("qvec"), col("sub"), subDim), col("cvec"))
          .as("partial"))
      .groupBy(col("q_id"), col("sub"))
      .agg(transform(array_sort(collect_list(struct(col("cid"), col("partial")))),
        s => s.getField("partial")).as("ktab"))
      .groupBy(col("q_id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("ktab")))),
        s => s.getField("ktab")).as("dtab"))
  }

  /** Approximate similarity of a `codes` row against a `dtab` row. */
  private def adcScore: Column =
    aggregate(
      zip_with(col("codes"), col("dtab"),
        (c, row) => element_at(row, c.cast("int") + 1)),
      lit(0.0d), (acc, x) => acc + x)

  /** Final top-k — pure ADC, or exact-cosine rerank of the shortlist. */
  private def finishTopK(
      sims: DataFrame, q: DataFrame, corpus: DataFrame,
      k: Int, rerankFactor: Int): DataFrame =
    if (rerankFactor <= 1) Ann.selectTopK(sims, k)
    else {
      val shortlist = Ann.selectTopK(sims, k * rerankFactor)
        .select(col("q_id"), col("cand_id"))
      val cv = normalized(corpus, "vec_id", "embedding")
      val exact = cv.join(broadcast(shortlist), cv("vec_id") === col("cand_id"))
        .join(broadcast(q), "q_id")
        .select(col("q_id"), col("cand_id"),
          VectorFns.dot(col("nvec"), col("qvec")).as("sim"))
      Ann.selectTopK(exact, k)
    }

  /** Materialize codebooks + codes next to the corpus segments (the
    * deployment shape, like IvfAnn.materialize: train/encode ONCE at
    * build, queries read bytes). Layout: `<path>/codebooks`, `<path>/codes`.
    */
  def materialize(
      corpus: DataFrame, path: String,
      m: Int = 8, kCodes: Int = 16, seed: Long = 42L): Unit = {
    val cb = trainCodebooks(corpus, "vec_id", "embedding", m, kCodes, seed)
    cb.write.mode("overwrite").parquet(s"$path/codebooks")
    encode(corpus, "vec_id", "embedding", cb, m)
      .write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Query a materialized PQ index. `corpus` supplies the float vectors
    * for the rerank stage only — a per-query shortlist-sized point lookup
    * in a deployment, never a corpus scan (pass rerankFactor = 1 for the
    * pure-ADC, codes-only path). refreshByPath first, so a serving loop
    * picks up a rebuilt index on its next batch (the IvfAnn hot-swap
    * lesson).
    */
  def knnPqIndexed(
      spark: SparkSession, path: String,
      queries: DataFrame, corpus: DataFrame, k: Int,
      rerankFactor: Int = 8): DataFrame = {
    spark.catalog.refreshByPath(s"$path/codebooks")
    spark.catalog.refreshByPath(s"$path/codes")
    val codebooks = spark.read.parquet(s"$path/codebooks")
    val codes = spark.read.parquet(s"$path/codes")
    val q = normalized(queries, "vec_id", "embedding")
      .select(col("vec_id").as("q_id"), col("nvec").as("qvec"))
    val sims = codes.crossJoin(broadcast(adcTable(q, codebooks)))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"), adcScore.as("sim"))
    finishTopK(sims, q, corpus, k, rerankFactor)
  }

  /** IVF+PQ (the FAISS IVFPQ composition — the shape a billion-vector
    * deployment actually runs): coarse KMeans cells bound WHICH vectors
    * are scored (probe nProbe cells per query), PQ codes bound WHAT is
    * read per vector (m bytes, no floats), the ADC table bounds per-
    * candidate work to m lookups, and the exact rerank touches only the
    * k·factor shortlist. Corpus cost per query: |probed cells| · m byte
    * lookups — independent of both corpus dimension and float width.
    */
  def knnIvfPq(
      queries: DataFrame, corpus: DataFrame, k: Int,
      numCentroids: Int = 16, nProbe: Int = 4,
      m: Int = 8, kCodes: Int = 16, seed: Long = 42L,
      rerankFactor: Int = 8): DataFrame = {
    val (assigned, cellCentroids) = IvfAnn.buildIndexCached(corpus, numCentroids, seed)
    val (codebooks, codes) = buildCached(corpus, "vec_id", "embedding", m, kCodes, seed)
    val codesWithCell = codes.join(assigned.select(col("vec_id"), col("cell")), "vec_id")
    // Cell probing runs in the RAW embedding space (the IVF centroids are
    // trained there); ADC runs in the normalized space (cosine).
    val qRaw = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val probes = IvfAnn.probeCells(qRaw, cellCentroids, nProbe)
    val q = normalized(queries, "vec_id", "embedding")
      .select(col("vec_id").as("q_id"), col("nvec").as("qvec"))
    val dtab = adcTable(q, codebooks)
    val sims = codesWithCell
      .join(broadcast(probes.join(dtab, "q_id")), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"), adcScore.as("sim"))
    finishTopK(sims, q, corpus, k, rerankFactor)
  }
}
