package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-measured scaling curve for the expensive dedup/ANN/curation family.
  *
  * The driver's fixtures stop at sf0.1, so the 100 TB posture of these
  * operators rests on plan-shape arguments alone. This main converts "the
  * plan is right" into "the slope is right": it synthesizes a C×-bigger
  * corpus from the sf0.1 documents/embeddings tables (content-perturbed so
  * the copies are NOT near-duplicates of each other — a naive self-union
  * would grow the true-pair count quadratically in the copy count and no
  * engine would look linear), writes BOTH scales through the same Spark
  * writer (identical file layout, unlike the driver's single-row-group
  * fixtures), and times the five most expensive registry queries at each
  * scale.
  *
  * Perturbation keeps within-copy structure exactly: copy k suffixes every
  * text token with k (shingle sets disjoint across copies, identical inside
  * a copy) and rolls each embedding by k positions (norm preserved,
  * cross-copy cosine ≈ random). So ground-truth work grows exactly C× and
  * a measured time ratio ≈ C means linear scaling.
  *
  * Usage: runMain graft.ScaleBench [copies] — prints one JSON line per
  * scale plus a final {"metric":"scale_slope",...} summary.
  */
object ScaleBench {

  private val QueryNames = Seq(
    "q_dedup_embedding", "q_dedup_ngram_jaccard", "q_dedup_clusters",
    "q_ann_ivf", "q_curation", "dedup_embedding_t09",
    // round-6 corpus family: the three shuffle-bearing new operators
    // (span-dedup window, LM-score explode+join, n-gram rollup);
    // q_mix_weighted is a pure scan predicate and has nothing to measure.
    "q_dedup_span", "q_lm_quality", "q_ngram_top",
    // round-6 additions: TF-IDF (tf shuffle + vocab join + per-doc window),
    // feature-hash embedding (per-doc rollup), sliding-window chunking
    // (expected ~1.0 — scan-local by construction, the measurement is the
    // proof).
    "q_tfidf_top", "q_text_embed", "q_chunk_docs",
    // round-7 curation family: quality gates (scan-local, expected ~flat),
    // boilerplate span df-strip (span rollup + broadcast-back), domain
    // capping (dictionary rollup + broadcast predicate).
    "q_quality_gates", "q_boilerplate_strip", "q_domain_cap")

  /** The registry's q_dedup_embedding runs the fixture-calibrated
    * threshold 0.4, where ~0.4% of RANDOM pairs qualify — so the true-pair
    * OUTPUT grows quadratically with corpus size by construction and no
    * exact pair-finder can look linear in input rows. The production
    * near-dup setting (cos ≥ 0.9, r=8/b=16 per EmbeddingLsh's analysis) is
    * the 100 TB-relevant slope, measured here alongside it.
    */
  private def dedupEmbeddingT09(s: SparkSession, d: String): DataFrame =
    graft.dedup.EmbeddingLsh.nearPairs(
      graft.engine.Tables.embeddings(s, d), "vec_id", "embedding",
      threshold = 0.9, r = 8, b = 16)

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val reps = 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Graft.session(
      master = s"local[$cpus]", shufflePartitions = cpus.toInt,
      appName = "graft-scalebench", extraConf = Map("spark.ui.enabled" -> "false"))

    val root = s"/tmp/graft_scale_p${ProcessHandle.current().pid()}"
    val dir1 = s"$root/x1"
    val dirC = s"$root/x$copies"
    synthesize(spark, baseDir, dir1, 1)
    synthesize(spark, baseDir, dirC, copies)

    def timeAll(dir: String): Map[String, Double] = QueryNames.map { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        (s: SparkSession, d: String) => dedupEmbeddingT09(s, d))
      val times = (1 to reps).flatMap { _ =>
        // Cold per rep: the session-scoped pairs/cluster/IVF caches would
        // otherwise make reps 2..N measure a cache lookup instead of the
        // work whose scaling we're here to measure.
        graft.queries.DedupQueries.invalidateCaches()
        graft.similarity.IvfAnn.invalidateIndexCache()
        val t0 = System.nanoTime()
        try { fn(spark, dir).write.format("noop").mode("overwrite").save()
              Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[scale] $name FAILED at $dir: ${e.getMessage}"); None }
      }
      name -> (if (times.isEmpty) Double.NaN else times.sorted.apply(times.size / 2))
    }.toMap

    def f3(v: Double) = "%.3f".format(v)
    val t1 = timeAll(dir1)
    val tC = timeAll(dirC)
    def line(scale: Int, t: Map[String, Double]) =
      s"""{"metric":"scale_times","scale":$scale,"queries":{${
        QueryNames.map(n => s"\"$n\":${f3(t(n))}").mkString(",")}}}"""
    println(line(1, t1))
    println(line(copies, tC))
    val slopes = QueryNames.map(n => n -> tC(n) / t1(n))
    println(s"""{"metric":"scale_slope","copies":$copies,"slopes":{${
      slopes.map { case (n, s) => s"\"$n\":${f3(s)}" }.mkString(",")}}}""")
    spark.stop()
  }

  /** Write a `copies`× corpus (documents + embeddings) derived from
    * `baseDir` under `outDir`, content-perturbed per copy (see class doc).
    */
  def synthesize(spark: SparkSession, baseDir: String, outDir: String, copies: Int): Unit = {
    val idShift = 10000000L
    val docs = graft.engine.Tables.documents(spark, baseDir)
    val docsC = (0 until copies).map { k =>
      val text =
        if (k == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", "$1" + k.toString)
      docs.select(
        (col("doc_id") + lit(k * idShift)).as("doc_id"),
        text.as("text"),
        col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    }.reduce(_ unionByName _)
    docsC.write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb = graft.engine.Tables.embeddings(spark, baseDir)
    val embC = (0 until copies).map { k =>
      // roll by k positions: norm preserved, cross-copy cosine ≈ random
      val dim = 64
      val r = k % dim
      val rolled =
        if (r == 0) col("embedding")
        else concat(
          slice(col("embedding"), r + 1, dim - r),
          slice(col("embedding"), 1, r))
      emb.select(
        (col("vec_id") + lit(k * idShift)).as("vec_id"),
        rolled.as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
    embC.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }
}
