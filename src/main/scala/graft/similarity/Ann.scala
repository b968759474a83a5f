package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Similarity search over embedding columns.
  *
  * Brute-force top-k: the (small) query set is broadcast against the
  * candidate corpus, cosine is a codegen'd vector_dot, and the top-k
  * selection is the bounded `top_k_by` aggregate — each map task keeps a
  * k-sized heap per query (ObjectHashAggregate partial mode), so the 100 TB
  * candidate side streams through map tasks and only
  * (queries × partitions × k) heap entries ever shuffle. No window, no
  * one-reducer-per-query stage.
  *
  * LSH ANN: 8 fixed random hyperplanes (seeded, deterministic) sign-hash
  * every vector into one of 256 buckets; probes only compare within their
  * bucket, cutting the scanned candidate set ~256× at the cost of recall —
  * bounded against brute force in SimilaritySpec.
  */
object Ann {

  val NumPlanes = 8
  val Dim = 64

  /** Deterministic pseudo-random hyperplanes (fixed seed). */
  private lazy val planes: Seq[Array[Float]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumPlanes)(Array.fill(Dim)(rnd.nextGaussian().toFloat))
  }

  private def planeDot(emb: Column, plane: Array[Float]): Column =
    VectorFns.dot(emb, typedlit(plane))

  /** 0..255 bucket id from the sign pattern of the 8 plane dots. */
  def lshBucket(emb: Column): Column =
    planes.zipWithIndex
      .map { case (p, i) => when(planeDot(emb, p) > 0, lit(1 << i)).otherwise(lit(0)) }
      .reduce(_ + _)

  /** Two-stage top-k over (q_id, cand_id, sim) rows: map-side k-bounded
    * heaps, merge of (queries × partitions × k) entries, then posexplode
    * back to one ranked row per hit. Rank is 1-based, (sim desc, cand_id
    * asc) — identical ordering to the window form it replaces.
    */
  private[similarity] def selectTopK(sims: DataFrame, k: Int): DataFrame =
    sims.groupBy("q_id")
      .agg(VectorFns.topKBy(col("sim"), col("cand_id"), k).as("hits"))
      .select(col("q_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(
        col("q_id"), col("hit.cand_id").as("cand_id"),
        (col("pos") + 1).as("rank"), col("hit.sim").as("sim"))

  /** Exact cosine top-k: one row per (query, rank<=k candidate). */
  def knnBruteForce(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      VectorFns.norm(col("embedding")).as("q_nrm"))
    val c = candidates.select(
      col("vec_id").as("cand_id"), col("embedding").as("c_emb"),
      VectorFns.norm(col("embedding")).as("c_nrm"))
    val sims = broadcast(q).join(c, col("q_id") =!= col("cand_id"))
      .withColumn("sim", VectorFns.dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
    selectTopK(sims, k)
  }

  /** LSH-bucketed ANN top-k: compares only same-bucket pairs. */
  def knnLsh(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame =
    knnLshMultiProbe(queries, candidates, k, nProbe = 1)

  /** knnLsh's EXACT-REGIME twin (the q_ann_ivf_exact promotion pattern):
    * each query probes ALL 2^numPlanes buckets, so every candidate is
    * scored and the result IS brute-force kNN routed through the bucket
    * assignment / probe-join / k-heap machinery — deterministic and
    * DuckDB-hash-verifiable. Identical candidate-side bucketing and
    * scoring code to the approximate rows; only the probe set differs,
    * exactly like IVF's probe-all. A candidate still reaches a query
    * through exactly one bucket (its own), so no dedup is needed.
    */
  def knnLshProbeAll(
      queries: DataFrame, candidates: DataFrame, k: Int,
      numPlanes: Int = NumPlanes): DataFrame = {
    val q = queries.select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      VectorFns.norm(col("embedding")).as("q_nrm"))
      .withColumn("bucket", explode(typedlit((0 until (1 << numPlanes)).toList)))
    val c = candidates.select(
      col("vec_id").as("cand_id"), col("embedding").as("c_emb"),
      VectorFns.norm(col("embedding")).as("c_nrm"),
      lshBucket(col("embedding")).as("bucket"))
    val sims = broadcast(q).join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("sim",
        VectorFns.dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
    selectTopK(sims, k)
  }

  /** Multi-probe LSH ANN: each query probes its own bucket PLUS the
    * buckets reached by flipping the sign bits with the smallest
    * |margin| (the hyperplanes the query sits closest to — exactly the
    * flips most likely to hold its true neighbors). Standard multiprobe:
    * recall rises with nProbe at probe-side cost only; the candidate
    * corpus still stores ONE bucket per vector, so the index does not
    * grow. All probe generation is codegen'd HOFs on the (small,
    * broadcast) query side: sort plane margins, take the nProbe−1
    * smallest, XOR their bits into the base bucket, explode.
    *
    * numPlanes/seed are parameters (2^numPlanes buckets); recall vs
    * brute force and the nProbe monotonicity are bounded in
    * SimilaritySpec.
    */
  def knnLshMultiProbe(
      queries: DataFrame, candidates: DataFrame, k: Int,
      nProbe: Int = 3, numPlanes: Int = NumPlanes, dim: Int = Dim,
      seed: Long = 42L): DataFrame = {
    require(nProbe >= 1 && nProbe <= numPlanes + 1,
      s"nProbe must be in 1..numPlanes+1, got $nProbe")
    val ps = graft.functions.expressions.LshOps.planes(numPlanes, 1, dim, seed)
    def dots(emb: Column): Column =
      array(ps.toSeq.map(p => VectorFns.dot(emb, typedlit(p.toSeq))): _*)
    def bucketOf(ds: Column): Column =
      aggregate(
        zip_with(ds, typedlit((0 until numPlanes).map(i => 1 << i).toList),
          (d, bit) => when(d > 0, bit).otherwise(lit(0))),
        lit(0), (acc, b) => acc + b)
    val q0 = queries.select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      VectorFns.norm(col("embedding")).as("q_nrm"),
      dots(col("embedding")).as("__dots"))
    // (|margin|, planeIdx) sorted ascending -> flip the closest planes
    val flips = slice(
      transform(
        array_sort(zip_with(col("__dots"),
          typedlit((0 until numPlanes).toList),
          (d, i) => struct(abs(d).as("m"), i.as("i")))),
        s => s.getField("i")),
      1, nProbe - 1)
    val bits = typedlit((0 until numPlanes).map(i => 1 << i).toList)
    val q = q0
      .withColumn("__base", bucketOf(col("__dots")))
      .withColumn("bucket", explode(concat(
        array(col("__base")),
        transform(flips, i => col("__base").bitwiseXOR(element_at(bits, i + 1))))))
      .select("q_id", "q_emb", "q_nrm", "bucket")
    val c = candidates.select(
      col("vec_id").as("cand_id"), col("embedding").as("c_emb"),
      VectorFns.norm(col("embedding")).as("c_nrm"),
      bucketOf(dots(col("embedding"))).as("bucket"))
    val sims = broadcast(q).join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("sim", VectorFns.dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      // a candidate can reach one query through at most one bucket (its
      // own), so no dedup is needed before the k-heap
    selectTopK(sims, k)
  }
}
