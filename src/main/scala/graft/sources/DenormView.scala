package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized DENORMALIZED view — the ingest-time lookup-join Pinot
  * tables ship with (dimension columns resolved INTO the fact segments at
  * ingest, so queries never join at read time — reference:
  * /root/reference/basics/import-data/README.md ingest transforms and the
  * lookup-join usage in Architecture.md).
  *
  * Incremental contract (same discipline as the dedup band / TF-IDF DF /
  * LM vocab / IVF indexes): `refreshIncremental` joins ONLY the new fact
  * batch against the CURRENT dimension and appends — the existing view
  * files are never rescanned or rewritten. Each fact row therefore
  * carries the dimension AS OF its own ingest (the standard denormalized
  * contract; a dim change never rewrites history — that is what makes
  * the refresh O(batch), not O(view)).
  */
object DenormView {

  /** Full build: fact ⋈ broadcast dim, written to `path`. */
  def materialize(fact: DataFrame, dim: DataFrame, key: String, path: String): Unit =
    fact.join(broadcast(dim), key)
      .write.mode("overwrite").parquet(path)

  /** O(batch) refresh: join the new rows only, append under `path`. */
  def refreshIncremental(
      spark: SparkSession, path: String,
      factBatch: DataFrame, dim: DataFrame, key: String): Unit = {
    factBatch.join(broadcast(dim), key)
      .write.mode("append").parquet(path)
    // same-session readers must not serve the stale file listing
    spark.catalog.refreshByPath(path)
  }

  /** Read the view as it exists on disk now (hot-swap-safe: refresh the
    * cached listing first, the enrich()/knnIvfIndexed discipline).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    spark.catalog.refreshByPath(path)
    spark.read.parquet(path)
  }
}
