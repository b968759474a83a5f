package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hybrid offline+realtime table with a CATALOG-DERIVED time boundary and
  * realtime→offline segment promotion — the broker/minion pair of Pinot's
  * hybrid tables re-expressed for a file layout (reference:
  * /root/reference/basics/Architecture.md — brokers route a hybrid query
  * to offline servers below the time boundary and realtime servers above
  * it; a periodic task promotes completed realtime segments into the
  * offline table).
  *
  * Layout under `root/`:
  *   - `offline/`   — immutable, complete time granules (parquet; any
  *                    internal layout — reads use recursiveFileLookup)
  *   - `realtime/`  — streaming-ingested rows (micro-batch parquet)
  *   - `_time_boundary` — the serving arbiter: epoch-MICROS long, written
  *                    via temp-file + atomic rename
  *
  * THE BOUNDARY FILE IS THE ONLY SERVING TRUTH. `read` serves
  * `offline WHERE ts < boundary  UNION ALL  realtime WHERE ts >= boundary`,
  * so promotion can stage data freely and flip visibility with ONE atomic
  * rename:
  *   1. copy complete granules `[boundary, newBoundary)` from realtime
  *      into `offline/promoted=<granule range>/` — invisible: the
  *      boundary still routes that range to realtime;
  *   2. atomically advance `_time_boundary` to `newBoundary` — the copied
  *      granules flip to offline in one rename; their realtime twins stop
  *      being served the same instant (no loss, no double-serve, no
  *      reader-side coordination);
  *   3. garbage-collect realtime rows `< newBoundary` (pure space
  *      reclamation — correctness never depends on it).
  * A crash between 1 and 2 leaves unserved files that the next promotion
  * run OVERWRITES (stage dirs are named by their range start, which a
  * failed run leaves unchanged), so replay is idempotent.
  *
  * At 100 TB: `read` plans two parquet scans with the boundary predicate
  * pushed into each (partition pruning when offline is day-partitioned);
  * the boundary derivation reads parquet FOOTERS (driver-side, no scan
  * job — the SegmentCatalog.metadataRowCount discipline); promotion
  * touches only the promoted granules, never rewrites history.
  */
object HybridTable {

  final case class PromotionStats(
      oldBoundaryUs: Long, newBoundaryUs: Long, promotedRows: Long)

  private val BoundaryName = "_time_boundary"

  /** Run `body` (layout writes) with INT64-micros parquet timestamps:
    * INT64 carries min/max FOOTER statistics, which the boundary
    * derivation reads driver-side instead of scanning — legacy INT96 (the
    * session default, kept for dump-format stability) has none. Restores
    * the session's previous setting afterwards. Use around every write
    * into a hybrid layout.
    */
  def withMicrosTimestamps[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def fs(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def offlineDir(root: String): String = s"$root/offline"
  def realtimeDir(root: String): String = s"$root/realtime"

  /** The committed boundary (epoch micros), if one has been written.
    * Tolerates losing an exists/open race against a concurrent commit
    * (returns None → the caller falls back to derivation) instead of
    * surfacing a FileNotFoundException from the serving path.
    */
  def readBoundary(spark: SparkSession, root: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(root, BoundaryName)
    val f = fs(spark, root)
    if (!f.exists(p)) None
    else
      try {
        val in = f.open(p)
        try Some(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
        finally in.close()
      } catch { case _: java.io.FileNotFoundException => None }
  }

  /** Atomically commit a new boundary: temp file + OVERWRITE rename via
    * FileContext — one metadata op replaces the old value, so a reader
    * sees either boundary but never a missing file (FileSystem.rename
    * cannot overwrite, and delete-then-rename would open that window).
    */
  def writeBoundary(spark: SparkSession, root: String, boundaryUs: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val f = fs(spark, root)
    val tmp = f.makeQualified(new Path(root, s".$BoundaryName.tmp"))
    val dst = f.makeQualified(new Path(root, BoundaryName))
    val out = f.create(tmp, true)
    try out.write(boundaryUs.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(f.getUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** CATALOG-DERIVED boundary (Pinot's broker rule, re-expressed): the
    * offline side owns COMPLETE granules, so the boundary is the start of
    * the granule AFTER the newest offline timestamp — floor(max) + 1
    * granule. Derived from parquet FOOTER max statistics of the (INT64
    * timestamp) column: a driver-side metadata read, never a scan job.
    * None when offline is empty or footers lack stats.
    */
  def deriveBoundary(
      spark: SparkSession, root: String, tsCol: String,
      granuleUs: Long = 86400000000L): Option[Long] = {
    val dir = offlineDir(root)
    val f = fs(spark, dir)
    if (!f.exists(new org.apache.hadoop.fs.Path(dir))) None
    else SegmentCatalog.metadataColumnRangeLong(spark, dir, tsCol)
      .orElse {
        // legacy INT96-timestamp segments carry no long stats — fall back
        // to one max() scan (engine-written segments are INT64 micros, so
        // this path is for foreign files only)
        readDir(spark, dir).flatMap { df =>
          val r = df.agg(max(unix_micros(col(tsCol)))).head()
          if (r.isNullAt(0)) None else Some((0L, r.getLong(0)))
        }
      }
      .map { case (_, hi) => math.floorDiv(hi, granuleUs) * granuleUs + granuleUs }
  }

  private def readDir(spark: SparkSession, dir: String): Option[DataFrame] = {
    val f = fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    // recursiveFileLookup: stage subdirs (promoted=...) are plain data,
    // not Hive partitions — no conflicting-layout inference. The side
    // counts as PRESENT only when a visible entry exists: a dir holding
    // only `_temporary`/`_spark_metadata` (a racing first write) must
    // read as absent, not crash schema inference.
    if (f.exists(p) && f.listStatus(p).exists { st =>
          val n = st.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        })
      Some(spark.read.option("recursiveFileLookup", "true").parquet(dir))
    else None
  }

  /** The hybrid view: offline strictly below the boundary, realtime at or
    * above it. Falls back to the catalog-derived boundary when no
    * boundary file has been committed yet; with neither, everything is
    * realtime (the empty-offline bootstrap state).
    */
  def read(spark: SparkSession, root: String, tsCol: String,
      granuleUs: Long = 86400000000L): DataFrame = {
    // No sentinel literal in the plan: Long.MinValue micros overflows the
    // INT96 rebase when the comparison is evaluated against legacy
    // timestamps (streaming sinks write the session default). Bootstrap
    // (no committed/derivable boundary = no offline data) serves
    // everything from realtime, unfiltered.
    val boundaryUs = readBoundary(spark, root)
      .orElse(deriveBoundary(spark, root, tsCol, granuleUs))
    val off = readDir(spark, offlineDir(root)).map { df =>
      boundaryUs match {
        case Some(b) => df.filter(col(tsCol) < timestamp_micros(lit(b)))
        case None => df.filter(lit(false))
      }
    }
    val rt = readDir(spark, realtimeDir(root)).map { df =>
      boundaryUs match {
        case Some(b) => df.filter(col(tsCol) >= timestamp_micros(lit(b)))
        case None => df
      }
    }
    (off, rt) match {
      case (Some(o), Some(r)) => o.unionByName(r)
      case (Some(o), None) => o
      case (None, Some(r)) => r
      case (None, None) => throw new IllegalStateException(
        s"hybrid table $root has neither offline nor realtime data")
    }
  }

  /** Promote complete realtime granules into the offline table and
    * advance the boundary — Pinot's RealtimeToOfflineSegments task. The
    * new boundary is the start of the newest (in-progress) realtime
    * granule: everything strictly below it is complete and moves; the
    * open granule keeps serving from realtime. Lease-guarded (same
    * discipline as dedup-index compaction); `gcRealtime = true` also
    * deletes the realtime files wholly below the new boundary (step 3 —
    * per-file, atomic, idempotent; optional because serving correctness
    * never depends on it).
    *
    * Returns None when another promoter holds the lease; Some(stats)
    * otherwise (promotedRows == 0 when no granule completed since the
    * last run).
    */
  def promoteRealtime(
      spark: SparkSession, root: String, tsCol: String,
      granuleUs: Long = 86400000000L, gcRealtime: Boolean = true,
      leaseTtlMs: Long = 15 * 60 * 1000L): Option[PromotionStats] =
    FsLease.withLease(spark, root, "_promote_lease", leaseTtlMs) {
      import org.apache.hadoop.fs.Path
      val f = fs(spark, root)
      val oldB = readBoundary(spark, root)
        .orElse(deriveBoundary(spark, root, tsCol, granuleUs))
        .getOrElse(Long.MinValue)
      val rt = readDir(spark, realtimeDir(root)).getOrElse(
        throw new IllegalStateException(s"hybrid table $root has no realtime dir"))
      // newest realtime granule stays open; everything below its start is
      // complete. Footer max again — no scan job for the decision.
      val maxUs = SegmentCatalog
        .metadataColumnRangeLong(spark, realtimeDir(root), tsCol).map(_._2)
        .getOrElse(rt.agg(max(unix_micros(col(tsCol)))).head() match {
          case r if r.isNullAt(0) => Long.MinValue
          case r => r.getLong(0)
        })
      val newB = math.floorDiv(maxUs, granuleUs) * granuleUs
      if (maxUs == Long.MinValue || newB <= oldB)
        PromotionStats(oldB, oldB, 0L)
      else {
        // 1. stage [oldB, newB) into offline — named by range START so a
        // crashed run's leftover is overwritten by its replay, never
        // accumulated next to it
        val stageName =
          if (oldB == Long.MinValue) "promoted=bootstrap"
          else s"promoted=$oldB"
        val stage = s"${offlineDir(root)}/$stageName"
        val upper = col(tsCol) < timestamp_micros(lit(newB))
        val toPromote =
          if (oldB == Long.MinValue) rt.filter(upper) // bootstrap: no lower bound
          else rt.filter(col(tsCol) >= timestamp_micros(lit(oldB)) && upper)
        withMicrosTimestamps(spark) {
          toPromote.write.mode("overwrite").parquet(stage)
        }
        val promoted = SegmentCatalog.metadataRowCount(spark, stage)
        // 2. flip visibility in one atomic rename
        writeBoundary(spark, root, newB)
        // 3. GC: delete exactly the realtime FILES whose footer max sits
        // wholly below the new boundary — their rows can never be served
        // again (read filters realtime to ts >= boundary). Per-file
        // deletes are atomic and idempotent: a crash leaves extra dead
        // files for the next run, the realtime dir itself is never moved
        // or rewritten (no window where the open granule disappears from
        // the layout), and a file STRADDLING the boundary is kept whole —
        // its dead prefix is reclaimed once a later boundary passes its
        // max. Files without stats (foreign INT96) are conservatively
        // kept.
        if (gcRealtime) {
          SegmentCatalog.dataFileRangesLong(spark, realtimeDir(root), tsCol)
            .foreach {
              case (file, Some((_, hi))) if hi < newB =>
                f.delete(new Path(file), false)
              case _ =>
            }
        }
        PromotionStats(oldB, newB, promoted)
      }
    }
}
