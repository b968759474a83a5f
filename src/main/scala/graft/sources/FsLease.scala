package graft.sources

import org.apache.spark.sql.SparkSession

/** Filesystem lease for serializing maintenance jobs (index compaction,
  * realtime→offline promotion) against one directory root.
  *
  * Two layers, matching the failure domains:
  *   - a JVM-wide set keyed by (root, name) for SAME-PROCESS racers —
  *     `FileSystem.create(overwrite = false)` on the LOCAL filesystem is
  *     a non-atomic exists-then-create, so the file alone cannot
  *     serialize two threads (a spec-caught TOCTOU);
  *   - a hidden lease FILE for cross-process racers (atomic
  *     create-if-absent on HDFS-like stores), carrying a per-acquisition
  *     OWNERSHIP TOKEN (UUID): after creating the file the acquirer
  *     reads it back and proceeds only if it still holds its OWN token —
  *     a TTL-breaker that raced in between (delete + re-create) is
  *     detected and this acquirer backs off. Release deletes the file
  *     only while the token still matches, so a holder that overran the
  *     TTL can never delete the breaker's LIVE lease. The remaining
  *     window — a breaker deleting the file AFTER the holder's read-back
  *     verify — is the irreducible overlap every mtime-TTL lease has;
  *     size the TTL well above the longest guarded job.
  *
  * A lease whose mtime is older than `ttlMs` is a crashed holder's
  * leftover and is broken (deleted, then re-acquired through the same
  * token-verified path).
  */
object FsLease {

  private val inProcess =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Run `body` under `<root>/<name>`; None (body not run) when another
    * holder is live. The name should be `_`-prefixed so FileIndex
    * listings and partition discovery never see it.
    */
  def withLease[A](
      spark: SparkSession, root: String, name: String, ttlMs: Long)(body: => A)
      : Option[A] = {
    import org.apache.hadoop.fs.Path
    val key = s"$root/$name"
    if (!inProcess.add(key)) return None
    try {
      val rootPath = new Path(root)
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(rootPath)) fs.mkdirs(rootPath)
      val lease = new Path(rootPath, name)
      val token = java.util.UUID.randomUUID().toString
      def readToken(): Option[String] =
        try {
          val in = fs.open(lease)
          try Some(new String(
            in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
          finally in.close()
        } catch { case _: java.io.IOException => None }
      def tryAcquire(): Boolean = {
        val created =
          try {
            val out = fs.create(lease, false)
            try out.write(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            finally out.close()
            true
          } catch { case _: java.io.IOException => false }
        created && readToken().contains(token)
      }
      val acquired = tryAcquire() || {
        // lease exists: break it only if its holder looks dead (mtime
        // older than the TTL); getFileStatus can race the holder's own
        // release, in which case just try once more
        val stale =
          try fs.getFileStatus(lease).getModificationTime <
            System.currentTimeMillis() - ttlMs
          catch { case _: java.io.FileNotFoundException => true }
        stale && { fs.delete(lease, false); tryAcquire() }
      }
      if (!acquired) None
      else try Some(body) finally {
        // token-guarded release: never delete a lease we no longer own
        if (readToken().contains(token)) fs.delete(lease, false)
      }
    } finally inProcess.remove(key)
  }
}
