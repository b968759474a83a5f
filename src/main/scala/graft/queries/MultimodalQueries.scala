package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.multimodal.{MediaItem, Multimodal}

/** §K multimodal — drives the binary-column + batched-decode plumbing
  * through the driver contract. Media bytes are synthesized from the
  * documents table (this container has no codecs; the decode step is the
  * documented stub), so the entry is deterministic but rows-only.
  */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_multimodal_features",
      (s, d) => {
        import s.implicits._
        val kinds = Seq("image", "audio", "video")
        val items = Tables.documents(s, d)
          .select(col("doc_id"), col("text"), col("source"))
          .as[(Long, String, String)]
          .map { case (id, text, src) =>
            MediaItem(id, kinds((id % 3).toInt), text.getBytes("UTF-8"),
              s"stub/$src", 0, 0, 1000L)
          }
        Multimodal.extractFeatures(items, batchSize = 128)
          .groupBy("kind")
          .agg(
            count(lit(1)).as("n_items"),
            round(avg("n_bytes"), 2).as("avg_bytes"),
            round(avg(element_at(col("features"), 1)), 4).as("avg_f0"))
          .orderBy("kind")
      },
      None),

    // Frame sampling over video rows: the frame axis is deterministic
    // arithmetic over the synthesized duration, so DuckDB can verify the
    // sampled frame counts exactly (floor((dur-1)/step)+1 per clip).
    QueryDef(
      "q_multimodal_frames",
      (s, d) => {
        import s.implicits._
        val kinds = Seq("image", "audio", "video")
        val items = Tables.documents(s, d)
          .select(col("doc_id"), col("text"), col("source"))
          .as[(Long, String, String)]
          .map { case (id, text, src) =>
            MediaItem(id, kinds((id % 3).toInt), text.getBytes("UTF-8"),
              s"stub/$src", 0, 0, 500L + (id % 10) * 250L)
          }
        Multimodal.sampleFrames(items, everyMs = 250L)
          .agg(
            countDistinct(col("media_id")).as("n_videos"),
            count(lit(1)).as("n_frames"))
      },
      Some("""SELECT count(DISTINCT doc_id) AS n_videos,
                     CAST(sum(CAST(floor((dur - 1) / 250) + 1 AS BIGINT)) AS BIGINT) AS n_frames
              FROM (SELECT doc_id, 500 + (doc_id % 10) * 250 AS dur
                    FROM documents WHERE doc_id % 3 = 2)"""))
  )
}
