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
      None)
  )
}
