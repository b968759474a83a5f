package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the RAG / pretraining-context
  * preparation step: split each document into overlapping windows of
  * `window` tokens advancing by `stride` (overlap = window - stride), so
  * retrieval or training sees every span inside at least one chunk.
  *
  * Shape at 100 TB: entirely scan-local — tokenize, per-doc window-index
  * explode (bounded by docLength/stride) and slice are all codegen'd
  * expressions; no shuffle, no state, no UDF. Contrast with
  * `Packing`/q_pack_sequences, which concatenates ACROSS documents; this
  * operator windows WITHIN each document.
  */
object Chunker {

  /** One row per (doc, chunk): (idCol, chunk_idx, chunk: Array[String]).
    * Windows advance by `stride` and STOP at the first window that
    * reaches the document's end — later start positions would emit
    * strictly-suffix chunks already contained in an earlier window
    * (pure duplication for stride < window). Chunk count is
    * ceil(max(n - window, 0) / stride) + 1; every token lands in at
    * least one chunk; only the final chunk may be shorter than `window`
    * (when the document is shorter than one window).
    */
  def slidingWindows(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    val lastIdx = greatest(
      ceil((size(col("t")) - window).cast("double") / stride).cast("int"), lit(0))
    docs
      .select(col(idCol), split(col(textCol), " ").as("t"))
      .select(col(idCol), col("t"),
        explode(sequence(lit(0), lastIdx)).as("chunk_idx"))
      .select(
        col(idCol), col("chunk_idx"),
        slice(col("t"), col("chunk_idx") * stride + 1, lit(window)).as("chunk"))
  }
}
