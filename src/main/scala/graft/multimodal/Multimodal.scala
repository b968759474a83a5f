package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One media row: opaque bytes + typed metadata (the schema a 100 TB
  * multimodal corpus table carries alongside its text/doc tables).
  */
final case class MediaItem(
    media_id: Long,
    kind: String, // "image" | "audio" | "video"
    bytes: Array[Byte],
    mime: String,
    width: Int,
    height: Int,
    duration_ms: Long)

final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    features: Array[Float])

/** Multimodal columns — image/audio/video as opaque binary columns with
  * typed metadata, processed in per-partition batches.
  *
  * The Spark-side plumbing is real: binary schema, batched
  * `mapPartitions` (one decoder init per partition, not per row — the
  * shape a JNI codec or an ONNX session needs), deterministic
  * partitioning. The CODEC ITSELF IS A STUB (`decodeStub`): this
  * container has no image/audio libraries, so decode is a deterministic
  * hash-derived feature vector standing in for "decode + embed"; swap
  * `decodeStub` for a real codec without touching any plumbing.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  val FeatureDim = 16

  /** STUB decoder: deterministic features from a rolling byte hash.
    * Replace with a real image/audio decode + model forward pass.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val out = Array.fill(FeatureDim)(0L)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      out(i % FeatureDim) ^= h
      i += 1
    }
    out.map(v => (v % 1000003L).toFloat / 1000003f)
  }

  /** Batched per-partition feature extraction. Batches amortize decoder
    * init; partition count controls parallel decoder instances at scale.
    */
  def extractFeatures(items: Dataset[MediaItem], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // one "decoder session" per partition (stubbed as a no-op handle)
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val b = Option(m.bytes).getOrElse(Array.empty[Byte])
          MediaFeatures(m.media_id, m.kind, b.length, decodeStub(b))
        }
      }
    }
  }

  /** Frame sampling plumbing for video rows: emits (media_id, frame_ts_ms)
    * stub frames every `everyMs` over the clip duration. Fully declarative
    * (`sequence` + `explode`, codegen'd) — the frame axis is generated
    * inside the scan stage, no typed lambda, no object serialization; the
    * per-frame decode then rides `extractFeatures`' batched path.
    */
  def sampleFrames(items: Dataset[MediaItem], everyMs: Long = 1000L): DataFrame =
    items.toDF()
      .filter(col("kind") === "video")
      .select(
        col("media_id"),
        explode(sequence(
          lit(0L), greatest(col("duration_ms"), lit(1L)) - 1, lit(everyMs)))
          .as("frame_ts_ms"))
}
