package graft

import graft.multimodal.{MediaItem, Multimodal}

class MultimodalSpec extends SparkSpec {

  private def items() = {
    import spark.implicits._
    spark.createDataset(Seq(
      MediaItem(1L, "image", Array[Byte](1, 2, 3, 4), "image/png", 2, 2, 0L),
      MediaItem(2L, "image", Array[Byte](1, 2, 3, 4), "image/png", 2, 2, 0L),
      MediaItem(3L, "audio", Array[Byte](9, 9, 9), "audio/wav", 0, 0, 2500L),
      MediaItem(4L, "video", Array[Byte](5), "video/mp4", 640, 480, 3500L)))
  }

  test("batched feature extraction is deterministic and shape-stable") {
    val out = Multimodal.extractFeatures(items(), batchSize = 2).collect()
    assert(out.length === 4)
    out.foreach(f => assert(f.features.length === Multimodal.FeatureDim))
    val byId = out.map(f => f.media_id -> f).toMap
    // identical bytes -> identical (deterministic) stub features
    assert(byId(1L).features.toSeq === byId(2L).features.toSeq)
    assert(byId(1L).features.toSeq !== byId(3L).features.toSeq)
    assert(byId(3L).n_bytes === 3)
  }

  test("frame sampling emits one stub frame per interval for video only") {
    val frames = Multimodal.sampleFrames(items(), everyMs = 1000L).collect()
    assert(frames.map(_.getLong(0)).toSet === Set(4L))
    assert(frames.map(_.getLong(1)).sorted.toSeq === Seq(0L, 1000L, 2000L, 3000L))
  }
}
