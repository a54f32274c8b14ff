package graft.multimodal

import graft.SparkSpec

/** Multimodal plumbing: schema, determinism, batch shape — the parts
  * that stay when the stub decoders become real codecs. */
class MultimodalSpec extends SparkSpec {

  private def rows = Seq(
    Multimodal.MediaRow(1L, "image", "fake-png-payload".getBytes),
    Multimodal.MediaRow(2L, "audio", "fake-wav-payload-longer".getBytes),
    Multimodal.MediaRow(3L, "video", "fake-mp4".getBytes),
    Multimodal.MediaRow(4L, "image", Array.emptyByteArray))

  test("decodeMeta is deterministic and schema-stable") {
    val spark2 = spark
    import spark2.implicits._
    val ds = spark.createDataset(rows).repartition(3)
    val got1 = Multimodal.decodeMeta(ds).collect().sortBy(_.media_id)
    val got2 = Multimodal.decodeMeta(ds).collect().sortBy(_.media_id)
    assert(got1.toSeq == got2.toSeq)
    assert(got1.map(_.n_bytes).toSeq == Seq(16, 23, 8, 0))
    val img = got1(0)
    assert(img.width >= 64 && img.width < 4096 && img.n_frames == 1)
    val aud = got1(1)
    assert(aud.width == 0 && aud.n_frames >= 1000)
  }

  test("features are fixed-width, normalized, partition-invariant") {
    val spark2 = spark
    import spark2.implicits._
    val ds1 = spark.createDataset(rows).repartition(1)
    val ds4 = spark.createDataset(rows).repartition(4)
    val f1 = Multimodal.extractFeatures(ds1).collect().map(f => f.media_id -> f.feature.toSeq).toMap
    val f4 = Multimodal.extractFeatures(ds4).collect().map(f => f.media_id -> f.feature.toSeq).toMap
    assert(f1 == f4, "features must not depend on partitioning")
    assert(f1.values.forall(_.size == 16))
    assert(math.abs(f1(1L).sum - 1.0f) < 1e-6, "L1-normalized")
  }

  test("frame sampling produces stride-spaced indexes") {
    val spark2 = spark
    import spark2.implicits._
    val meta = spark.createDataset(Seq(
      Multimodal.DecodedMeta(7L, "video", 100, 640, 480, 10)))
    val idx = Multimodal.sampleFrameIndexes(meta, stride = 3)
      .collect().map(_.getInt(1)).sorted
    assert(idx.toSeq == Seq(0, 3, 6, 9))
  }
}
