package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (BASELINE.json extension): image/audio/
  * video as opaque `binary` columns + typed metadata struct, with
  * decode / feature-extract / resize / frame-sample as per-partition
  * typed transforms.
  *
  * The actual codecs are NOT in this container, so the decode kernels are
  * STUBBED with deterministic fakes (clearly marked below) — what's real
  * and tested is the Spark-side contract: schema, binary handling,
  * partition-parallel batch shape, and the feature pipeline wiring.
  * Swapping a stub for a real codec (JNI/FFI in mapPartitions) changes no
  * plan shape: decode stays embarrassingly parallel inside the scan
  * stage at 100 TB.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])
  final case class DecodedMeta(media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int)
  final case class MediaFeature(media_id: Long, feature: Array[Float])

  /** ==== STUB ==== deterministic fake decoder: real implementations
    * parse container headers (PNG/JPEG/WAV/MP4); the fake derives stable
    * pseudo-dimensions from the byte content so tests are exact. */
  private[multimodal] def decodeStub(kind: String, bytes: Array[Byte]): (Int, Int, Int) = {
    val h = bytes.foldLeft(17L)((a, b) => a * 31 + (b & 0xff))
    def pick(lo: Int, hi: Int, salt: Int): Int =
      lo + math.floorMod(h ^ salt, (hi - lo).toLong).toInt
    kind match {
      case "image" => (pick(64, 4096, 1), pick(64, 4096, 2), 1)
      case "video" => (pick(320, 1920, 3), pick(240, 1080, 4), pick(24, 7200, 5))
      case "audio" => (0, 0, pick(1000, 100000, 6)) // frames = samples
      case _ => (0, 0, 0)
    }
  }

  /** ==== STUB ==== deterministic fake feature extractor: a 16-bin byte
    * histogram, L1-normalized — stands in for a real image/audio
    * embedding; identical batch shape (fixed-width Array[Float]). */
  private[multimodal] def featureStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
    val n = math.max(bytes.length, 1).toFloat
    hist.map(_ / n)
  }

  /** Decode metadata per partition (one pass over binary payloads). */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val (w, h, f) = decodeStub(m.kind, m.bytes)
      DecodedMeta(m.media_id, m.kind, m.bytes.length, w, h, f)
    })
  }

  /** Extract fixed-width features per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m => MediaFeature(m.media_id, featureStub(m.bytes))))
  }

  /** Deterministic frame sampling: every `stride`-th frame index up to
    * the decoded frame count (plumbing for video pipelines). */
  def sampleFrameIndexes(meta: Dataset[DecodedMeta], stride: Int): DataFrame = {
    meta.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride))))
      .select(col("media_id"), col("frame_idx"))
  }

  /** A media table derived from documents (text bytes as the opaque
    * payload — the container has no real media corpus; the pipeline
    * neither knows nor cares). */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("bytes"))
      .as[MediaRow]
  }

  /** Gate query (rows-only): decode + feature pipeline over the derived
    * media table; deterministic metadata + feature norm. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaFromDocuments(spark, dir).cache()
    val meta = decodeMeta(media)
    val feats = extractFeatures(media)
      .map(f => (f.media_id, math.sqrt(f.feature.map(x => x.toDouble * x).sum)))
      .toDF("media_id", "feat_norm")
      .withColumn("feat_norm", round(col("feat_norm"), 6))
    val out = meta.toDF().join(feats, "media_id")
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("width"), col("height"), col("n_frames"), col("feat_norm"))
      .orderBy("media_id")
      .collect()
    media.unpersist(false)
    out.map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
      r.getInt(4), r.getInt(5), r.getDouble(6)))
      .toSeq.toDF("media_id", "kind", "n_bytes", "width", "height", "n_frames", "feat_norm")
  }
}
