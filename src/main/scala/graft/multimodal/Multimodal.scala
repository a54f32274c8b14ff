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

  /** Engine-portable content hash: (h·31 + byte) mod (2³¹−1), h₀=17 —
    * every intermediate fits well inside int64, so a SQL oracle can fold
    * the identical chain (no JVM wrap-around semantics involved). */
  val HashMod = 2147483647L
  private[multimodal] def byteHash(bytes: Array[Byte]): Long =
    bytes.foldLeft(17L)((a, b) => (a * 31 + (b & 0xff)) % HashMod)

  /** ==== STUB ==== deterministic fake decoder: real implementations
    * parse container headers (PNG/JPEG/WAV/MP4); the fake derives stable
    * pseudo-dimensions from the byte content so tests are exact. */
  private[multimodal] def decodeStub(kind: String, bytes: Array[Byte]): (Int, Int, Int) = {
    val h = byteHash(bytes)
    def pick(lo: Int, hi: Int, salt: Int): Int =
      lo + ((h ^ salt) % (hi - lo)).toInt // h ≥ 0, salt tiny → xor ≥ 0
    kind match {
      case "image" => (pick(64, 4096, 1), pick(64, 4096, 2), 1)
      case "video" => (pick(320, 1920, 3), pick(240, 1080, 4), pick(24, 7200, 5))
      case "audio" => (0, 0, pick(1000, 100000, 6)) // frames = samples
      case _ => (0, 0, 0)
    }
  }

  /** Feature norm in pure double arithmetic from exact integer bin
    * counts — bitwise reproducible in SQL (the Float feature vector of
    * [[featureStub]] stays the ML-facing API; this is the oracle's
    * contract). */
  private[multimodal] def featNormExact(bytes: Array[Byte]): Double = {
    val cnt = new Array[Long](16)
    var i = 0
    while (i < bytes.length) { cnt((bytes(i) & 0xff) >> 4) += 1; i += 1 }
    val n = math.max(bytes.length, 1).toDouble
    var s = 0.0
    var b = 0
    while (b < 16) { val x = cnt(b) / n; s += x * x; b += 1 }
    math.sqrt(s)
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

  /** Gate query (oracle-checked): decode + feature pipeline over the
    * derived media table in one partition-parallel pass — metadata from
    * the portable content hash, feature norm from exact bin counts; the
    * DuckDB oracle folds the same chains over the ASCII bytes. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(spark, dir)
      .map { m =>
        val (w, h, f) = decodeStub(m.kind, m.bytes)
        (m.media_id, m.kind, m.bytes.length, w, h, f,
          BigDecimal(featNormExact(m.bytes))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .toDF("media_id", "kind", "n_bytes", "width", "height", "n_frames", "feat_norm")
      .orderBy("media_id")
  }

  /** DuckDB oracle: the identical hash fold, dimension picks, and
    * 16-bin norm chain over the documents' (ASCII) bytes. */
  val oracle: String = {
    def pick(lo: Int, hi: Int, salt: Int): String =
      s"($lo + xor(h, $salt) % ${hi - lo})::INT"
    val normChain = (0 until 16).map(b =>
      s"(hist[${b + 1}] / n) * (hist[${b + 1}] / n)").mkString(" + ")
    s"""WITH d AS (SELECT doc_id AS media_id, text,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |      ELSE 'video' END AS kind,
       |    [ascii(text[i])::BIGINT for i in range(1, length(text) + 1)] AS codes
       |  FROM documents),
       |c AS (SELECT media_id, kind, len(codes) AS n_bytes,
       |    list_reduce(list_prepend(17::BIGINT, codes),
       |      (a, b) -> (a * 31 + b) % ${Multimodal.HashMod}) AS h,
       |    [len(list_filter(codes, x -> x // 16 = bin))::DOUBLE
       |       for bin in range(0, 16)] AS hist,
       |    greatest(len(codes), 1)::DOUBLE AS n
       |  FROM d)
       |SELECT media_id, kind, n_bytes,
       |  CASE kind WHEN 'image' THEN ${pick(64, 4096, 1)}
       |    WHEN 'video' THEN ${pick(320, 1920, 3)} ELSE 0 END AS width,
       |  CASE kind WHEN 'image' THEN ${pick(64, 4096, 2)}
       |    WHEN 'video' THEN ${pick(240, 1080, 4)} ELSE 0 END AS height,
       |  CASE kind WHEN 'image' THEN 1
       |    WHEN 'video' THEN ${pick(24, 7200, 5)}
       |    ELSE ${pick(1000, 100000, 6)} END AS n_frames,
       |  round(sqrt($normChain), 6) AS feat_norm
       |FROM c ORDER BY media_id""".stripMargin
  }
}
