package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batched decode/feature-extract operators.
  *
  * The Spark-side structure (schema, partition-local batching, operator
  * signatures, output shape) is real and tested, and [[probeMeta]] is a
  * REAL header-level decoder (PNG/BMP/WAV container detection + metadata
  * by codegen'd byte arithmetic). Only the pixel/sample *codec* itself is
  * a STUB — this container has no image/audio libraries, so `decodeStub`
  * produces a deterministic md5-derived fake feature vector. Swapping in a
  * real decoder is a one-function change: replace `decodeStub`'s body with
  * the JNI/library call; everything around it (mapPartitions batch loop,
  * metadata threading, schema) stays.
  *
  * Scale notes: decode runs inside `mapPartitions` so each task processes
  * its partition as one batch (the Scala analog of mapInPandas' Arrow
  * batches) — no per-row driver involvement, no shuffle; repartition
  * upstream controls batch size / codec parallelism. */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("modality", StringType),      // image | audio | video | text
    StructField("content", BinaryType),       // opaque encoded bytes
    StructField("meta", StructType(Seq(       // typed sidecar metadata
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType),
      StructField("n_bytes", LongType))))))

  /** Build a media table from the documents fixture (text bytes as the
    * opaque payload — the only binary-able fixture in testdata). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text").as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("sample_rate"),
        lit(null).cast(LongType).as("duration_ms"),
        length(col("text")).cast(LongType).as("n_bytes")).as("meta"))

  val FeatureDim = 8

  /** STUB decoder ???: a real implementation would decode `content` with an
    * image/audio codec and emit pixel/spectrogram features. The stand-in is
    * a deterministic md5-derived vector so the plumbing is testable and
    * reproducible. Same bytes ⇒ same features, everywhere.
    *
    * The payload is hashed exactly ONCE; each feature dimension re-hashes
    * only the 32-char hex digest (+ the dim index) — O(|content| + dims)
    * per row, not O(|content| · dims). */
  def decodeStub(content: Array[Byte]): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val base = md.digest(content).map("%02x".format(_)).mkString
    (0 until FeatureDim).map { i =>
      md.reset()
      val h = java.nio.ByteBuffer
        .wrap(md.digest((base + i.toString).getBytes("UTF-8"))).getInt & 0x7fffffff
      (h % 100000).toDouble / 100000.0
    }.toArray
  }

  case class MediaFeatures(media_id: Long, modality: String,
                           features: Array[Double], n_bytes: Long)

  /** Batched feature extraction: one decode pass per partition, rows
    * streamed through the stub codec. Output: (media_id, modality,
    * features[FeatureDim], n_bytes). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val sp = media.sparkSession
    import sp.implicits._
    media.select(col("media_id"), col("modality"), col("content"),
      col("meta.n_bytes").as("n_bytes"))
      .mapPartitions { rows: Iterator[Row] =>
        // partition = one batch: codec state (here the MD5 instance inside
        // decodeStub) could be hoisted/reused per batch in a real decoder
        rows.map { r =>
          MediaFeatures(
            r.getAs[Long]("media_id"),
            r.getAs[String]("modality"),
            decodeStub(r.getAs[Array[Byte]]("content")),
            r.getAs[Long]("n_bytes"))
        }
      }
  }

  // ------------------------------------------------ real header probing
  private def u8(c: org.apache.spark.sql.Column, off: Int) =
    conv(hex(substring(c, off, 1)), 16, 10).cast("long")
  private def beU32(c: org.apache.spark.sql.Column, off: Int) =
    conv(hex(substring(c, off, 4)), 16, 10).cast("long")
  private def leU32(c: org.apache.spark.sql.Column, off: Int) =
    u8(c, off) + u8(c, off + 1) * 256L + u8(c, off + 2) * 65536L +
      u8(c, off + 3) * 16777216L

  /** REAL (not stubbed) header-level media probing: container detection and
    * metadata extraction for PNG, BMP and canonical-PCM WAV payloads by
    * fixed-offset byte arithmetic — `substring`/`hex`/`conv` only, so the
    * whole probe is a codegen'd projection with no codec library. This is
    * the piece of "decode" a 100 TB triage pass actually runs corpus-wide
    * (route by container, read dimensions/rate, drop malformed payloads)
    * before any expensive per-pixel decode touches a GPU worker.
    *
    * WAV fields assume the canonical 44-byte RIFF/fmt/data layout (the
    * overwhelmingly common case); exotic chunk orders probe as detected
    * but with null duration. */
  def probeMeta(media: DataFrame): DataFrame = {
    val c = col("content")
    val isPng = hex(substring(c, 1, 8)) === "89504E470D0A1A0A"
    val isBmp = hex(substring(c, 1, 2)) === "424D"
    val isWav = hex(substring(c, 1, 4)) === "52494646" &&
      hex(substring(c, 9, 4)) === "57415645"
    val byteRate = leU32(c, 29)
    media
      .withColumn("detected",
        when(isPng, "image/png").when(isBmp, "image/bmp")
          .when(isWav, "audio/wav").otherwise("unknown"))
      .withColumn("probed_width",
        when(isPng, beU32(c, 17)).when(isBmp, leU32(c, 19)).cast(IntegerType))
      .withColumn("probed_height",
        when(isPng, beU32(c, 21)).when(isBmp, leU32(c, 23)).cast(IntegerType))
      .withColumn("probed_sample_rate",
        when(isWav, leU32(c, 25)).cast(IntegerType))
      .withColumn("probed_duration_ms",
        when(isWav && byteRate > 0,
          leU32(c, 41) * 1000L / byteRate).cast(LongType))
  }

  /** "Resize" for the stub modality: truncate payload to `maxBytes`
    * (stands in for image resize / audio downsample; exercises binary
    * manipulation staying inside codegen'd expressions). */
  def truncateContent(media: DataFrame, maxBytes: Int): DataFrame =
    media.withColumn("content",
      expr(s"substring(content, 1, $maxBytes)"))
      .withColumn("meta", struct(
        col("meta.width"), col("meta.height"), col("meta.sample_rate"),
        col("meta.duration_ms"),
        least(col("meta.n_bytes"), lit(maxBytes.toLong)).as("n_bytes")))

  /** Frame sampling for the stub modality: every `stride`-th byte of the
    * payload becomes a "frame" (stands in for video frame sampling — a
    * real impl emits decoded frame structs at timestamps). Stays inside
    * codegen'd expressions: sequence + per-index binary substring. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.withColumn("frames",
      transform(
        sequence(lit(1), greatest(col("meta.n_bytes").cast("int"), lit(1)), lit(stride)),
        i => expr("content").substr(i, lit(1))))
}
