package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batched decode/feature-extract operators.
  *
  * Decode is REAL and JDK-only: [[probeMeta]] is a header-level decoder
  * (PNG/BMP/WAV container detection + metadata by codegen'd byte
  * arithmetic), and [[decodeMedia]] decodes actual pixels/samples —
  * `javax.imageio` for PNG/BMP rasters, a hand-rolled RIFF walk for
  * 16-bit PCM WAV — emitting per-channel sums/means and sample stats.
  * No external codec library is needed for these formats; JPEG/MP3/video
  * would slot into the same mapPartitions loop via their own library call.
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

  // --------------------------------------------------- real pixel decode
  /** Exact raster statistics of a decoded image: dimensions, pixel count
    * and per-channel (sRGB) sums. Sums are integers, so they are
    * order-independent and bit-reproducible — the per-channel mean is one
    * IEEE division away and therefore also engine-exact. */
  case class ImageStats(width: Int, height: Int, nPixels: Long,
                        sumR: Long, sumG: Long, sumB: Long)

  /** Decode an encoded image payload (any `javax.imageio`-readable format:
    * PNG, BMP, GIF, …) to its exact raster stats. None on undecodable
    * bytes. JDK-only — no external codec library. */
  def decodeImage(bytes: Array[Byte]): Option[ImageStats] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        Some(ImageStats(w, h, w.toLong * h, sr, sg, sb))
      }
    } catch { case _: Exception => None }

  /** Exact sample statistics of a decoded 16-bit PCM WAV payload: sample
    * count (all channels pooled), integer sum, min and max. */
  case class AudioStats(nSamples: Long, sumSamples: Long,
                        minSample: Int, maxSample: Int)

  /** The RIFF/WAVE chunk walk shared by [[decodeWav]] and
    * [[decimateWavStats]]: locate the PCM-16 data chunk (format tag 1,
    * 16-bit), not assuming the canonical 44-byte layout. Returns
    * (dataOffset, sampleCount); None on anything malformed/non-PCM-16. */
  private def pcm16DataRange(bytes: Array[Byte]): Option[(Int, Int)] = {
    def leU32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def leU16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmtOk = false
    var data: Option[(Int, Int)] = None // (offset, size)
    while (off + 8 <= bytes.length && (data.isEmpty || !fmtOk)) {
      val id = tag(off)
      // bounds math stays in Long: a declared size near 2^31 would wrap
      // an Int sum negative, pass the check, and crash the sample loop
      val sz = leU32(off + 4)
      if (off + 8 + sz > bytes.length) return None
      val szI = sz.toInt
      if (id == "fmt " && szI >= 16)
        fmtOk = leU16(off + 8) == 1 && leU16(off + 8 + 14) == 16
      else if (id == "data") data = Some((off + 8, szI))
      off += 8 + szI + (szI & 1) // chunks are word-aligned
    }
    data.filter(_ => fmtOk).map { case (dOff, dSz) => (dOff, dSz / 2) }
  }

  /** The i-th signed 16-bit LE PCM sample at data offset `dOff`. */
  @inline private def pcm16Sample(bytes: Array[Byte], dOff: Int, i: Int): Int =
    ((bytes(dOff + 2 * i + 1) << 8) | (bytes(dOff + 2 * i) & 0xff)).toShort.toInt

  /** Decode a RIFF/WAVE payload holding 16-bit integer PCM (format tag 1),
    * walking the chunk list (not assuming the canonical 44-byte layout).
    * None on anything malformed or non-PCM-16. JDK-only byte arithmetic. */
  def decodeWav(bytes: Array[Byte]): Option[AudioStats] =
    pcm16DataRange(bytes).map { case (dOff, n) =>
      var (sum, mn, mx) = (0L, Int.MaxValue, Int.MinValue)
      var i = 0
      while (i < n) {
        val s = pcm16Sample(bytes, dOff, i)
        sum += s; if (s < mn) mn = s; if (s > mx) mx = s
        i += 1
      }
      AudioStats(n, sum, if (n == 0) 0 else mn, if (n == 0) 0 else mx)
    }

  /** One decoded row per media row: images carry raster stats, audio
    * carries sample stats, everything else decodes to kind "unknown" with
    * all-null stats (a triage pass drops those, it does not crash). Means
    * are a single IEEE division over exact integer sums — engine-exact. */
  case class DecodedMedia(media_id: Long, kind: String,
    width: Option[Int], height: Option[Int], n_pixels: Option[Long],
    sum_r: Option[Long], sum_g: Option[Long], sum_b: Option[Long],
    mean_b: Option[Double],
    n_samples: Option[Long], sum_samples: Option[Long],
    min_sample: Option[Int], max_sample: Option[Int],
    mean_sample: Option[Double])

  /** Batched REAL decode: one pass per partition, rows routed by magic
    * bytes to the pixel ([[decodeImage]]) or PCM ([[decodeWav]]) codec.
    * The partition is the batch: codec instances and buffers amortize
    * across its rows, nothing touches the driver, and upstream
    * `repartition` controls decode parallelism — at 100 TB this is the
    * same shape with the library decoder swapped in per modality. */
  def decodeMedia(media: DataFrame): Dataset[DecodedMedia] = {
    val sp = media.sparkSession
    import sp.implicits._
    val none = DecodedMedia(0L, "unknown", None, None, None, None, None,
      None, None, None, None, None, None, None)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows: Iterator[Row] =>
        javax.imageio.ImageIO.setUseCache(false) // no executor-disk staging
        // constant magics hoisted out of the per-row loop
        def magic(hex: String): Array[Byte] =
          hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
        val (png, bmp, riff, wave, jpg) =
          (magic("89504E47"), magic("424D"), magic("52494646"),
            magic("57415645"), magic("FFD8FF"))
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val bytes = r.getAs[Array[Byte]]("content")
          def hasMagic(m: Array[Byte], off: Int): Boolean =
            bytes.length >= off + m.length &&
              m.indices.forall(i => bytes(off + i) == m(i))
          val isImage = hasMagic(png, 0) || hasMagic(bmp, 0) || hasMagic(jpg, 0)
          val isWav = hasMagic(riff, 0) && hasMagic(wave, 8)
          // a malformed payload decodes to 'unknown', it never crashes
          // the task (decodeImage catches internally; guard WAV too)
          val decoded: Option[DecodedMedia] =
            try {
              if (isImage) decodeImage(bytes).map { s =>
                DecodedMedia(id,
                  if (bytes(0) == 0x42) "image/bmp"
                  else if ((bytes(0) & 0xff) == 0xff) "image/jpeg"
                  else "image/png",
                  Some(s.width), Some(s.height), Some(s.nPixels),
                  Some(s.sumR), Some(s.sumG), Some(s.sumB),
                  Some(s.sumB.toDouble / s.nPixels),
                  None, None, None, None, None)
              } else if (isWav) decodeWav(bytes).map { s =>
                DecodedMedia(id, "audio/wav", None, None, None, None, None,
                  None, None, Some(s.nSamples), Some(s.sumSamples),
                  Some(s.minSample), Some(s.maxSample),
                  Some(if (s.nSamples == 0) 0.0
                       else s.sumSamples.toDouble / s.nSamples))
              } else None
            } catch { case _: Exception => None }
          decoded.getOrElse(none.copy(media_id = id))
        }
      }
  }

  /** Output row of [[resizeImageStats]]: the downsampled raster's
    * dimensions and exact per-channel integer sums. */
  case class ResizedImage(media_id: Long, out_w: Int, out_h: Int,
                          sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL nearest-neighbor downsample of decodable images: keep every
    * `stride`-th pixel in both axes (the cheap thumbnail/preprocess resize
    * a vision-data pipeline runs before feature extraction) and report the
    * output dimensions plus exact per-channel integer sums of the KEPT
    * pixels. Undecodable payloads are dropped, not crashed (triage
    * happens in [[decodeMedia]]).
    *
    * Correctness contract: the sums are order-free integers over a
    * deterministic pixel subset, so a construction-inverting oracle can
    * compute them directly from the planted raster (m_resize) — a hash
    * match proves resize(decode(build(x))) samples exactly the pixels the
    * spec names. Scale shape: same partition-batched decode as
    * [[decodeMedia]] — one pass, no driver traffic, repartition upstream
    * for decode parallelism. */
  def resizeImageStats(media: DataFrame, stride: Int): Dataset[ResizedImage] = {
    require(stride >= 1, "stride >= 1")
    val sp = media.sparkSession
    import sp.implicits._
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows: Iterator[Row] =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          val id = r.getAs[Long]("media_id")
          val bytes = r.getAs[Array[Byte]]("content")
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) None
            else {
              val ow = (img.getWidth + stride - 1) / stride
              val oh = (img.getHeight + stride - 1) / stride
              var (sr, sg, sb) = (0L, 0L, 0L)
              var y = 0
              while (y < oh) {
                var x = 0
                while (x < ow) {
                  val rgb = img.getRGB(x * stride, y * stride)
                  sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                  x += 1
                }
                y += 1
              }
              Some(ResizedImage(id, ow, oh, sr, sg, sb))
            }
          } catch { case _: Exception => None }
        }
      }
  }

  /** Output row of [[decimateWavStats]]: kept-sample count and exact
    * integer stats of the stride-decimated PCM stream. */
  case class DecimatedAudio(media_id: Long, n_kept: Long, sum_kept: Long,
                            min_kept: Int, max_kept: Int)

  /** REAL stride decimation of PCM-16 WAV payloads — the audio twin of
    * [[resizeImageStats]] (the cheap downsample an audio-data pipeline
    * runs before feature extraction): keep every `stride`-th sample and
    * report exact integer stats of the KEPT samples. Sums/mins/maxes are
    * order-free integers over a deterministic index subset, so a
    * construction-inverting oracle computes them straight from the
    * planted samples (m_resample). Undecodable/non-PCM payloads drop.
    * Same partition-batched shape as [[decodeMedia]]. */
  def decimateWavStats(media: DataFrame, stride: Int): Dataset[DecimatedAudio] = {
    require(stride >= 1, "stride >= 1")
    val sp = media.sparkSession
    import sp.implicits._
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.flatMap { r =>
          val id = r.getAs[Long]("media_id")
          val bytes = r.getAs[Array[Byte]]("content")
          try {
            pcm16DataRange(bytes).map { case (dOff, n) =>
              var (cnt, sum, mn, mx) = (0L, 0L, Int.MaxValue, Int.MinValue)
              var i = 0
              while (i < n) {
                val s = pcm16Sample(bytes, dOff, i)
                cnt += 1; sum += s
                if (s < mn) mn = s; if (s > mx) mx = s
                i += stride
              }
              DecimatedAudio(id, cnt, sum,
                if (cnt == 0) 0 else mn, if (cnt == 0) 0 else mx)
            }
          } catch { case _: Exception => None }
        }
      }
  }

  /** Output row of [[silenceStats]]: run-length silence profile of one
    * PCM payload. */
  case class SilenceStats(media_id: Long, n_samples: Int, n_silent: Int,
                          longest_run: Int, lead_silent: Int)

  /** Silence-run detection over PCM-16 WAV payloads — the VAD-adjacent
    * pass an audio pipeline runs to drop dead air and find trimmable
    * lead-in: a sample is silent iff |s| ≤ `threshold`; per payload we
    * report the silent-sample count, the LONGEST consecutive silent run
    * and the leading-silence length (n_samples when the whole payload is
    * silent). Pure integer run-length scan inside the partition-batched
    * decode — one output row per payload, no shuffle, no driver. The
    * planted-WAV construction makes every run closed-form replayable
    * (m_silence uses the gaps-and-islands window replay in DuckDB). */
  def silenceStats(media: DataFrame, threshold: Int): Dataset[SilenceStats] = {
    require(threshold >= 0, "threshold >= 0")
    val sp = media.sparkSession
    import sp.implicits._
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.flatMap { r =>
          val id = r.getAs[Long]("media_id")
          val bytes = r.getAs[Array[Byte]]("content")
          try {
            pcm16DataRange(bytes).map { case (dOff, n) =>
              var i = 0; var cur = 0; var best = 0; var cnt = 0
              var lead = -1
              while (i < n) {
                val s = pcm16Sample(bytes, dOff, i)
                if (math.abs(s) <= threshold) {
                  cur += 1; cnt += 1; if (cur > best) best = cur
                } else {
                  if (lead < 0) lead = i
                  cur = 0
                }
                i += 1
              }
              SilenceStats(id, n, cnt, best, if (lead < 0) n else lead)
            }
          } catch { case _: Exception => None }
        }
      }
  }

  /** Output row of [[gainStats]]: loudness-normalization profile of one
    * PCM payload. */
  case class GainStats(media_id: Long, n_samples: Int, peak: Int,
                       n_clipped: Int, sum_sq: Long, gain_micro: Long,
                       rms_micro: Long)

  /** Loudness-normalization pass over PCM-16 WAV payloads — the gain
    * computation an audio pipeline runs before resampling/feature
    * extraction: per payload the PEAK (max |s|; |−32768| counts as
    * 32768), the CLIPPED-sample count (s at either int16 rail — the
    * re-record/re-encode quality signal), the exact Σs² energy, the
    * peak-normalization factor `gain_micro = (10⁶·32767) div max(peak,1)`
    * (pure integer division) and the RMS in floor-micro units. The RMS is
    * the one float: sqrt(Σs²/n) is two IEEE basic ops on exact integers,
    * so `floor(10⁶·rms)` replays engine-exactly (the d_temperature /
    * gx_assort discipline — sqrt is correctly rounded in both engines).
    * Pure partition-batched scan: one output row per payload, no shuffle,
    * no driver. Malformed/non-PCM payloads drop ([[decodeMedia]] owns
    * triage). */
  def gainStats(media: DataFrame): Dataset[GainStats] = {
    val sp = media.sparkSession
    import sp.implicits._
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.flatMap { r =>
          val id = r.getAs[Long]("media_id")
          val bytes = r.getAs[Array[Byte]]("content")
          try {
            pcm16DataRange(bytes).map { case (dOff, n) =>
              var (peak, clip, sumSq) = (0, 0, 0L)
              var i = 0
              while (i < n) {
                val s = pcm16Sample(bytes, dOff, i)
                val a = math.abs(s) // abs(-32768) = 32768 fits Int
                if (a > peak) peak = a
                if (s == 32767 || s == -32768) clip += 1
                sumSq += s.toLong * s
                i += 1
              }
              val gain = 32767L * 1000000L / math.max(peak, 1)
              val rms =
                if (n == 0) 0L
                else math.floor(1e6 * math.sqrt(sumSq.toDouble / n)).toLong
              GainStats(id, n, peak, clip, sumSq, gain, rms)
            }
          } catch { case _: Exception => None }
        }
      }
  }

  /** Output row of [[pcmWindowFeatures]]: exact integer features of one
    * fixed-length analysis window. */
  case class PcmWindowFeatures(media_id: Long, win_idx: Int, n_win: Long,
                               sum_abs: Long, n_zc: Long)

  /** REAL windowed audio feature extraction from PCM-16 WAV payloads —
    * the frame-level energy/zero-crossing pass an audio pipeline runs
    * before VAD / silence trimming / quality filtering: samples split
    * into consecutive windows of `win`, each window reporting its sample
    * count, Σ|s| (the L1 energy) and the zero-crossing count (sign flips
    * between ADJACENT samples within the window; s ≥ 0 counts as
    * positive so the flip predicate is a pure integer comparison).
    * Everything is integer arithmetic on decoded samples, so a
    * construction-inverting oracle recomputes every window in closed
    * form (m_audio). Malformed/non-PCM payloads drop (triage happens in
    * [[decodeMedia]]); same partition-batched shape as the other
    * decoders — one output row per window, no shuffle, no driver. */
  def pcmWindowFeatures(media: DataFrame, win: Int): Dataset[PcmWindowFeatures] = {
    require(win >= 2, "win >= 2 (a 1-sample window has no crossings)")
    val sp = media.sparkSession
    import sp.implicits._
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.flatMap { r =>
          val id = r.getAs[Long]("media_id")
          val bytes = r.getAs[Array[Byte]]("content")
          try {
            pcm16DataRange(bytes).toSeq.flatMap { case (dOff, n) =>
              (0 until (n + win - 1) / win).map { wi =>
                val lo = wi * win
                val hi = math.min(lo + win, n)
                var (sumAbs, zc) = (0L, 0L)
                var k = lo
                while (k < hi) {
                  val s = pcm16Sample(bytes, dOff, k)
                  sumAbs += math.abs(s)
                  if (k > lo) {
                    val prev = pcm16Sample(bytes, dOff, k - 1)
                    if ((prev >= 0) != (s >= 0)) zc += 1
                  }
                  k += 1
                }
                PcmWindowFeatures(id, wi, hi - lo, sumAbs, zc)
              }
            }
          } catch { case _: Exception => Seq.empty }
        }
      }
  }

  // ------------------------------------------------- video frame walk
  /** Aggregate stats of the frames SAMPLED from a GVID container. */
  case class VideoStats(nFrames: Int, nSampled: Int, pxTotal: Long,
                        sumR: Long, sumG: Long, sumB: Long)

  /** Walk a GVID container — magic "GVID", u16-LE frame count, then per
    * frame a u32-LE length prefix and an imageio-decodable still — and
    * REALLY decode every `stride`-th frame (the frame-sampling pass a
    * video-data pipeline runs: container parse is cheap and sequential,
    * pixel decode is the cost, so only sampled frames pay it). Per-channel
    * integer sums over the sampled frames are order-free, so a
    * construction-inverting oracle computes them straight from planted
    * frames (m_video). None on any malformed structure — a truncated
    * frame table or an undecodable sampled frame rejects the container
    * rather than returning partial stats. */
  def decodeVideo(bytes: Array[Byte], stride: Int): Option[VideoStats] = {
    require(stride >= 1, "stride >= 1")
    if (bytes.length < 6 || bytes(0) != 'G' || bytes(1) != 'V' ||
      bytes(2) != 'I' || bytes(3) != 'D') return None
    val nf = (bytes(4) & 0xff) | ((bytes(5) & 0xff) << 8)
    var off = 6
    var j = 0
    var ns = 0
    var px = 0L; var sr = 0L; var sg = 0L; var sb = 0L
    while (j < nf) {
      if (off + 4 > bytes.length) return None
      val len = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
      if (len < 0 || off + 4 + len > bytes.length) return None
      if (j % stride == 0) {
        decodeImage(java.util.Arrays.copyOfRange(bytes, off + 4, off + 4 + len)) match {
          case Some(st) =>
            ns += 1; px += st.nPixels
            sr += st.sumR; sg += st.sumG; sb += st.sumB
          case None => return None
        }
      }
      off += 4 + len
      j += 1
    }
    Some(VideoStats(nf, ns, px, sr, sg, sb))
  }

  /** Output row of [[videoFrameStats]]. */
  case class VideoFrames(media_id: Long, n_frames: Int, n_sampled: Int,
                         px_total: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** [[decodeVideo]] over a (media_id, content) frame — same
    * partition-batched mapPartitions shape as [[resizeImageStats]];
    * malformed containers drop. */
  def videoFrameStats(media: DataFrame, stride: Int): Dataset[VideoFrames] = {
    val sp = media.sparkSession
    import sp.implicits._
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows: Iterator[Row] =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          val id = r.getAs[Long]("media_id")
          decodeVideo(r.getAs[Array[Byte]]("content"), stride).map(v =>
            VideoFrames(id, v.nFrames, v.nSampled, v.pxTotal,
              v.sumR, v.sumG, v.sumB))
        }
      }
  }

  /** Output row of [[sceneStats]]: temporal segmentation profile of one
    * GVID container. */
  case class SceneStats(media_id: Long, n_frames: Int, n_scenes: Int,
                        longest_scene: Int, boundary_sum: Long)

  /** Scene-boundary detection over GVID containers — the temporal
    * segmentation pass a video pipeline runs before per-scene sampling /
    * dedup / captioning: every frame decodes to its exact integer pixel
    * profile (n_pixels, Σr, Σg, Σb) and a SCENE BOUNDARY is any frame
    * whose profile differs from its predecessor (planted scenes repeat a
    * frame byte-identically, so the cut criterion is exact — the
    * real-codec analog thresholds the same profile delta). Emits per clip
    * the frame count, scene count, longest scene and the sum of scene
    * START indices (an order-free integer checksum of the cut
    * positions). Malformed containers or undecodable frames reject the
    * whole clip, [[decodeVideo]]'s contract.
    *
    * Scale shape: stateless partition-batched decode — sequential
    * per-row container walk, one output row per clip, no shuffle, no
    * driver. Decode cost is every frame (segmentation needs the full
    * timeline, unlike [[decodeVideo]]'s sampling). */
  def sceneStats(media: DataFrame): Dataset[SceneStats] = {
    val sp = media.sparkSession
    import sp.implicits._
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows: Iterator[Row] =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          val id = r.getAs[Long]("media_id")
          val bytes = r.getAs[Array[Byte]]("content")
          if (bytes.length < 6 || bytes(0) != 'G' || bytes(1) != 'V' ||
            bytes(2) != 'I' || bytes(3) != 'D') None
          else {
            val nf = (bytes(4) & 0xff) | ((bytes(5) & 0xff) << 8)
            var off = 6
            var j = 0
            var ok = true
            var prev: (Long, Long, Long, Long) = null
            var nScenes = 0; var runLen = 0; var longest = 0
            var boundarySum = 0L
            while (j < nf && ok) {
              if (off + 4 > bytes.length) ok = false
              else {
                val len = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
                  ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
                if (len < 0 || off + 4 + len > bytes.length) ok = false
                else {
                  decodeImage(java.util.Arrays.copyOfRange(
                    bytes, off + 4, off + 4 + len)) match {
                    case Some(st) =>
                      val cur = (st.nPixels, st.sumR, st.sumG, st.sumB)
                      if (prev == null || cur != prev) {
                        if (runLen > longest) longest = runLen
                        nScenes += 1; boundarySum += j; runLen = 0
                      }
                      runLen += 1; prev = cur
                    case None => ok = false
                  }
                  off += 4 + len
                  j += 1
                }
              }
            }
            if (runLen > longest) longest = runLen
            if (ok && j == nf) Some(SceneStats(id, nf, nScenes, longest,
              boundarySum))
            else None
          }
        }
      }
  }

  /** Output row of [[videoFrames]]: one sampled frame's raw still bytes. */
  case class VideoFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Extract every `stride`-th frame's BYTES from a GVID container — the
    * walk of [[decodeVideo]] without the pixel decode, for pipelines that
    * route frames onward (perceptual hashing, resize, feature extract)
    * instead of aggregating in place. Malformed containers emit nothing
    * (whole-container reject, same semantics as decodeVideo); the walk is
    * sequential per row and only byte-slices, so the cost is I/O-shaped
    * regardless of stride. */
  def videoFrames(media: DataFrame, stride: Int): Dataset[VideoFrame] = {
    require(stride >= 1, "stride >= 1")
    val sp = media.sparkSession
    import sp.implicits._
    media.select(col("media_id"), col("content"))
      .flatMap { r =>
        val id = r.getAs[Long]("media_id")
        val bytes = r.getAs[Array[Byte]]("content")
        val out = scala.collection.mutable.ArrayBuffer.empty[VideoFrame]
        if (bytes.length < 6 || bytes(0) != 'G' || bytes(1) != 'V' ||
          bytes(2) != 'I' || bytes(3) != 'D') Seq.empty
        else {
          val nf = (bytes(4) & 0xff) | ((bytes(5) & 0xff) << 8)
          var off = 6
          var j = 0
          var ok = true
          while (j < nf && ok) {
            if (off + 4 > bytes.length) ok = false
            else {
              val len = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
                ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
              if (len < 0 || off + 4 + len > bytes.length) ok = false
              else {
                if (j % stride == 0) out += VideoFrame(id, j,
                  java.util.Arrays.copyOfRange(bytes, off + 4, off + 4 + len))
                off += 4 + len
                j += 1
              }
            }
          }
          if (ok) out.toSeq else Seq.empty
        }
      }
  }

  // --------------------------------------------- perceptual image hashes
  /** Output row of [[imageHashes]]: the decoded dimensions plus the two
    * classic perceptual hashes over the blue channel. */
  case class ImageHash(media_id: Long, w: Int, h: Int, ahash: Long, dhash: Long)

  /** REAL perceptual hashing of decodable images — the content-level
    * image-dedup primitive (byte-level dedup misses re-encoded /
    * metadata-tweaked copies; these hashes don't): per image compute
    *  - aHash: bit(y·w+x) = 1 iff B(x,y)·n > ΣB — the mean-threshold
    *    hash, written as an integer cross-multiplication so no float
    *    mean exists anywhere;
    *  - dHash: bit(y·(w−1)+x) = 1 iff B(x+1,y) > B(x,y) — the
    *    horizontal-gradient hash (robust to global brightness shifts).
    * Bits are little-endian in row-major top-down image coordinates over
    * the blue channel; both hashes are pure integer comparisons on
    * decoded pixels, so a construction-inverting oracle recomputes them
    * in closed form (m_phash) and grouping by hash IS the dedup.
    *
    * Production-shape note: real pipelines resize to a fixed tiny raster
    * first ([[resizeImageStats]]' stride walk) so every hash is the same
    * width; the fixtures' rasters already fit, and rasters wider than 64
    * bits drop (triage, not crash) rather than truncate ambiguously.
    * Same partition-batched mapPartitions decode as [[decodeMedia]]. */
  def imageHashes(media: DataFrame): Dataset[ImageHash] = {
    val sp = media.sparkSession
    import sp.implicits._
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows: Iterator[Row] =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          val id = r.getAs[Long]("media_id")
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("content")))
            if (img == null || img.getWidth.toLong * img.getHeight > 64) None
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              val n = w * h
              val blue = Array.tabulate(h, w)((y, x) => img.getRGB(x, y) & 0xff)
              var sum = 0L
              for (y <- 0 until h; x <- 0 until w) sum += blue(y)(x)
              var (a, d) = (0L, 0L)
              for (y <- 0 until h; x <- 0 until w) {
                if (blue(y)(x) * n > sum) a |= 1L << (y * w + x)
                if (x < w - 1 && blue(y)(x + 1) > blue(y)(x))
                  d |= 1L << (y * (w - 1) + x)
              }
              Some(ImageHash(id, w, h, a, d))
            }
          } catch { case _: Exception => None }
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

  /** Output row of [[jpegProbe]]: the frame-header facts a triage pass
    * reads before any entropy decode. */
  case class JpegMeta(media_id: Long, soi_ok: Int, width: Int, height: Int,
                      n_components: Int)

  /** JPEG (JFIF/EXIF) header walk: verify the SOI marker, then scan the
    * length-prefixed marker segments to the first SOF frame header
    * (C0–CF excluding DHT C4 / JPG C8 / DAC CC) and read the raster
    * dimensions and component count. Runs in `mapPartitions` — segment
    * offsets are variable, so unlike [[probeMeta]]'s PNG/BMP/WAV probes
    * this cannot be a fixed-offset codegen projection; it is still
    * header-only (no entropy decode), so the corpus-wide triage cost is
    * a few dozen byte reads per payload. Malformed payloads emit
    * soi_ok=0 with zero dims rather than crashing the task. */
  def jpegProbe(media: DataFrame): Dataset[JpegMeta] = {
    val sp = media.sparkSession
    import sp.implicits._
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val b = r.getAs[Array[Byte]]("content")
          def u8(i: Int): Int = b(i) & 0xff
          def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
          var out = JpegMeta(id, 0, 0, 0, 0)
          if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
            var off = 2
            var done = false
            while (!done && off + 4 <= b.length) {
              if (u8(off) != 0xff) { done = true } // desync: stop, soi-only
              else {
                // JPEG permits runs of 0xFF fill bytes between segments —
                // the marker is the first non-FF byte after the run. JDK
                // encoders never emit fill, but external inputs may. The
                // skip moves `off` past the loop-head bounds check, so
                // re-verify before the length-prefixed reads below.
                while (off + 2 < b.length && u8(off + 1) == 0xff) off += 1
                if (off + 4 > b.length) { done = true; off = b.length }
                else {
                val m = u8(off + 1)
                if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) off += 2
                else if (m == 0xd9 || m == 0xda) done = true // EOI / scan data
                else {
                  val len = be16(off + 2)
                  val isSof = m >= 0xc0 && m <= 0xcf &&
                    m != 0xc4 && m != 0xc8 && m != 0xcc
                  if (isSof && off + 9 < b.length) {
                    out = JpegMeta(id, 1, be16(off + 7), be16(off + 5),
                      u8(off + 9))
                    done = true
                  } else off += 2 + len
                }
                }
              }
            }
            if (out.soi_ok == 0) out = JpegMeta(id, 1, 0, 0, 0)
          }
          out
        }
      }
  }

  /** Transcode decodable rasters to JPEG via the JDK encoder — the lossy
    * member of the codec family (PNG/BMP build arithmetically; JPEG must
    * go through an encoder). Dimensions and component structure survive
    * the round-trip EXACTLY (gated hash-exact via [[jpegProbe]]); pixel
    * values do not (DCT quantization), so pixel-stat gates over JPEG are
    * rows-only by declaration. Same partition-batched shape as
    * [[decodeMedia]]; undecodable payloads are dropped, not crashed. */
  def transcodeJpeg(media: DataFrame): DataFrame = {
    val sp = media.sparkSession
    import sp.implicits._
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows: Iterator[Row] =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          val id = r.getAs[Long]("media_id")
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("content")))
            if (img == null) None
            else {
              // the JDK jpg writer rejects rasters with alpha — repaint
              // into a 3-byte BGR buffer (exact copy for opaque sources)
              val rgb = new java.awt.image.BufferedImage(img.getWidth,
                img.getHeight, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
              val g = rgb.createGraphics()
              g.drawImage(img, 0, 0, null)
              g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(rgb, "jpg", bos)
              Some((id, bos.toByteArray))
            }
          } catch { case _: Exception => None }
        }
      }.toDF("media_id", "content")
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

  // ------------------------------------------ phash-banded image near-dup
  /** Output row of [[dhash64]]: one full-width 64-bit gradient hash per
    * decodable image. */
  case class MediaHash64(media_id: Long, dhash64: Long)

  /** FIXED-WIDTH perceptual hash for the image near-dup JOIN: resample
    * the decoded blue channel to the standard 9×8 raster (nearest
    * neighbor — the same stride walk as [[resizeImageStats]], closed-form
    * replayable) and take the horizontal-gradient dHash over it:
    * bit(y·8+x) = 1 iff B(x+1, y) > B(x, y) on the resampled grid.
    * Unlike [[imageHashes]] (whose width varies with the source raster,
    * so distances across sizes are meaningless) every image maps to the
    * same 64 bits, which is what makes Hamming banding well-defined. */
  def dhash64(media: DataFrame): Dataset[MediaHash64] = {
    val sp = media.sparkSession
    import sp.implicits._
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows: Iterator[Row] =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          val id = r.getAs[Long]("media_id")
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("content")))
            if (img == null) None
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              var bits = 0L
              for (y <- 0 until 8; x <- 0 until 8) {
                val ys = y * h / 8
                val bl = img.getRGB(x * w / 9, ys) & 0xff
                val br = img.getRGB((x + 1) * w / 9, ys) & 0xff
                if (br > bl) bits |= 1L << (y * 8 + x)
              }
              Some(MediaHash64(id, bits))
            }
          } catch { case _: Exception => None }
        }
      }
  }

  /** Phash-banded image near-dup excision — the LAION-style step a
    * multimodal pipeline runs right after decode: band each 64-bit
    * [[dhash64]] into 4 pieces of 16 bits (pigeonhole: Hamming ≤ 3 ⇒ at
    * least one piece matches exactly — the SimHash discipline applied to
    * image codes), candidate-join on (piece, value), verify exact
    * Hamming on the full hash, then map every image to its best
    * survivor: keep_id = min(media_id, smallest verified partner),
    * n_near = verified-partner count. Direct (non-transitive) partners
    * — for the exact-duplicate clusters the planted fixtures contain,
    * every member links to the class minimum directly, so min-direct ==
    * min-transitive there.
    *
    * Scale shape: the join is bucketed by the 2^16-value pieces (never
    * all-pairs; PlanSpec pins no product), the hash frame shuffles 16
    * bytes per image, and the survivor agg is one groupBy. */
  /** 4×16-bit band-piece rows (media_id, dhash64, piece, pv) of a
    * [[dhash64]] frame — pigeonhole-exact for Hamming ≤ 3 (≥1 piece
    * must match). Shared by the self-join, incremental and streaming
    * near-dup forms; a pure stateless projection+explode, so a stream
    * can run it ahead of its one stateful aggregation. */
  private[graft] def phashBandPieces(hashes: DataFrame): DataFrame = {
    val pieces = 4
    val bitsPer = 16
    val mask = (1L << bitsPer) - 1
    val bandRows = (0 until pieces).map { p =>
      struct(lit(p).as("piece"),
        shiftright(col("dhash64"), p * bitsPer).bitwiseAND(lit(mask)).as("pv"))
    }
    hashes.select(col("media_id"), col("dhash64"),
        explode(array(bandRows: _*)).as("bp"))
      .select(col("media_id"), col("dhash64"), col("bp.piece"), col("bp.pv"))
  }

  /** Hamming-verified candidate pairs (media_id, partner) of a DELTA
    * hash frame against a static INDEX piece frame (from
    * [[phashBandPieces]]) — the incremental/ingest form of the
    * candidate join ([[phashNearDupSurvivors]] is the self-join form).
    * A delta id also present in the index never self-matches (explicit
    * media_id != partner guard).
    * May emit one row per matching piece; consumers dedup (batch
    * `distinct`, streaming `collect_set`). Stateless end-to-end, so the
    * streaming gate runs it as a stream-static equi join. */
  def phashCandidatesAgainst(indexPieces: DataFrame, deltaHashes: DataFrame,
                             maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4,
      "banding is pigeonhole-exact only for maxHamming < 4 pieces")
    phashBandPieces(deltaHashes)
      .join(indexPieces.select(col("piece"), col("pv"),
        col("media_id").as("partner"), col("dhash64").as("hb")),
        Seq("piece", "pv"))
      .filter(col("media_id") =!= col("partner"))
      .filter(bit_count(col("dhash64").bitwiseXOR(col("hb"))) <= maxHamming)
      .select(col("media_id"), col("partner"))
  }

  /** Batch delta-vs-index best-survivor mapping: every delta image maps
    * to min(own id, smallest verified index partner); n_near counts
    * distinct partners. `deltaIds` reattaches zero-candidate media. */
  def phashNearDupAgainst(indexPieces: DataFrame, deltaHashes: DataFrame,
                          maxHamming: Int = 3): DataFrame = {
    val cands = phashCandidatesAgainst(indexPieces, deltaHashes, maxHamming)
      .distinct()
    deltaHashes.select(col("media_id"))
      .join(cands, Seq("media_id"), "left")
      .groupBy(col("media_id"))
      .agg(min(col("partner")).as("mn"), count(col("partner")).as("n_near"))
      .select(col("media_id"),
        when(col("mn").isNull || col("mn") > col("media_id"), col("media_id"))
          .otherwise(col("mn")).as("keep_id"),
        col("n_near"))
  }

  def phashNearDupSurvivors(hashes: DataFrame,
                            maxHamming: Int = 3): DataFrame = {
    val pieces = 4
    require(maxHamming < pieces,
      s"banding is pigeonhole-exact only for maxHamming < $pieces pieces")
    val hs = graft.CacheScope.cached(
      hashes.select(col("media_id"), col("dhash64")))
    val banded = phashBandPieces(hs)
    val a = banded.select(col("piece"), col("pv"),
      col("media_id").as("a"), col("dhash64").as("ha"))
    val b = banded.select(col("piece"), col("pv"),
      col("media_id").as("b"), col("dhash64").as("hb"))
    val pairs = a.join(b, Seq("piece", "pv")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    val partners = pairs.select(col("a").as("media_id"), col("b").as("partner"))
      .unionByName(pairs.select(col("b").as("media_id"), col("a").as("partner")))
    hs.join(partners, Seq("media_id"), "left")
      .groupBy(col("media_id"))
      .agg(min(col("partner")).as("mn"), count(col("partner")).as("n_near"))
      .select(col("media_id"),
        when(col("mn").isNull || col("mn") > col("media_id"), col("media_id"))
          .otherwise(col("mn")).as("keep_id"),
        col("n_near"))
  }
}
