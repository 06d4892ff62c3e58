package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal plumbing: schema, batched stub decode, binary ops. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.fromDocuments(Tables.documents(spark, sf)).cache()

  test("media table has the canonical multimodal schema") {
    assert(media.schema("content").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
    assert(media.count() == 500)
  }

  test("decodeImage decodes a REAL PNG written by ImageIO to exact stats") {
    // known 3x2 raster: pixel (x,y) = RGB(10x+y, 100+x, 200+y)
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 3; y <- 0 until 2)
      img.setRGB(x, y, ((10 * x + y) << 16) | ((100 + x) << 8) | (200 + y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val s = Multimodal.decodeImage(bos.toByteArray).get
    assert(s.width == 3 && s.height == 2 && s.nPixels == 6)
    assert(s.sumR == (for (x <- 0 until 3; y <- 0 until 2) yield 10 * x + y).sum)
    assert(s.sumG == (for (x <- 0 until 3; _ <- 0 until 2) yield 100 + x).sum)
    assert(s.sumB == (for (_ <- 0 until 3; y <- 0 until 2) yield 200 + y).sum)
  }

  test("JPEG transcode keeps geometry exactly; pixels drift only within lossy bounds") {
    // near-constant 16x8 raster: JPEG quantization on a flat field is
    // tiny, so per-channel means must land within a small drift bound
    val img = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 16; y <- 0 until 8)
      img.setRGB(x, y, (100 << 16) | (150 << 8) | 200)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq((7L, bos.toByteArray)).toDF("media_id", "content")
    val jpg = Multimodal.transcodeJpeg(media).cache()
    val bytes = jpg.select("content").head().getAs[Array[Byte]](0)
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "SOI magic")
    // header walk reads the SOF frame exactly
    val meta = Multimodal.jpegProbe(jpg).collect()
    assert(meta.length == 1)
    assert(meta(0) == Multimodal.JpegMeta(7L, 1, 16, 8, 3), s"got ${meta(0)}")
    // real pixel decode routes by the FFD8FF magic
    val dec = Multimodal.decodeMedia(jpg).collect().head
    assert(dec.kind == "image/jpeg")
    assert(dec.width.contains(16) && dec.height.contains(8) &&
      dec.n_pixels.contains(128L))
    def mean(s: Option[Long]) = s.get.toDouble / 128
    assert(math.abs(mean(dec.sum_r) - 100) <= 4, s"r mean ${mean(dec.sum_r)}")
    assert(math.abs(mean(dec.sum_g) - 150) <= 4, s"g mean ${mean(dec.sum_g)}")
    assert(math.abs(mean(dec.sum_b) - 200) <= 4, s"b mean ${mean(dec.sum_b)}")
    // malformed payloads: junk probes soi_ok=0; SOI-only probes 1 with
    // zero dims — neither crashes the task
    val junk = Seq((1L, Array[Byte](1, 2, 3, 4)),
      (2L, Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)))
      .toDF("media_id", "content")
    val probed = Multimodal.jpegProbe(junk).collect()
      .map(m => m.media_id -> m).toMap
    assert(probed(1L).soi_ok == 0)
    assert(probed(2L).soi_ok == 1 && probed(2L).width == 0)
  }

  test("decodeWav parses 16-bit PCM incl. negatives and non-canonical chunks") {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val samples = Seq(100, -200, 32767, -32768, 0)
    val data = samples.flatMap(s => le16(s & 0xffff)).toArray
    // a LIST chunk between fmt and data: the walk must skip it
    val junk = "LIST".getBytes ++ le32(4) ++ "INFO".getBytes
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val body = fmt ++ junk ++ "data".getBytes ++ le32(data.length) ++ data
    val wav = "RIFF".getBytes ++ le32(4 + body.length) ++ "WAVE".getBytes ++ body
    val st = Multimodal.decodeWav(wav).get
    assert(st.nSamples == 5 && st.sumSamples == samples.map(_.toLong).sum)
    assert(st.minSample == -32768 && st.maxSample == 32767)
    // float-PCM (format 3) must be rejected, not mis-parsed
    val fmtF = "fmt ".getBytes ++ le32(16) ++ le16(3) ++ le16(1) ++
      le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val bodyF = fmtF ++ "data".getBytes ++ le32(data.length) ++ data
    val wavF = "RIFF".getBytes ++ le32(4 + bodyF.length) ++ "WAVE".getBytes ++ bodyF
    assert(Multimodal.decodeWav(wavF).isEmpty)
    // a chunk declaring a ~2^31 size must reject, not overflow Int bounds
    // math into an ArrayIndexOutOfBounds crash
    val bodyO = fmt ++ "data".getBytes ++ le32(0x7fffffff) ++ data
    val wavO = "RIFF".getBytes ++ le32(4 + bodyO.length) ++ "WAVE".getBytes ++ bodyO
    assert(Multimodal.decodeWav(wavO).isEmpty, "overflowing size must reject")
  }

  test("decodeMedia routes by magic, is partition-invariant, survives junk") {
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 2; y <- 0 until 2) img.setRGB(x, y, 0x0A141E)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rows = Seq(
      (1L, bos.toByteArray),
      (2L, "not a media file".getBytes("UTF-8")),
      (3L, Array[Byte](0x42, 0x4D, 1, 2))) // BMP magic, truncated garbage
      .toDF("media_id", "content")
    def run(df: org.apache.spark.sql.DataFrame) =
      Multimodal.decodeMedia(df).collect().map(d => d.media_id -> d).toMap
    val out = run(rows)
    assert(out(1L).kind == "image/png" && out(1L).n_pixels.contains(4L))
    assert(out(1L).sum_r.contains(40L) && out(1L).sum_g.contains(80L) &&
      out(1L).sum_b.contains(120L))
    assert(out(2L).kind == "unknown" && out(2L).width.isEmpty)
    assert(out(3L).kind == "unknown", "undecodable magic-matched bytes -> unknown")
    assert(run(rows.repartition(3)) == run(rows),
      "partitioning must not change decode output")
  }

  test("pcmWindowFeatures windows exactly, counts sign flips, keeps tails") {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    // 9 samples → windows [4,4,1]; crossings only count inside a window
    val samples = Seq(5, -3, -2, 7, /*|*/ -1, 0, -4, 6, /*|*/ -9)
    val data = samples.flatMap(s => le16(s & 0xffff)).toArray
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val body = fmt ++ "data".getBytes ++ le32(data.length) ++ data
    val wav = "RIFF".getBytes ++ le32(4 + body.length) ++ "WAVE".getBytes ++ body
    val out = Multimodal.pcmWindowFeatures(
      Seq((7L, wav)).toDF("media_id", "content"), 4)
      .collect().sortBy(_.win_idx)
    // window 0: |5|+|−3|+|−2|+|7|=17, flips 5→−3, −2→7 (0 is positive)
    // window 1: |−1|+|0|+|−4|+|6|=11, flips −1→0, 0→−4, −4→6
    // window 2: the 1-sample tail — no pairs, no crossings
    assert(out.map(w => (w.win_idx, w.n_win, w.sum_abs, w.n_zc)).toSeq ==
      Seq((0, 4L, 17L, 2L), (1, 4L, 11L, 3L), (2, 1L, 9L, 0L)))
    // the boundary pair 6→−9 crosses zero but spans windows: never counted
  }

  test("gainStats: peak incl. the negative rail, clip census, exact RMS") {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def wav(samples: Seq[Int]): Array[Byte] = {
      val data = samples.flatMap(s => le16(s & 0xffff)).toArray
      val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
        le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
      val body = fmt ++ "data".getBytes ++ le32(data.length) ++ data
      "RIFF".getBytes ++ le32(4 + body.length) ++ "WAVE".getBytes ++ body
    }
    val out = Multimodal.gainStats(Seq(
        (1L, wav(Seq(100, -200, 32767, -32768, 0))),
        (2L, wav(Seq(3, -4))))
      .toDF("media_id", "content"))
      .collect().map(g => g.media_id -> g).toMap
    val g1 = out(1L)
    // peak = |−32768| = 32768 (beyond the positive rail), both rails clip
    assert(g1.n_samples == 5 && g1.peak == 32768 && g1.n_clipped == 2)
    assert(g1.sum_sq == 100L * 100 + 200L * 200 + 32767L * 32767 +
      32768L * 32768)
    assert(g1.gain_micro == 32767L * 1000000L / 32768L)
    assert(g1.rms_micro ==
      math.floor(1e6 * math.sqrt(g1.sum_sq.toDouble / 5)).toLong)
    // unclipped clip-free payload: gain amplifies (> 1e6)
    val g2 = out(2L)
    assert(g2.peak == 4 && g2.n_clipped == 0 && g2.sum_sq == 25L)
    assert(g2.gain_micro == 32767L * 1000000L / 4)
  }

  test("imageHashes: same raster hashes equal across PNG/BMP encodings") {
    // known 4x2 blue raster; red/green constant so only blue drives bits
    val blue = Array(Array(10, 250, 30, 30), Array(200, 5, 5, 90))
    def img() = {
      val i = new java.awt.image.BufferedImage(4, 2,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 2; x <- 0 until 4)
        i.setRGB(x, y, (7 << 16) | (9 << 8) | blue(y)(x))
      i
    }
    def enc(fmt: String) = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img(), fmt, bos)
      bos.toByteArray
    }
    val media = Seq((1L, enc("png")), (2L, enc("bmp")))
      .toDF("media_id", "content")
    val out = Multimodal.imageHashes(media).collect().sortBy(_.media_id)
    assert(out.length == 2)
    // independent replay of the bit formulas over the known raster
    val n = 8
    val sum = blue.flatten.sum
    var (a, d) = (0L, 0L)
    for (y <- 0 until 2; x <- 0 until 4) {
      if (blue(y)(x) * n > sum) a |= 1L << (y * 4 + x)
      if (x < 3 && blue(y)(x + 1) > blue(y)(x)) d |= 1L << (y * 3 + x)
    }
    assert(out(0).ahash == a && out(0).dhash == d)
    // content-level dedup across containers: different bytes (md5 dedup
    // misses it), identical perceptual hashes
    assert(!java.util.Arrays.equals(enc("png"), enc("bmp")))
    assert(out(0).ahash == out(1).ahash && out(0).dhash == out(1).dhash)
    // rasters wider than 64 bits drop (triage), not truncate
    val big = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(big, "png", bos)
    val media2 = Seq((3L, bos.toByteArray)).toDF("media_id", "content")
    assert(Multimodal.imageHashes(media2).count() == 0)
  }

  test("probeMeta decodes real PNG/BMP/WAV headers (no codec library)") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // PNG: signature + IHDR length + "IHDR" + width=400 + height=200 (BE)
    val png = b(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 0x0D) ++ "IHDR".getBytes ++
      b(0, 0, 1, 0x90) ++ b(0, 0, 0, 0xC8) ++ b(8, 6, 0, 0, 0)
    // BMP: "BM" + size/reserved/offset + DIB size + width=640, height=480 (LE)
    val bmp = "BM".getBytes ++ b(0, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0) ++
      b(40, 0, 0, 0) ++ b(0x80, 2, 0, 0) ++ b(0xE0, 1, 0, 0)
    // WAV (canonical 44-byte): rate=16000, byteRate=32000, data=64000 -> 2000ms
    val wav = "RIFF".getBytes ++ b(0, 0, 0, 0) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ b(16, 0, 0, 0) ++ b(1, 0) ++ b(1, 0) ++
      b(0x80, 0x3E, 0, 0) ++ b(0, 0x7D, 0, 0) ++ b(2, 0) ++ b(16, 0) ++
      "data".getBytes ++ b(0, 0xFA, 0, 0)
    val df = Seq((1L, png), (2L, bmp), (3L, wav), (4L, "junk".getBytes))
      .toDF("media_id", "content")
    val out = Multimodal.probeMeta(df)
      .select($"media_id", $"detected", $"probed_width", $"probed_height",
        $"probed_sample_rate", $"probed_duration_ms")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "image/png")
    assert(out(1L).getInt(2) == 400 && out(1L).getInt(3) == 200)
    assert(out(2L).getString(1) == "image/bmp")
    assert(out(2L).getInt(2) == 640 && out(2L).getInt(3) == 480)
    assert(out(3L).getString(1) == "audio/wav")
    assert(out(3L).getInt(4) == 16000 && out(3L).getLong(5) == 2000L)
    assert(out(4L).getString(1) == "unknown" && out(4L).isNullAt(2))
  }

  test("resizeImageStats keeps exactly the strided pixel subset") {
    // 5x4 raster: pixel (x,y) = RGB(10x+y, 100+x, 200+y); stride 2 keeps
    // x∈{0,2,4}, y∈{0,2}
    val img = new java.awt.image.BufferedImage(5, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 5; y <- 0 until 4)
      img.setRGB(x, y, ((10 * x + y) << 16) | ((100 + x) << 8) | (200 + y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq((7L, bos.toByteArray), (8L, "junk".getBytes))
      .toDF("media_id", "content")
    val out = Multimodal.resizeImageStats(df, 2).collect()
    assert(out.length == 1, "undecodable rows drop, not crash")
    val r = out.head
    val kept = for (x <- Seq(0, 2, 4); y <- Seq(0, 2)) yield (x, y)
    assert(r.out_w == 3 && r.out_h == 2)
    assert(r.sum_r == kept.map { case (x, y) => 10 * x + y }.sum)
    assert(r.sum_g == kept.map { case (x, _) => 100 + x }.sum)
    assert(r.sum_b == kept.map { case (_, y) => 200 + y }.sum)
    // stride 1 degenerates to the full-raster stats decodeImage reports
    val full = Multimodal.decodeImage(bos.toByteArray).get
    val s1 = Multimodal.resizeImageStats(df, 1).head()
    assert((s1.out_w, s1.out_h) == (full.width, full.height))
    assert((s1.sum_r, s1.sum_g, s1.sum_b) == ((full.sumR, full.sumG, full.sumB)))
  }

  test("decimateWavStats keeps exactly the strided sample subset") {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val samples = Seq(100, -200, 32767, -32768, 0, 7, -9)
    val data = samples.flatMap(s => le16(s & 0xffff)).toArray
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val body = fmt ++ "data".getBytes ++ le32(data.length) ++ data
    val wav = "RIFF".getBytes ++ le32(4 + body.length) ++ "WAVE".getBytes ++ body
    val df = Seq((5L, wav), (6L, "junk".getBytes)).toDF("media_id", "content")
    val out = Multimodal.decimateWavStats(df, 3).collect()
    assert(out.length == 1, "undecodable rows drop, not crash")
    val kept = Seq(samples(0), samples(3), samples(6)) // indices 0, 3, 6
    val r = out.head
    assert(r.n_kept == 3 && r.sum_kept == kept.map(_.toLong).sum)
    assert(r.min_kept == kept.min && r.max_kept == kept.max)
    // stride 1 degenerates to decodeWav's full stats
    val full = Multimodal.decodeWav(wav).get
    val s1 = Multimodal.decimateWavStats(df, 1).head()
    assert((s1.n_kept, s1.sum_kept, s1.min_kept, s1.max_kept) ==
      ((full.nSamples, full.sumSamples, full.minSample, full.maxSample)))
  }

  test("truncate and frame-sample keep schema and bounds") {
    val t = Multimodal.truncateContent(media, 16)
    assert(t.select(max(length($"content"))).head.getInt(0) <= 16)
    assert(t.select(max($"meta.n_bytes")).head.getLong(0) <= 16)
    val f = Multimodal.sampleFrames(media, 10)
    val row = f.select($"meta.n_bytes", size($"frames")).head
    assert(row.getInt(1) == (row.getLong(0).toInt + 9) / 10)
  }

  test("decodeVideo walks a GVID container and decodes only sampled frames") {
    def pngFrame(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(2, 2,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 2; y <- 0 until 2)
        img.setRGB(x, y, ((seed + x) << 16) | ((seed + y) << 8) | seed)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def container(frames: Seq[Array[Byte]]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write('G'); bos.write('V'); bos.write('I'); bos.write('D')
      bos.write(frames.length & 0xff); bos.write((frames.length >> 8) & 0xff)
      frames.foreach { f =>
        bos.write(f.length & 0xff); bos.write((f.length >> 8) & 0xff)
        bos.write((f.length >> 16) & 0xff); bos.write((f.length >> 24) & 0xff)
        bos.write(f)
      }
      bos.toByteArray
    }
    val fr = Seq(pngFrame(10), pngFrame(50), pngFrame(90))
    val direct = fr.map(f => Multimodal.decodeImage(f).get)
    // stride 2 samples frames 0 and 2 only
    val v2 = Multimodal.decodeVideo(container(fr), 2).get
    assert(v2.nFrames == 3 && v2.nSampled == 2)
    assert(v2.pxTotal == direct(0).nPixels + direct(2).nPixels)
    assert(v2.sumR == direct(0).sumR + direct(2).sumR)
    assert(v2.sumG == direct(0).sumG + direct(2).sumG)
    assert(v2.sumB == direct(0).sumB + direct(2).sumB)
    // stride 1 decodes every frame
    val v1 = Multimodal.decodeVideo(container(fr), 1).get
    assert(v1.nSampled == 3 && v1.sumR == direct.map(_.sumR).sum)
    // malformed containers reject: bad magic, truncated frame table
    val bad = container(fr); bad(0) = 'X'
    assert(Multimodal.decodeVideo(bad, 2).isEmpty)
    val trunc = container(fr).dropRight(10)
    assert(Multimodal.decodeVideo(trunc, 2).isEmpty)

    // videoFrames extracts the SAME sampled stills byte-for-byte and
    // keeps whole-container reject semantics
    val media = Seq((7L, container(fr)), (8L, trunc))
      .toDF("media_id", "content")
    val got = Multimodal.videoFrames(media, 2).collect()
      .map(v => (v.media_id, v.frame_idx, v.frame.toSeq)).toSet
    assert(got == Set((7L, 0, fr(0).toSeq), (7L, 2, fr(2).toSeq)),
      "sampled frame bytes must round-trip exactly; torn container emits nothing")
    assert(Multimodal.videoFrames(media, 1).filter($"media_id" === 7L).count() == 3)
  }

  test("sceneStats cuts exactly at pixel-profile changes; rejects torn clips") {
    def pngFrame(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(2, 2,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 2; y <- 0 until 2)
        img.setRGB(x, y, ((seed + x) << 16) | ((seed + y) << 8) | seed)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def container(frames: Seq[Array[Byte]]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write('G'); bos.write('V'); bos.write('I'); bos.write('D')
      bos.write(frames.length & 0xff); bos.write((frames.length >> 8) & 0xff)
      frames.foreach { f =>
        bos.write(f.length & 0xff); bos.write((f.length >> 8) & 0xff)
        bos.write((f.length >> 16) & 0xff); bos.write((f.length >> 24) & 0xff)
        bos.write(f)
      }
      bos.toByteArray
    }
    val a = pngFrame(10); val b = pngFrame(50); val c = pngFrame(90)
    // scenes: a a a | b | c c  -> 3 scenes, longest 3, starts 0+3+4 = 7;
    // adjacent IDENTICAL frames never cut, every profile change does
    val clip = container(Seq(a, a, a, b, c, c))
    val media = Seq((1L, clip), (2L, container(Seq(a)).dropRight(5)))
      .toDF("media_id", "content")
    val out = Multimodal.sceneStats(media).collect()
    assert(out.length == 1, "torn clip must reject whole")
    val s = out.head
    assert(s.media_id == 1L && s.n_frames == 6 && s.n_scenes == 3)
    assert(s.longest_scene == 3 && s.boundary_sum == 7L, s"got $s")
  }

  test("phash near-dup: planted copies accept/reject as constructed") {
    // the m_phash_dedup planting contract: near copies (seed%20==0,
    // %40!=0, one sampled pixel +16) land within Hamming ≤1 of their
    // base and excise to it; far copies (seed%40==0, rows ≥2 perturbed)
    // share hash piece 0 with their base — a guaranteed band candidate —
    // but scatter past the threshold and must come out unmatched; seeds
    // 256 apart decode to byte-identical images (exact clusters keep the
    // class minimum)
    val out = SparkEntry.queries("m_phash_dedup")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    graft.CacheScope.releaseAll()
    val nearCopies = out.keys.filter(id => id % 2 == 1 && id % 40 != 1)
    val farCopies = out.keys.filter(_ % 40 == 1)
    assert(nearCopies.nonEmpty && farCopies.nonEmpty, "planting missing")
    nearCopies.foreach { id =>
      val (keep, n) = out(id)
      assert(n >= 1 && keep < id, s"near copy $id must excise: keep=$keep n=$n")
    }
    farCopies.foreach { id =>
      val (keep, n) = out(id)
      assert(keep == id && n == 0, s"far copy $id must reject: keep=$keep n=$n")
    }
    // an exact mod-256 cluster pair: both present => larger maps to smaller
    val exact = out.keys.filter(id => id % 2 == 0 && out.contains(id + 256))
    assert(exact.nonEmpty, "no mod-256 exact pair at this SF")
    exact.foreach { id =>
      assert(out(id + 256)._1 <= id, s"exact dup ${id + 256} must excise")
    }
  }
}
