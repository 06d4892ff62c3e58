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

  test("stub decode is deterministic and batch-shaped") {
    val f1 = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1 == f2, "partitioning must not change decode output")
    assert(f1.values.forall(_.size == Multimodal.FeatureDim))
    assert(f1.values.forall(_.forall(v => v >= 0.0 && v < 1.0)))
  }

  test("decodeStub matches its SQL-expressible definition") {
    val bytes = "hello world".getBytes("UTF-8")
    val expected = Multimodal.decodeStub(bytes)
    val viaSql = (0 until Multimodal.FeatureDim).map { i =>
      val r = spark.sql(
        s"""SELECT ((CAST(conv(substring(md5(concat(
           | md5(encode('hello world', 'UTF-8')),
           | encode('$i', 'UTF-8'))), 1, 8), 16, 10) AS BIGINT) & 2147483647) % 100000)
           | / CAST(100000.0 AS DOUBLE)""".stripMargin).head.getDouble(0)
      r
    }
    assert(expected.toSeq == viaSql)
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

  test("truncate and frame-sample keep schema and bounds") {
    val t = Multimodal.truncateContent(media, 16)
    assert(t.select(max(length($"content"))).head.getInt(0) <= 16)
    assert(t.select(max($"meta.n_bytes")).head.getLong(0) <= 16)
    val f = Multimodal.sampleFrames(media, 10)
    val row = f.select($"meta.n_bytes", size($"frames")).head
    assert(row.getInt(1) == (row.getLong(0).toInt + 9) / 10)
  }
}
