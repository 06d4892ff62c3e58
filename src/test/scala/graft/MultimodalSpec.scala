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
        s"""SELECT ((CAST(conv(substring(md5(concat(encode('hello world', 'UTF-8'),
           | encode('$i', 'UTF-8'))), 1, 8), 16, 10) AS BIGINT) & 2147483647) % 100000)
           | / CAST(100000.0 AS DOUBLE)""".stripMargin).head.getDouble(0)
      r
    }
    assert(expected.toSeq == viaSql)
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
