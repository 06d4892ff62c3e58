package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, MinHashAggregator, TextFunctions}
import graft.operators.Dedup
import graft.sources.Tables

/** Custom function surface: SQL registration of native expressions and the
  * MinHash typed Aggregator (equivalence with the column-min signature). */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("readabilityStats: exact counts, floor-micro Flesch scores, guards") {
    val docs = Seq(
      (1L, "Hello world. Go now!"),
      (2L, "no sentence punct here"), // 0 sentences -> s floors at 1
      (3L, "")).toDF("id", "txt")     // empty -> 0 words, w floors at 1
    val out = TextFunctions.readabilityStats(docs, "id", "txt")
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long, Long)].collect()
    // doc 1: 4 words, 2 sentence runs, vowel groups e|o, o, o, o = 5
    assert(out(0)._2 == 4 && out(0)._3 == 2 && out(0)._4 == 5)
    // replay the exact double tree the operator promises
    def ease(w: Long, s: Long, sy: Long): Long = {
      val ws = w.toDouble / math.max(s, 1L).toDouble
      val sw = sy.toDouble / math.max(w, 1L).toDouble
      math.floor(1e6 * (206.835 - 1.015 * ws - 84.6 * sw)).toLong
    }
    def fk(w: Long, s: Long, sy: Long): Long = {
      val ws = w.toDouble / math.max(s, 1L).toDouble
      val sw = sy.toDouble / math.max(w, 1L).toDouble
      math.floor(1e6 * (0.39 * ws + 11.8 * sw - 15.59)).toLong
    }
    out.foreach { r =>
      assert(r._5 == ease(r._2, r._3, r._4) && r._6 == fk(r._2, r._3, r._4))
    }
    // the guards: empty doc scores (no NULL/NaN), 0-sentence doc treats
    // the whole text as one sentence
    assert(out(2)._2 == 0 && out(2)._5 == ease(0, 0, 0))
    assert(out(1)._3 == 0)
  }

  test("registered SQL functions compute dot / norm") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "graft_l2norm(array(3.0d, 4.0d)) AS n").head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
  }

  test("NfcNormalize folds decomposed sequences, is the identity on ASCII, and registers in SQL") {
    import graft.functions.NfcNormalize
    val df = Seq(
      "caf\u00e9",       // precomposed U+00E9
      "cafe\u0301",      // decomposed e + combining acute U+0301
      "plain ascii",     // NFC identity (fast path)
      "A\u0308\u0332x",  // A + diaeresis + low line: only the diaeresis composes
      "").toDF("s")
    val out = df.select(NfcNormalize.nfcNormalize($"s").as("n"))
      .as[String].collect()
    assert(out(0) == out(1), "precomposed and decomposed must normalize equally")
    assert(out(0) == "caf\u00e9")
    assert(out(2) == "plain ascii" && out(4) == "")
    assert(out(3) == "\u00c4\u0332x", "base+diaeresis composes; U+0332 has no composition")
    // null propagates; SQL registration exposes the same expression
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_nfc(CAST(NULL AS STRING)), graft_nfc('cafe' || '\u0301')").head
    assert(r.isNullAt(0) && r.getString(1) == "caf\u00e9")
    // the eval (non-codegen) path agrees with the codegen path
    assert(NfcNormalize.nfc(
      org.apache.spark.unsafe.types.UTF8String.fromString("cafe\u0301"))
      .toString == "caf\u00e9")
  }

  test("WordNgrams matches the composed transform form and the bigram native") {
    import graft.functions.NgramExpressions
    val docs = Seq(
      "", "one", "one two", "one two three", "a b c d e",
      "  leading   and trailing  ", "x y z x y z").toDF("text")
    val tk = TextFunctions.tokens($"text")
    // composed reference form for k = 3 (the shape trigrams() had before
    // the fused loop): explicit empty branch + element_at chain
    val composed = when(size(tk) >= 3,
      transform(sequence(lit(1), size(tk) - 2),
        i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1),
          element_at(tk, i + 2))))
      .otherwise(array().cast("array<string>"))
    val rows = docs.select(
      TextFunctions.trigrams($"text").as("fused"), composed.as("ref"),
      NgramExpressions.ngramsNative(tk, 2).as("k2"),
      NgramExpressions.bigramsNative(tk).as("bg")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
      assert(r.getSeq[String](2) == r.getSeq[String](3))
    }
  }

  test("zValue interleaves bits; buckets keep both spans narrow") {
    import graft.operators.Layout
    // z(3=0b11, 1=0b01): x bits at even positions (1,4), y bit 0 at
    // position 1 -> 0b0111 = 7; top-bit check at i = 20
    val r = Seq((3L, 1L), (0L, 0L), (1L << 20, 1L << 20))
      .toDF("x", "y")
      .select(Layout.zValue($"x", $"y").as("z")).as[Long].collect()
    assert(r(0) == 7L)
    assert(r(1) == 0L)
    assert(r(2) == ((1L << 40) | (1L << 41)))
    // locality: on a 64x64 grid, 16 z-range buckets each span at most a
    // quarter of each dimension (a row-major sort would give full-width
    // y spans in every bucket)
    val grid = (0L until 64L).flatMap(a => (0L until 64L).map(b => (a, b)))
      .toDF("x", "y")
    val spans = Layout.zOrderBuckets(grid, $"x", $"y", 16)
      .select($"x_span", $"y_span").as[(Long, Long)].collect()
    assert(spans.length == 16)
    spans.foreach { case (xs, ys) => assert(xs <= 16 && ys <= 16) }
  }

  test("pruningReport: zorder scans fewer buckets than xsort for a box") {
    import graft.operators.Layout
    // dense 64x64 grid: the quarter-to-half box covers 1/16 of the area;
    // an x-sorted layout prunes x only (every surviving bucket spans all
    // of y), zorder prunes both dimensions
    val grid = (0L until 64L).flatMap(a => (0L until 64L).map(b => (a, b)))
      .toDF("x", "y")
    val rep = Layout.pruningReport(grid, $"x", $"y", 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val xs = rep.find(_._1 == "xsort").get
    val zo = rep.find(_._1 == "zorder").get
    // both layouts see the same data and the same predicate
    assert(xs._4 == 64 * 64 && zo._4 == 64 * 64)
    assert(xs._6 == zo._6 && xs._6 == 17L * 17L) // box [16,32]^2 inclusive
    // pruning: every scanned bucket is counted, and the z-layout reads
    // no more rows than the x-sort (it prunes on y too)
    assert(zo._5 <= xs._5, s"zorder must read <= xsort rows: $zo vs $xs")
    assert(zo._5 < zo._4 && xs._5 < xs._4, "both layouts must prune something")
  }

  test("MinHash Aggregator equals the column-min signature computation") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sf).limit(50)
    val viaAggregator = docs
      .select($"doc_id", explode(Dedup.shingles($"text")).as("shingle"))
      .select($"doc_id", TextFunctions.hash32($"shingle").as("h"))
      .groupBy($"doc_id")
      .agg(udaf(MinHashAggregator).apply($"h").as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaColumns = Dedup.minhashSignatures(docs, "doc_id", "text")
      .collect().map { r =>
        r.getLong(0) -> (1 until r.length).map(r.getLong).toSeq
      }.toMap
    assert(viaAggregator == viaColumns)
  }
}
