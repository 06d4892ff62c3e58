package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.sources.Tables

/** Structured Streaming parity: streaming windowed aggregates over the
  * bounded events fixture must equal their batch equivalents. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  lazy val stream = EventStreams.readEvents(spark, sf)
  lazy val batch = Tables.events(spark, sf)

  test("streaming tumbling window equals batch aggregation") {
    val streamed = EventStreams.runToMemory(
      EventStreams.tumblingCounts(stream), "t_tumbling")
      .select($"window_start", $"event_type", $"n", $"total_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val batched = batch
      .groupBy(date_trunc("hour", $"ts").as("window_start"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(streamed == batched)
  }

  test("streaming session windows cover all events") {
    val sessions = EventStreams.runToMemory(
      EventStreams.sessionCounts(stream), "t_sessions")
    assert(sessions.agg(sum($"n_events")).head.getLong(0) == batch.count())
    // session semantics: 30-min gap == the batch lag-based sessionization
    val batchSessions = queries.AnalyticsQueries.queries("s_events_sessions")(spark, sf)
    assert(sessions.count() == batchSessions.count())
  }

  test("sliding windows produce a superset of tumbling windows") {
    val sliding = EventStreams.runToMemory(
      EventStreams.slidingCounts(stream), "t_sliding")
    val tumbling = spark.table("t_tumbling")
    assert(sliding.count() >= tumbling.count())
    // every event counted 4x in 1h/15min sliding windows
    assert(sliding.agg(sum($"n")).head.getLong(0) == 4 * batch.count())
  }

  test("streaming windowed degrees equal batch count(DISTINCT) per window") {
    val streamed = EventStreams.runToMemory(
      EventStreams.windowedDegrees(stream), "t_degrees")
      .select($"window_start", $"user_id", $"degree")
      .as[(java.sql.Timestamp, Long, Long)].collect().toSet
    val batched = batch
      .groupBy(date_trunc("hour", $"ts").as("window_start"), $"user_id")
      .agg(countDistinct($"event_type").as("degree"))
      .as[(java.sql.Timestamp, Long, Long)].collect().toSet
    assert(streamed == batched)
  }

  test("streaming dedup equals batch dropDuplicates on the fingerprint") {
    val deduped = EventStreams.runToMemory(
      EventStreams.dedupedEvents(stream, Seq("user_id", "event_type")),
      "t_dedup", mode = org.apache.spark.sql.streaming.OutputMode.Append())
    // every (user_id, event_type) survives exactly once
    assert(deduped.groupBy($"user_id", $"event_type").count()
      .filter($"count" > 1).isEmpty)
    assert(deduped.count() ==
      batch.dropDuplicates("user_id", "event_type").count())
  }

  test("foreachBatch parquet sink lands watermark-finalized windows") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    EventStreams.runToParquet(EventStreams.tumblingCounts(stream), out, ckpt)
    val landed = spark.read.parquet(out)
    // append mode emits only watermark-closed windows; with a bounded
    // source the final (unclosed) windows stay in state — landed counts
    // must be a subset of the batch result, keyed identically
    val batchWindows = batch
      .groupBy(date_trunc("hour", $"ts").as("window_start"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val landedRows = landed.select($"window_start", $"event_type", $"n")
      .as[(java.sql.Timestamp, String, Long)].collect()
    assert(landedRows.nonEmpty)
    landedRows.foreach { case (w, t, n) =>
      assert(batchWindows((w, t)) == n, s"window $w/$t")
    }
  }

  test("stream-static enrichment join equals the batch join") {
    // static dimension: each user's first-seen timestamp from batch
    val userDim = batch.groupBy($"user_id")
      .agg(min($"ts").as("first_seen"))
    val streamed = EventStreams.runToMemory(
      EventStreams.enrichWithStatic(stream, userDim, Seq("user_id")),
      "t_enrich",
      mode = org.apache.spark.sql.streaming.OutputMode.Append())
      .select($"event_id", $"first_seen")
      .as[(Long, java.sql.Timestamp)].collect().toMap
    val batched = batch.join(userDim, Seq("user_id"), "left")
      .select($"event_id", $"first_seen")
      .as[(Long, java.sql.Timestamp)].collect().toMap
    assert(streamed == batched)
  }

  test("streaming decontamination filter equals the batch contamination report") {
    val docsStream = EventStreams.readDocuments(spark, sf)
    val docsBatch = Tables.documents(spark, sf)
    val benchmark = docsBatch.filter($"source" === "src19")
    val corpus = docsBatch.filter($"source" =!= "src19")
    val decon =
      EventStreams.decontaminatedDocs(docsStream, benchmark, "doc_id", "text")
    assert(decon.queryExecution.analyzed.toString.length < 20000,
      "benchmark hashes must ride a broadcast variable, not a plan literal")
    val clean = EventStreams.runToMemory(
      decon.filter($"source" =!= "src19"),
      "t_decontam",
      mode = org.apache.spark.sql.streaming.OutputMode.Append())
      .select($"doc_id").as[Long].collect().toSet
    val expected = graft.operators.Dedup
      .contaminationReport(corpus, benchmark, "doc_id", "text")
      .filter(!$"contaminated").select($"doc_id").as[Long].collect().toSet
    assert(clean == expected)
    assert(clean.nonEmpty && clean.size < corpus.count())
  }

  test("null-text docs survive BOTH decontamination forms identically") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_nulldoc").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "alpha beta gamma delta"),
        org.apache.spark.sql.Row(2L, null))),
      schema).write.mode("overwrite").parquet(dir)
    val benchmark = Seq((100L, "beta gamma delta epsilon")).toDF("doc_id", "text")
    val st = spark.readStream.schema(schema).parquet(dir)
    val viaBroadcast = EventStreams.runToMemory(
      EventStreams.decontaminatedDocs(st, benchmark, "doc_id", "text"),
      "t_null_bc", mode = org.apache.spark.sql.streaming.OutputMode.Append())
      .select($"doc_id").as[Long].collect().toSet
    val viaJoin = EventStreams.runToMemory(
      EventStreams.decontaminatedDocsJoin(st, benchmark, "doc_id", "text"),
      "t_null_join", mode = org.apache.spark.sql.streaming.OutputMode.Append())
      .select($"doc_id").as[Long].collect().toSet
    // doc 1 shares the "beta gamma delta" shingle -> dropped; doc 2 has
    // no shingles -> nothing in common with the benchmark -> survives
    assert(viaBroadcast == Set(2L), s"broadcast form: $viaBroadcast")
    assert(viaJoin == viaBroadcast, "both forms must agree on null text")
  }

  test("streaming span dedup equals the batch incremental form across micro-batches") {
    import org.apache.spark.sql.types._
    val passage = "one two three four five six seven"
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_spanstream").toString
    // two files -> two micro-batches under maxFilesPerTrigger=1: proves
    // the per-doc aggregation is batch-local (docs are source-row atomic)
    def writeFile(n: Int, rows: Seq[(Long, String)]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          org.apache.spark.sql.Row(r._1, r._2)), 1),
        schema).write.parquet(s"$dir/f$n")
    writeFile(1, Seq((1L, s"alpha $passage omega"), (2L, "plain text here")))
    writeFile(2, Seq((3L, s"beta gamma $passage"), (4L, "")))
    val indexed = Seq((10L, s"corpus doc with $passage inside"))
      .toDF("doc_id", "text")
    val idx = graft.operators.Dedup.spanKeyIndex(indexed, "doc_id", "text")
    val st = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/f*")
    val drained = EventStreams.runToMemory(
      EventStreams.spanDedupStream(st, idx, "doc_id", "text"),
      "t_span_stream",
      mode = org.apache.spark.sql.streaming.OutputMode.Update())
    val delta = Seq((1L, s"alpha $passage omega"), (2L, "plain text here"),
      (3L, s"beta gamma $passage"), (4L, "")).toDF("doc_id", "text")
    val streamed = delta.select($"doc_id")
      .join(drained, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"n_tokens", lit(0)).as("n_tokens"),
        coalesce($"n_kept", lit(0)).as("n_kept"),
        coalesce($"clean_text", lit("")).as("clean_text"))
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    val batch = graft.operators.Dedup
      .spanDedupAgainst(indexed, delta, "doc_id", "text")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq,
      s"stream=${streamed.toSeq} batch=${batch.toSeq}")
    assert(streamed(0) == ((1L, 9, 2, "alpha omega")), s"got ${streamed(0)}")
    assert(streamed(3) == ((4L, 0, 0, "")), s"got ${streamed(3)}")
  }

  test("row-local minhash signature array equals the aggregated batch form") {
    import graft.operators.Dedup
    // varied docs: long text, exactly-2-token (short-shingle path), empty
    // and whitespace-only (both collapse to the '' shingle), 7-token
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "one two"), (3L, ""), (4L, "  "),
      (5L, "a b c d e f g")).toDF("doc_id", "text")
    val batchSigs = Dedup.minhashSignatures(d, "doc_id", "text")
      .select($"doc_id", array((0 until Dedup.NumHashes)
        .map(i => col(s"mh_$i")): _*).as("bsig"))
    val rowLocal = d
      .withColumn("__sh", transform(Dedup.shingles($"text"),
        sh => graft.functions.TextFunctions.hash32(sh)))
      .select($"doc_id", Dedup.minhashSigArray($"__sh").as("rsig"))
    val joined = batchSigs.join(rowLocal, "doc_id")
      .select($"doc_id", ($"bsig" === $"rsig").as("eq"),
        $"bsig", $"rsig")
      .as[(Long, Boolean, Seq[Long], Seq[Long])].collect()
    assert(joined.length == 5)
    joined.foreach { case (id, eq, b, r) =>
      assert(eq, s"doc $id: batch=$b rowLocal=$r") }
  }

  test("streaming minhash dedup equals batch incrementalSurvivors across micro-batches") {
    import org.apache.spark.sql.types._
    import graft.operators.Dedup
    val ta = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tb = "red orange yellow green blue indigo violet ultra"
    val tc = "north south east west up down left right forward back"
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_mhstream").toString
    def writeFile(n: Int, rows: Seq[(Long, String)]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          org.apache.spark.sql.Row(r._1, r._2)), 1),
        schema).write.parquet(s"$dir/f$n")
    // file 1: an index duplicate (drops) + a unique survivor; file 2: an
    // intra-delta duplicate PAIR (min id 3 survives, 5 drops), an empty
    // doc, and a second index duplicate — proving cross hits land in
    // whichever micro-batch carries the doc
    // doc 7 is NULL-text: its row-local signature is NULL (ANSI
    // size(NULL) propagation) while the batch side drops null docs from
    // sigs entirely — neither path can produce a hit for it
    // (minhashSigArray's documented null contract); it must survive
    writeFile(1, Seq((1L, ta), (2L, "a genuinely unique document text")))
    writeFile(2, Seq((3L, tc), (4L, ""), (5L, tc), (6L, ta),
      (7L, null.asInstanceOf[String])))
    val indexed = Seq((10L, ta), (12L, tb)).toDF("doc_id", "text")
    val delta = Seq((1L, ta), (2L, "a genuinely unique document text"),
      (3L, tc), (4L, ""), (5L, tc), (6L, ta),
      (7L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val bandIdx = Dedup.minhashBandIndex(
      Dedup.minhashSignatures(indexed, "doc_id", "text"))
      .localCheckpoint(true)
    val st = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/f*")
    val (drained, nStateOps) = EventStreams.runToMemoryCounted(
      EventStreams.minhashHitsStream(st, bandIdx, "doc_id", "text"),
      "t_minhash_stream",
      mode = org.apache.spark.sql.streaming.OutputMode.Update())
    assert(nStateOps == 1,
      "the whole detection chain must be stateless around ONE aggregation")
    val hitIds = drained.select($"doc_id").distinct()
      .as[Long].collect().toSet
    val remainder = delta.join(
      drained.select($"doc_id".as("__hit")).distinct(),
      delta("doc_id") === col("__hit"), "left_anti")
    val streamed = Dedup.minhashSelfSurvivors(remainder, "doc_id",
        Dedup.minhashSignatures(delta, "doc_id", "text"))
      .select($"doc_id").as[Long].collect().sorted
    val batch = Dedup.incrementalSurvivors(indexed, delta, "doc_id", "text")
      .select($"doc_id").as[Long].collect().sorted
    assert(streamed.toSeq == batch.toSeq,
      s"stream=${streamed.toSeq} batch=${batch.toSeq}")
    assert(hitIds == Set(1L, 6L), s"cross hits: $hitIds")
    assert(streamed.toSeq == Seq(2L, 3L, 4L, 7L), s"got ${streamed.toSeq}")
  }

  test("streaming windowed HLL equals the batch per-window registers") {
    import graft.operators.Sketches
    val (whllDrained, whllStateOps) = EventStreams.runToMemoryCounted(
        EventStreams.windowedHllRegisters(stream), "t_whll_stream",
        mode = org.apache.spark.sql.streaming.OutputMode.Update())
    val streamed = whllDrained
      .groupBy("window_start", "register").agg(max($"rho_max").as("rho_max"))
      .as[(java.sql.Timestamp, Int, Int)].collect().toSet
    assert(whllStateOps == 1,
      "windowed registers must be ONE stateful aggregation")
    val b = Sketches.hllRegistersBy(
        batch.select(date_trunc("hour", $"ts").as("grp"),
          $"user_id".cast("string").as("item")), "grp", "item")
      .as[(java.sql.Timestamp, Int, Int)].collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed == b,
      s"stream-only=${(streamed -- b).take(3)} batch-only=${(b -- streamed).take(3)}")
  }

  test("streaming span fraction equals the batch measure across micro-batches") {
    import org.apache.spark.sql.types._
    import graft.operators.Dedup
    val block = (1 to 15).map(j => s"B$j").mkString(" ")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_sfstream").toString
    def writeFile(n: Int, rows: Seq[(Long, String)]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          org.apache.spark.sql.Row(r._1, r._2)), 1),
        schema).write.parquet(s"$dir/f$n")
    // the shared block straddles the two micro-batches: the dup-key set
    // is corpus-derived batch-side, so the verdicts can't depend on
    // which batch carried which doc
    writeFile(1, Seq((1L, s"a1 a2 $block a3 a4"), (6L, "tiny doc")))
    writeFile(2, Seq((2L, s"b1 $block b2 b3 b4"),
      (5L, "solo tokens that never repeat anywhere else"), (7L, "")))
    val d = Seq((1L, s"a1 a2 $block a3 a4"), (2L, s"b1 $block b2 b3 b4"),
      (5L, "solo tokens that never repeat anywhere else"),
      (6L, "tiny doc"), (7L, "")).toDF("doc_id", "text")
    val dupKeys = Dedup.dupSpanKeySet(d, "doc_id", "text").localCheckpoint(true)
    val st = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/f*")
    val (drained, nStateOps) = EventStreams.runToMemoryCounted(
      EventStreams.spanDupFractionStream(st, dupKeys, "doc_id", "text"),
      "t_span_frac_stream",
      mode = org.apache.spark.sql.streaming.OutputMode.Update())
    assert(nStateOps == 1)
    val streamed = d.select($"doc_id")
      .join(drained.groupBy("doc_id")
        .agg(max(struct($"n_spans", $"n_dup")).as("m"))
        .select($"doc_id", $"m.n_spans".as("n_spans"), $"m.n_dup".as("n_dup")),
        Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"n_spans", lit(0L)).as("n_spans"),
        coalesce($"n_dup", lit(0L)).as("n_dup"))
      .withColumn("dup_milli", when($"n_spans" === 0, lit(0L))
        .otherwise(expr("(1000 * n_dup) div n_spans")))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val batch = Dedup.spanDupFractionFrom(d.select($"doc_id", $"text"),
        Dedup.spanRowsOf(d, "doc_id", "text"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq,
      s"stream=${streamed.toSeq} batch=${batch.toSeq}")
    assert(streamed.head == ((1L, 15L, 11L, 733L)), s"got ${streamed.head}")
  }

  test("streaming centroid assignment equals the batch round-1 counts") {
    import org.apache.spark.sql.types._
    import graft.operators.Similarity
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val dir = java.nio.file.Files.createTempDirectory("graft_kmstream").toString
    def rowsOf(rows: Seq[(Long, Seq[Float])]) =
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2))
    def writeFile(n: Int, rows: Seq[(Long, Seq[Float])]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rowsOf(rows), 1), schema)
        .write.parquet(s"$dir/f$n")
    val vs: Seq[(Long, Seq[Float])] = Seq(
      1L -> Seq(0f, 0f), 2L -> Seq(0.1f, 0f), 3L -> Seq(1f, 1f),
      4L -> Seq(0.9f, 1f), 5L -> Seq(0.5f, 0.5f), 6L -> Seq(0f, 1f))
    // assignment state must accumulate ACROSS the micro-batch split
    writeFile(1, vs.take(3)); writeFile(2, vs.drop(3))
    val all = spark.createDataFrame(
      spark.sparkContext.parallelize(rowsOf(vs), 2), schema)
    def asCorpus(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("vec"))
    val c = asCorpus(all)
    val seeds = Similarity.int8LloydSeeds(c, 3)
    val st = asCorpus(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/f*"))
    val (drained, nOps) = EventStreams.runToMemoryCounted(
      Similarity.streamingLloydAssignCounts(st, c, seeds), "t_km_stream",
      mode = org.apache.spark.sql.streaming.OutputMode.Update())
    assert(nOps == 1, "row-local assignment around ONE counting aggregation")
    val streamed = drained.groupBy("cid").agg(max($"n").as("n"))
      .as[(Int, Long)].collect().toMap
    val batch = Similarity.int8LloydStep(c, seeds)
      .select($"cid", $"n_assigned").as[(Int, Long)].collect().toMap
    CacheScope.releaseAll()
    assert(streamed.values.sum == vs.size, s"every vector assigned: $streamed")
    assert(streamed == batch, s"stream=$streamed batch=$batch")
  }

  test("streaming sketch maintenance equals the batch sketches across micro-batches") {
    import org.apache.spark.sql.types._
    import graft.operators.Sketches
    val schema = StructType(Seq(StructField("token", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_skstream").toString
    def writeFile(n: Int, toks: Seq[String]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          toks.map(t => org.apache.spark.sql.Row(t)), 1),
        schema).write.parquet(s"$dir/f$n")
    // overlapping token files: the shared tokens count twice in CMS and
    // re-max in HLL, so equality REQUIRES cross-micro-batch state
    val t1 = (1 to 40).map(i => s"tok$i")
    val t2 = (20 to 60).map(i => s"tok$i")
    writeFile(1, t1); writeFile(2, t2)
    val all = (t1 ++ t2).toDF("token")
    val st = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/f*")
    val (hllDrained, hllStateOps) = EventStreams.runToMemoryCounted(
        EventStreams.hllRegisterStream(st, "token"), "t_hll_stream",
        mode = org.apache.spark.sql.streaming.OutputMode.Update())
    val hllStream = hllDrained
      .groupBy("register").agg(max($"rho_max").as("r"))
    assert(hllStateOps == 1)
    val hllJoined = Sketches.hllRegisters(all, "token")
      .join(hllStream, Seq("register"), "left")
      .select($"register", $"rho_max",
        coalesce($"r", lit(0)).cast("int").as("rs"))
      .as[(Int, Int, Int)].collect()
    assert(hllJoined.length == 64)
    hllJoined.foreach { case (reg, b, sm) =>
      assert(b == sm, s"register $reg: batch=$b stream=$sm") }
    val (cmsDrained, cmsStateOps) = EventStreams.runToMemoryCounted(
        EventStreams.cmsCellStream(st, "token"), "t_cms_stream",
        mode = org.apache.spark.sql.streaming.OutputMode.Update())
    val cmsStream = cmsDrained
      .groupBy("r", "bucket").agg(max($"cnt").as("cnt"))
      .orderBy("r", "bucket").collect().toSeq
    assert(cmsStateOps == 1)
    val batchCells = Sketches.cmsBuild(all, "token")
      .orderBy("r", "bucket").collect().toSeq
    assert(cmsStream == batchCells,
      s"stream cells=${cmsStream.take(5)} batch=${batchCells.take(5)}")
  }

  test("streaming quantile sample histogram accumulates across micro-batches " +
    "(== batch sketch); IVF+PQ append is STATELESS and byte-identical to " +
    "the batch index") {
    import org.apache.spark.sql.types._
    import graft.operators.{Sketches, Similarity}
    // quantile: keys 21..40 appear in BOTH files, so their sampled values
    // must count twice — equality with the batch sketch requires the
    // histogram state to accumulate across micro-batches
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_qstream").toString
    def writeFile(n: Int, rows: Seq[(Long, Long)]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map(r => org.apache.spark.sql.Row(r._1, r._2)), 1),
        schema).write.parquet(s"$dir/f$n")
    val r1 = (1L to 40L).map(i => (i, i % 7))
    val r2 = (21L to 60L).map(i => (i, i % 7))
    writeFile(1, r1); writeFile(2, r2)
    val st = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/f*")
    val (drained, nOps) = EventStreams.runToMemoryCounted(
      EventStreams.quantileSampleHistStream(st, $"k", $"v", 0.5),
      "t_q_stream", mode = org.apache.spark.sql.streaming.OutputMode.Update())
    assert(nOps == 1)
    val hist = drained.groupBy("v").agg(max($"cnt").as("cnt"))
    val sample = hist
      .select($"v", explode(sequence(lit(1L), $"cnt"))).select("v")
    val all = (r1 ++ r2).toDF("k", "v")
    val streamRes = Sketches
      .sampledQuantilesFrom(sample, all.select($"k", $"v"), Seq(250, 500, 750))
      .collect().toSeq
    val batchRes = Sketches
      .sampledQuantiles(all, $"k", $"v", 0.5, Seq(250, 500, 750))
      .collect().toSeq
    assert(streamRes == batchRes)
    // IVF+PQ append: zero state stores, rows == the batch index build
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
    val dim = Similarity.inferDim(corpus)
    val cells = Similarity.ivfSampledCells(corpus)
    val cbs = Similarity.pqCodebooks(corpus, dim)
    val stv = EventStreams.readEmbeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
      .filter($"id" < 50)
    val (appended, nOps2) = EventStreams.runToMemoryCounted(
      Similarity.streamingIvfPqAppend(stv, cells, cbs, dim), "t_ivf_append",
      mode = org.apache.spark.sql.streaming.OutputMode.Append())
    assert(nOps2 == 0, "index append must be stateless")
    val streamRows = appended
      .select($"vec_id", $"cell", $"codes")
      .as[(Long, Int, Seq[Int])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val delta = corpus.filter($"id" < 50)
    val batchCell = Similarity.ivfSampledAssign(delta, cells)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    val batchCodes = Similarity.pqEncode(delta, cbs, dim)
      .groupBy("vec_id")
      .agg(sort_array(collect_list(struct($"m", $"code"))).as("mc"))
      .select($"vec_id", expr("transform(mc, x -> x.code)").as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(streamRows.nonEmpty && streamRows.keySet == batchCell.keySet)
    streamRows.foreach { case (id, (cell, codes)) =>
      assert(cell == batchCell(id), s"cell of $id")
      assert(codes == batchCodes(id), s"codes of $id")
    }
  }

  test("streaming boilerplate strip equals the batch form across micro-batches") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("source", StringType), StructField("text", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_bpstream").toString
    def writeFile(n: Int, rows: Seq[(Long, String, String)]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          org.apache.spark.sql.Row(r._1, r._2, r._3)), 1),
        schema).write.parquet(s"$dir/f$n")
    // srcA: "header a" in 3/3 (dropped everywhere), "semi a" 2/3 (dropped);
    // srcB: "header a" in 1/2 -> kept there (threshold is per source).
    // Docs split across TWO micro-batches: the drop set is static, the
    // per-doc reassembly is batch-local, so the split must not matter.
    val corpus = Seq(
      (1L, "A", "header a\nbody one\nsemi a"),
      (2L, "A", "header a\nsemi a\nbody two"),
      (3L, "A", "header a\nbody three"),
      (4L, "B", "header a\nbody four"),
      (5L, "B", "body five"))
    writeFile(1, corpus.take(2))
    writeFile(2, corpus.drop(2))
    val batchDf = corpus.toDF("doc_id", "source", "text")
    val dropSet = graft.operators.Dedup
      .boilerplateDropSet(batchDf, "doc_id", "source", "text")
    val st = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/f*")
    val streamed = EventStreams.runToMemory(
      EventStreams.boilerplateStripStream(st, dropSet,
        "doc_id", "source", "text"),
      "t_bp_stream",
      mode = org.apache.spark.sql.streaming.OutputMode.Update())
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    val batch = graft.operators.Dedup
      .boilerplateStrip(batchDf, "doc_id", "source", "text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq,
      s"stream=${streamed.toSeq} batch=${batch.toSeq}")
    assert(streamed(3)._2 == 2 && streamed(3)._3 == 0) // srcB keeps header
  }

  test("streaming gopher panel equals the batch form across micro-batches") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_gopherstream").toString
    def writeFile(n: Int, rows: Seq[(Long, String)]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          org.apache.spark.sql.Row(r._1, r._2)), 1),
        schema).write.parquet(s"$dir/f$n")
    val corpus = Seq(
      (1L, "aa\naa\nbb"),                    // dup lines + bigram tie
      (2L, "x y x y x y"),                   // top-2gram + dup-3gram
      (3L, "all words differ entirely"),     // clean
      (4L, "one"))                           // no bigrams/trigrams at all
    writeFile(1, corpus.take(2))
    writeFile(2, corpus.drop(2))
    val st = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/f*")
    val streamed = EventStreams.gopherPanelOfCounts(
      EventStreams.runToMemory(
        EventStreams.gopherGramCountsStream(st, "doc_id", "text"),
        "t_gopher_stream",
        mode = org.apache.spark.sql.streaming.OutputMode.Update()))
      .as[(Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().sortBy(_._1)
    val batch = graft.functions.TextFunctions
      .gopherRepetitionStats(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq,
      s"stream=${streamed.toSeq} batch=${batch.toSeq}")
    assert(streamed(0)._3 == 333333L && streamed(1)._5 == 818181L)
  }

  test("streaming near-dup suppression keeps one doc per simhash signature") {
    val docsStream = EventStreams.readDocuments(spark, sf)
    val docsBatch = Tables.documents(spark, sf)
    val kept = EventStreams.runToMemory(
      EventStreams.nearDupFreeDocs(docsStream, "text"),
      "t_neardup_stream",
      mode = org.apache.spark.sql.streaming.OutputMode.Append())
    val keptSigs = graft.operators.Dedup
      .withSimhash(kept.select($"doc_id", $"text"), "text")
      .select($"simhash").as[Long].collect().toSeq
    val allSigs = graft.operators.Dedup
      .simhashSignatures(docsBatch, "doc_id", "text")
      .select($"simhash").as[Long].collect().toSet
    assert(keptSigs.size == keptSigs.toSet.size, "one survivor per signature")
    assert(keptSigs.toSet == allSigs, "every signature keeps a representative")
  }

  test("streaming near-dup suppression passes null-text docs through untouched") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_nullsig").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "alpha beta gamma delta"),
        org.apache.spark.sql.Row(2L, "alpha beta gamma delta"),
        org.apache.spark.sql.Row(3L, null),
        org.apache.spark.sql.Row(4L, null)), 1),
      schema).write.mode("overwrite").parquet(dir)
    val st = spark.readStream.schema(schema).parquet(dir)
    val kept = EventStreams.runToMemory(
      EventStreams.nearDupFreeDocs(st, "text"),
      "t_neardup_null",
      mode = org.apache.spark.sql.streaming.OutputMode.Append())
      .select($"doc_id").as[Long].collect().toSet
    // the duplicate pair keeps one survivor; BOTH null-text docs survive
    // (without the bypass they'd collide on the degenerate signature 0)
    assert(kept.intersect(Set(1L, 2L)).size == 1, s"dup pair: $kept")
    assert(Set(3L, 4L).subsetOf(kept), s"null docs must pass through: $kept")
  }

  test("streaming IVF+PQ serving equals the batch index answer") {
    import graft.operators.Similarity
    val corpus = Tables.embeddings(spark, sf).select($"vec_id".as("id"),
      $"embedding".cast("array<double>").as("vec"))
    val dim = Similarity.inferDim(corpus)
    val cells = Similarity.ivfSampledCells(corpus).persist()
    val assigned = Similarity.ivfSampledAssign(corpus, cells).persist()
    val cbs = Similarity.pqCodebooks(corpus, dim).persist()
    val codes = Similarity.pqEncode(corpus, cbs, dim).persist()
    val queriesDf = corpus.filter($"id" < 5)
    val batch = Similarity.ivfPqTopK(corpus, queriesDf, 10,
        prebuiltCells = Some(cells), prebuiltAssigned = Some(assigned),
        prebuiltCodebooks = Some(cbs), prebuiltCodes = Some(codes))
      .select($"query_id", $"vec_id", $"score_micro", $"rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    val st = EventStreams.readEmbeddings(spark, sf).filter($"vec_id" < 5)
      .select($"vec_id".as("id"),
        $"embedding".cast("array<double>").as("vec"))
    val agg = Similarity.streamingIvfPqTopK(st, cells, assigned, cbs,
      codes, kNN = 10, dim = dim)
    val sunk = EventStreams.runToMemory(agg, "t_stream_ann",
      mode = org.apache.spark.sql.streaming.OutputMode.Update())
    val streamed = sunk.groupBy($"query_id")
      .agg(max(struct($"n_cands", $"top")).as("mx"))
      .select($"query_id", posexplode($"mx.top"))
      .select($"query_id", $"col.vec_id".as("vec_id"),
        (lit(0L) - $"col.ns").as("score_micro"),
        ($"pos" + 1).cast("int").as("rank"))
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(streamed == batch,
      "the stream's answer must be bit-identical to batch ivfPqTopK")
    assert(streamed.size == 50, s"5 queries x top-10: ${streamed.size}")
  }

  test("as-of tier enrichment: boundaries, equal-ts purchases, tier 0") {
    // user 1: purchases at 1000, 5000 — events straddle every boundary;
    // user 2: never purchases (tier 0 via the LEFT join);
    // user 3: TWO purchases at the same ts — the empty [t, t) era must
    // be skipped and ts == t lands in the later era (tier 2)
    val mk = Seq(
      (1L, 500L, 1L, "view"), (2L, 1000L, 1L, "purchase"),
      (3L, 3000L, 1L, "click"), (4L, 5000L, 1L, "purchase"),
      (5L, 9000L, 1L, "view"), (6L, 700L, 2L, "view"),
      (30L, 2000L, 3L, "purchase"), (31L, 2000L, 3L, "purchase"),
      (7L, 1000L, 3L, "view"), (8L, 2000L, 3L, "view"))
      .toDF("event_id", "us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros($"us")).drop("us")
    val out = EventStreams.asOfTier(mk, EventStreams.tierIntervals(mk))
      .select($"event_id", $"tier").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 2,
      6L -> 0, 30L -> 2, 31L -> 2, 7L -> 0, 8L -> 2), s"got $out")
  }

  test("streaming as-of tier equals the batch join over the fixture") {
    val streamed = EventStreams.runToMemory(
      EventStreams.asOfTier(stream, EventStreams.tierIntervals(batch)),
      "t_asof_tier", mode = org.apache.spark.sql.streaming.OutputMode.Append())
      .select($"event_id", $"tier").as[(Long, Int)].collect().toMap
    val batched = EventStreams
      .asOfTier(batch, EventStreams.tierIntervals(batch))
      .select($"event_id", $"tier").as[(Long, Int)].collect().toMap
    assert(streamed == batched)
    assert(streamed.size == batch.count(), "exactly one row per event")
    assert(streamed.valuesIterator.exists(_ > 0) &&
      streamed.valuesIterator.exists(_ == 0), "both tiers non-vacuous")
  }

  test("stream-static ANTI-join decontamination matches the broadcast form") {
    val docsStream = EventStreams.readDocuments(spark, sf)
    val docsBatch = Tables.documents(spark, sf)
    val benchmark = docsBatch.filter($"source" === "src19")
    val corpus = docsBatch.filter($"source" =!= "src19")
    val clean = EventStreams.runToMemory(
      EventStreams.decontaminatedDocsJoin(docsStream, benchmark, "doc_id", "text")
        .filter($"source" =!= "src19"),
      "t_decontam_join",
      mode = org.apache.spark.sql.streaming.OutputMode.Append())
      .select($"doc_id").as[Long].collect().toSet
    val expected = graft.operators.Dedup
      .contaminationReport(corpus, benchmark, "doc_id", "text")
      .filter(!$"contaminated").select($"doc_id").as[Long].collect().toSet
    assert(clean == expected, "join form must equal the batch report")
    assert(clean.nonEmpty && clean.size < corpus.count())
  }

  test("stream-stream interval join equals the batch join") {
    val streamed = EventStreams.runToMemory(
      EventStreams.purchaseAfterClick(stream), "t_ssjoin",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Double)]
      .collect().toSet
    val clicks = batch.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("click_ts"))
    val purchases = batch.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("purchase_ts"), $"value")
    val batched = purchases.join(clicks,
        $"p_user" === $"c_user" &&
          $"click_ts" <= $"purchase_ts" &&
          $"click_ts" >= $"purchase_ts" - expr("INTERVAL 1 HOUR"))
      .select($"p_user", $"purchase_ts", $"click_ts", $"value")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Double)]
      .collect().toSet
    assert(streamed == batched)
    assert(batched.nonEmpty)
  }

  test("outer stream-stream join: matches + watermark-gated null padding") {
    val streamed = EventStreams.runToMemory(
      EventStreams.purchaseAfterClickOuter(stream), "t_ssjoin_outer",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val matched = streamed.filter($"click_ts".isNotNull)
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Double)].collect().toSet
    val inner = EventStreams.runToMemory(
      EventStreams.purchaseAfterClick(stream), "t_ssjoin_inner2",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Double)].collect().toSet
    assert(matched == inner, "outer join's matched rows == inner join")
    // null-padded rows: exactly the clickless purchases below the
    // ms-floored min-side watermark (max event time - 2h)
    val clicks = batch.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts".as("cts"))
    val purchases = batch.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("purchase_ts"), $"value")
    val wUs = {
      val mc = clicks.agg(max($"cts")).head.getTimestamp(0).getTime // ms
      val mp = purchases.agg(max($"purchase_ts")).head.getTimestamp(0).getTime
      (math.min(mc, mp) - 7200000L) * 1000L
    }
    val expectedNull = purchases
      .join(clicks, $"user_id" === $"cu" && $"cts" <= $"purchase_ts" &&
        $"cts" >= $"purchase_ts" - expr("INTERVAL 1 HOUR"), "left_anti")
      .filter(unix_micros($"purchase_ts") < wUs)
      .select($"user_id", $"purchase_ts", $"value")
      .as[(Long, java.sql.Timestamp, Double)].collect().toSet
    val gotNull = streamed.filter($"click_ts".isNull)
      .select($"user_id", $"purchase_ts", $"purchase_value")
      .as[(Long, java.sql.Timestamp, Double)].collect().toSet
    assert(gotNull == expectedNull)
    assert(gotNull.nonEmpty, "fixture must produce clickless purchases")
  }

  test("full outer stream-stream join: both sides null-pad at their own cutoff") {
    val streamed = EventStreams.runToMemory(
      EventStreams.purchaseAfterClickFull(stream), "t_ssjoin_full",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val matched = streamed.filter($"click_ts".isNotNull && $"purchase_ts".isNotNull)
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Double)].collect().toSet
    val inner = EventStreams.runToMemory(
      EventStreams.purchaseAfterClick(stream), "t_ssjoin_inner3",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Double)].collect().toSet
    assert(matched == inner, "full outer's matched rows == inner join")
    val clicks = batch.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts".as("cts"))
    val purchases = batch.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("purchase_ts"), $"value")
    val wUs = {
      val mc = clicks.agg(max($"cts")).head.getTimestamp(0).getTime // ms
      val mp = purchases.agg(max($"purchase_ts")).head.getTimestamp(0).getTime
      (math.min(mc, mp) - 7200000L) * 1000L
    }
    // purchase-side nulls: same cutoff as the left outer (ts < W)
    val expPNull = purchases
      .join(clicks, $"user_id" === $"cu" && $"cts" <= $"purchase_ts" &&
        $"cts" >= $"purchase_ts" - expr("INTERVAL 1 HOUR"), "left_anti")
      .filter(unix_micros($"purchase_ts") < wUs)
      .select($"user_id", $"purchase_ts", $"value")
      .as[(Long, java.sql.Timestamp, Double)].collect().toSet
    val gotPNull = streamed.filter($"click_ts".isNull)
      .select($"user_id", $"purchase_ts", $"purchase_value")
      .as[(Long, java.sql.Timestamp, Double)].collect().toSet
    assert(gotPNull == expPNull)
    // click-side nulls: the condition-derived cutoff is one join-bound
    // EARLIER (a purchase at W can still reach clicks back to W - 1h)
    val expCNull = clicks
      .join(purchases, $"user_id" === $"cu" && $"cts" <= $"purchase_ts" &&
        $"cts" >= $"purchase_ts" - expr("INTERVAL 1 HOUR"), "left_anti")
      .filter(unix_micros($"cts") < wUs - 3600000000L)
      .select($"cu", $"cts")
      .as[(Long, java.sql.Timestamp)].collect().toSet
    val gotCNull = streamed.filter($"purchase_ts".isNull)
      .select($"user_id", $"click_ts")
      .as[(Long, java.sql.Timestamp)].collect().toSet
    assert(gotCNull == expCNull)
    assert(gotPNull.nonEmpty && gotCNull.nonEmpty,
      "fixture must exercise both null-padding sides")
  }

  test("transformWithState totals equal the mapGroupsWithState totals") {
    val tws = EventStreams.runToMemoryRocksDB(
      EventStreams.runningUserTotalsTws(stream).toDF(), "t_totals_tws")
      .groupBy($"user_id")
      .agg(max(struct($"n", $"total_micro")).as("m"))
      .select($"user_id", $"m.n", $"m.total_micro")
      .as[(Long, Long, Long)].collect().toSet
    val mgws = EventStreams.runToMemory(
      EventStreams.runningUserTotals(stream).toDF(), "t_totals_mgws",
      org.apache.spark.sql.streaming.OutputMode.Update())
      .groupBy($"user_id")
      .agg(max(struct($"n", $"total_micro")).as("m"))
      .select($"user_id", $"m.n", $"m.total_micro")
      .as[(Long, Long, Long)].collect().toSet
    assert(tws == mgws)
    assert(tws.nonEmpty)
  }

  test("mapGroupsWithState running totals equal batch groupBy") {
    val streamed = EventStreams.runToMemory(
      EventStreams.runningUserTotals(stream).toDF(), "t_totals",
      org.apache.spark.sql.streaming.OutputMode.Update())
    // last update per user = final totals (n strictly increases per update)
    val finalTotals = streamed.groupBy($"user_id")
      .agg(max(struct($"n", $"total_micro")).as("m"))
      .select($"user_id", $"m.n", $"m.total_micro")
      .as[(Long, Long, Long)].collect()
      .map { case (u, n, t) => u -> (n, t) }.toMap
    val batched = batch.groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum(floor(lit(1000000.0) * $"value").cast("long")).as("t"))
      .as[(Long, Long, Long)].collect()
      .map { case (u, n, t) => u -> (n, t) }.toMap
    assert(finalTotals == batched)
  }

  test("cdc swap recovers a crash BETWEEN the two renames (old version kept)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_cdc_spec").toString
    val target = s"$root/t"
    Seq((1L, "v1:1"), (2L, "v1:2")).toDF("k", "payload").write.parquet(target)
    // simulate the crash window: rename 1 done (target stepped aside to
    // _old), rename 2 never ran, a torn _tmp is still on disk
    Files.move(Paths.get(target), Paths.get(target + "_old"))
    Files.createDirectories(Paths.get(target + "_tmp"))
    Files.writeString(Paths.get(target + "_tmp/part-torn"), "torn")
    assert(!new java.io.File(target).exists())
    // next merge must restore _old as the current version, then merge
    val srcDir = s"$root/src"
    Seq((2L, "v2:2"), (3L, "v2:3")).toDF("k", "payload").write.parquet(srcDir)
    val src = spark.readStream.schema("k LONG, payload STRING").parquet(srcDir)
    EventStreams.cdcMergeRun(src, target, "k", "payload", s"$root/ck")
    val out = spark.read.parquet(target)
      .as[(Long, String)].collect().toMap
    // k=1 only ever existed in the pre-crash version: its survival IS the
    // "old version recoverable" claim
    assert(out == Map(1L -> "v1:1", 2L -> "v2:2", 3L -> "v2:3"))
    assert(!new java.io.File(target + "_old").exists())
    assert(!new java.io.File(target + "_tmp").exists())
  }

  test("cdc swap clears a stale _old from a crash AFTER rename 2") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_cdc_spec2").toString
    val target = s"$root/t"
    Seq((1L, "v2:1")).toDF("k", "payload").write.parquet(target)
    // stale leftover of a swap that crashed before the final delete —
    // without recovery the next swap's Files.move(target, _old) throws
    // FileAlreadyExistsException
    Files.createDirectories(Paths.get(target + "_old"))
    Files.writeString(Paths.get(target + "_old/part-stale"), "stale")
    val srcDir = s"$root/src"
    Seq((2L, "v3:2")).toDF("k", "payload").write.parquet(srcDir)
    val src = spark.readStream.schema("k LONG, payload STRING").parquet(srcDir)
    EventStreams.cdcMergeRun(src, target, "k", "payload", s"$root/ck")
    val out = spark.read.parquet(target).as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "v2:1", 2L -> "v3:2"))
    assert(!new java.io.File(target + "_old").exists())
  }
}
