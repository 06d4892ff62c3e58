package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Collocations, Dedup, Similarity, Sketches}
import graft.functions.TextFunctions
import graft.sources.Tables

/** Specs for the training-data pipeline operators: dedup correctness
  * (planted duplicates), LSH recall vs brute force, text functions. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf).cache()

  test("exact dedup collapses planted exact duplicates") {
    val planted = docs.limit(5).union(docs.limit(5)) // 5 exact dup pairs
    val out = Dedup.exactDedup(planted, "doc_id", "text")
    assert(out.count() == 5)
    val groups = Dedup.exactGroups(planted, "doc_id", "text")
    assert(groups.filter($"n_copies" === 2).count() == 5)
  }

  test("minhash candidates recover high-jaccard planted near-dups") {
    // ground truth: pairs with exact jaccard >= 0.5
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture should contain near-dup pairs")
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
      .select("a", "b").as[(Long, Long)].collect().toSet
    val recall = truth.count(cand.contains).toDouble / truth.size
    assert(recall >= 0.9, s"LSH recall $recall over ${truth.size} true pairs")
  }

  test("line dedup keeps the corpus-first copy of each line, rebuilds docs") {
    val corpus = Seq(
      (1L, "unique alpha\nshared boilerplate\nunique beta"),
      (2L, "shared boilerplate\nunique gamma"),
      (3L, "Shared  Boilerplate\nunique delta"), // normalized duplicate
      (4L, "shared boilerplate")                 // nothing survives
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(corpus, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L)._1 == 3 && out(1L)._2 == 0) // first occurrence keeps all
    assert(out(2L)._1 == 1 && out(2L)._2 == 1)
    assert(out(3L)._1 == 1 && out(3L)._2 == 1) // case/space-normalized match
    assert(out(4L)._1 == 0 && out(4L)._2 == 1) // fully-boilerplate doc empties
    // doc 2's surviving text is exactly "unique gamma"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("unique gamma".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(2L)._3 == md)
  }

  test("boilerplate strip drops per-source majority lines, ALL copies") {
    val corpus = Seq(
      // srcA (3 docs): "header a" in all 3 (dropped, every copy);
      // "semi a" in 2 of 3 (majority -> dropped); bodies unique (kept)
      (1L, "A", "header a\nbody one\nsemi a"),
      (2L, "A", "header a\nsemi a\nbody two"),
      (3L, "A", "header a\nbody three"),
      // srcB (2 docs): "header a" appears in ONE of 2 -> not a majority
      // there (2*1 > 2 is false) -> kept in srcB even though it is
      // boilerplate in srcA: the threshold is per source
      (4L, "B", "header a\nbody four"),
      (5L, "B", "body five")
    ).toDF("doc_id", "source", "text")
    val out = Dedup.boilerplateStrip(corpus, "doc_id", "source", "text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L)._1 == 1 && out(1L)._2 == 2) // header + semi dropped
    assert(out(2L)._1 == 1 && out(2L)._2 == 2)
    assert(out(3L)._1 == 1 && out(3L)._2 == 1) // header dropped, no semi
    assert(out(4L)._1 == 2 && out(4L)._2 == 0) // srcB: header survives
    assert(out(5L)._1 == 1 && out(5L)._2 == 0)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("body one".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L)._3 == md) // first copy does NOT survive, unlike lineDedup
  }

  test("contamination report flags exactly the docs sharing benchmark shingles") {
    val corpus = Seq(
      (1L, "aa bb cc dd"),      // shares shingle "bb cc dd" with benchmark
      (2L, "xx yy zz ww"),      // disjoint
      (3L, "short")             // short-doc whole-text shingle, disjoint
    ).toDF("doc_id", "text")
    val benchmark = Seq((100L, "bb cc dd ee")).toDF("doc_id", "text")
    val out = Dedup.contaminationReport(corpus, benchmark, "doc_id", "text")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((1L, true)))
    assert(out(2L) == ((0L, false)))
    assert(out(3L) == ((0L, false)))
  }

  test("duplicate-ngram coverage counts positions inside repeated trigrams") {
    val corpus = Seq(
      (1L, "a b c a b c"), // "a b c" at 0 and 3: all 6 positions covered
      (2L, "x y z w"),     // 2 distinct trigrams, none repeated
      (3L, "q r")          // short doc: no trigrams
    ).toDF("doc_id", "text")
    val out = Dedup.dupShingleCoverage(corpus, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((6L, 6L, 1000L)))
    assert(out(2L) == ((4L, 0L, 0L)))
    assert(out(3L) == ((2L, 0L, 0L)))
  }

  test("substring contamination detects exactly at the guarantee length") {
    // windowLen 8, stride 4: guaranteed detection for shared runs of
    // >= 8 + 4 - 1 = 11 chars. Use distinct alphabets so no accidental
    // window matches.
    val shared11 = "QWERTYUIOPA"        // 11 chars, guaranteed
    val bench = Seq((100L, s"zz $shared11 zz")).toDF("doc_id", "text")
    val corpus = Seq(
      // guarantee-length run embedded at an arbitrary offset
      (1L, s"abcdefgh $shared11 ijklmnop"),
      // disjoint text of ample length
      (2L, "0123456789 0123456789 0123456789"),
      // shorter than one window: zero windows, clean
      (3L, "tiny")
    ).toDF("doc_id", "text")
    val out = Dedup.substringContamination(corpus, bench, "doc_id", "text",
        windowLen = 8, corpusStride = 4)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L)._3, "guarantee-length shared run must flag")
    assert(out(1L)._2 >= 1)
    assert(out(2L) == ((7L, 0L, false)))
    assert(out(3L) == ((0L, 0L, false)))
    // a run one char short of the guarantee CAN evade the stride: a
    // 10-char run at offset 6 has valid window starts {6,7,8}, while the
    // stride-4 grid hits 1 and 5 only (len 15 -> last start 8) — no
    // corpus window falls fully inside the run
    val corpus2 = Seq((4L, s"abcde${shared11.take(10)}")).toDF("doc_id", "text")
    val miss = Dedup.substringContamination(corpus2, bench, "doc_id", "text",
        windowLen = 8, corpusStride = 4)
      .as[(Long, Long, Long, Boolean)].collect().head
    assert(!miss._4, "sub-guarantee run at a misaligned offset evades stride")
  }

  test("int8 quantization: identical vectors share codes, error within step") {
    import graft.operators.Similarity
    val vecs = Seq(
      (1L, Array(0.0, 10.0, -5.0)),
      (2L, Array(0.0, 10.0, -5.0)), // exact duplicate of 1
      (3L, Array(1.0, 0.0, 5.0)),
      (4L, Array(0.5, 5.0, 0.0))
    ).toDF("id", "vec")
    val out = Similarity.quantizeInt8(vecs)
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.values.forall(_._1 == 3L), "all dims quantized")
    assert(out(1L)._2 == out(2L)._2, "identical vectors must share the fingerprint")
    assert(out(1L)._2 != out(3L)._2, "distinct vectors must differ")
    // reconstruction error bound: |v - dequant(q)| <= (mx - mn) / 255
    val el = vecs.select($"id", posexplode($"vec").as(Seq("i", "v")))
    val stats = el.groupBy($"i").agg(min($"v").as("mn"), max($"v").as("mx"))
    val err = el.join(stats, "i")
      .withColumn("q", when($"mx" === $"mn", lit(0))
        .otherwise(least(floor(($"v" - $"mn") * 255.0 / ($"mx" - $"mn")), lit(255L)).cast("int")))
      .withColumn("deq", $"mn" + $"q" * ($"mx" - $"mn") / 255.0)
      .withColumn("step", ($"mx" - $"mn") / 255.0)
      .filter(abs($"v" - $"deq") > $"step" * 1.000001)
    assert(err.isEmpty, "dequantized values must sit within one step of the input")
  }

  test("seqPack assigns every doc once, bounds bin load by ctx + longest doc") {
    import graft.operators.Sampling
    val lens = (1 to 400).map(i => (i.toLong, 20L + (i * 37) % 300))
      .toDF("doc_id", "n_tokens")
    val ctx = 512L
    val packed = Sampling.seqPack(lens, "doc_id", "n_tokens", ctx, groups = 4)
      .as[(Long, Long, Long)].collect()
    assert(packed.length == 400 && packed.map(_._1).distinct.length == 400)
    val maxDoc = packed.map(_._2).max
    val binLoads = packed.groupBy(_._3).map { case (_, ds) => ds.map(_._2).sum }
    assert(binLoads.forall(_ <= ctx + maxDoc),
      s"LPT round-robin bound violated: max=${binLoads.max} ctx=$ctx maxDoc=$maxDoc")
    // deterministic under repartition
    val packed2 = Sampling.seqPack(lens.repartition(13), "doc_id", "n_tokens",
      ctx, groups = 4).as[(Long, Long, Long)].collect()
    assert(packed.sortBy(_._1).toSeq == packed2.sortBy(_._1).toSeq)
  }

  test("binary-sign ANN: packing hand-checked, orthant fixture exact") {
    import graft.operators.Similarity
    // packing: all-positive first half, all-negative second half
    val one = Seq((0L, Seq.fill(32)(1.0) ++ Seq.fill(32)(-1.0)))
      .toDF("id", "vec")
    val code = Similarity.binarySignCodes(one, 64)
      .select($"blo", $"bhi").as[(Long, Long)].head()
    assert(code == ((0xFFFFFFFFL, 0L)), s"got $code")
    // two opposite orthants: binary codes separate them perfectly, so
    // the Hamming shortlist is the query's own cluster and the rerank
    // recovers the EXACT micro top-5 (n_hits = 5 everywhere)
    val vecs = ((0L until 20L).map { i =>
      (i, (0 until 64).map(j => if (j < 32) 1.0 + 0.01 * ((i + j) % 7)
                                else -1.0 - 0.01 * ((i * 3 + j) % 5)).toSeq)
    } ++ (100L until 120L).map { i =>
      (i, (0 until 64).map(j => if (j < 32) -1.0 - 0.01 * ((i + j) % 7)
                                else 1.0 + 0.01 * ((i * 5 + j) % 5)).toSeq)
    }).toDF("id", "vec")
    val queries = vecs.filter($"id" === 3L || $"id" === 105L)
    val out = Similarity.binaryTopK(vecs, queries, 5)
      .as[(Long, Long, Int, Long, Int, Long)].collect()
    assert(out.length == 10)
    assert(out.forall(_._6 == 5L), s"orthant recall must be exact: ${out.toSeq}")
    // no cross-orthant neighbor can enter a top-5
    assert(out.forall(r => (r._1 < 100L) == (r._2 < 100L)))
    // in-cluster hamming strictly below the cross-cluster floor (64)
    assert(out.forall(_._3 < 32))
  }

  test("cluster-safe split: whole dup components share one split") {
    import graft.operators.{Dedup, Sampling}
    // planted components {1,2,3} (chain) and {10,11}; 20 is unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val rep = Dedup.ccComponentRep(pairs)
      .as[(Long, Long)].collect().toMap
    assert(rep == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val docsF = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val out = docsF
      .join(rep.toSeq.toDF("doc_id", "rep"), Seq("doc_id"), "left")
      .withColumn("rep", coalesce($"rep", $"doc_id"))
      .withColumn("split", Sampling.splitColumn($"rep", 0.3, 0.3))
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // the invariant the op exists for: one split value per component
    assert(Set(1L, 2L, 3L).map(out(_)._3).size == 1)
    assert(Set(10L, 11L).map(out(_)._3).size == 1)
    assert(out(20L)._2 == 20L)
  }

  test("packMaterialize: doc_id order, eos terminators, exact truncation") {
    import graft.operators.Sampling
    val docsF = Seq((1L, "a b c"), (2L, "d e"), (3L, ""))
      .toDF("doc_id", "text")
    // one group, 5 doc tokens -> a single bin; assembly in doc_id order
    // with per-doc eos: "a b c <eos> d e <eos> <eos>" (8 raw), cut at 6
    val out = Sampling.packMaterialize(docsF, "doc_id", "text",
        ctxLen = 6, groups = 1)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r._2 == 3L && r._3 == 8L && r._4 == 2L, s"got $r")
    assert(r._5 == "a b c <eos> d e", s"got '${r._5}'")
    // partition invariance rides seqPack's; assembly must also hold
    val again = Sampling.packMaterialize(docsF.repartition(5), "doc_id",
      "text", ctxLen = 6, groups = 1)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(again.toSeq == out.toSeq)
  }

  test("curriculumOrder: bands strictly ordered, dense within") {
    import graft.operators.Sampling
    val rows = ((0L until 100L).map(i => (i, 1)) ++
      (100L until 250L).map(i => (i, 2)) ++
      (250L until 300L).map(i => (i, 3))).toDF("key", "band")
    val out = Sampling.curriculumOrder(rows, "key", "band", 1)
      .select($"key", $"band", $"cur_pos").as[(Long, Int, Long)].collect()
    assert(out.length == 300)
    assert(out.map(_._3).sorted.toSeq == (1L to 300L), "dense 1..n")
    // every band-1 position precedes every band-2 position, etc.
    val byBand = out.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    assert(byBand(1).max < byBand(2).min && byBand(2).max < byBand(3).min)
    // within a band the order is a hash shuffle, not key order
    assert(byBand(1).toSeq != byBand(1).sorted.toSeq ||
      out.filter(_._2 == 1).sortBy(_._3).map(_._1).toSeq != (0L until 100L))
    // partition invariance
    val again = Sampling.curriculumOrder(rows.repartition(11), "key", "band", 1)
      .select($"key", $"band", $"cur_pos").as[(Long, Int, Long)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("epochOrder: dense permutation, partition-invariant, epoch-distinct") {
    import graft.operators.Sampling
    val bins = (0L until 300L).map(i => (i, 400L + i % 100))
      .toDF("pack_id", "total_tokens")
    val e1 = Sampling.epochOrder(bins, "pack_id", 1)
      .select($"pack_id", $"epoch_pos").as[(Long, Long)].collect()
    // dense 1..n permutation
    assert(e1.length == 300 && e1.map(_._2).sorted.toSeq == (1L to 300L))
    // invariant under input partitioning (the determinism contract)
    val e1b = Sampling.epochOrder(bins.repartition(17), "pack_id", 1)
      .select($"pack_id", $"epoch_pos").as[(Long, Long)].collect()
    assert(e1.sortBy(_._1).toSeq == e1b.sortBy(_._1).toSeq)
    // a different epoch is a genuinely different permutation
    val e2 = Sampling.epochOrder(bins, "pack_id", 2)
      .select($"pack_id", $"epoch_pos").as[(Long, Long)].collect()
    assert(e2.map(_._2).sorted.toSeq == (1L to 300L))
    assert(e1.sortBy(_._1).map(_._2).toSeq != e2.sortBy(_._1).map(_._2).toSeq)
    // ...and not the identity (hash order really interleaves)
    assert(e1.sortBy(_._1).map(_._2).toSeq != (1L to 300L))
  }

  test("surprisal ranks rare-token docs above common-token docs") {
    // 10 docs of a shared phrase + 1 doc of tokens seen nowhere else:
    // the unique-token doc must carry the highest mean surprisal, the
    // repeated docs identical (and lower) scores
    val corpus = ((1 to 10).map(i => (i.toLong, "the quick brown fox")) :+
      (99L, "zyzzyva qoph xylyl")).toDF("doc_id", "text")
    val out = TextFunctions.surprisalStats(corpus, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(out(99L) > out(1L), "rare tokens must score higher")
    assert((1 to 10).map(i => out(i.toLong)).toSet.size == 1,
      "identical docs must score identically")
    // n_total = 43? no: 10*4 + 3 tokens; unique tokens have cnt=1 so each
    // term is exactly round(ln(43)*1e6) micro-nats
    val nTotal = 43L
    val expected = math.round(math.log(nTotal.toDouble) * 1e6)
    assert(out(99L) == expected, s"cnt=1 tokens: mean == ln(N) micro-nats")
  }

  test("bigram surprisal: predictable continuations score zero, novel ones positive") {
    // "a b" always continues the same way in docs 1-3 (P(b|a)=1 ⇒ 0 nats);
    // doc 4's "a c" is the 1-of-4 continuation of context "a"
    val corpus = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a b"),
      (4L, "a c"),
      (5L, "solo") // no bigrams
    ).toDF("doc_id", "text")
    val out = TextFunctions.bigramSurprisalStats(corpus, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // ctx "a" occurs 4 times; "a b" 3 of them, "a c" once
    val l = (x: Double) => math.round(math.log(x) * 1e6)
    assert(out(1L) == ((1L, l(4) - l(3))))
    assert(out(4L) == ((1L, l(4) - l(1))))
    assert(out(4L)._2 > out(1L)._2, "rarer continuation must be more surprising")
    assert(out(5L) == ((0L, 0L)), "bigram-free docs score zero")
  }

  test("count-min estimates dominate true counts; collisions overestimate only") {
    // vocabulary (2000) > sketch width (512) forces bucket collisions, so
    // the one-sided error property is exercised, not vacuous
    val items = (0 until 20000).map(i => s"item_${i % 2000}").toDF("item")
    val sketch = Sketches.cmsBuild(items, "item")
    val rows = sketch.agg(count(lit(1)), sum($"cnt")).as[(Long, Long)].head()
    assert(rows._1 <= Sketches.CmsDepth.toLong * Sketches.CmsWidth,
      "sketch must stay within depth x width cells")
    assert(rows._2 == 20000L * Sketches.CmsDepth, "cells must conserve total mass")
    val truth = items.groupBy("item").agg(count(lit(1)).as("true_cnt"))
    val est = Sketches.cmsEstimate(sketch, items, "item")
    val checked = truth.join(est, truth("item") === est("item"))
      .select(truth("item"), $"true_cnt", $"est")
      .as[(String, Long, Long)].collect()
    assert(checked.length == 2000)
    assert(checked.forall { case (_, t, e) => e >= t }, "CMS never underestimates")
    assert(checked.exists { case (_, t, e) => e > t },
      "with vocab > width some bucket must collide")
    // CMS bound: overestimate ≤ total/width per row w.h.p.; depth rows of
    // independent hashes make the min far tighter — generous 3x margin
    val bound = 3L * 20000L / Sketches.CmsWidth
    assert(checked.forall { case (_, t, e) => e - t <= bound },
      s"overestimate must stay within ~${bound}")
  }

  test("bloom filter has no false negatives and a small false-positive rate") {
    val trainItems = (0 until 300).map(i => s"member_$i").toDF("v")
    val bits = Sketches.bloomBits(trainItems, "v").cache()
    assert(bits.count() <= Sketches.BloomBits)
    val probes = ((0 until 300).map(i => s"member_$i") ++
      (0 until 1000).map(i => s"outsider_$i")).toDF("v")
    val out = Sketches.bloomMayContain(bits, probes, "v")
      .as[(String, Boolean)].collect().toMap
    assert((0 until 300).forall(i => out(s"member_$i")),
      "members must always report maybe=true (no false negatives)")
    val fp = (0 until 1000).count(i => out(s"outsider_$i"))
    assert(fp.toDouble / 1000 <= 0.10, s"false-positive rate too high: $fp/1000")
    bits.unpersist()
  }

  test("bloom shard merge ORs into exactly the full filter; union keeps no false negatives") {
    val a = (0 until 200).map(i => s"left_$i").toDF("v")
    val b = (0 until 200).map(i => s"right_$i").toDF("v")
    val merged = Sketches.bloomMerge(
      Sketches.bloomBits(a, "v"), Sketches.bloomBits(b, "v")).cache()
    val full = Sketches.bloomBits(a.union(b), "v")
    // merge(bits(A), bits(B)) == bits(A ∪ B) exactly, both directions
    assert(merged.except(full).isEmpty && full.except(merged).isEmpty,
      "merged bit set must equal the full-build bit set")
    // the merged filter still answers for members of BOTH shards
    val out = Sketches.bloomMayContain(merged, a.union(b), "v")
      .as[(String, Boolean)].collect()
    assert(out.length == 400 && out.forall(_._2),
      "no false negatives over the union after merge")
    merged.unpersist()
  }

  test("sampled quantile sketch: full-rate path is exact; sampled path gates rank error") {
    val df = (1 to 1000).map(i => (i.toLong, i.toLong)).toDF("k", "v")
    // rate 1.0 = the sample IS the data: estimates are the exact
    // interpolated quantiles and every rank error is 0 or the div floor
    val exact = Sketches.sampledQuantiles(df, $"k", $"v", 1.0,
      Seq(250, 500, 750)).orderBy("q_milli")
      .as[(Long, Double, Long, Long, Long, Long)].collect()
    assert(exact.map(_._1).toSeq == Seq(250L, 500L, 750L))
    // percentile of 1..1000 at q: 1 + q*(999)
    assert(exact(0)._2 == 1.0 + 0.25 * 999)
    assert(exact(1)._2 == 1.0 + 0.5 * 999)
    assert(exact.forall(_._3 == 1000L), "full-rate n_sample = n")
    assert(exact.forall(_._6 <= 1L), "full-rate rank error bounded by floor slack")
    // an eighth-rate sample still lands within a loose rank band
    val s = Sketches.sampledQuantiles(df, $"k", $"v", 0.125, Seq(500))
      .as[(Long, Double, Long, Long, Long, Long)].head()
    assert(s._3 > 0 && s._3 < 1000, "sample must be a strict subset")
    assert(s._6 <= 150, s"eighth-rate median rank error too large: ${s._6}")
  }

  test("minhash est_sim correlates with exact jaccard on dup pairs") {
    val est = Dedup.minhashCandidates(docs, "doc_id", "text")
      .filter($"est_sim" >= 0.5)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.3)
    val joined = est.join(exact, Seq("a", "b"))
    assert(joined.count() > 0)
  }

  test("near-dup pipeline keeps exactly the min id per duplicate cluster") {
    val out = Dedup.nearDupSurvivors(docs, "doc_id", "text", 0.5)
      .select($"doc_id").as[Long].collect().toSet
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .filter($"est_sim" >= 0.5).select("a", "b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture has near-dup pairs")
    // union-find oracle: expected survivors = min of each transitive cluster
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val clusters = pairs.flatMap(p => Seq(p._1, p._2)).distinct.groupBy(find)
    val expectedVictims = clusters.values.flatMap(c => c.sorted.tail).toSet
    val all = docs.select($"doc_id").as[Long].collect().toSet
    assert(out == all -- expectedVictims)
  }

  test("incremental dedup drops index matches, then dedups the remainder") {
    val indexed = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val delta = Seq(
      // exact dup of an indexed doc -> dropped by the cross pass
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "completely different content about vectorized execution engines"),
      // internal dup of 101 -> min id 101 survives
      (102L, "completely different content about vectorized execution engines"),
      (103L, "a third unrelated document mentioning graph analytics at scale"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalSurvivors(indexed, delta, "doc_id", "text", 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(out == Set(101L, 103L), s"got $out")
    // the index side is never deduped against itself: an index-only dup
    // pair must not affect the delta's survivors
    val indexed2 = indexed.union(
      Seq((2L, "the quick brown fox jumps over the lazy dog again and again"))
        .toDF("doc_id", "text"))
    val out2 = Dedup.incrementalSurvivors(indexed2, delta, "doc_id", "text", 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(out2 == out, s"index self-dups must be irrelevant: $out2")
  }

  test("nearDupSurvivors fails fast on non-integral id columns") {
    // string ids would silently cast to null downstream (no dedup at all)
    val bad = Seq(("a", "one two three"), ("b", "four five six"))
      .toDF("doc_id", "text")
    assertThrows[IllegalArgumentException](
      Dedup.nearDupSurvivors(bad, "doc_id", "text"))
  }

  test("simhash: identical docs share signatures; near-dups are close") {
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    // identical text must produce identical signature (determinism)
    val sigs2 = Dedup.simhashSignatures(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sigs == sigs2)
    assert(sigs.size == docs.count())
  }

  test("per-row simhash projection equals the explode+groupBy signatures") {
    val viaAgg = Dedup.simhashSignatures(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val viaRow = Dedup.withSimhash(docs.select($"doc_id", $"text"), "text")
      .select($"doc_id", $"simhash").as[(Long, Long)].collect().toMap
    assert(viaRow == viaAgg)
  }

  test("oodDriftHist: on-centroid queries bucket at 1.0, drift shifts low") {
    val cells = Seq((0, Seq(1.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0)))
      .toDF("cell", "centroid")
    val q = Seq(
      ("base", 1L, Seq(1.0, 0.0, 0.0)),   // IS centroid 0 -> best 1.0
      ("base", 2L, Seq(0.8, 0.6, 0.0)),   // cos 0.8 to centroid 0
      ("ood", 3L, Seq(0.0, 0.0, 1.0))     // orthogonal to both -> 0.0
    ).toDF("grp", "id", "vec")
    val out = Similarity.oodDriftHist(q, cells)
      .as[(String, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("base", 10)) == ((1L, 10000L)), s"got $out") // exact 1.0
    assert(out(("base", 8)) == ((1L, 8000L)))
    assert(out(("ood", 0)) == ((1L, 0L)))
  }

  test("LSH ANN achieves high recall@10 vs brute force") {
    val corpus = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
      .cache()
    val queries = corpus.filter($"id" < 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.5, s"multi-probe LSH recall@10 = $recall")
  }

  test("LSH ANN works on a non-64-dim corpus (dim inferred from data)") {
    // 7-dim synthetic vectors: two tight clusters + noise
    val vecs = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) Array(1.0, 0.2, 0.1, 0.0, 0.3, 0.1, 0.0)
                 else Array(0.0, 0.1, 0.9, 0.4, 0.0, 0.2, 0.8)
      (i, base.zipWithIndex.map { case (v, j) => v + 0.01 * ((i + j) % 5) }.toSeq)
    }.toDF("id", "vec")
    val queries = vecs.filter($"id" < 4)
    val exact = Similarity.bruteForceTopK(vecs, queries, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(vecs, queries, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.5, s"7-dim LSH recall@5 = $recall")
  }

  test("LSH ANN on an empty query set returns empty, not an error") {
    val corpus = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
    val none = corpus.filter($"id" < 0) // nothing matches
    assert(Similarity.lshTopK(corpus, none, 10).isEmpty)
  }

  test("graph-beam ANN navigates to the exact neighbors within a cluster") {
    // two well-separated 4-d clusters; the deterministic entry (min id 0)
    // sits in cluster A with the queries, so the kNN graph restricted to
    // A is connected and 3 beam rounds must recover the EXACT top-5
    val vecs = ((0L until 20L).map { i =>
      (i, Seq(1.0, 0.1 + 0.01 * (i % 7), 0.02 * (i % 5), 0.0))
    } ++ (100L until 120L).map { i =>
      (i, Seq(0.0, 0.02 * (i % 5), 0.1 + 0.01 * (i % 7), 1.0))
    }).toDF("id", "vec")
    val queries = vecs.filter($"id" === 5L || $"id" === 11L)
    // EXACT graph build pinned explicitly: random low-dim micro-fixtures
    // are the degenerate case for the default LSH-banded build (too few
    // vectors per band), and this test is about the WALK, not the build
    val beam = Similarity.beamSearchTopK(vecs, queries, 5,
        prebuiltEdges = Some(Similarity.exactKnnEdges(vecs)))
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    val exact = Similarity.exactTopKMicro(vecs, queries, 5)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(beam == exact, "beam search must equal the micro-exact top-5 in-cluster")
    assert(beam.forall(_._2 < 20L), "no cross-cluster neighbor can enter the top-5")
    // recall on the real embedding corpus, driver-query shape (id%5
    // subsample): random high-dim fixtures are the adversarial case for
    // graph navigation, and the default (graphK, ef, rounds) still land
    // ≥0.9 here — the driver query hash-pins the exact per-query value
    val corpus = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
      .filter($"id" % 5 === 0)
      .cache()
    val cq = corpus.filter($"id" < 50)
    val ex = Similarity.exactTopKMicro(corpus, cq, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val bm = Similarity.beamSearchTopK(corpus, cq, 10,
        prebuiltEdges = Some(Similarity.exactKnnEdges(corpus)))
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = ex.count(bm.contains).toDouble / ex.size
    assert(recall >= 0.9, s"graph-beam recall@10 = $recall")
    // the DEFAULT (LSH-banded) graph build: approximate edges where the
    // true neighbor shares no band — recall degrades gracefully even on
    // this adversarial random high-dim fixture
    val bmLsh = Similarity.beamSearchTopK(corpus, cq, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recallLsh = ex.count(bmLsh.contains).toDouble / ex.size
    assert(recallLsh >= 0.7, s"LSH-default graph-beam recall@10 = $recallLsh")
  }

  test("HNSW descent matches flat NSW recall at equal beam width and skips empty layers") {
    val corpus = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
      .filter($"id" % 5 === 0)
      .cache()
    val cq = corpus.filter($"id" < 50)
    val ex = Similarity.exactTopKMicro(corpus, cq, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val base = Similarity.exactKnnEdges(corpus)
    def upper(l: Int) = Similarity.exactKnnEdges(
      corpus.filter(Similarity.hnswMember($"id", l)), 4)
    val hn = Similarity.hnswTopK(corpus, cq, 10,
        prebuiltBase = Some(base), prebuiltUpper = Some(upper))
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val flat = Similarity.beamSearchTopK(corpus, cq, 10,
        prebuiltEdges = Some(base))
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val rH = ex.count(hn.contains).toDouble / ex.size
    val rF = ex.count(flat.contains).toDouble / ex.size
    assert(rH >= rF,
      s"hierarchical recall $rH must be >= flat $rF at equal beam width")
    assert(rH >= 0.9, s"HNSW recall@10 = $rH")
    // EMPTY upper layers (levelMod so large no fixture id is a member —
    // verified offline by the md5 replay): descent skips every layer and
    // the search must degrade to EXACTLY the flat walk from the default
    // entry, not throw or diverge
    val deep = Similarity.hnswTopK(corpus, cq, 10, levelMod = 1000000,
        prebuiltBase = Some(base), prebuiltUpper = Some(upper))
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(deep == flat, "all-layers-empty HNSW must equal flat NSW exactly")
  }

  test("LSH hard negatives are all cross-label and recall the exact miner") {
    val withLbl = Tables.embeddings(spark, sf).select($"vec_id".as("id"),
      $"embedding".cast("array<double>").as("vec"), $"label")
    val q = withLbl.filter($"id" < 10)
    val res = Similarity.lshHardNegatives(withLbl, q, 10).cache()
    val ql = q.select($"id".as("query_id"), $"label".as("q_label"))
    assert(res.join(ql, "query_id").filter($"neg_label" === $"q_label")
      .count() == 0, "every mined negative must be cross-label")
    assert(res.groupBy("query_id").count().filter($"count" > 10).isEmpty)
    // recall vs the exact cross-label miner: same LSH floor as lshTopK
    val qv = q.select($"id".as("query_id"), $"vec".as("qv"),
      Similarity.norm($"vec").as("qn"), $"label".as("q_label"))
    val exact = withLbl.select($"id".as("vec_id"), $"vec",
        Similarity.norm($"vec").as("cn"), $"label".as("neg_label"))
      .crossJoin(broadcast(qv))
      .filter($"vec_id" =!= $"query_id" && $"neg_label" =!= $"q_label")
      .select($"query_id", $"vec_id",
        floor(lit(1000000.0) * (Similarity.dot($"qv", $"vec") /
          ($"qn" * $"cn"))).cast("long").as("cos_micro"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id")
          .orderBy($"cos_micro".desc, $"vec_id")))
      .filter($"rank" <= 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = res.select("query_id", "vec_id")
      .as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.5, s"LSH hard-negative recall@10 = $recall")
  }

  test("zipf fit reads -1 on a planted 1/rank vocabulary and near 0 on a flat one") {
    val zipf = (1 to 100).map(r => (f"t$r%03d", math.max(1000L / r, 1L)))
      .toDF("token", "cnt")
    val z = TextFunctions.zipfFit(zipf).as[(Long, Long, Long)].head()
    assert(z._1 == 100L)
    assert(z._2 > -1150000L && z._2 < -900000L,
      s"planted 1/rank corpus must fit slope ~ -1, got ${z._2}")
    assert(z._3 < -980000L, s"fit must be near-perfectly correlated, got ${z._3}")
    val flat = (1 to 100).map(r => (f"u$r%03d", 500L + (r % 3)))
      .toDF("token", "cnt")
    val f = TextFunctions.zipfFit(flat).as[(Long, Long, Long)].head()
    assert(math.abs(f._2) < 20000L,
      s"near-uniform corpus must read near-zero slope, got ${f._2}")
  }

  test("weighted hash sampling keeps saturated rows always and light rows in proportion") {
    import graft.operators.Sampling
    val rows = (0L until 2000L).map(i => (i, if (i < 1000) 100L else 500L))
      .toDF("k", "w")
    val kept = Sampling.weightedHashSample(rows, $"k", $"w", 500L)
      .as[(Long, Long)].collect()
    val keptSet = kept.map(_._1).toSet
    assert((1000L until 2000L).forall(keptSet.contains),
      "rows at or above the cap must always be kept")
    val light = kept.count(_._2 == 100L)
    // keep probability 100/500 = 0.2 over 1000 light rows; generous band
    assert(light > 120 && light < 280, s"light-row keep count $light outside band")
    // membership is a pure row predicate: partitioning cannot change it
    val repart = Sampling.weightedHashSample(rows.repartition(13), $"k", $"w", 500L)
      .select($"k").as[Long].collect().toSet
    assert(repart == keptSet)
  }

  test("JL projection distortion is bounded and shrinks as dims grow") {
    val corpus = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
      .cache()
    val queries = corpus.filter($"id" < 10)
    // projected vectors have exactly outDims components
    val pdim = Similarity.jlProject(corpus, 64, 16)
      .select(size($"vec")).as[Int].head()
    assert(pdim == 16)
    // mean |Δcos| over all (query, corpus) pairs, per outDims — the JL
    // lemma's concentration: more dims, less distortion
    def meanDist(outDims: Int): Double = {
      val f = Similarity.scoredMicro(corpus, queries)
      val p = Similarity.scoredMicro(
        Similarity.jlProject(corpus, 64, outDims),
        Similarity.jlProject(queries, 64, outDims))
        .withColumnRenamed("cos_micro", "cos_proj")
      f.join(p, Seq("query_id", "vec_id"))
        .agg(avg(abs($"cos_micro" - $"cos_proj"))).as[Double].head()
    }
    val d16 = meanDist(16)
    val d48 = meanDist(48)
    assert(d16 < 400000, s"16-dim mean distortion $d16 out of band")
    assert(d48 < d16, s"distortion must shrink with dims: 48d $d48 vs 16d $d16")
    // determinism: a second projection is bit-identical
    val p1 = Similarity.jlProject(corpus, 64, 16).orderBy("id")
      .as[(Long, Seq[Double])].collect()
    val p2 = Similarity.jlProject(corpus, 64, 16).orderBy("id")
      .as[(Long, Seq[Double])].collect()
    assert(p1.sameElements(p2))
  }

  test("SQ8 dequantized search recovers the float ranking almost exactly") {
    val corpus = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
      .cache()
    val queries = corpus.filter($"id" < 10)
    val exact = Similarity.exactTopKMicro(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val sq = Similarity.sqTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(sq.contains).toDouble / exact.size
    assert(recall >= 0.9, s"SQ8 recall@10 = $recall (8-bit error is tiny at 64 dims)")
    // codes+stats fully determine the result: a repartitioned corpus
    // produces the identical ranking
    val sq2 = Similarity.sqTopK(corpus.repartition(7), queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(sq2 == sq)
  }

  test("MIPS: norm-augmentation reduces dot ranking to cosine ranking") {
    val corpus = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
      .cache()
    val queries = corpus.filter($"id" < 5)
    val mips = Similarity.mipsTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // Shrivastava-Li: append sqrt(M^2 - |x|^2) to corpus vectors and 0 to
    // queries -> cos(q', x') = dot(q, x) / (|q|·M), strictly monotone in
    // the dot, so any cosine index answers MIPS
    val m2 = corpus
      .select(aggregate($"vec", lit(0.0), (a, x) => a + x * x).as("n2"))
      .agg(max($"n2")).as[Double].head()
    val aug = corpus.select($"id",
      concat($"vec", array(sqrt(lit(m2) -
        aggregate($"vec", lit(0.0), (a, x) => a + x * x)))).as("vec"))
    val qaug = queries.select($"id", concat($"vec", array(lit(0.0))).as("vec"))
    val viaCos = Similarity.exactTopKMicro(aug, qaug, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(mips.keySet == viaCos.keySet)
    mips.keySet.foreach { q =>
      val overlap = (mips(q) & viaCos(q)).size
      assert(overlap >= 9, s"query $q: reduction diverged, overlap $overlap/10")
    }
  }

  test("CSV round-trip preserves quotes, commas, newlines and null-vs-empty") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("txt", StringType)))
    val rows = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "she said \"hi\""),
      (4L, "line one\nline two"),
      (5L, ""),                        // empty string, NOT null
      (6L, null.asInstanceOf[String])) // null, NOT empty
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2))), schema)
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv_spec").toString
    graft.sources.Export.csvShards(df, "id", tmp, 10, compression = "none")
    val back = graft.sources.Export.readCsv(spark, tmp, schema)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .sortBy(_._1).toSeq
    assert(back == rows.sortBy(_._1).toSeq)
  }

  test("editOneNeighborCounts: substitutions and indels match, ed-2 never") {
    val df = Seq("abc", "abd", "abcd", "xyz", "acbd").toDF("n")
    // abc~abd (sub), abc~abcd (ins), abd~abcd (ins), abd~acbd (ins) —
    // abcd~acbd is a TRANSPOSITION (ed 2) that still shares deletion
    // variants ("abd", "acd"), so it reaches the candidate set and must
    // be dropped by the exact levenshtein verify
    val out = Dedup.editOneNeighborCounts(df, $"n")
      .as[(String, Long)].collect().toMap
    assert(out == Map("abc" -> 2L, "abd" -> 3L, "abcd" -> 2L, "acbd" -> 1L))
    assert(!out.contains("xyz"))
  }

  test("lshTuningCurve: exact dups are always candidates, disjoint never") {
    // ids multiples of 20 so the sampleMod=20 filter keeps everything:
    // 20/40 are exact duplicates (jaccard 1), 60 shares nothing
    val docs = Seq(
      (20L, "alpha beta gamma delta epsilon zeta"),
      (40L, "alpha beta gamma delta epsilon zeta"),
      (60L, "one two three four five six seven")).toDF("doc_id", "txt")
    val sh = Dedup.shingleRows(docs, "doc_id", "txt")
    val out = Dedup.lshTuningCurve(sh)
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    // only the dup pair shares shingles -> exactly one row, decile 9
    assert(out.length == 1 && out.head._1 == 9)
    val (_, nPairs, nCand, rate, expMicro) = out.head
    assert(nPairs == 1 && nCand == 1 && rate == 1000)
    // 1-(1-1^4)^8 = 1 exactly -> floor-micro 1000000
    assert(expMicro == 1000000L)
  }

  test("lshFalseDrops counts a planted borderline est>tau>exact pair") {
    // the borderline pair: one token substituted in a 12-token doc ->
    // exact jaccard 8/12 = 0.667 (milli 666 < tau 700) while the
    // deterministic md5 minhash family agrees on 25/32 lanes (est_milli
    // 781 >= 700) AND shares an LSH band — a candidate the banded verdict
    // drops that exact verification would keep: a FALSE drop. Doc 3 is an
    // exact copy of doc 1 (est 1000, jaccard 1000): a TRUE drop
    val base = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima"
    val nearMiss = base.replace("bravo", "xray")
    val docs = Seq((1L, base), (2L, nearMiss), (3L, base),
      (4L, "a wholly different corpus of words and phrases here"))
      .toDF("doc_id", "txt")
    val sh = Dedup.shingleRows(docs, "doc_id", "txt")
    val out = Dedup.lshFalseDropsFrom(Dedup.minhashCandidatesFrom(sh), sh, 700L)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    // decile 6 = the two borderline pairs (1,2) and (2,3), both false
    // drops (8*10 div 12 = 6); decile 9 = the exact pair (1,3), zero false
    assert(out.toSeq == Seq((6, 2L, 2L, 1000L), (9, 1L, 0L, 0L)),
      s"got ${out.toSeq}")
  }

  test("unigram Viterbi fails loudly on non-BMP input (position-parity guard)") {
    // Scala substring splits surrogate pairs where DuckDB slices code
    // points — the guard must abort the query with the documented
    // exception, never silently hash-diverge (Collocations.uniViterbi)
    import graft.operators.Collocations
    val vocab = Seq(("a", 5L, 100L), ("b", 5L, 100L))
      .toDF("tok", "cnt", "score_micro")
    val words = Seq((1L, "a😀b")).toDF("doc_id", "word")
    val ex = intercept[Throwable] {
      Collocations.unigramWordStats(words, vocab).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("non-BMP")),
      s"expected the BMP-guard IllegalArgumentException, got: $ex")
  }

  test("textRank centers the hub token and floors isolated tokens") {
    val corpus = Seq(
      (1L, "a b"), (2L, "a c"), (3L, "a d"), (4L, "b c"), (5L, "z"))
      .toDF("id", "txt")
    val out = Collocations.textRank(corpus, "id", "txt",
      vocabN = 10, rounds = 3, k = 10)
      .as[(String, Long)].collect()
    // 'a' touches b, c, d — the structural hub must outrank every spoke
    assert(out.head._1 == "a", s"hub should rank first, got ${out.toSeq}")
    // 'z' only ever appears alone: no in-edges, so its score is exactly
    // the damping floor after every round
    assert(out.find(_._1 == "z").get._2 == 150000L)
    // deterministic under repartition (integer fixed-point everywhere)
    val out2 = Collocations.textRank(corpus.repartition(4), "id", "txt",
      vocabN = 10, rounds = 3, k = 10).as[(String, Long)].collect()
    assert(out.toSeq == out2.toSeq)
  }

  test("binary quantization: exact duplicate ranks first at Hamming 0") {
    val corpus = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
      .cache()
    // plant an exact duplicate of vector 0 under a fresh id: its codes
    // match bit-for-bit, so it must rank first for query 0 at distance 0
    val maxId = corpus.agg(max($"id")).as[Long].head()
    val dup = corpus.filter($"id" === 0).select(lit(maxId + 1).as("id"), $"vec")
    val planted = corpus.unionByName(dup)
    val queries = planted.filter($"id" === 0)
    val top = Similarity.bqTopK(planted, queries, 5)
      .orderBy($"rank").as[(Long, Long, Long, Int)].collect()
    assert(top.head == ((0L, maxId + 1, 0L, 1)),
      s"duplicate must be the rank-1 hit at Hamming 0, got ${top.head}")
    // 64 dims pack into exactly two 32-bit words per vector
    val words = Similarity.bqEncodeWith(corpus, Similarity.bqThresholds(corpus))
    assert(words.groupBy("id").count().select(countDistinct($"count"))
      .as[Long].head() == 1)
    assert(words.filter($"id" === 0).count() == 2)
    // codes+thresholds fully determine the result: a repartitioned corpus
    // produces the identical ranking
    val t1 = Similarity.bqTopK(corpus, corpus.filter($"id" < 5), 10)
      .select("query_id", "vec_id", "hamming").as[(Long, Long, Long)].collect().toSet
    val t2 = Similarity.bqTopK(corpus.repartition(7), corpus.filter($"id" < 5), 10)
      .select("query_id", "vec_id", "hamming").as[(Long, Long, Long)].collect().toSet
    assert(t1 == t2)
  }

  test("IVF ANN achieves reasonable recall@10 vs brute force") {
    val corpus = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
      .cache()
    val queries = corpus.filter($"id" < 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall@10 = $recall (nprobe=4/nlist=16)")
  }

  test("sampled-centroid IVF achieves reasonable recall and is deterministic") {
    val corpus = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
      .cache()
    val queries = corpus.filter($"id" < 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfSampledTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.3, s"sampled IVF recall@10 = $recall (nprobe=4/nlist=16)")
    // trainless index is a pure function of the data: identical re-run
    val again = Similarity.ivfSampledTopK(corpus.repartition(7), queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(again == ivf, "sampled IVF must be partition-invariant")
  }

  test("matryoshka truncation at full width is exactly the exact ranker") {
    val corpus = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
    val queries = corpus.filter($"id" < 5)
    val dim = corpus.select(size($"vec")).head.getInt(0)
    val full = Similarity.bruteForceTopK(corpus, queries, 10)
      .collect().map(_.toSeq).toSet
    val cutFull = Similarity.matryoshkaTopK(corpus, queries, 10, dims = dim)
      .collect().map(_.toSeq).toSet
    assert(cutFull == full, "dims = full width must be a no-op")
    // a strict prefix still ranks (sanity: right shape, self excluded)
    val half = Similarity.matryoshkaTopK(corpus, queries, 10, dims = dim / 2)
    assert(half.count() == 50)
    assert(half.filter($"query_id" === $"vec_id").isEmpty)
  }

  test("token budget sums exactly to B and flattens toward small groups") {
    import graft.operators.Sampling
    // lang is the skewed grouping (sources are near-uniform)
    val out = Sampling.tokenBudget(
        docs.select($"lang", TextFunctions.tokenCount($"text").as("nt")),
        $"lang", $"nt")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val totalTokens = out.map(_._2).sum
    val b = totalTokens / 2
    assert(out.map(_._3).sum == b,
      s"largest-remainder rounding must hit the budget exactly: ${out.toSeq}")
    // sqrt flattening: small groups get MORE than their token share,
    // large groups less
    val smallest = out.minBy(_._2)
    val largest = out.maxBy(_._2)
    assert(smallest._3.toDouble / b > smallest._2.toDouble / totalTokens,
      s"smallest group not upweighted: $smallest of $totalTokens")
    assert(largest._3.toDouble / b < largest._2.toDouble / totalTokens,
      s"largest group not downweighted: $largest of $totalTokens")
  }

  test("BPE merge rounds apply greedily without overlap, argmax is total-ordered") {
    import graft.operators.Collocations
    val d = Seq(
      (1L, "x x x x x"),         // (x,x) count 4; greedy applies only 2
      (2L, "new york new york"), // (new,york) 2
      (3L, "a b")).toDF("doc_id", "text")
    val out = Collocations.mergeRounds(d, "doc_id", "text", 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // round 1: (x, x) wins at n=4, but "x x x x x" holds one candidate run
    // of 4 and the non-overlap rule takes the even offsets -> 2 merges
    assert(out(0) == ((1, "x x", 4L, 2L)), s"got ${out(0)}")
    // round 2: doc 1 is now [x x, x x, x] (all pairs distinct), so
    // (new, york) wins at n=2 and both occurrences merge
    assert(out(1) == ((2, "new york", 2L, 2L)), s"got ${out(1)}")
    // exhaustion: when no pairs remain before `rounds` runs out, the loop
    // stops, emits only the learned rounds, and KEEPS the last state (the
    // SQL twin's LEFT JOIN passthrough mirrors this)
    val tiny = Seq((1L, "a a"), (2L, "b")).toDF("doc_id", "text")
    val (learned, state) = Collocations.mergeRoundsWithState(
      tiny, "doc_id", "text", 3)
    assert(learned.count() == 1, "only round 1 has a pair to merge")
    val toks = state.groupBy("doc_id").count().orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(toks == Seq((1L, 1L), (2L, 1L)), s"state after exhaustion: $toks")
  }

  test("product quantization: ADC recall holds and codes are partition-invariant") {
    val corpus = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
    val queries = corpus.filter($"id" < 5)
    val pq = Similarity.pqTopK(corpus, queries, 10).select("query_id", "vec_id")
    val exact = Similarity.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id")
    assert(pq.count() == 50, "10 neighbors per query")
    val hits = pq.join(exact, Seq("query_id", "vec_id"), "left_semi").count()
    // 8x16 sampled codebooks on the (near-random) fixture: 13/50 at this
    // SF — assert a floor, not the point value, so SF changes don't trip
    assert(hits >= 8, s"ADC recall collapsed: $hits/50")
    val dim = Similarity.inferDim(corpus)
    val cbs = Similarity.pqCodebooks(corpus, dim)
    def codes(df: org.apache.spark.sql.DataFrame) =
      Similarity.pqEncode(df, cbs, dim).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(codes(corpus) == codes(corpus.repartition(7)),
      "codes must not depend on partitioning")
    // the IVF+PQ composition: candidates come only from probed cells, so
    // results stay k-per-query, self-free, and within the IVF candidate set
    val ivfpq = Similarity.ivfPqTopK(corpus, queries, 10)
    assert(ivfpq.count() == 50, "10 neighbors per query")
    assert(ivfpq.filter($"query_id" === $"vec_id").isEmpty)
    val ivfCand = Similarity.ivfSampledTopK(corpus, queries, Int.MaxValue)
      .select("query_id", "vec_id")
    assert(ivfpq.select("query_id", "vec_id")
      .join(ivfCand, Seq("query_id", "vec_id"), "left_anti").isEmpty,
      "IVF+PQ must only rescore vectors the IVF probe admitted")
  }

  test("semantic dedup keeps one representative per tight embedding cluster") {
    def jitter(base: Array[Double], eps: Double) = base.map(_ + eps).toSeq
    val cl1 = Array(10.0, 0.0, 0.0, 0.0)
    val cl2 = Array(0.0, 10.0, 0.0, 0.0)
    val iso = Array(0.0, 0.0, 10.0, 0.0)
    val corpus = Seq(
      (1L, cl1.toSeq), (2L, jitter(cl1, 0.01)), (3L, jitter(cl1, 0.02)),
      (10L, cl2.toSeq), (11L, jitter(cl2, 0.01)),
      (20L, iso.toSeq)
    ).toDF("id", "vec")
    val out = Similarity.semanticSurvivors(corpus, threshold = 0.99, nlist = 3)
      .select($"id").as[Long].collect().toSet
    assert(out == Set(1L, 10L, 20L),
      s"each tight cluster keeps its min id, the isolate survives: $out")
    // the trainless sampled-cell variant implements the same semantics
    // (clusters are orthogonal, so any centroid sample separates them)
    val sampled = Similarity.semanticSurvivorsSampled(corpus,
        threshold = 0.99, nlist = 3)
      .select($"id").as[Long].collect().toSet
    assert(sampled == Set(1L, 10L, 20L),
      s"sampled-cell variant must keep the same survivors: $sampled")
  }

  test("approx_count_distinct is within its error bound of exact") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct($"l_partkey")).head.getLong(0)
    val approx = li.select(approx_count_distinct($"l_partkey", 0.02)).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }

  test("cosine is 1.0 for identical vectors, bounded elsewhere") {
    val two = Seq((1L, Seq(1.0, 2.0, 3.0)), (2L, Seq(1.0, 2.0, 3.0)),
      (3L, Seq(-1.0, -2.0, -3.0))).toDF("id", "vec")
    val pairs = Similarity.cosineNearDupExact(two, -2.0).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 3L)) == -1.0)
  }

  test("hash sampling is deterministic, partition-independent, ~rate-sized") {
    import graft.operators.Sampling
    val s1 = Sampling.hashSample(docs, $"doc_id", 0.2).select("doc_id")
      .as[Long].collect().toSet
    val s2 = Sampling.hashSample(docs.repartition(7), $"doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "sample must not depend on partitioning")
    val n = docs.count().toDouble
    assert(math.abs(s1.size / n - 0.2) < 0.08, s"rate ${s1.size / n}")
    // split covers everything exactly once and is append-stable
    val split = docs.withColumn("split",
      Sampling.splitColumn($"doc_id", 0.1, 0.1))
    assert(split.count() == n)
    val halfSplit = docs.filter($"doc_id" < 250).withColumn("split",
      Sampling.splitColumn($"doc_id", 0.1, 0.1))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val fullSplit = split.select("doc_id", "split").as[(Long, String)]
      .collect().toMap
    halfSplit.foreach { case (id, sp) => assert(fullSplit(id) == sp) }
  }

  test("stratified sampling honors per-stratum rates and stays deterministic") {
    import graft.operators.Sampling
    val df = (0 until 2000).map(i => (i.toLong, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val kept = Sampling.stratifiedSample(df, $"lang", $"id",
      Seq("en" -> 0.5, "de" -> 0.05), defaultRate = 0.0)
    val byLang = kept.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(byLang("en") / 1000.0 - 0.5) < 0.08)
    assert(math.abs(byLang.getOrElse("de", 0L) / 1000.0 - 0.05) < 0.04)
    // deterministic + partition independent
    val again = Sampling.stratifiedSample(df.repartition(7), $"lang", $"id",
      Seq("en" -> 0.5, "de" -> 0.05), defaultRate = 0.0)
      .select("id").as[Long].collect().toSet
    assert(again == kept.select("id").as[Long].collect().toSet)
    // a stratum's membership does not depend on the OTHER rates (auditable:
    // the same id keeps its fate when unrelated strata change)
    val enOnly = Sampling.stratifiedSample(df, $"lang", $"id",
      Seq("en" -> 0.5), defaultRate = 0.0)
      .select("id").as[Long].collect().toSet
    assert(enOnly == kept.filter($"lang" === "en").select("id").as[Long].collect().toSet)
  }

  test("stratified sampling with empty rates degrades to the default rate in both twins") {
    import graft.operators.Sampling
    val df = (0 until 1000).map(i => (i.toLong, "en")).toDF("id", "lang")
    val kept = Sampling.stratifiedSample(df, $"lang", $"id",
      Seq.empty, defaultRate = 0.2).select("id").as[Long].collect().toSet
    // same default path as a rate list naming a stratum absent from the data
    val viaAbsent = Sampling.stratifiedSample(df, $"lang", $"id",
      Seq("zz" -> 0.9), defaultRate = 0.2).select("id").as[Long].collect().toSet
    assert(kept == viaAbsent)
    val sql = Sampling.stratifiedSampleSql("t", "lang", "id",
      Seq.empty, defaultRate = 0.2)
    assert(!sql.contains("CASE"), "WHEN-less CASE is a DuckDB syntax error")
    assert(sql.contains("< 200000"), "bare default bound expected")
  }

  test("PII scrub redacts emails and phones; clean text untouched") {
    val df = Seq(
      (1L, "write me at jane.doe+x@corp.example.com or call +1-555-123 4567 now"),
      (2L, "no pii here at all"),
      (3L, "double a@b.io c@d.org and 555-123-9876")).toDF("id", "text")
    val out = df.select($"id",
      TextFunctions.emailCount($"text").as("e"),
      TextFunctions.phoneCount($"text").as("p"),
      TextFunctions.scrubPii($"text").as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L)._1 == 1 && out(1L)._2 == 1)
    assert(out(1L)._3 == "write me at <EMAIL> or call <PHONE> now")
    assert(out(2L) == ((0, 0, "no pii here at all")))
    assert(out(3L)._1 == 2 && out(3L)._2 == 1)
    assert(out(3L)._3 == "double <EMAIL> <EMAIL> and <PHONE>")
  }

  test("repetition counts flag duplicated bigrams; short docs yield zero") {
    val df = Seq(
      (1L, "spam spam spam spam"),
      (2L, "all these words differ"),
      (3L, "one")).toDF("doc_id", "text")
    val (n, nd) = TextFunctions.repetitionCounts(col("text"))
    val out = df.select($"doc_id", n, nd).as[(Long, Int, Int)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((3, 1))) // "spam spam" x3 -> 1 distinct
    assert(out(2L) == ((3, 3)))
    assert(out(3L) == ((0, 0))) // < 2 tokens: no bigrams
    // the explode+window scale form computes identical counts
    val stats = TextFunctions.repetitionStats(df, "doc_id", "text")
      .as[(Long, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(stats == out)
  }

  test("gopher repetition panel: line, top-2gram and dup-3gram occupancy") {
    val df = Seq(
      (1L, "aa\naa\nbb"),       // dup line: "aa" x2 of 3 lines, 8 chars
      (2L, "x y x y x y"),      // top 2-gram "x y" x3, dup 3-grams x2+x2
      (3L, "all words differ entirely")
    ).toDF("doc_id", "text")
    val out = TextFunctions.gopherRepetitionStats(df, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // doc 1: dup_line = 1e6*1 div 3; dup_line_chars = 1*len("aa") of 8;
    // bigram tie ("aa aa","aa bb" both x1) -> lexicographic first "aa aa"
    // (5 chars x1) of 8 chars; no duplicated trigram
    assert(out(1L) == ((1L, 3L, 333333L, 250000L, 625000L, 0L, false)))
    // doc 2: one line, no dups; "x y" x3 * 3 chars = 9 of 11;
    // trigrams "x y x" x2 + "y x y" x2 -> (2*5 + 2*5) = 20 of 11
    // (overlap-counted: the documented proxy exceeds 1e6 here)
    assert(out(2L) == ((2L, 1L, 0L, 0L, 818181L, 1818181L, false)))
    // doc 3: zero repetition everywhere; top 2-gram is a singleton
    // ("all words", 9 chars of 25 = 360000 > 0.2 -> short-doc guardrail
    // fires, the known small-doc behavior of the occupancy proxy)
    assert(out(3L)._3 == 0L && out(3L)._6 == 0L && !out(3L)._7)
    assert(out(3L)._5 == 360000L)
  }

  test("text functions: token count, fingerprint, langid determinism") {
    val df = Seq((1L, "  the cat and the hat  "), (2L, ""), (3L, "der hund ist nicht ein"))
      .toDF("doc_id", "text")
    val out = df.select($"doc_id",
      TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.fingerprint($"text").as("fp"),
      TextFunctions.langId($"text").as("lang")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2), r.getString(3)))).toMap
    assert(out(1L)._1 == 5)
    assert(out(2L)._1 == 0)
    assert(out(1L)._3 == "en")
    assert(out(3L)._3 == "de")
    // fingerprint insensitive to case/whitespace
    val fp2 = Seq((1L, "THE  CAT and the hat")).toDF("doc_id", "text")
      .select(TextFunctions.fingerprint($"text")).head().getString(0)
    assert(out(1L)._2 == fp2)
  }

  test("token chunking: overlap, short tail, one chunk per short doc") {
    import graft.operators.Chunking
    val df = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens
      (2L, "x"),                   // 1 token -> single short chunk
      (3L, "p q r s")              // 4 tokens, = window
    ).toDF("doc_id", "text")
    val out = Chunking.tokenChunks(df, "doc_id", "text", 4, 3)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0, 4, "a b c d"), (1L, 1, 4, "d e f g"), (1L, 2, 4, "g h i j"),
      (2L, 0, 1, "x"),
      (3L, 0, 4, "p q r s")))
    // every token position is covered by at least one chunk
    val covered = out.filter(_._1 == 1L).flatMap { case (_, k, n, _) =>
      (k * 3) until (k * 3 + n) }.toSet
    assert(covered == (0 until 10).toSet)
  }

  test("int8 group centroids: exact integer sums on a hand-checked corpus") {
    import graft.operators.Similarity
    // dim 0 spans [0, 10] -> codes 0 and 255; dim 1 constant -> code 0
    val corpus = Seq(
      (1L, 0, Seq(0.0, 5.0)), (2L, 0, Seq(10.0, 5.0)), (3L, 1, Seq(10.0, 5.0)))
      .toDF("id", "grp", "vec")
    val out = Similarity.int8GroupCentroids(corpus)
      .as[(Int, Int, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (0, 0, 2L, 255L, 127500L), // codes 0 + 255
      (0, 1, 2L, 0L, 0L),        // constant dim -> code 0
      (1, 0, 1L, 255L, 255000L),
      (1, 1, 1L, 0L, 0L)))
  }

  test("int8 Lloyd step: hand-checked assignment, inertia and centroid shift") {
    import graft.operators.Similarity
    // codes: ids 1-3 -> (0,0), ids 4-5 -> (255,255), id 6 -> (255,0);
    // explicit seeds c0=id1, c1=id4. id 6 ties both centroids at 255^2
    // -> smallest cid wins. c0 mean dim0 = 255000 div 4 = 63750 milli
    // -> L1 shift 63750; c1 members equal the seed -> zero everything
    val c = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(0.0, 0.0)), (3L, Seq(0.0, 0.0)),
      (4L, Seq(1.0, 1.0)), (5L, Seq(1.0, 1.0)), (6L, Seq(1.0, 0.0)))
      .toDF("id", "vec")
    val seeds = Seq((0, 1L), (1, 4L)).toDF("cid", "id")
    val out = Similarity.int8LloydStep(c, seeds)
      .orderBy("cid").as[(Int, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0, 4L, 65025L, 63750L), (1, 2L, 0L, 0L)), s"got $out")
    // the hash-ranked seed frame is deterministic and rank-dense
    val sd = Similarity.int8LloydSeeds(c, 2).as[(Int, Long)].collect().toSeq
    assert(sd.map(_._1) == Seq(0, 1) && sd.map(_._2).distinct.size == 2)
    // churn half-step against the UPDATED centroids: c0's mean moved to
    // (63750, 0) milli, so id 6 at (255000, 0) now sits 191250 from c0
    // but 255000 from c1 in dim0 (plus 255000² in dim1) -> id 6 STAYS;
    // ids 1-3 (0,0) stay at c0 (63750² < 2·255000²); c1 members exact
    // -> nobody moves anywhere on this fixture
    val churn = Similarity.int8LloydChurn(c, seeds)
      .orderBy("cid").as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(churn == Seq((0, 4L, 4L, 0L, 4L), (1, 2L, 2L, 0L, 2L)),
      s"got $churn")
  }

  test("mixture balancing equalizes skewed group sizes deterministically") {
    import graft.operators.Sampling
    val df = docs.select($"doc_id", $"lang")
    val out = Sampling.balanceGroups(df, $"doc_id", $"lang")
    val inCounts = df.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val minN = inCounts.values.min
    assert(inCounts.values.max > minN * 2,
      "fixture lang mix must be skewed or this test is vacuous")
    val kept = out.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    // every group lands near the smallest group's size (hash-thresholded:
    // expected min_n, binomial spread); the smallest group keeps everything
    assert(kept.keySet == inCounts.keySet, "no group may be emptied")
    assert(kept(inCounts.minBy(_._2)._1) == minN)
    kept.foreach { case (g, k) =>
      assert(math.abs(k - minN) <= math.max(6L, minN / 2),
        s"$g kept $k vs min $minN") }
    // deterministic and partition-independent
    val again = Sampling.balanceGroups(df.repartition(7), $"doc_id", $"lang")
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
  }

  test("temperature sampling lands group sizes near sqrt(min_n * n_g)") {
    import graft.operators.Sampling
    val df = docs.select($"doc_id", $"lang")
    val out = Sampling.temperatureSample(df, $"doc_id", $"lang")
    val inCounts = df.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val minN = inCounts.values.min
    assert(inCounts.values.max > minN * 2,
      "fixture lang mix must be skewed or this test is vacuous")
    val kept = out.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(kept.keySet == inCounts.keySet, "no group may be emptied")
    // smallest group kept whole (bound = floor(1e6*sqrt(1)) = 1e6 > any h)
    assert(kept(inCounts.minBy(_._2)._1) == minN)
    kept.foreach { case (g, k) =>
      val target = math.sqrt(minN.toDouble * inCounts(g)).toLong
      assert(math.abs(k - target) <= math.max(6L, target / 2),
        s"$g kept $k vs sqrt target $target") }
    // kept sets nest monotonically: temperature keeps a superset of the
    // full-equalization sample at the same salt-family discipline
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(df.select("doc_id").as[Long].collect().toSet))
    // deterministic and partition-independent
    val again = Sampling.temperatureSample(df.repartition(7), $"doc_id", $"lang")
      .select("doc_id").as[Long].collect().toSet
    assert(again == ids)
  }

  test("mixture upsampling replicates minority groups toward the largest") {
    import graft.operators.Sampling
    val df = docs.select($"doc_id", $"lang")
    val out = Sampling.upsampleGroups(df, $"doc_id", $"lang")
    val inCounts = df.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val maxN = inCounts.values.max
    assert(maxN > inCounts.values.min * 2,
      "fixture lang mix must be skewed or this test is vacuous")
    // every original row survives with copy_id 1..copies contiguous
    val perKey = out.groupBy("doc_id").agg(
        count(lit(1)).as("c"), max("copy_id").as("mx"), min("copy_id").as("mn"))
      .as[(Long, Long, Long, Long)].collect()
    assert(perKey.length == df.count(), "every original row must survive")
    perKey.foreach { case (id, c, mx, mn) =>
      assert(mn == 1L && mx == c, s"doc $id copy_ids not contiguous") }
    // the argmax group passes through unchanged (max_n mod n_g == 0 there);
    // every group lands near max_n (base copies exact, remainder binomial)
    val got = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(got(inCounts.maxBy(_._2)._1) == maxN)
    got.foreach { case (g, k) =>
      assert(math.abs(k - maxN) <= math.max(6L, maxN / 2),
        s"$g upsampled to $k vs max $maxN") }
    // deterministic and partition-independent
    val again = Sampling.upsampleGroups(df.repartition(7), $"doc_id", $"lang")
      .groupBy("doc_id").agg(max("copy_id")).as[(Long, Long)].collect().toMap
    assert(again == perKey.map(t => t._1 -> t._2).toMap)
  }

  test("upsampling replication is HARD-capped on pathological group ratios") {
    import graft.operators.Sampling
    // 1 minority row vs a 100k-row majority: uncapped would emit 100k copies
    val skewed = spark.range(100000).selectExpr("id AS doc_id", "'big' AS grp")
      .union(spark.range(1).selectExpr("id + 9000000 AS doc_id", "'tiny' AS grp"))
    val out = Sampling.upsampleGroups(skewed, $"doc_id", $"grp", maxCopies = 64L)
    val copies = out.filter($"grp" === "tiny").count()
    assert(copies == 64L, s"cap must bound replication, got $copies")
    // majority group passes through untouched below the cap
    assert(out.filter($"grp" === "big").count() == 100000L)
    // cap above the natural ratio changes nothing
    val loose = Sampling.upsampleGroups(
      docs.select($"doc_id", $"lang"), $"doc_id", $"lang")
    val tight = Sampling.upsampleGroups(
      docs.select($"doc_id", $"lang"), $"doc_id", $"lang", maxCopies = 1000000L)
    assert(loose.count() == tight.count())
  }

  test("DSIR weights separate the target domain from the rest") {
    import graft.operators.Sampling
    val w = Sampling.dsirWeights(docs, "doc_id", "text", $"lang" === "en")
      .join(docs.select($"doc_id", $"lang"), "doc_id")
    // the target class must score higher ON AVERAGE than every other class
    // (its features are literally the target distribution)
    val means = w.groupBy("lang")
      .agg((sum($"dsir_micro") / sum($"n_feats")).as("m"))
      .as[(String, Double)].collect().toMap
    val others = means.filterNot(_._1 == "en").values
    assert(others.forall(_ < means("en")),
      s"en mean ${means("en")} must dominate $means")
    // deterministic and partition-independent
    val again = Sampling.dsirWeights(docs.repartition(7), "doc_id", "text",
      $"lang" === "en").as[(Long, Long, Long)].collect().toSet
    val first = Sampling.dsirWeights(docs, "doc_id", "text", $"lang" === "en")
      .as[(Long, Long, Long)].collect().toSet
    assert(again == first)
  }

  test("Naive Bayes classifier recovers the fixture languages in-sample") {
    import graft.operators.Classify
    val out = Classify.naiveBayes(docs, "doc_id", "text", "lang").cache()
    assert(out.count() == docs.count(), "one prediction per doc")
    val n = out.count()
    val acc = out.filter($"true_lang" === $"pred_lang").count().toDouble / n
    // the fixture langs share their ENTIRE vocabulary (zero lang-exclusive
    // tokens) and differ only distributionally, so in-sample NB cannot be
    // near-perfect; the honest bar is beating the majority-class prior
    // (predict-en-always), which a broken likelihood would collapse to
    val majority = docs.groupBy("lang").count()
      .agg(max("count")).head.getLong(0).toDouble / n
    assert(acc > majority, s"in-sample accuracy $acc must beat prior $majority")
    // scores are unnormalized log-posteriors: strictly negative
    assert(out.filter($"score_micro" >= 0).isEmpty)
    // deterministic and partition-independent
    val again = Classify.naiveBayes(docs.repartition(7), "doc_id", "text", "lang")
      .as[(Long, String, String, Long)].collect().toSet
    assert(again == out.as[(Long, String, String, Long)].collect().toSet)
  }

  test("PQ rerank rescoring is exact on the shortlist and beats raw ADC order") {
    val corpus = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
    val queries = corpus.filter($"id" < 5)
    val exact = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val rerank = Similarity.pqRerankTopK(corpus, queries, 5, shortlist = 20)
    val got = rerank.select("query_id", "vec_id").as[(Long, Long)]
      .collect().toSet
    assert(rerank.groupBy("query_id").count().filter($"count" =!= 5).isEmpty)
    // the reranked top-5 must be a subset of the 20-deep ADC shortlist
    val short20 = Similarity.pqTopK(corpus, queries, 20)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(short20))
    // refinement cannot LOSE exact-top-5 hits the shortlist already found:
    // recall(rerank∩exact) == recall(shortlist∩exact) at k=5 per query
    val shortHits = exact.count(short20.contains)
    val rerankHits = exact.count(got.contains)
    assert(rerankHits == shortHits,
      s"rerank must keep every exact hit the shortlist surfaced: $rerankHits vs $shortHits")
  }

  test("token entropy: constant docs score zero, uniform docs score n·ln n") {
    val d = Seq(
      (1L, "x x x x"),      // constant: H = 0
      (2L, "a b c d"),      // uniform over 4 types: n·H = 4·ln 4
      (3L, "a a a b")       // skewed: between the two
    ).toDF("doc_id", "text")
    val out = TextFunctions.tokenEntropyStats(d, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    assert(out(0) == ((1L, 4L, 1L, 0L)), s"constant doc: ${out(0)}")
    val ln4micro = math.round(math.log(4) * 1e6)
    assert(out(1) == ((2L, 4L, 4L, 4L * ln4micro)), s"uniform doc: ${out(1)}")
    assert(out(2)._4 > 0 && out(2)._4 < out(1)._4,
      s"skewed doc must land strictly between: ${out(2)}")
  }

  test("embedding decontamination flags exact benchmark copies at cos 1") {
    val corpus = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
    val bench = corpus.filter($"id" < 10)
    // plant an exact copy of benchmark vector 0 into the corpus side
    val planted = corpus.filter($"id" >= 10)
      .union(bench.filter($"id" === 0).select(lit(999999L).as("id"), $"vec"))
    val out = Similarity.embContamination(planted, bench, 0.45).cache()
    val hit = out.filter($"id" === 999999L)
      .as[(Long, Long, Boolean)].head()
    assert(hit._2 == 1000000L && hit._3, s"exact copy must flag at cos 1: $hit")
    // cosine bound: nothing exceeds 1.0 in micros
    assert(out.filter($"max_cos_micro" > 1000000L).isEmpty)
    assert(out.count() == planted.count(), "one row per corpus vector")
  }

  test("kNN components separate well-separated clumps and label by min id") {
    // two orthogonal clumps: ids 0-2 near e1, ids 10-12 near e2
    def v(x: Double, y: Double, eps: Double) = Array(x + eps, y, 0.0, 0.0)
    val rows = Seq(
      0L -> v(1, 0, 0.00), 1L -> v(1, 0, 0.01), 2L -> v(1, 0, 0.02),
      10L -> v(0, 1, 0.00), 11L -> v(0, 1, 0.01), 12L -> v(0, 1, 0.02))
    val df = rows.toDF("id", "vec")
    val out = Similarity.knnComponents(df, 2).orderBy("id")
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 10L, 11L, 12L))
    assert(out.filter(_._1 < 10).forall(r => r._2 == 0L && r._3 == 3L),
      s"first clump labels: ${out.toSeq}")
    assert(out.filter(_._1 >= 10).forall(r => r._2 == 10L && r._3 == 3L),
      s"second clump labels: ${out.toSeq}")
  }

  test("PMI ranks bound pairs above frequent-but-independent pairs") {
    import graft.operators.Collocations
    // "new york" always co-occurs (bound); "of" and "the" are everywhere
    // but in all combinations (independent)
    val d = (1 to 6).map(i =>
      (i.toLong, s"new york of the x$i of x$i the of y$i the"))
      .toDF("doc_id", "text")
    val out = Collocations.pmiTop(d, "text", minCount = 5, k = 10)
      .as[(String, Long, Long)].collect()
    assert(out.head._1 == "new york", s"top PMI pair: ${out.toSeq}")
    val pmis = out.map(r => r._1 -> r._3).toMap
    // the independent pair scores below the bound pair when present
    pmis.get("of the").foreach(p => assert(p < pmis("new york")))
    // output respects the (pmi desc, bg asc) total order
    assert(out.sortBy(r => (-r._3, r._1)).toSeq == out.toSeq)
  }

  test("int8 outlier score isolates a planted far vector within its label") {
    // label 0: 20 vectors near (1,0,...), one planted at the opposite
    // corner; label 1: a tight clump (no outlier)
    val dim = 8
    def v(base: Double, j: Int): Array[Double] =
      Array.tabulate(dim)(k => if (k == 0) base else 0.001 * ((j + k) % 5))
    val rows =
      (0 until 20).map(j => (j.toLong, 0, v(1.0, j))) ++
        Seq((99L, 0, Array.tabulate(dim)(k => if (k == 0) -1.0 else 0.9))) ++
        (100 until 110).map(j => (j.toLong, 1, v(0.5, j)))
    val df = rows.toDF("id", "grp", "vec")
    val out = Similarity.int8OutlierScores(df).cache()
    val g0 = out.filter($"grp" === 0).orderBy($"l1_milli".desc)
      .as[(Long, Int, Long)].collect()
    assert(g0.head._1 == 99L, s"planted outlier must top its label: ${g0.head}")
    assert(g0.head._3 > 2 * g0(1)._3, "outlier separation must be decisive")
    // deterministic and partition-independent
    val again = Similarity.int8OutlierScores(df.repartition(5))
      .as[(Long, Int, Long)].collect().toSet
    assert(again == out.as[(Long, Int, Long)].collect().toSet)
  }

  test("quantized power iteration recovers a planted dominant direction") {
    val dim = 16
    // the quantization range-normalizes every dimension, so the op finds
    // the dominant CORRELATION direction: plant dims 0,1 perfectly
    // correlated (both = t·u + tiny noise) and make the off-axis noise
    // hash-scrambled per (j,k) — a shift-structured pattern would itself
    // create correlated dimension pairs
    val rows = (0 until 200).map { j =>
      val t = (j % 21) - 10
      val v = Array.tabulate(dim) { k =>
        // modulus 251 > dim·slope-collisions: distinct per-dim slopes mod
        // 251 keep the noise dims pairwise near-uncorrelated (a small
        // modulus aliases k and k+m onto the SAME slope — shifted copies)
        val noise = 0.0008 * (((j * 2654435761L + k * 40503L + j * k * 97L) % 251) - 125)
        if (k <= 1) t * 0.7 + noise else noise
      }
      (j.toLong, v)
    }
    val df = rows.toDF("id", "vec")
    val v = Similarity.pcaTopComponent(df).orderBy("dim")
      .as[(Int, Long)].collect().map(_._2.toDouble)
    assert(v.length == dim)
    val norm = math.sqrt(v.map(x => x * x).sum)
    val alignment = math.abs(v(0) + v(1)) / (norm * math.sqrt(2))
    assert(alignment >= 0.9, s"top PC must align with the planted axis: " +
      s"alignment $alignment, v ${v.toSeq}")
    // deterministic and partition-independent
    val again = Similarity.pcaTopComponent(df.repartition(7)).orderBy("dim")
      .as[(Int, Long)].collect().map(_._2.toDouble)
    assert(again.toSeq == v.toSeq)
  }

  test("stupid backoff walks trigram→bigram→unigram→OOV with exact scores") {
    val train = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val test = Seq(
      (10L, "a b c"), // trigram seen: ln(2/2) = 0
      (11L, "x b c"), // bigram backoff: B + ln(2/2)
      (12L, "x y c"), // unigram backoff: 2B + ln(2) - ln(6)
      (13L, "x y z"), // OOV: 2B - ln(6)
      (14L, "a b")    // no trigram: (0, 0)
    ).toDF("doc_id", "text")
    val out = TextFunctions.backoffScores(train, test, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    val B = TextFunctions.StupidBackoffMicro
    val ln2 = 693147L; val ln6 = 1791759L
    assert(out(0) == ((10L, 1L, 0L)), s"seen trigram: ${out(0)}")
    assert(out(1) == ((11L, 1L, B)), s"bigram backoff: ${out(1)}")
    assert(out(2) == ((12L, 1L, 2 * B + ln2 - ln6)), s"unigram: ${out(2)}")
    assert(out(3) == ((13L, 1L, 2 * B - ln6)), s"OOV: ${out(3)}")
    assert(out(4) == ((14L, 0L, 0L)), s"short doc: ${out(4)}")
  }

  test("winnow matching finds planted overlap and the hot-fp cap holds") {
    // docs 1/2 share a long verbatim passage; 3 is unrelated; 4..40 all
    // contain the same boilerplate sentence (a hot fingerprint source)
    val passage = "the quick brown fox jumps over the lazy dog again and again"
    val boiler = "all rights reserved contact us at example dot com"
    val d = (Seq(
      (1L, s"alpha $passage omega"),
      (2L, s"beta $passage gamma"),
      (3L, "completely unrelated text about graphs and joins here")) ++
      (4 to 40).map(i => (i.toLong, s"doc $i unique words w$i x$i y$i $boiler")))
      .toDF("doc_id", "text")
    val out = Dedup.winnowMatchPairs(d, "doc_id", "text",
        minShared = 3, maxDf = 10)
      .as[(Long, Long, Long)].collect()
    assert(out.exists(p => p._1 == 1L && p._2 == 2L),
      s"planted passage pair missing: ${out.toSeq}")
    // boilerplate fingerprints sit in 37 docs > maxDf=10: they must not
    // generate the ~37² pair explosion
    val boilerPairs = out.count(p => p._1 >= 4L)
    assert(boilerPairs == 0,
      s"hot fingerprints must be capped out: ${out.toSeq}")
  }

  test("span dedup excises exactly the planted cross-doc span") {
    // docs 1/2 share one verbatim 7-token passage (covers three 5-token
    // windows -> all 7 tokens dup-covered in both docs); doc 3 repeats a
    // span only WITHIN itself (must survive: dup needs >= 2 DISTINCT
    // docs); doc 4 is short and untouched; doc 5 is empty
    val passage = "one two three four five six seven"
    val d = Seq(
      (1L, s"alpha $passage omega"),
      (2L, s"beta gamma $passage"),
      (3L, "rep a b c d rep a b c d rep a b c d"),
      (4L, "tiny doc"),
      (5L, "")).toDF("doc_id", "text")
    val out = Dedup.spanDedup(d, "doc_id", "text")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 9, 2, "alpha omega")), s"got ${out(0)}")
    assert(out(1) == ((2L, 9, 2, "beta gamma")), s"got ${out(1)}")
    // intra-doc repetition survives whole
    assert(out(2)._3 == out(2)._2 && out(2)._4.nonEmpty, s"got ${out(2)}")
    assert(out(3) == ((4L, 2, 2, "tiny doc")), s"got ${out(3)}")
    assert(out(4) == ((5L, 0, 0, "")), s"got ${out(4)}")
  }

  test("intra-doc span dedup: first copy wins, composition order pinned") {
    // periodic doc: "rep a b c d" ×3 — every span at i>=5 repeats its
    // i-5 twin, so coverage excises tokens 5..14 and the FIRST period
    // survives verbatim
    val d3 = Seq((3L, "rep a b c d rep a b c d rep a b c d"),
      (4L, "tiny doc"), (5L, "")).toDF("doc_id", "text")
    val w3 = Dedup.spanDedupWithin(d3, "doc_id", "text")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    assert(w3(0) == ((3L, 15, 5, "rep a b c d")), s"got ${w3(0)}")
    assert(w3(1) == ((4L, 2, 2, "tiny doc")), s"got ${w3(1)}")
    assert(w3(2) == ((5L, 0, 0, "")), s"got ${w3(2)}")
    // cross-doc-only duplication is out of the intra form's scope
    val passage = "one two three four five six seven"
    val cd = Seq((1L, s"alpha $passage omega"), (2L, s"beta $passage"))
      .toDF("doc_id", "text")
    val cout = Dedup.spanDedupWithin(cd, "doc_id", "text")
      .as[(Long, Int, Int, String)].collect()
    assert(cout.forall(r => r._2 == r._3), s"got ${cout.toSeq}")
    // composition order (the documented pipeline: CROSS first, then
    // intra on the cleaned text): excising the shared C1..C5 passage
    // REJOINS doc 1's split "p q r s | t" halves into a brand-new
    // intra-dup that only the cross→intra order can see
    val ab = Seq((1L, "p q r s C1 C2 C3 C4 C5 t p q r s t"),
      (2L, "zz C1 C2 C3 C4 C5 yy")).toDF("doc_id", "text")
    val crossClean = Dedup.spanDedup(ab, "doc_id", "text")
      .select($"doc_id", $"clean_text".as("text"))
    val canonical = Dedup.spanDedupWithin(crossClean, "doc_id", "text")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    assert(canonical(0)._4 == "p q r s t", s"got ${canonical(0)}")
    assert(canonical(1)._4 == "zz yy", s"got ${canonical(1)}")
    // the reverse order misses it: intra finds no repeat in the original
    val intraClean = Dedup.spanDedupWithin(ab, "doc_id", "text")
      .select($"doc_id", $"clean_text".as("text"))
    val reversed = Dedup.spanDedup(intraClean, "doc_id", "text")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    assert(reversed(0)._4 == "p q r s t p q r s t",
      s"reverse order must leave the rejoined repetition: ${reversed(0)}")
  }

  test("incremental span dedup excises only index-shared spans from the delta") {
    val passage = "one two three four five six seven"
    val indexed = Seq((10L, s"corpus doc with $passage inside")).toDF("doc_id", "text")
    val delta = Seq(
      (1L, s"alpha $passage omega"),          // shares the index span -> cleaned
      (2L, s"beta gamma delta epsilon zeta"), // untouched
      (3L, s"rep a b c d rep a b c d"))       // delta-internal dup: out of scope
      .toDF("doc_id", "text")
    val out = Dedup.spanDedupAgainst(indexed, delta, "doc_id", "text")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 9, 2, "alpha omega")), s"got ${out(0)}")
    assert(out(1)._3 == out(1)._2, s"got ${out(1)}")
    assert(out(2)._3 == out(2)._2, s"got ${out(2)}")
  }

  test("span runs: a 3w shared block merges to ONE maximal excision") {
    // docs 1/2 share one 15-token (3w) block: its 11 consecutive
    // duplicated window starts must merge into ONE maximal run of
    // run_len 15 per doc — not 11 separate windows. Docs 3/4 share two
    // 5-token blocks separated by a unique token: islands must split
    // them into TWO single-window runs. Doc 5 shares nothing -> no rows.
    val block = (1 to 15).map(j => s"B$j").mkString(" ")
    val d = Seq(
      (1L, s"a1 a2 $block a3 a4"),
      (2L, s"b1 $block b2 b3 b4"),
      (3L, "x1 x2 x3 x4 x5 g1 y1 y2 y3 y4 y5"),
      (4L, "c1 x1 x2 x3 x4 x5 c2 y1 y2 y3 y4 y5 c3"),
      (5L, "solo tokens that never repeat anywhere else")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDupRuns(d, "doc_id", "text")
      .orderBy("doc_id", "run_start")
      .as[(Long, Int, Int, Int)].collect()
    assert(out.toSeq == Seq(
      (1L, 3, 11, 15), (2L, 2, 11, 15),
      (3L, 1, 1, 5), (3L, 7, 1, 5),
      (4L, 2, 1, 5), (4L, 8, 1, 5)), s"got ${out.toSeq}")
  }

  test("span dup fraction: planted 3w block reads 11/15 duplicated windows") {
    // the span-runs fixture: docs 1/2 share a 15-token block inside
    // 19-token docs -> 15 windows each, 11 duplicated -> 733 milli;
    // doc 5 shares nothing -> 0; a sub-w doc has no windows -> zeros
    val block = (1 to 15).map(j => s"B$j").mkString(" ")
    val d = Seq(
      (1L, s"a1 a2 $block a3 a4"),
      (2L, s"b1 $block b2 b3 b4"),
      (5L, "solo tokens that never repeat anywhere else"),
      (6L, "tiny doc")).toDF("doc_id", "text")
    val base = d.select($"doc_id", $"text")
    val out = Dedup.spanDupFractionFrom(base,
        Dedup.spanRowsOf(d, "doc_id", "text"))
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (1L, 15L, 11L, 733L), (2L, 15L, 11L, 733L),
      (5L, 3L, 0L, 0L), (6L, 0L, 0L, 0L)), s"got ${out.toSeq}")
    // the w guard: shared spans at w=5 must refuse a w=50 consumer
    intercept[IllegalArgumentException] {
      Dedup.spanDupFractionFrom(base,
        Dedup.spanRowsOf(d, "doc_id", "text"), w = 50)
    }
  }

  test("PQ index artifacts survive a parquet round-trip") {
    import java.nio.file.Files
    val corpus = Tables.embeddings(spark, sf)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
    val queries = corpus.filter($"id" < 5)
    val dim = Similarity.inferDim(corpus)
    val cbs = Similarity.pqCodebooks(corpus, dim)
    val codes = Similarity.pqEncode(corpus, cbs, dim)
    val dir = Files.createTempDirectory("graft_pq").toString
    cbs.write.parquet(s"$dir/codebooks")
    codes.write.parquet(s"$dir/codes")
    val direct = Similarity.pqTopK(corpus, queries, 10,
      prebuiltCodebooks = Some(cbs), prebuiltCodes = Some(codes))
      .collect().map(_.toSeq).toSet
    val reloaded = Similarity.pqTopK(corpus, queries, 10,
      prebuiltCodebooks = Some(spark.read.parquet(s"$dir/codebooks")),
      prebuiltCodes = Some(spark.read.parquet(s"$dir/codes")))
      .collect().map(_.toSeq).toSet
    assert(reloaded == direct,
      "search over persisted index artifacts must equal the in-session index")
  }

  test("containment catches a planted sub-document that Jaccard misses") {
    val big = (0 until 40).map(i => s"w$i").mkString(" ")          // 38 shingles
    val sub = (10 until 16).map(i => s"w$i").mkString(" ")         // 4 shingles, all in big
    val planted = Seq((1L, big), (2L, sub)).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairsFrom(
        Dedup.shingleRows(planted, "doc_id", "text"), 500)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(pairs.length == 1)
    val (a, b, inter, na, nb, ca, cb) = pairs.head
    assert((a, b) == (1L, 2L))
    assert(inter == 4L && nb == 4L && cb == 1000L,
      "the sub-document is fully contained")
    assert(ca == (1000 * inter) / na)
    // Jaccard would have rejected this pair at the same 0.5 bar
    assert(inter * 1000 < (na + nb - inter) * 500)
    // below-threshold pairs are dropped in BOTH directions
    val far = Seq((1L, big), (2L, "w10 w11 w12 zz qq rr ss tt uu vv ww xx"))
      .toDF("doc_id", "text")
    assert(Dedup.containmentPairsFrom(
      Dedup.shingleRows(far, "doc_id", "text"), 500).count() == 0)
  }

  test("rocAuc: closed forms — separation 1e6/0, all-tied 500000, midrank hand check") {
    import graft.operators.Classify
    def auc(rows: Seq[(Long, Boolean)]): Long =
      Classify.rocAuc(rows.toDF("score", "pos"), "score", "pos")
        .select("auc_micro").as[Long].head()
    // perfect separation (every positive above every negative) and reverse
    assert(auc(Seq((10L, true), (11L, true), (1L, false), (2L, false))) == 1000000L)
    assert(auc(Seq((1L, true), (2L, true), (10L, false), (11L, false))) == 0L)
    // all scores identical: midrank ties give exactly chance level
    assert(auc(Seq((5L, true), (5L, true), (5L, false), (5L, false))) == 500000L)
    // hand check: pos {3, 1}, neg {2, 1} — pairs won 2, tied 0.5 of 4
    assert(auc(Seq((3L, true), (1L, true), (2L, false), (1L, false))) == 625000L)
  }

  test("rocAuc is invariant to input partitioning (distributed prefix sum)") {
    import graft.operators.Classify
    val rows = (0 until 997).map(i => ((i * 37 % 101).toLong, i % 3 == 0))
    def run(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      Classify.rocAuc(df, "score", "pos")
        .select("n_pos", "n_neg", "auc_micro").as[(Long, Long, Long)]
        .collect().map(t => t._3).toSeq
    val base = run(rows.toDF("score", "pos"))
    assert(base == run(rows.toDF("score", "pos").repartition(13)))
    assert(base == run(rows.toDF("score", "pos").coalesce(1)))
  }

  test("HLL registers: full table, mergeable via max, estimate within rate bound") {
    val a = (0 until 600).map(i => s"tok_a_$i").toDF("item")
    val b = (0 until 600).map(i => s"tok_b_$i").toDF("item")
    val ra = Sketches.hllRegisters(a, "item")
    assert(ra.count() == 64, "all registers present (zeros included)")
    // duplicates cannot move a max-of-rho register
    val dup = Sketches.hllRegisters(a.union(a).union(a), "item")
    assert(ra.collect().map(_.toSeq).toSet == dup.collect().map(_.toSeq).toSet)
    // sketch merge = register-wise max (the property that makes HLL
    // shardable at 100 TB: union the corpora or max the sketches)
    val merged = Sketches.hllRegisters(a.union(b), "item")
      .withColumnRenamed("rho_max", "m").join(ra.withColumnRenamed("rho_max", "x"), "register")
      .join(Sketches.hllRegisters(b, "item").withColumnRenamed("rho_max", "y"), "register")
    assert(merged.filter($"m" =!= greatest($"x", $"y")).count() == 0)
    // raw estimate within ~4 standard errors (1.04/sqrt(64) ≈ 13%)
    val est = Sketches.hllEstimate(merged.select($"register", $"m".as("rho_max")))
      .select("est").as[Long].head()
    assert(math.abs(est - 1200.0) / 1200.0 < 0.52,
      s"estimate $est too far from the 1200 true distinct")
  }

  test("grouped HLL equals the dense single-sketch estimate per group") {
    val tok = docs.select($"source",
      explode(TextFunctions.tokens($"text")).as("token"))
    val grouped = Sketches.hllEstimateBy(
        Sketches.hllRegistersBy(tok, "source", "token"))
      .select($"grp", $"est").as[(String, Long)].collect().toMap
    // the grouped arithmetic (absent registers folded in as 2^55 terms)
    // must equal the dense 64-row sketch built for that group alone
    for (src <- Seq("src0", "src7", "src19")) {
      val dense = Sketches.hllEstimate(Sketches.hllRegisters(
          tok.filter($"source" === src).select($"token".as("item")), "item"))
        .select("est").as[Long].head()
      assert(grouped(src) == dense, s"$src: ${grouped(src)} != $dense")
    }
  }

  test("BPE per-group compression ratios are consistent with the state") {
    import graft.operators.Collocations
    val (_, state) = Collocations.mergeRoundsWithState(docs, "doc_id", "text", 3)
    val after = state.groupBy("doc_id").agg(count(lit(1)).as("na"))
    val joined = docs.select($"doc_id", $"lang",
        size(TextFunctions.tokens($"text")).cast("long").as("nb"))
      .join(after, "doc_id")
      .groupBy("lang")
      .agg(sum($"nb").as("n_before"), sum($"na").as("n_after"))
      .as[(String, Long, Long)].collect()
    assert(joined.length == 5)
    joined.foreach { case (lang, before, a) =>
      assert(a <= before, s"$lang: merges cannot grow the token count")
      assert(a > 0, s"$lang: state lost docs")
    }
  }

  test("rendezvous reshard: every 8→9 move lands on the NEW shard; beats mod") {
    import graft.operators.Layout
    val ids = spark.range(0, 1000).toDF("doc_id")
    val sh = ids
      .withColumn("s8", Layout.rendezvousShard(col("doc_id"), 8))
      .withColumn("s9", Layout.rendezvousShard(col("doc_id"), 9))
      .as[(Long, Int, Int)].collect()
    assert(sh.forall { case (_, s8, _) => s8 >= 0 && s8 < 8 })
    val moved = sh.filter { case (_, s8, s9) => s8 != s9 }
    assert(moved.nonEmpty && moved.forall(_._3 == 8),
      "HRW growth relocates ONLY to the added shard")
    assert(moved.length < 250, s"~1/9 expected, got ${moved.length}/1000")
    val rep = Layout.reshardReport(ids, "doc_id", 8, 9)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rep("hrw")._4 < rep("mod")._4,
      "HRW moved fraction must beat mod-hash rewrite fraction")
    assert(rep("mod")._4 > 800L, "mod-hash 8→9 is a near-total rewrite")
    assert(rep("hrw")._3 == moved.length.toLong)
  }

  test("row-local gopher panel and strip equal their aggregation twins") {
    // the stateless per-row forms s_stream_clean runs (no explode, no
    // groupBy) must be row-for-row equal to the gated batch forms on
    // the same planted corpus — the withSimhash batch/stream duality
    val q = floor(col("doc_id") / 20) % 10
    val m = pmod(col("doc_id"), lit(10))
    val planted = Tables.documents(spark, sf).limit(200)
      .select(col("doc_id"), col("source"),
        concat(lit("(c) "), col("source"), lit(" reserved\n"), col("text"),
          when(m === 0, lit("\nrepeat me line\nrepeat me line")
            ).otherwise(lit("")),
          when(m === 1, lit(" badger badger badger")).otherwise(lit("")),
          when(q === 3, lit("\nrare promo")).otherwise(lit(""))).as("text"))
      .cache()
    val aggPanel = TextFunctions
      .gopherRepetitionStats(planted, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq)
    val rowPanel = TextFunctions.gopherPanelRow(planted, "text")
      .select("doc_id", "n_lines", "dup_line_micro", "dup_line_char_micro",
        "top2_char_micro", "dup3_char_micro", "keep")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(aggPanel.length == rowPanel.length && aggPanel.length > 0)
    aggPanel.zip(rowPanel).foreach { case (a, r) =>
      assert(a == r, s"gopher row/agg divergence: $a vs $r") }
    val aggStrip = operators.Dedup
      .boilerplateClean(planted, "doc_id", "source", "text")
      .orderBy("doc_id").collect().map(_.toSeq)
    val rowStrip = operators.Dedup.boilerplateCleanRow(planted,
        operators.Dedup.boilerplateDropSets(planted, "doc_id", "source",
          "text"),
        "doc_id", "source", "text")
      .orderBy("doc_id").collect().map(_.toSeq)
    graft.CacheScope.releaseAll()
    planted.unpersist()
    assert(aggStrip.length == rowStrip.length)
    aggStrip.zip(rowStrip).foreach { case (a, r) =>
      assert(a == r, s"strip row/agg divergence: $a vs $r") }
  }

  test("clean pipeline: strip runs BEFORE gopher, scrub BEFORE span dedup") {
    import spark.implicits._
    val head = "aaa bbb aaa bbb aaa bbb"
    val bodies = Seq(
      "one two xyz abc def ghi jkl mno pqr stu",
      "uvw rst opq lmn ijk fgh cde bca abd cab",
      "zzz yyy xxx www vvv uuu ttt sss rrr qqq")
    val long4 = "pad4 early filler tokens going along nicely today mail me" +
      " at u4@x.com soon now final words keep going until end"
    val long5 = "pad5 early filler tokens going along nicely today mail me" +
      " at u5@x.com soon now final words keep going until end"
    val docs = (bodies.zipWithIndex.map { case (b, i) =>
      (i.toLong + 1, "s", s"$head\n$b") } ++
      Seq((4L, "t", long4), (5L, "t", long5)))
      .toDF("doc_id", "source", "text")
    // ORDER PIN 1: on the RAW docs the majority header trips gopher's
    // top-2gram fraction for every source-s doc — a gopher-first
    // pipeline would drop them all; the shipped strip-first order keeps
    // them (the header is boilerplate, not content repetition)
    val rawKeep = graft.functions.TextFunctions
      .gopherRepetitionStats(docs, "doc_id", "text")
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(!rawKeep(_)),
      s"header must trip raw gopher: $rawKeep")
    val out = operators.Dedup.cleanPipeline(docs, "doc_id", "source", "text")
      .select("doc_id", "n_tokens", "n_kept")
      .as[(Long, Int, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    graft.CacheScope.releaseAll()
    assert(Seq(1L, 2L, 3L).forall(out.contains),
      s"strip-first must keep the source-s docs: ${out.keySet}")
    assert(Seq(1L, 2L, 3L).forall(d => out(d) == ((10, 10))),
      s"stripped bodies are unique 10-token texts: $out")
    // ORDER PIN 2: docs 4/5 differ only in their email pre-scrub (so
    // the strip keeps both lines); AFTER the scrub their redacted spans
    // are identical and span dedup must excise them in both docs —
    // impossible if the scrub ran after span dedup
    assert(out.contains(4L) && out.contains(5L), s"4/5 must survive: $out")
    assert(out(4L)._2 < out(4L)._1 && out(5L)._2 < out(5L)._1,
      s"redacted twins must span-dedup: $out")
  }

  test("unigram LM: EM learns the planted piece and apply segments with it") {
    import spark.implicits._
    // every doc is "abcabc xy": the only 2-piece segmentation of abcabc
    // is abc|abc, which the Viterbi must prefer over any 3+-piece path
    // (fewer log factors); EM must then prune the vocab down to exactly
    // the used pieces + the alphabet
    val docs = (1L to 20L).map(i => (i, "abcabc xy")).toDF("doc_id", "text")
    val vocab = Collocations.unigramVocab(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    graft.CacheScope.releaseAll()
    assert(vocab.keySet == Set("a", "b", "c", "x", "y", "abc", "xy"),
      s"vocab must converge to used pieces + alphabet: ${vocab.keySet}")
    assert(vocab("abc") == 40L && vocab("xy") == 20L,
      s"usage counts must be word-count-weighted: $vocab")
    assert(Seq("a", "b", "c", "x", "y").forall(vocab(_) == 0L),
      "chars are kept for coverage with zero usage")
    val applied = Collocations.unigramApplyFrom(
        Collocations.unigramVocab(docs, "doc_id", "text"),
        docs, "doc_id", "text")
      .select("doc_id", "n_words", "n_pieces").as[(Long, Long, Long)]
      .collect()
    graft.CacheScope.releaseAll()
    assert(applied.length == 20 && applied.forall { case (_, w, p) =>
      w == 2L && p == 3L }, "abcabc|xy must segment as abc abc xy")
  }

  test("BPE-dropout: deterministic and segmentation-changing") {
    import spark.implicits._
    // NOTE: n_drop >= n_plain is NOT universal — skipping an early
    // merge can ENABLE two later merges on the same tokens (y a b z
    // under merges (a,b),(y,a),(b,z)), so the only corpus-independent
    // contracts are determinism and that the gate fires somewhere
    val run = () => graft.queries.PipelineQueries
      .queries("d_bpe_dropout")(spark, sf)
      .select("doc_id", "n_plain", "n_drop").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    val out = run()
    assert(out.nonEmpty)
    // the 1/10 gate must actually change some segmentation at this SF
    assert(out.exists { case (_, p, d) => d != p },
      "dropout must alter at least one doc's segmentation")
    // zero RNG state: a second full apply is byte-identical
    assert(run() == out, "dropout must be deterministic")
    graft.CacheScope.releaseAll()
  }

  test("d_fim: roundtrip reassembly holds and split points are in-bounds") {
    val out = graft.queries.PipelineQueries.queries("d_fim")(spark, sf)
      .as[(Long, Int, Int, Int, Long, Int)].collect()
    assert(out.nonEmpty)
    assert(out.forall(_._6 == 1), "prefix||middle||suffix must equal text")
    assert(out.forall(r => r._3 >= 1 && r._3 <= r._4 && r._4 <= r._2 - 1),
      "1 <= p1 <= p2 <= n-1 so all three segments are well-formed")
  }
}
