package graft

import org.apache.spark.sql.functions._

/** Differential tests for the KinGraph facade against an in-memory Scala
  * digraph oracle — the same pattern as the reference's NetworkX tests
  * (/root/reference/tests/test_graph.py:24-63), compared as sets. */
class KinGraphSpec extends SparkSpec {
  import spark.implicits._

  /** Tiny in-memory oracle mirroring reference semantics: at most one edge
    * per (src, dst, etype); self-loops allowed. */
  case class Oracle(nodes: Set[String], edges: Set[(String, String, Int)]) {
    def addEdge(s: String, d: String, t: Int = 0): Oracle =
      Oracle(nodes + s + d, edges + ((s, d, t)))
    def removeNode(k: String): Oracle =
      Oracle(nodes - k, edges.filterNot(e => e._1 == k || e._2 == k))
    def neighbors(k: String): Set[String] = edges.collect { case (`k`, d, _) => d }
    def predecessors(k: String): Set[String] = edges.collect { case (s, `k`, _) => s }
  }

  def graphOf(o: Oracle): KinGraph =
    KinGraph(
      o.nodes.toSeq.toDF("key"),
      o.edges.toSeq.toDF("src", "dst", "etype"))

  // deterministic pseudo-random multigraph like tests/test_graph.py:19-31
  val rnd = new scala.util.Random(42)
  val n = 40
  val oracle: Oracle = (0 until n * 8).foldLeft(Oracle(Set.empty, Set.empty)) {
    case (o, _) => o.addEdge(s"node_${rnd.nextInt(n)}", s"node_${rnd.nextInt(n)}")
  }
  lazy val g: KinGraph = graphOf(oracle).preload()

  test("counts match oracle") {
    assert(g.nNodes == oracle.nodes.size)
    assert(g.nEdges == oracle.edges.size)
  }

  test("node and edge membership matches oracle") {
    assert(g.nodeKeys.as[String].collect().toSet == oracle.nodes)
    assert(g.edgePairs.as[(String, String)].collect().toSet ==
      oracle.edges.map(e => (e._1, e._2)))
  }

  test("neighbors and predecessors match oracle for every node") {
    val nbrs = g.edges.groupBy("src").agg(collect_set($"dst").as("ns"))
      .as[(String, Seq[String])].collect().toMap
    val preds = g.edges.groupBy("dst").agg(collect_set($"src").as("ps"))
      .as[(String, Seq[String])].collect().toMap
    oracle.nodes.foreach { k =>
      assert(nbrs.getOrElse(k, Nil).toSet == oracle.neighbors(k), s"nbrs($k)")
      assert(preds.getOrElse(k, Nil).toSet == oracle.predecessors(k), s"preds($k)")
    }
  }

  test("neighborsFrom/predecessorsFrom: one row per existing key (empty " +
    "list for zero degree), NodeNotFound for missing keys") {
    // differential vs the oracle over EVERY node — zero-out-degree sinks
    // must appear with an empty list (reference graph.py:928-940 yields an
    // empty iterator, never skips the key)
    val allKeys = oracle.nodes.toSeq
    val nf = g.neighborsFrom(allKeys)
      .as[(String, Seq[String])].collect().toMap
    val pf = g.predecessorsFrom(allKeys)
      .as[(String, Seq[String])].collect().toMap
    assert(nf.keySet == oracle.nodes, "every queried key appears")
    assert(pf.keySet == oracle.nodes)
    oracle.nodes.foreach { k =>
      assert(nf(k) == oracle.neighbors(k).toSeq.sorted, s"nbrsFrom($k)")
      assert(pf(k) == oracle.predecessors(k).toSeq.sorted, s"predsFrom($k)")
    }
    // a missing key raises eagerly, like neighbors() (graph.py:865)
    assertThrows[NodeNotFound](g.neighborsFrom(Seq(allKeys.head, "missing_key")))
    assertThrows[NodeNotFound](g.predecessorsFrom(Seq("missing_key")))
    // explicit sink/source fixture (the dense random graph has none):
    // b is a pure sink, a/c pure sources — each must appear with []
    val g2 = graphOf(Oracle(Set("a", "b", "c"),
      Set(("a", "b", 0), ("c", "b", 0))))
    val nf2 = g2.neighborsFrom(Seq("a", "b", "c"))
      .as[(String, Seq[String])].collect().toMap
    assert(nf2 == Map("a" -> Seq("b"), "b" -> Seq.empty, "c" -> Seq("b")))
    val pf2 = g2.predecessorsFrom(Seq("a", "b", "c"))
      .as[(String, Seq[String])].collect().toMap
    assert(pf2 == Map("a" -> Seq.empty, "b" -> Seq("a", "c"), "c" -> Seq.empty))
  }

  test("neighborsFromSeq/predecessorsFromSeq: positional reference parity — " +
    "one result per input OCCURRENCE, duplicates included, order-aligned") {
    // the reference's loop yields one iterator per input element
    // (graph.py:928-957); the keyed frame collapses duplicates, so the
    // positional facade must replay them
    val g2 = graphOf(Oracle(Set("a", "b", "c"),
      Set(("a", "b", 0), ("c", "b", 0))))
    val in = Seq("a", "b", "a", "c", "a")
    val nf = g2.neighborsFromSeq(in)
    assert(nf.size == in.size, "one result per input occurrence")
    assert(nf.map(_._1) == in, "order-aligned with the input")
    assert(nf == Seq("a" -> Seq("b"), "b" -> Seq.empty, "a" -> Seq("b"),
      "c" -> Seq("b"), "a" -> Seq("b")))
    val pf = g2.predecessorsFromSeq(Seq("b", "b"))
    assert(pf == Seq("b" -> Seq("a", "c"), "b" -> Seq("a", "c")))
    assertThrows[NodeNotFound](g2.neighborsFromSeq(Seq("a", "missing_key")))
  }

  test("point lookups and existence") {
    val k = oracle.nodes.head
    assert(g.node(k).getAs[String]("key") == k)
    assert(g.hasNode(k))
    assert(!g.hasNode("missing_key"))
    val (s, d, t) = oracle.edges.head
    assert(g.hasEdge(s, d, t))
    assert(g.edge(s, d, t).getAs[String]("src") == s)
    assertThrows[NodeNotFound](g.node("missing_key"))
    assertThrows[EdgeNotFound](g.edge("missing_key", "also_missing"))
    assertThrows[NodeNotFound](g.neighbors("missing_key"))
    assertThrows[KeyTooLong](g.node("a" * 20, maxKeyLen = 15))
  }

  test("point-lookup LRU: repeated node()/edge() launches no Spark job; " +
    "emptyCache restores cold behavior (reference cache_len contract)") {
    // a parquet-backed graph: on the in-memory fixtures Catalyst folds
    // point lookups into a LocalRelation (zero jobs even cold), so the
    // job-count pin needs a real scan behind the facade. Built PRIVATELY
    // (not Tables.tradeGraph): emptyCache() unpersists the graph's
    // frames, and doing that to the session-shared registered "trade"
    // cache would break the registry invariant for every later test
    val tg = graft.KinGraph.fromEdges(
      graft.sources.Tables.tradeEdges(spark, sf))
    val k = "S1"
    val eRow = tg.edges.limit(1).collect().head
    val (s0, d0, t0) = (eRow.getAs[String]("src"), eRow.getAs[String]("dst"),
      eRow.getAs[Int]("etype"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r1 = tg.node(k)
      val e1 = tg.edge(s0, d0, t0)
      // drain the async listener bus until the count is STABLE — ">= 2"
      // is a floor, not the total (AQE can run several jobs per lookup),
      // and an early snapshot would leak late cold events into the
      // warm-phase equality assert
      val t = System.currentTimeMillis()
      var cold = -1
      var last = jobs.get()
      while (cold < 0 && System.currentTimeMillis() - t < 10000) {
        Thread.sleep(300)
        val now = jobs.get()
        if (now == last && now >= 2) cold = now else last = now
      }
      assert(cold >= 2, "cold lookups must run Spark jobs")
      assert(tg.lookupCacheSize == 2)
      // warm repeats are served from the LRU — zero new jobs
      assert(tg.node(k) == r1)
      assert(tg.edge(s0, d0, t0) == e1)
      tg.nodeData(k) // rides the same cache via node()
      Thread.sleep(300) // allow any unexpected job event to surface
      assert(jobs.get() == cold, "cached lookups must not launch Spark jobs")
      // emptyCache drops the LRU: the next lookup is cold again
      tg.emptyCache()
      assert(tg.lookupCacheSize == 0)
      assert(tg.node(k) == r1)
      val t2 = System.currentTimeMillis()
      while (jobs.get() == cold && System.currentTimeMillis() - t2 < 5000)
        Thread.sleep(20)
      assert(jobs.get() > cold, "post-clear lookup must re-probe storage")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("requireKeyLen enforces the KeyTooLong contract on batches") {
    val batch = Seq("ok_key", "x" * 20).toDF("key")
    assertThrows[KeyTooLong](g.requireKeyLen(batch, Seq("key"), 15))
    g.requireKeyLen(Seq("fine").toDF("key"), Seq("key"), 15) // no throw
    val bad = g.invalidKeys(batch, Seq("key"), 15).as[String].collect()
    assert(bad.toSeq == Seq("x" * 20))
  }

  test("GraphIO.open graphs enforce the reference max_key_len=15 by default " +
    "(graph.py:23-24, 1366); direct construction stays permissive") {
    val opened = io.GraphIO.open(spark, "/tmp/graft_keylen_spec", "n")
    assertThrows[KeyTooLong](opened.addNodes(Seq("a" * 16).toDF("key")))
    assertThrows[KeyTooLong](opened.addEdges(
      Seq(("b" * 16, "x", 0)).toDF("src", "dst", "etype")))
    val ok = opened.addNodes(Seq("a" * 15).toDF("key"))
    assert(ok.nNodes == 1)
    // derived graphs carry the contract, and point lookups honor it
    assert(ok.maxKeyLen == KinConfig.DefaultMaxKeyLen)
    assertThrows[KeyTooLong](ok.node("a" * 16))
    // direct construction stays permissive: analytics keys are unbounded
    val direct = KinGraph(Seq("z" * 40).toDF("key"),
      Seq.empty[(String, String, Int)].toDF("src", "dst", "etype"))
    assert(direct.addNodes(Seq("y" * 40).toDF("key")).nNodes == 2)
    // explicit opt-out restores the permissive behavior on open
    val loose = io.GraphIO.open(spark, "/tmp/graft_keylen_spec2", "n",
      maxKeyLen = Int.MaxValue)
    assert(loose.addNodes(Seq("w" * 16).toDF("key")).nNodes == 1)
  }

  test("requireAttrLen enforces max_str_len on string ATTRS (ref graph.py:227-228)") {
    val batch = Seq(("k1", "short"), ("k2", "y" * 20)).toDF("key", "name")
    assertThrows[StringTooLong](g.requireAttrLen(batch, Seq("key"), 15))
    // key length is exempt here (that's requireKeyLen's contract)
    g.requireAttrLen(Seq(("k" * 20, "ok")).toDF("key", "name"), Seq("key"), 15)
    // non-string attrs never trip the guard
    g.requireAttrLen(Seq(("k1", 123456789)).toDF("key", "n"), Seq("key"), 5)
  }

  test("upsert honors explicit __seq batch order on shuffled input") {
    val base = KinGraph(Seq(("n1", "orig")).toDF("key", "name"),
      Seq.empty[(String, String, Int)].toDF("src", "dst", "etype"))
    // __seq pins last-write-wins even though the winner appears first in
    // the local Seq and the batch is repartitioned (shuffled) before upsert
    val batch = Seq(("n1", "winner", 9L), ("n1", "loser", 1L))
      .toDF("key", "name", KinGraph.BatchOrderCol)
      .repartition(4)
    val out = base.addNodes(batch)
    assert(out.node("n1").getAs[String]("name") == "winner")
    assert(out.nodes.columns.toSeq == Seq("key", "name")) // __seq dropped
  }

  test("addEdges auto-creates endpoints and dedups on identity") {
    val add = Seq(("zz_new1", "zz_new2", 0), ("zz_new1", "zz_new2", 0),
      ("zz_new1", "zz_new2", 1)).toDF("src", "dst", "etype")
    val g2 = g.addEdges(add)
    assert(g2.nNodes == oracle.nodes.size + 2)
    // one edge for etype 0 (deduped), one for etype 1 (multi-edge by type)
    assert(g2.nEdges == oracle.edges.size + 2)
    assert(g2.hasEdge("zz_new1", "zz_new2", 0))
    assert(g2.hasEdge("zz_new1", "zz_new2", 1))
  }

  test("upsert replaces attributes wholly (reference attr-replace semantic)") {
    val nodes = Seq(("a", "old_name", 1.0), ("b", "keep", 2.0))
      .toDF("key", "name", "score")
    val edges = Seq(("a", "b", 0, 5.0)).toDF("src", "dst", "etype", "weight")
    val g0 = KinGraph(nodes, edges)
    // upsert node a with NO score -> score must become null (whole replace)
    val up = Seq(("a", "new_name")).toDF("key", "name")
    val g1 = g0.addNodes(up)
    val row = g1.node("a")
    assert(row.getAs[String]("name") == "new_name")
    assert(row.isNullAt(row.fieldIndex("score")))
    // untouched node keeps attrs
    assert(g1.node("b").getAs[Double]("score") == 2.0)
    // edge upsert replaces weight
    val g2 = g1.addEdges(Seq(("a", "b", 0, 9.5)).toDF("src", "dst", "etype", "weight"))
    assert(g2.edge("a", "b").getAs[Double]("weight") == 9.5)
    assert(g2.nEdges == 1)
  }

  test("removeNode cascades incident edges like the reference") {
    val k = oracle.edges.head._1
    val o2 = oracle.removeNode(k)
    val g2 = g.removeNode(k)
    assert(g2.nNodes == o2.nodes.size)
    assert(g2.nEdges == o2.edges.size)
    assert(g2.edgePairs.as[(String, String)].collect().toSet ==
      o2.edges.map(e => (e._1, e._2)))
    assertThrows[NodeNotFound](g.removeNode("missing_key"))
  }

  test("removeEdge deletes exactly one identity") {
    val (s, d, t) = oracle.edges.head
    val g2 = g.removeEdge(s, d, t)
    assert(g2.nEdges == oracle.edges.size - 1)
    assert(!g2.hasEdge(s, d, t))
    assertThrows[EdgeNotFound](g.removeEdge("nope", "nada"))
  }

  test("setNeighbors replaces out-adjacency declaratively") {
    val k = oracle.nodes.head
    val g2 = g.setNeighbors(k, Seq("node_0", "node_1"))
    val ns = g2.edges.filter($"src" === k).select("dst").as[String].collect().toSet
    assert(ns == Set("node_0", "node_1"))
    // other adjacency untouched
    val other = oracle.nodes.find(_ != k).get
    assert(g2.edges.filter($"src" === other).count() ==
      oracle.neighbors(other).size)
  }

  test("setPredecessors replaces in-adjacency; creates node if absent") {
    val g2 = g.setPredecessors("zz_fresh", Seq("node_0"))
    assert(g2.hasNode("zz_fresh"))
    assert(g2.predecessors("zz_fresh").as[String].collect().toSet == Set("node_0"))
  }

  test("batch pagination covers all rows exactly once") {
    var cursor = ""
    val all = Seq.newBuilder[String]
    var n = 0
    var done = false
    while (!done && n < 100) {
      val page = g.batchGetNodes(10, cursor).select("key").as[String].collect().toSeq
      if (page.isEmpty) done = true
      else { all ++= page; cursor = page.max; n += 1 }
    }
    val res = all.result()
    assert(res.size == oracle.nodes.size)
    assert(res.toSet == oracle.nodes)
  }

  test("adjacencyCoo is a valid COO of the graph") {
    val coo = g.adjacencyCoo.collect()
    assert(coo.length == oracle.edges.map(e => (e._1, e._2)).size)
    val ids = g.denseIds.as[(String, Long)].collect().toMap
    val fromCoo = coo.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = oracle.edges.map(e => (ids(e._1), ids(e._2)))
    assert(fromCoo == expected)
  }

  test("subgraph keeps only edges with both endpoints in the key set") {
    val keys = oracle.nodes.take(10)
    val sg = g.subgraph(keys.toSeq.toDF("key"))
    assert(sg.nodeKeys.as[String].collect().toSet == keys)
    val expected = oracle.edges.filter(e => keys(e._1) && keys(e._2))
    assert(sg.edgePairs.as[(String, String)].collect().toSet ==
      expected.map(e => (e._1, e._2)))
  }

  test("common neighbors/predecessors match set intersection") {
    val ks = oracle.nodes.toSeq.sorted
    val (u, v) = (ks.head, ks(1))
    assert(g.commonNeighbors(u, v).as[String].collect().toSet ==
      (oracle.neighbors(u) intersect oracle.neighbors(v)))
    assert(g.commonPredecessors(u, v).as[String].collect().toSet ==
      (oracle.predecessors(u) intersect oracle.predecessors(v)))
  }

  test("degrees match oracle") {
    val outs = g.outDegrees.as[(String, Long)].collect().toMap
    oracle.nodes.foreach { k =>
      assert(outs.getOrElse(k, 0L) == oracle.neighbors(k).size, s"deg($k)")
    }
    val k = oracle.edges.head._1
    assert(g.outDegree(k) == oracle.neighbors(k).size)
  }
}
