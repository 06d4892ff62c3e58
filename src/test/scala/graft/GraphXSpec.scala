package graft

import org.apache.spark.sql.functions._
import graft.gx.GraphXBridge

/** Pins the GraphX algorithm semantics on a tiny known graph (these are
  * rows-only in the driver gate, so the spec is their correctness anchor):
  *    a -> b -> c -> a   (a 3-cycle = one triangle, one component)
  *    d -> e             (a 2-chain, second component)
  *    f                  (isolated via self-loop removal? no: f-f self loop)
  */
class GraphXSpec extends SparkSpec {
  import spark.implicits._

  lazy val g = KinGraph(
    Seq("a", "b", "c", "d", "e", "f").toDF("key"),
    Seq(("a", "b", 0), ("b", "c", 0), ("c", "a", 0), ("d", "e", 0), ("f", "f", 0))
      .toDF("src", "dst", "etype"))
  lazy val gx = GraphXBridge.toGraphX(g)

  test("triangle counts: each cycle vertex in exactly one triangle") {
    val tc = GraphXBridge.triangleCounts(gx).as[(String, Int)].collect().toMap
    assert(tc("a") == 1 && tc("b") == 1 && tc("c") == 1)
    assert(tc("d") == 0 && tc("e") == 0 && tc("f") == 0)
  }

  test("connected components: min-key labels, self-loop keeps own component") {
    val cc = GraphXBridge.connectedComponents(gx).as[(String, String)].collect().toMap
    assert(cc("a") == "a" && cc("b") == "a" && cc("c") == "a")
    assert(cc("d") == "d" && cc("e") == "d")
    assert(cc("f") == "f")
  }

  test("pagerank: cycle vertices equal; chain sink outranks source") {
    val pr = GraphXBridge.pageRank(gx, 20).as[(String, Double)].collect().toMap
    assert(math.abs(pr("a") - pr("b")) < 1e-6)
    assert(math.abs(pr("b") - pr("c")) < 1e-6)
    assert(pr("e") > pr("d"))
  }

  test("pagerank rank agreement: disagreements are adjacent near-tie swaps only") {
    // the driver gate (gx_pagerank_rank) is a slack frame flag
    // (>=49/50); this pins the STRUCTURE the slack exists for — a
    // float-vs-fixed-point divergence may only be an adjacent
    // transposition of near-tied scores, so a persistent >=1-position
    // displacement that is NOT a neighbor swap fails here even though
    // the frame flag would stay green
    val al = graft.queries.GxQueries.pagerankRankAlignment(spark, sf)
      .select($"pos", $"key", $"key_gx")
      .as[(Int, String, String)].collect().sortBy(_._1)
    assert(al.length == 50)
    val fpAt = al.map(r => r._1 -> r._2).toMap
    val dis = al.filter(r => r._3 == null || r._2 != r._3)
    assert(dis.length <= 1, s"positional disagreements: ${dis.toSeq}")
    assert(dis.forall(r => r._3 != null &&
      (fpAt.get(r._1 - 1).contains(r._3) || fpAt.get(r._1 + 1).contains(r._3))),
      s"non-adjacent rank divergence: ${dis.toSeq}")
  }

  test("pagerank rank agreement: swap distribution is stable across runs") {
    // retry-tolerant stability pin for the driver gate's slack: three
    // independent alignments (fresh GraphX runs) must agree on WHICH
    // positions disagree, and the swap count must stay within the
    // gate's slack. Measured distribution on this fixture (3 runs,
    // sf0.001): zero disagreements in every run — the float scores (same
    // 5-iter horizon as the fp twin since r16) are far enough apart in
    // the top 50 that no adjacent pair ties; the driver gate's floor is
    // raised to 49/50 on that basis (one swap of slack retained for
    // larger-SF near-ties).
    val runs = (1 to 3).map { _ =>
      val dis = graft.queries.GxQueries.pagerankRankAlignment(spark, sf)
        .select($"pos", $"key", $"key_gx")
        .as[(Int, String, String)].collect()
        .filter(r => r._3 == null || r._2 != r._3).map(_._1).toSet
      graft.CacheScope.releaseAll()
      dis
    }
    assert(runs.forall(_ == runs.head),
      s"disagreeing positions must be run-stable: $runs")
    assert(runs.head.size <= 1,
      s"swap count beyond the gate slack: ${runs.head}")
  }

  test("shortest paths: forward-edge hop distance to the landmark") {
    // a->b->c->a cycle: distance to c is 2 from a, 1 from b, 0 from c
    val d = GraphXBridge.shortestPathsTo(gx, "c").as[(String, Int)].collect().toMap
    assert(d("c") == 0 && d("b") == 1 && d("a") == 2)
    assert(!d.contains("d") && !d.contains("f")) // unreachable omitted
    assertThrows[NodeNotFound](GraphXBridge.shortestPathsTo(gx, "nope"))
  }

  test("vertex-id switchover: hash ids below threshold, dense ids above") {
    // hash path (default): ids are xxhash64 values, unique on this fixture
    val hashIds = gx.vertices.map(_._1).collect()
    assert(hashIds.distinct.length == hashIds.length)
    assert(!hashIds.forall(id => id >= 0 && id < 6)) // genuinely hashes
    // forcing the threshold to 0 nodes switches to collision-safe dense ids
    val dense = GraphXBridge.toGraphX(g, 0, maxHashNodes = 0L)
    val denseIds = dense.vertices.map(_._1).collect().sorted
    assert(denseIds.toSeq == (0L until 6L)) // rank over key order
    // both id schemes produce the same algorithm results
    val ccHash = GraphXBridge.connectedComponents(gx)
      .as[(String, String)].collect().toMap
    val ccDense = GraphXBridge.connectedComponents(dense)
      .as[(String, String)].collect().toMap
    assert(ccHash == ccDense)
  }

  test("user-supplied hashFunc drives vertex ids (ref hash_func ctor param)") {
    val custom = KinGraph(g.nodes, g.edges, c => xxhash64(lit("salt"), c))
    val gx2 = GraphXBridge.toGraphX(custom)
    val expected = custom.nodes.select(xxhash64(lit("salt"), $"key"))
      .as[Long].collect().toSet
    assert(gx2.vertices.map(_._1).collect().toSet == expected)
    val cc = GraphXBridge.connectedComponents(gx2)
      .as[(String, String)].collect().toMap
    assert(cc("b") == "a") // algorithms unaffected by the id family
  }

  test("degrees count directed edges incl. self-loops; isolated-side zeros") {
    val d = GraphXBridge.degrees(gx).as[(String, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(d("a") == ((1, 1)))
    assert(d("d") == ((1, 0)))
    assert(d("e") == ((0, 1)))
    assert(d("f") == ((1, 1)))
  }
}
