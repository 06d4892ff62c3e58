package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Randomized mixed-op integrity test mirroring the reference's
  * examples/check_integrity.py (100k interleaved ops vs NetworkX with
  * p_edge_del=.2, p_node_del=.25): apply a random op sequence to both
  * KinGraph and the in-memory oracle, then compare every invariant the
  * reference checks — counts, node/edge sets, per-node adjacency. Batched
  * here (ops applied as one plan per kind per round) because that is the
  * engine's intended mutation style. */
class IntegritySpec extends SparkSpec {
  import spark.implicits._

  sealed trait Op
  case class AddEdge(u: String, v: String) extends Op
  case class DelEdge(u: String, v: String) extends Op
  case class DelNode(u: String) extends Op

  val nKeys = 30
  def key(i: Int): String = s"n$i"

  val genOp: Gen[Op] = for {
    p <- Gen.choose(0.0, 1.0)
    u <- Gen.choose(0, nKeys - 1).map(key)
    v <- Gen.choose(0, nKeys - 1).map(key)
  } yield if (p < 0.2) DelEdge(u, v) else if (p < 0.45) DelNode(u) else AddEdge(u, v)

  case class State(nodes: Set[String], edges: Set[(String, String)]) {
    def apply(op: Op): State = op match {
      case AddEdge(u, v) => State(nodes + u + v, edges + ((u, v)))
      case DelEdge(u, v) => State(nodes, edges - ((u, v)))
      case DelNode(u) => State(nodes - u, edges.filterNot(e => e._1 == u || e._2 == u))
    }
  }

  def applyToGraph(g: KinGraph, op: Op): KinGraph = op match {
    case AddEdge(u, v) => g.addEdges(Seq((u, v, 0)).toDF("src", "dst", "etype"))
    case DelEdge(u, v) =>
      if (g.hasEdge(u, v)) g.removeEdge(u, v) else g
    case DelNode(u) =>
      if (g.hasNode(u)) g.removeNode(u) else g
  }

  test("random op sequences keep KinGraph equal to the oracle") {
    // scalacheck-core generators with pinned seeds (the scalatest bridge
    // artifact is not on the offline classpath)
    (1 to 2).foreach { trial =>
      val ops = Gen.listOfN(20, genOp)
        .apply(Gen.Parameters.default, Seed(42L + trial)).get
      val empty = io.GraphIO.empty(spark)
      // checkpoint every 5 ops: call-at-a-time chains grow the plan per op
      // (see KinGraph.checkpointed) — this pins the facade's answer to that
      val (g, st) = ops.zipWithIndex.foldLeft((empty, State(Set.empty, Set.empty))) {
        case ((gr, s), (op, i)) =>
          val next = applyToGraph(gr, op)
          (if ((i + 1) % 5 == 0) next.checkpointed() else next, s(op))
      }
      assert(g.nodeKeys.as[String].collect().toSet == st.nodes)
      assert(g.edgePairs.as[(String, String)].collect().toSet == st.edges)
      // per-node adjacency equality, as check_integrity.py:65-78 does
      val nbrs = g.edges.groupBy("src").agg(collect_set($"dst")).as[(String, Seq[String])]
        .collect().toMap
      st.nodes.foreach { k =>
        val expected = st.edges.collect { case (`k`, d) => d }
        assert(nbrs.getOrElse(k, Nil).toSet == expected, s"adjacency($k)")
      }
    }
  }

  test("batched mutation equivalence: one addEdges == sequential adds") {
    val pairs = (0 until 50).map(i => (key(i % 10), key((i * 7) % 10), 0))
    val batched = io.GraphIO.empty(spark)
      .addEdges(pairs.toDF("src", "dst", "etype"))
    val expected = pairs.map(p => (p._1, p._2)).toSet
    assert(batched.edgePairs.as[(String, String)].collect().toSet == expected)
    assert(batched.nNodes == expected.flatMap(e => Seq(e._1, e._2)).size)
  }
}
