package graft

import graft.io.GraphIO
import java.nio.file.Files

/** Open/save roundtrip with the reference's r/w/n flag contract
  * (/root/reference/kinbaku/graph.py:67-70, 282-306). */
class GraphIOSpec extends SparkSpec {
  import spark.implicits._

  test("save + open('r') roundtrips nodes and edges") {
    val dir = Files.createTempDirectory("graft_io").toString
    val g = KinGraph(
      Seq("a", "b", "c").toDF("key"),
      Seq(("a", "b", 0), ("b", "c", 1)).toDF("src", "dst", "etype"))
    GraphIO.save(g, dir)
    val g2 = GraphIO.open(spark, dir, "r")
    assert(g2.nNodes == 3 && g2.nEdges == 2)
    assert(g2.hasEdge("b", "c", 1))
  }

  test("open('r') on missing path throws; open('w') creates empty") {
    assertThrows[KinbakuError](GraphIO.open(spark, "/tmp/graft_missing_xyz", "r"))
    val g = GraphIO.open(spark, "/tmp/graft_missing_xyz", "w")
    assert(g.nNodes == 0 && g.nEdges == 0)
  }

  test("open('n') ignores existing data (fresh overwrite semantics)") {
    val dir = Files.createTempDirectory("graft_io_n").toString
    GraphIO.save(KinGraph(Seq("x").toDF("key"),
      Seq.empty[(String, String, Int)].toDF("src", "dst", "etype")), dir)
    val g = GraphIO.open(spark, dir, "n")
    assert(g.nNodes == 0)
  }

  test("csv and json export/import round-trip") {
    val g = KinGraph(
      Seq("a", "b").toDF("key"),
      Seq(("a", "b", 0)).toDF("src", "dst", "etype"))
    for (fmt <- Seq("csv", "json")) {
      val dir = Files.createTempDirectory(s"graft_io_$fmt").toString
      GraphIO.export(g, dir, fmt)
      val g2 = GraphIO.importFrom(spark, dir, fmt)
      assert(g2.nNodes == 2 && g2.nEdges == 1, fmt)
      assert(g2.hasEdge("a", "b"), fmt)
    }
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
