package graft

case class Person(key: String, name: String, email: String)
case class Loves(src: String, dst: String, etype: Int, love: Double)

/** Custom-attribute classes (SURVEY §2 #36/#37): user case classes as
  * schemas, mirroring /root/reference/examples/custom_attributes.py. */
class TypedGraphSpec extends SparkSpec {
  import spark.implicits._

  lazy val tg = TypedKinGraph(
    Seq(Person("u1", "Ada", "ada@x"), Person("u2", "Bob", "bob@x")).toDS(),
    Seq(Loves("u1", "u2", 0, 0.9)).toDS())

  test("typed point lookups return the user class") {
    assert(tg.node("u1").name == "Ada")
    assert(tg.edge("u1", "u2").love == 0.9)
    assertThrows[NodeNotFound](tg.node("nope"))
    assertThrows[EdgeNotFound](tg.edge("u2", "u1"))
  }

  test("typed graph runs the relational surface via .graph") {
    val g = tg.graph
    assert(g.nNodes == 2 && g.nEdges == 1)
    assert(g.neighbors("u1").as[String].collect().toSeq == Seq("u2"))
    // attr-replace upsert through the untyped surface keeps typed schema
    val g2 = g.updated("u1", Map("name" -> "Ada2", "email" -> "a2@x"))
    assert(g2.node("u1").getAs[String]("name") == "Ada2")
  }

  test("data() projection returns user attrs only, nulls dropped") {
    val g = tg.graph.updated("u3", Map("name" -> "Cee"))
    assert(g.nodeData("u3") == Map("name" -> "Cee"))
    assert(g.edgeData("u1", "u2") == Map("love" -> 0.9))
  }

  test("data() drops empty-string attrs like the reference (structure.py:59-60)") {
    val g = tg.graph.updated("u4", Map("name" -> "Dee", "email" -> ""))
    assert(g.nodeData("u4") == Map("name" -> "Dee")) // "" suppressed
  }

  test("facade sugar: apply/contains") {
    val g = tg.graph
    assert(g("u1").getAs[String]("key") == "u1")
    assert(g("u1", "u2").getAs[Double]("love") == 0.9)
    assert(g.contains("u1") && !g.contains("zz"))
    assert(g.contains("u1", "u2") && !g.contains("u2", "u1"))
  }

  test("compact returns stats and preserves content") {
    val (gc, nn, ne) = tg.graph.compact(2)
    assert(nn == 2 && ne == 1)
    assert(gc.hasEdge("u1", "u2"))
  }
}
