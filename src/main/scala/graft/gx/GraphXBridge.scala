package graft.gx

import org.apache.spark.graphx.{Edge, Graph, VertexId, PartitionStrategy}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.KinGraph

/** GraphX bridge — the analytics layer the reference points at with its
  * adjacency-matrix export (/root/reference/kinbaku/graph.py:1188-1265) and
  * its "Algorithms: coming soon" roadmap (docs/source/tutorial.rst).
  *
  * Vertex ids are the KinGraph dense ids (deterministic rank over key
  * order), so results join back to keys exactly like the reference's
  * `dictionary` return value. Edge partitioning uses EdgePartition2D which
  * bounds replication by 2*sqrt(numParts) — the right default for skewed
  * power-law graphs at scale. */
object GraphXBridge {

  /** Build a GraphX graph keyed by dense ids; vertex attr = key. */
  def toGraphX(g: KinGraph, numPartitions: Int = 0): Graph[String, Int] = {
    val ids = g.denseIds.cache()
    val verts = ids.rdd.map(r => (r.getLong(1): VertexId, r.getString(0)))
    val e = g.edges
      .join(ids.withColumnRenamed("key", "src").withColumnRenamed("id", "sid"), "src")
      .join(ids.withColumnRenamed("key", "dst").withColumnRenamed("id", "did"), "dst")
      .select(col("sid"), col("did"), col("etype"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), r.getInt(2)))
    val graph = Graph(verts, e)
    val parts = if (numPartitions > 0) numPartitions
                else graph.edges.getNumPartitions
    graph.partitionBy(PartitionStrategy.EdgePartition2D, parts)
  }

  private def withKeys(g: KinGraph, byId: DataFrame, valueCol: String): DataFrame = {
    val ids = g.denseIds
    byId.join(ids, byId("vid") === ids("id"))
      .select(col("key"), col(valueCol))
  }

  /** Static PageRank (fixed iterations, resetProb 0.15), keyed back to
    * node keys. */
  def pageRank(g: KinGraph, iters: Int = 10): DataFrame = {
    val sp = g.nodes.sparkSession
    import sp.implicits._
    val ranks = toGraphX(g).staticPageRank(iters).vertices
      .map { case (vid, r) => (vid, r) }.toDF("vid", "rank")
    withKeys(g, ranks, "rank")
  }

  /** Connected components (undirected semantics), component = min dense id
    * in the component, keyed back to node keys. */
  def connectedComponents(g: KinGraph): DataFrame = {
    val sp = g.nodes.sparkSession
    import sp.implicits._
    val cc = toGraphX(g).connectedComponents().vertices
      .map { case (vid, c) => (vid, c) }.toDF("vid", "component")
    withKeys(g, cc, "component")
  }

  /** Per-node triangle count (undirected, ignoring self-loops and
    * multiplicity — GraphX TriangleCount contract). */
  def triangleCounts(g: KinGraph): DataFrame = {
    val sp = g.nodes.sparkSession
    import sp.implicits._
    val tc = toGraphX(g)
      .partitionBy(PartitionStrategy.EdgePartition2D)
      .triangleCount().vertices
      .map { case (vid, c) => (vid, c) }.toDF("vid", "triangles")
    withKeys(g, tc, "triangles")
  }

  /** In/out degrees via GraphX (parity check for KinGraph.outDegrees). */
  def degrees(g: KinGraph): DataFrame = {
    val sp = g.nodes.sparkSession
    import sp.implicits._
    val gx = toGraphX(g)
    val outs = gx.outDegrees.map { case (v, d) => (v, d) }.toDF("vid", "out_degree")
    val ins = gx.inDegrees.map { case (v, d) => (v, d) }.toDF("vid2", "in_degree")
    val ids = g.denseIds
    ids.join(outs, ids("id") === outs("vid"), "left")
      .join(ins, ids("id") === ins("vid2"), "left")
      .select(col("key"),
        coalesce(col("out_degree"), lit(0)).as("out_degree"),
        coalesce(col("in_degree"), lit(0)).as("in_degree"))
  }
}
