package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.KinGraph

/** Batched traversal / aggregation operators beyond the reference's
  * point-wise surface — the set-oriented forms a Spark engine should offer.
  */
object GraphOps {

  /** All nodes reachable from `start` in exactly `k` hops (distinct), as a
    * 1-column DataFrame (`key`). Each hop is one semi-join-shaped
    * shuffle: frontier ⋈ edges on src. BFS-by-join, no driver loop over
    * rows — the loop is over k (plan depth k, bounded and small). */
  def kHopNeighbors(g: KinGraph, start: String, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    var frontier = g.edges.filter(col("src") === start)
      .select(col("dst").as("key")).distinct()
    for (_ <- 2 to k) {
      frontier = g.edges
        .join(frontier, g.edges("src") === frontier("key"), "left_semi")
        .select(col("dst").as("key")).distinct()
    }
    frontier
  }

  /** Nodes within <= k hops (the BFS closure minus the start node). */
  def withinKHops(g: KinGraph, start: String, k: Int): DataFrame = {
    var reached = g.edges.filter(col("src") === start)
      .select(col("dst").as("key")).distinct()
    var frontier = reached
    for (_ <- 2 to k) {
      val next = g.edges
        .join(frontier, g.edges("src") === frontier("key"), "left_semi")
        .select(col("dst").as("key")).distinct()
      frontier = next.except(reached)
      reached = reached.union(frontier).distinct()
    }
    reached
  }

  /** Weighted adjacency COO — implements the `weight=` parameter the
    * reference declares NOT IMPLEMENTED (graph.py:1192): value = the named
    * edge-attribute column (summed across duplicate (src,dst) pairs). */
  def weightedAdjacencyCoo(g: KinGraph, weightCol: String): DataFrame = {
    // Same shape as KinGraph.adjacencyCoo: the id mapping feeds two joins,
    // so it is materialized once (eager localCheckpoint) — otherwise the
    // global sort + zipWithIndex re-runs per branch. The weight aggregation
    // runs AFTER the id joins, keyed on compact (long, long) ids: with the
    // checkpointed ids broadcast by AQE, the map side stays narrow and the
    // only wide shuffle moves (long, long, double) rows.
    val ids = g.denseIds.localCheckpoint(true)
    g.edges
      .join(ids.withColumnRenamed("key", "src").withColumnRenamed("id", "row_id"), "src")
      .join(ids.withColumnRenamed("key", "dst").withColumnRenamed("id", "col_id"), "dst")
      .groupBy(col("row_id"), col("col_id"))
      .agg(sum(col(weightCol)).as("value"))
  }

  /** Hub-skew-safe neighbor collection: two-stage collect_list with a salt
    * so one mega-hub's adjacency never lands in a single task's buffer in
    * stage one. Stage 2 still unions per key, but over `salts` partial
    * lists instead of raw edges (bounded memory per stage-1 task; use for
    * the reference's one_node_many_neighbors-style hub shapes). */
  def saltedNeighborLists(g: KinGraph, salts: Int = 16): DataFrame = {
    val salted = g.edges
      .withColumn("salt", pmod(xxhash64(col("dst")), lit(salts)))
      .groupBy(col("src"), col("salt"))
      .agg(collect_set(col("dst")).as("partial"))
    salted.groupBy(col("src").as("key"))
      .agg(sort_array(flatten(collect_list(col("partial")))).as("neighbors"))
  }
}
