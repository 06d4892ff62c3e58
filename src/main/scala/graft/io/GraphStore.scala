package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.KinGraph

/** Hash-bucket-PARTITIONED persisted graph layout for incremental mutation
  * at scale — the complement of [[GraphIO.saveBucketed]] (which optimizes
  * point READS via catalog bucketing but, like any saveAsTable layout, can
  * only be replaced wholesale).
  *
  * Layout: `path/edges/bucket=NN/…` and `path/nodes/bucket=NN/…` with
  * `bucket = pmod(xxhash64(src|key), nBuckets)`. An incremental upsert
  * (reference `add_edge` semantics — (src,dst,etype) replace + endpoint
  * auto-create, graph.py:1446-1453) then rewrites ONLY the buckets its
  * delta hashes into, via dynamic partition overwrite (the
  * d_export_dynamic lakehouse discipline applied to graph state): cost is
  * O(delta + touched-bucket state), never O(full graph). This is the
  * scale-safe alternative to [[graft.KinGraph.addEdges]]' full-state
  * window-dedup for persisted graphs — at 100 TB an upsert whose delta
  * hits 8 of 4096 buckets reads and writes ~0.2% of the edge state.
  *
  * Bucket count guidance: pick `buckets` so a bucket ≈ one HDFS block at
  * the target scale (it is a layout constant — changing it is a rewrite,
  * exactly like choosing a table's bucketing). The merged touched-bucket
  * frame is materialized via localCheckpoint before the overwrite because
  * Spark (correctly) refuses to overwrite a path it is concurrently
  * reading; the materialization is bounded by the touched-bucket volume,
  * and a cluster deployment would swap it for a staging-dir commit with
  * identical pruning semantics. */
object GraphStore {
  /** Partition column name. Must not start with '_' — Spark's file index
    * hides underscore-prefixed paths, which would make `bucket=NN` dirs
    * invisible to partition discovery. */
  val BucketCol = "bucket"

  private def edgesPath(path: String) = s"$path/edges"
  private def nodesPath(path: String) = s"$path/nodes"

  private def bucketOf(c: Column, buckets: Int): Column =
    pmod(xxhash64(c), lit(buckets.toLong)).cast("int")

  /** Last-write-wins dedup on `keys` — the same window law as
    * [[KinGraph.upsert]] (explicit __seq wins, else source row order via
    * monotonically_increasing_id, ties by full-row hash) so the store's
    * replace semantics match the in-memory graph's exactly. */
  private def lastWriteWins(df: DataFrame, keys: Seq[String]): DataFrame = {
    val attrCols = df.columns.filterNot(_ == KinGraph.BatchOrderCol).map(col)
    val tagged =
      if (df.columns.contains(KinGraph.BatchOrderCol))
        df.withColumn("__ord", col(KinGraph.BatchOrderCol).cast("long"))
      else df.withColumn("__ord", monotonically_increasing_id())
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ord").desc, xxhash64(attrCols: _*).asc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__ord", "__rn", KinGraph.BatchOrderCol)
  }

  private def writeBucketed(df: DataFrame, keyCol: String, path: String,
                            buckets: Int): Unit =
    df.withColumn(BucketCol, bucketOf(col(keyCol), buckets))
      .repartition(col(BucketCol)) // one file per touched bucket, not B×tasks
      .write.mode(SaveMode.Overwrite).partitionBy(BucketCol).parquet(path)

  /** Initial edge-state write: batch dedup (last write wins) + one
    * hash-partitioned write — strictly linear, no full-state window. */
  def writeEdges(spark: SparkSession, path: String, edges: DataFrame,
                 buckets: Int): Unit = {
    val withType =
      if (edges.columns.contains("etype")) edges
      else edges.withColumn("etype", lit(0))
    writeBucketed(lastWriteWins(withType, Seq("src", "dst", "etype")),
      "src", edgesPath(path), buckets)
  }

  /** Initial node-state write (key-deduped, replace semantics). */
  def writeNodes(spark: SparkSession, path: String, nodes: DataFrame,
                 buckets: Int): Unit =
    writeBucketed(lastWriteWins(nodes, Seq("key")), "key",
      nodesPath(path), buckets)

  /** Persist a full graph snapshot into the mutable layout. */
  def write(g: KinGraph, path: String, buckets: Int = 64): Unit = {
    writeNodes(g.nodes.sparkSession, path, g.nodes, buckets)
    writeEdges(g.edges.sparkSession, path, g.edges, buckets)
  }

  def readEdges(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(edgesPath(path)).drop(BucketCol)

  def readNodes(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(nodesPath(path)).drop(BucketCol)

  def open(spark: SparkSession, path: String): KinGraph =
    KinGraph(readNodes(spark, path), readEdges(spark, path))

  /** Collect the delta's touched bucket ids — bounded by `buckets`, never
    * by data size, so the driver action is O(buckets). */
  private def touchedBuckets(df: DataFrame): Seq[Int] =
    df.select(BucketCol).distinct().collect().map(_.getInt(0)).toSeq

  private def withDynamicOverwrite(spark: SparkSession)(body: => Unit): Unit = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try body finally spark.conf.set(key, prev)
  }

  /** Materialize + dynamically overwrite only the partitions `df` carries.
    * localCheckpoint breaks the read-own-path lineage; volume is bounded
    * by the touched buckets. */
  private def overwriteTouched(df: DataFrame, path: String): Unit = {
    val m = df.repartition(col(BucketCol)).localCheckpoint(true)
    withDynamicOverwrite(df.sparkSession) {
      m.write.mode(SaveMode.Overwrite).partitionBy(BucketCol).parquet(path)
    }
  }

  /** Bucket-pruned incremental edge upsert: reference add_edge semantics
    * ((src,dst,etype) identity replace, last write within the batch wins,
    * missing endpoint nodes auto-created) touching ONLY the buckets the
    * delta hashes into. Reads are partition-pruned by `bucket IN
    * (touched)`; writes go through dynamic partition overwrite, so every
    * untouched bucket's files are left byte-identical on disk
    * (GraphStoreSpec pins this via file modification times). */
  def upsertEdges(spark: SparkSession, path: String, delta: DataFrame,
                  buckets: Int): Unit = {
    val withType =
      if (delta.columns.contains("etype")) delta
      else delta.withColumn("etype", lit(0))
    val persisted = spark.read.parquet(edgesPath(path))
    val cols = persisted.columns.filterNot(_ == BucketCol)
    // align to the persisted schema BEFORE the dedup window — the window's
    // tie-break hashes the aligned column set, matching KinGraph.addEdges'
    // alignColumns-then-upsert order exactly
    val seqCol =
      if (withType.columns.contains(KinGraph.BatchOrderCol))
        Seq(KinGraph.BatchOrderCol) else Nil
    val padded = cols.foldLeft(withType) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null))
    }.select((cols ++ seqCol).map(col): _*)
    val dd = lastWriteWins(padded, Seq("src", "dst", "etype"))
      .withColumn(BucketCol, bucketOf(col("src"), buckets))
      .localCheckpoint(true) // referenced 3× (touch set, anti-join, union)
    val touched = touchedBuckets(dd)
    val existing = persisted.filter(col(BucketCol).isin(touched: _*))
    val kept = existing.join(
      dd.select("src", "dst", "etype").distinct(),
      Seq("src", "dst", "etype"), "left_anti")
    overwriteTouched(kept.unionByName(dd), edgesPath(path))

    // endpoint auto-create, same pruning law on the nodes table: check
    // existence only in the buckets the delta's endpoint keys hash into;
    // skip the node write entirely when nothing is missing
    val epk = dd.select(col("src").as("key"))
      .union(dd.select(col("dst").as("key"))).distinct()
      .withColumn(BucketCol, bucketOf(col("key"), buckets))
    val touchedN = touchedBuckets(epk)
    val existingN = spark.read.parquet(nodesPath(path))
      .filter(col(BucketCol).isin(touchedN: _*))
    val missing = epk.join(existingN.select("key"), Seq("key"), "left_anti")
      .localCheckpoint(true) // read twice: emptiness guard + union
    if (!missing.isEmpty) {
      val ncols = existingN.columns
      val padded = ncols.foldLeft(missing) { (d, c) =>
        if (d.columns.contains(c)) d else d.withColumn(c, lit(null))
      }.select(ncols.map(col): _*)
      // only buckets that actually gained a node need rewriting
      val hot = touchedBuckets(padded)
      overwriteTouched(
        existingN.filter(col(BucketCol).isin(hot: _*)).unionByName(padded),
        nodesPath(path))
    }
  }
}
