package graft

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.GraphStore

/** The bucket-pruned persisted upsert: merge-content parity with
  * KinGraph.addEdges, and the on-disk pruning contract — buckets the delta
  * does not hash into keep their files byte-identical (same paths, sizes
  * and modification times), which no SQL oracle can observe. */
class GraphStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft_store_$tag").toString + "/g"

  /** (relative path, length, mtime) of every data file under a dir. */
  private def fileState(root: String): Map[String, (Long, Long)] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else Seq(f)
    val base = new File(root)
    walk(base)
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath.stripPrefix(base.getAbsolutePath) ->
        (f.length(), f.lastModified()))
      .toMap
  }

  private def bucketDirOf(rel: String): String =
    rel.split('/').find(_.startsWith("bucket=")).getOrElse(sys.error(rel))

  test("upsertEdges merge content matches KinGraph.addEdges exactly") {
    val dir = freshDir("parity")
    val base = Seq(
      ("a", "b", 0, 10L), ("a", "c", 0, 11L),
      ("b", "c", 0, 12L), ("c", "d", 1, 13L)).toDF("src", "dst", "etype", "w")
    val nodes = Seq("a", "b", "c", "d").toDF("key")
    GraphStore.writeEdges(spark, dir, base, 8)
    GraphStore.writeNodes(spark, dir, nodes, 8)
    // replaces (a,b,0), inserts (e,f,0) with BOTH endpoints auto-created,
    // and within-batch duplicate (a,c,0) rows where the LAST must win
    val delta = Seq(
      ("a", "b", 0, 99L), ("e", "f", 0, 50L),
      ("a", "c", 0, 7L), ("a", "c", 0, 8L)).toDF("src", "dst", "etype", "w")
      .withColumn(KinGraph.BatchOrderCol, monotonically_increasing_id())
    GraphStore.upsertEdges(spark, dir, delta, 8)
    val got = GraphStore.open(spark, dir)

    val want = KinGraph(nodes, base).addEdges(delta)
    assert(got.edges.select("src", "dst", "etype", "w").collect().toSet ==
      want.edges.select("src", "dst", "etype", "w").collect().toSet)
    assert(got.nodes.select("key").as[String].collect().toSet ==
      want.nodes.select("key").as[String].collect().toSet)
    // the replaced row carries the delta's value, last-write-wins inside
    // the batch
    val w = got.edges.filter(col("src") === "a" && col("dst") === "c")
      .select("w").as[Long].head()
    assert(w == 8L)
  }

  test("untouched buckets keep byte-identical files after an upsert") {
    val dir = freshDir("prune")
    val base = spark.range(2000).select(
      concat(lit("n"), col("id") % 100).as("src"),
      concat(lit("m"), col("id")).as("dst"),
      lit(0).as("etype"))
    GraphStore.writeEdges(spark, dir, base, 8)
    GraphStore.writeNodes(spark, dir,
      base.select(col("src").as("key"))
        .union(base.select(col("dst").as("key"))).distinct(), 8)
    val before = fileState(dir + "/edges")
    val beforeNodes = fileState(dir + "/nodes")

    // single-src delta → exactly one edge bucket may change; dsts all
    // exist → the node table must not be rewritten at all
    val delta = Seq(("n1", "m5", 0), ("n1", "m6", 0))
      .toDF("src", "dst", "etype")
    GraphStore.upsertEdges(spark, dir, delta, 8)

    val after = fileState(dir + "/edges")
    val srcBucket = spark.range(1).select(
      pmod(xxhash64(lit("n1")), lit(8L)).cast("int")).as[Int].head()
    val changed = (before.keySet ++ after.keySet).filter(k =>
      before.get(k) != after.get(k)).map(bucketDirOf)
    assert(changed == Set(s"bucket=$srcBucket"),
      s"expected only bucket=$srcBucket to change, got $changed")
    assert(fileState(dir + "/nodes") == beforeNodes,
      "node buckets rewritten although no endpoint was missing")

    // and the merge really landed: the two new edges are present
    assert(GraphStore.readEdges(spark, dir)
      .filter(col("src") === "n1" && col("dst").isin("m5", "m6"))
      .count() == 2)
  }

  test("auto-create rewrites only node buckets that gained a key") {
    val dir = freshDir("nodes")
    val base = Seq(("a", "b", 0)).toDF("src", "dst", "etype")
    GraphStore.writeEdges(spark, dir, base, 8)
    GraphStore.writeNodes(spark, dir, Seq("a", "b").toDF("key"), 8)
    val before = fileState(dir + "/nodes")
    val delta = Seq(("a", "zz9", 0)).toDF("src", "dst", "etype")
    GraphStore.upsertEdges(spark, dir, delta, 8)
    val after = fileState(dir + "/nodes")
    val newBucket = spark.range(1).select(
      pmod(xxhash64(lit("zz9")), lit(8L)).cast("int")).as[Int].head()
    val changed = (before.keySet ++ after.keySet).filter(k =>
      before.get(k) != after.get(k)).map(bucketDirOf)
    assert(changed == Set(s"bucket=$newBucket"),
      s"expected only bucket=$newBucket to change, got $changed")
    assert(GraphStore.readNodes(spark, dir).as[String].collect().toSet ==
      Set("a", "b", "zz9"))
  }
}
