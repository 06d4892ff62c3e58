package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{CacheScope, KinGraph}
import graft.ops.GraphOps
import graft.sources.Tables

/** Scratch profiler (not part of the driver surface; safe to delete). */
object ProfilePr {
  private def mat(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("warmup (lineitem count)") { Tables.lineitem(spark, sfDir).count() }
    time("part cache build") {
      Tables.cached("part", spark, sfDir)(Tables.partEdges(spark, sfDir)).count()
    }
    val g = KinGraph.fromEdges(Tables.cached("part", spark, sfDir)(Tables.partEdges(spark, sfDir)))
    time("denseIds") { mat(g.denseIds) }
    time("weightedAdjacencyCoo (noop)") {
      mat(GraphOps.weightedAdjacencyCoo(g, "quantity"))
    }
    time("weightedAdjacencyCoo + orderBy (noop)") {
      mat(GraphOps.weightedAdjacencyCoo(g, "quantity").orderBy("row_id", "col_id"))
    }
    CacheScope.releaseAll()
    spark.stop()
  }
}
