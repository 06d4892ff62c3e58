package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  /** Forces full evaluation of every expression in the plan. A bare
    * `.count()` lets Catalyst prune projections (a fingerprint query would
    * time only the parquet scan); the noop sink evaluates all columns. */
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // failures are recorded as JSON null, never as a plausible-looking duration.
    // Name-sorted execution: per-query timings stay comparable across rounds
    // (map iteration order reshuffles whenever the key set changes, silently
    // moving shared-cache build costs between first-toucher queries)
    // optional comma-separated name filter for local profiling runs; the
    // driver never sets it (first-toucher cache accounting shifts when the
    // query set shrinks, so filtered timings are for relative work only)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queryResults: Seq[(String, Option[Double])] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .map { case (name, fn) =>
        val t0 = System.nanoTime()
        val timing =
          try { materialize(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            System.err.println(s"BENCH FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
            None
          }
          finally CacheScope.releaseAll() // drop operator-local caches per query
        name -> timing
      }
    // reference-shaped workloads (BASELINE.md table): fixed size, not SF-scaled
    val workloadResults: Seq[(String, Option[Double])] =
      BenchWorkloads.workloads.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .map { case (name, fn) =>
        val t0 = System.nanoTime()
        val timing =
          try { fn(spark); Some((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            System.err.println(s"BENCH FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
            None
          }
        name -> timing
      }
    val results = queryResults ++ workloadResults
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.fold("null")(_.toString) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, None) => "\"" + k + "\"" }
    val total = results.flatMap(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":[${failed.mkString(",")}],"sf":"$sfDir"}"""
    println(line)
    // also persist to a file: the driver captures only the log tail, which
    // truncated ~34 per-query timings out of BENCH_r04.json
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"BENCH WARN could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
