package graft

/** Plan-capture runner for the optimization rounds: writes
  * `.explain("formatted")` for named SparkEntry queries to
  * `<outDir>/<name>_<tag>.txt`. Usage:
  *   runMain graft.Explain <sfDir> <outDir> <tag> <name1,name2,...>
  * Shared caches are built first (unnamed, untimed) so the captured plan
  * is the one the bench executes (InMemoryTableScan where a query reads a
  * session-shared cache, not the cache's build plan). */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "args: <sfDir> <outDir> <tag> <names,csv|all>")
    val Array(sfDir, outDir, tag, namesCsv) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Logs.quietBoundedWindowWarn()
    val wanted: Set[String] =
      if (namesCsv == "all") SparkEntry.queries.keySet
      else namesCsv.split(",").map(_.trim).filter(_.nonEmpty).toSet
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // shared caches must exist so query plans show InMemoryTableScan
    SparkEntry.cacheBuilds.foreach { case (n, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"EXPLAIN WARN cache:$n: ${e.getMessage}") }
      finally CacheScope.releaseAll()
    }
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if wanted.contains(name)) {
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
          txt.getBytes("UTF-8"))
        println(s"EXPLAIN OK $name")
      } catch { case e: Throwable =>
        System.err.println(s"EXPLAIN FAIL $name: ${e.getMessage}")
      } finally CacheScope.releaseAll()
    }
    spark.stop()
  }
}
