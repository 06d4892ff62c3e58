package graft

/** Driver-contract consistency: these invariants breaking would silently
  * zero the round's correctness gate, so they are pinned here. */
class ContractSpec extends SparkSpec {

  test("every oracle key has a corresponding query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query names are unique across the three surfaces") {
    val all = Seq(
      queries.GraphQueries.queries.keys,
      queries.AnalyticsQueries.queries.keys,
      queries.PipelineQueries.queries.keys,
      queries.GxQueries.queries.keys).flatten.toSeq
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names (map merge would drop one): $dups")
  }

  test("no shadowed (duplicate) registry keys within one source file") {
    // A Scala Map literal silently keeps only the LAST duplicate key: the
    // shadowed query definition becomes dead code and which oracle pairs
    // with the surviving one is luck. The runtime Map cannot see this
    // (duplicates are collapsed before any test runs), so scan the
    // registry SOURCE — split at the query-map and oracle-map
    // declarations and assert at most ONE binding per key per REGION
    // (the old ≤2-per-file rule let a rows-only query duplicated inside
    // the query map pass, and would false-trip on a name shared with
    // sharedCacheBuilds). Bit round 14 twice: d_split_leakage,
    // d_snapshot_diff.
    val keyDef = """"([a-z]+[a-z0-9]*_[a-z0-9_]+)"\s*->""".r
    val qMarker = "val queries: Map[String, (SparkSession, String) => DataFrame] = Map("
    val oMarker = "val oracles: Map[String, String] = Map("
    for (f <- Seq("GraphQueries", "AnalyticsQueries", "PipelineQueries",
        "GxQueries")) {
      val src = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"src/main/scala/graft/queries/$f.scala")),
        "UTF-8")
      val qi = src.indexOf(qMarker)
      val oi = src.indexOf(oMarker)
      assert(qi >= 0 && oi > qi, s"$f.scala: registry map markers not found")
      for ((region, body) <- Seq(
          "query map" -> src.substring(qi, oi),
          "oracle map" -> src.substring(oi))) {
        val over = keyDef.findAllMatchIn(body).map(_.group(1)).toSeq
          .groupBy(identity).filter(_._2.size > 1)
        assert(over.isEmpty,
          s"$f.scala binds a key more than once in the $region " +
            s"(shadowed definition?): ${over.keys.toSeq.sorted.mkString(", ")}")
      }
    }
  }

  test("oracle SQL contains no unescaped driver-breaking characters") {
    // Verify.q() escapes control chars; this guards against accidental
    // binary/unicode-control content in builder-authored SQL
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.forall(c => c >= ' ' || c == '\n' || c == '\r' || c == '\t'),
        s"$name contains raw control characters")
    }
  }

  test("every query constructs and resolves its schema at sf0.001") {
    // NOT purely lazy: operators that materialize shared intermediates
    // eagerly (checkpointed dense ids, LSH candidate pairs, the IVF index)
    // run real sf0.001 jobs here — that is intended, the contract is that
    // construction succeeds and the schema resolves on the smallest fixture
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.schema.nonEmpty, s"$name produced an empty schema")
    }
  }
}
