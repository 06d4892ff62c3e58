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
