package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture blow-up for scale-robustness runs: replicates an existing
  * testdata dir `factor`× with per-replica key shifts, preserving
  * referential integrity (orders follow customers, lineitem follows
  * orders/suppliers/parts) and key contiguity (each key column shifts by
  * its own original stride, so id-arithmetic plants keep working on the
  * replicas). region/nation stay fixed (their domains are SF-fixed in
  * TPC-H, which is exactly the density discipline the gates assume:
  * S/C/P/O/L/doc/vec domains scale, N/R degrees grow).
  *
  * Replicated document TEXT gets a per-replica suffix token (replica 0
  * stays pristine): verbatim-copied text would make every delta doc an
  * exact near-dup of its 9 twins and collapse the dedup gates to the
  * degenerate all-duplicates corpus; the suffix keeps cross-replica
  * Jaccard high-but-below-1 (realistic crawl-dup structure) while every
  * text-derived stat recomputes consistently in both engines. n_chars is
  * re-derived from the salted text.
  *
  * Usage: runMain graft.ScaleUp <srcDir> <outDir> <factor> [tables]
  * (e.g. /root/testdata/sf0.1 /tmp/sf1 10 → an sf≈1 fixture;
  * optional 4th arg = comma-list limiting which tables are written).
  *
  * Scale shape: one crossJoin against a `factor`-row literal range per
  * table — embarrassingly parallel, no shuffle except the write
  * repartition sizing output files. */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val (srcDir, outDir, fStr) = (args(0), args(1), args(2))
    val tableFilter: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    val factor = fStr.toInt
    require(factor >= 1, "factor >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def src(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")

    /** Replicated frame with shifted key columns: each listed key column
      * k becomes k + r·stride(k), stride = its original (max − min + 1),
      * so replica key ranges tile contiguously after the original.
      * `post` runs while `__r` is still in scope (text salting). */
    def blowUp(df: DataFrame, keyCols: Map[String, Long],
               post: DataFrame => DataFrame = identity): DataFrame = {
      val reps = spark.range(factor).select(col("id").as("__r"))
      val wide = df.crossJoin(reps)
      post(keyCols.foldLeft(wide) { case (acc, (c, stride)) =>
        acc.withColumn(c, (col(c) + col("__r") * stride)
          .cast(df.schema(c).dataType))
      }).drop("__r")
    }

    def stride(df: DataFrame, c: String): Long = {
      val r = df.agg(min(col(c)).cast("long"), max(col(c)).cast("long")).head()
      r.getLong(1) - r.getLong(0) + 1
    }

    def write(df: DataFrame, t: String, files: Int): Unit =
      if (tableFilter.forall(_.contains(t)))
        df.repartition(files).write.mode("overwrite")
          .parquet(s"$outDir/$t.parquet")

    val cust = src("customer"); val supp = src("supplier")
    val part = src("part"); val ord = src("orders")
    val li = src("lineitem"); val ev = src("events")
    val doc = src("documents"); val emb = src("embeddings")
    val (kc, ks, kp, ko) = (stride(cust, "c_custkey"), stride(supp, "s_suppkey"),
      stride(part, "p_partkey"), stride(ord, "o_orderkey"))

    write(src("region"), "region", 1)
    write(src("nation"), "nation", 1)
    write(blowUp(cust, Map("c_custkey" -> kc)), "customer", 4)
    write(blowUp(supp, Map("s_suppkey" -> ks)), "supplier", 1)
    write(blowUp(part, Map("p_partkey" -> kp)), "part", 4)
    write(blowUp(ord, Map("o_orderkey" -> ko, "o_custkey" -> kc)), "orders", 8)
    write(blowUp(li, Map("l_orderkey" -> ko, "l_partkey" -> kp,
      "l_suppkey" -> ks)), "lineitem", 16)
    // DEFAULT (r17 verdict #7): tile event replicas ALONG the time axis
    // (ts += replica * span) — production growth means a longer span,
    // not denser seconds, so per-window densities and event-time join
    // selectivity stay constant with SF. SPARK_GRAFT_SCALEUP_PACKED_TS=1
    // keeps the original span instead (replicas densify each second N×
    // at factor N) as an EXPLICIT stress fixture for time-window joins —
    // its pair counts are density-quadratic by construction (s_range_join
    // measured 690× at 100× packed vs 10.7× stretched, r17). The legacy
    // SPARK_GRAFT_SCALEUP_STRETCH_TS=1 is still accepted (and redundant).
    val stretchTs = !sys.env.get("SPARK_GRAFT_SCALEUP_PACKED_TS").contains("1")
    val evPost: DataFrame => DataFrame =
      if (!stretchTs) identity
      else { wide =>
        // ts ships as TIMESTAMP_NTZ in current fixtures — unix_micros
        // requires TIMESTAMP, so cast through it (session tz is UTC, and
        // the round-trip below uses the same cast pair, so the NTZ wall
        // time shifts by exactly replica*span)
        def us(c: org.apache.spark.sql.Column) =
          unix_micros(c.cast("timestamp"))
        val r = ev.agg(min(us(col("ts"))), max(us(col("ts")))).head()
        // empty (or all-null-ts) events: span is meaningless and getLong
        // would NPE — fall back to identity, matching every other branch's
        // empty-table behaviour (writes an empty replicated table)
        if (r.isNullAt(0) || r.isNullAt(1)) wide
        else {
          val spanUs = r.getLong(1) - r.getLong(0) + 1L
          wide.withColumn("ts",
            timestamp_micros(us(col("ts")) + col("__r") * spanUs)
              .cast(ev.schema("ts").dataType))
        }
      }
    write(blowUp(ev, Map("event_id" -> stride(ev, "event_id"),
      "user_id" -> stride(ev, "user_id")), evPost), "events", 8)
    write(blowUp(doc, Map("doc_id" -> stride(doc, "doc_id")), wide =>
      wide.withColumn("text",
          when(col("__r") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" rep"),
              col("__r").cast("string"))))
        .withColumn("n_chars", length(col("text")).cast("long"))),
      "documents", 8)
    write(blowUp(emb, Map("vec_id" -> stride(emb, "vec_id"))), "embeddings", 4)

    println(s"""{"scaled":"$srcDir","out":"$outDir","factor":$factor}""")
    spark.stop()
  }
}
