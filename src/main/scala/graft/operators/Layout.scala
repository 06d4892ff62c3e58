package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering keys for
  * scan-pruning locality.
  *
  * At 100 TB the cheapest query is the one that never reads the file:
  * parquet row-group min/max stats prune a scan only when the rows inside
  * each file are CLOSE in the filtered column. A single-column sort gives
  * that for one column and destroys it for every other; a Z-order
  * (Morton) key interleaves the bits of two columns so that
  * range-partitioning by the key keeps BOTH columns' spans narrow per
  * file — the standard multi-dimensional layout (Morton 1966; the same
  * idea behind Delta/Iceberg Z-ordering, expressed here as plain
  * `repartitionByRange(zValue(x, y))` + `sortWithinPartitions` before a
  * parquet write).
  *
  * Everything is closed-form integer bit arithmetic — codegen'd column
  * expressions on the Spark side, the identical shift/mask sum in the
  * DuckDB twin — so layout quality is hash-checkable, not eyeballed. */
object Layout {

  /** Bits interleaved per dimension: two 21-bit inputs fill 42 bits of
    * the positive long range. Inputs must sit in [0, 2^21). */
  val ZBits = 21

  /** The Morton key of two bounded non-negative ints: bit i of `x` lands
    * at position 2i, bit i of `y` at 2i+1. A fold of shift/mask/or terms
    * — whole-stage-codegen friendly, no UDF. */
  def zValue(x: Column, y: Column): Column =
    (0 until ZBits).map { i =>
      (shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)))
    }.reduce(_ bitwiseOR _)

  /** DuckDB twin of [[zValue]] — the same 2·21 unrolled terms. */
  def zValueSql(x: String, y: String): String =
    (0 until ZBits).map { i =>
      s"(((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")

  /** Per-file locality report of a Z-ordered layout: slice the key space
    * into `nBuckets` value ranges (the deterministic analog of the
    * range-partitioned files a writer would produce — `(n·z) div
    * (zmax+1)` is one broadcast scalar, no global sort, no single-
    * partition window) and report each bucket's row count and both
    * dimensions' spans. Narrow spans on BOTH columns are the pruning
    * guarantee a single-column sort cannot give. All-integer output. */
  def zOrderBuckets(df: DataFrame, x: Column, y: Column,
                    nBuckets: Int = 32): DataFrame = {
    require(nBuckets >= 1, "nBuckets >= 1")
    // rebase each dimension to its data minimum before interleaving — an
    // offset dimension (e.g. epoch-hours, all sharing high bits) would
    // otherwise contribute CONSTANT high bits and collapse every key
    // into the top z-range slice (one bucket, vacuous report). A real
    // writer normalizes coordinates the same way.
    val raw = df.select(x.cast("long").as("x0"), y.cast("long").as("y0"))
    val mins = raw.agg(min(col("x0")).as("mx"), min(col("y0")).as("my"))
    val keyed = raw.crossJoin(broadcast(mins))
      .select((col("x0") - col("mx")).as("xv"), (col("y0") - col("my")).as("yv"))
      .withColumn("z", zValue(col("xv"), col("yv")))
    val zmax = keyed.agg(max(col("z")).as("zmax"))
    keyed.crossJoin(broadcast(zmax))
      .select(expr(s"($nBuckets * z) div (zmax + 1)").as("bucket"),
        col("xv"), col("yv"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col("xv")).as("min_x"), max(col("xv")).as("max_x"),
        min(col("yv")).as("min_y"), max(col("yv")).as("max_y"))
      .withColumn("x_span", col("max_x") - col("min_x"))
      .withColumn("y_span", col("max_y") - col("min_y"))
      .orderBy("bucket")
  }

  /** File-skipping effectiveness report — the number a layout decision is
    * actually judged by at 100 TB: for the SAME rectangular predicate
    * (the data-adaptive quarter-to-half band on both rebased dimensions,
    * span div 4 .. span div 2 — integer arithmetic, so non-vacuous at
    * every SF), how many range-partitioned "files" must be read under
    *  - a Z-order layout (buckets of the Morton key), vs
    *  - a single-column sort (buckets of x alone — the layout that
    *    prunes x perfectly and y not at all).
    * A bucket is scanned iff its [min,max] envelope on BOTH dimensions
    * intersects the predicate box — exactly the parquet row-group
    * min/max-stats decision. One row per layout: bucket count, scanned
    * bucket count, total/read/matching row counts — all integers, fully
    * SQL-replayable ([[pruningReportSql]]). rows_match is layout-
    * independent by construction (the spec asserts it).
    *
    * Scale shape: two broadcast scalar frames (global min/max, zmax) +
    * one pass to bucket-stats (map-side combinable) + a bucket-count-
    * sized report aggregation — the data is scanned twice (once per
    * layout), never shuffled beyond the bucket aggregation. */
  def pruningReport(df: DataFrame, x: Column, y: Column,
                    nBuckets: Int = 32): DataFrame = {
    require(nBuckets >= 1, "nBuckets >= 1")
    val raw = df.select(x.cast("long").as("x0"), y.cast("long").as("y0"))
    val stats = raw.agg(min(col("x0")).as("mx"), max(col("x0")).as("xm"),
      min(col("y0")).as("my"), max(col("y0")).as("ym"))
    val keyed = raw.crossJoin(broadcast(stats))
      .select((col("x0") - col("mx")).as("xv"), (col("y0") - col("my")).as("yv"),
        (col("xm") - col("mx")).as("xr"), (col("ym") - col("my")).as("yr"))
      .withColumn("z", zValue(col("xv"), col("yv")))
    val zmax = keyed.agg(max(col("z")).as("zmax"))
    val both = keyed.crossJoin(broadcast(zmax))
      .select(col("xv"), col("yv"),
        expr(s"($nBuckets * z) div (zmax + 1)").as("b_z"),
        expr(s"($nBuckets * xv) div (xr + 1)").as("b_x"),
        expr("xr div 4").as("xlo"), expr("xr div 2").as("xhi"),
        expr("yr div 4").as("ylo"), expr("yr div 2").as("yhi"))
    def layout(tag: String, bucket: Column): DataFrame = {
      val hit = col("xv") >= col("xlo") && col("xv") <= col("xhi") &&
        col("yv") >= col("ylo") && col("yv") <= col("yhi")
      val bs = both.groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("xv")).as("min_x"), max(col("xv")).as("max_x"),
          min(col("yv")).as("min_y"), max(col("yv")).as("max_y"),
          sum(when(hit, 1L).otherwise(0L)).as("n_match"),
          // the predicate scalars ride along (constant per bucket)
          min(col("xlo")).as("xlo"), min(col("xhi")).as("xhi"),
          min(col("ylo")).as("ylo"), min(col("yhi")).as("yhi"))
      val scanned = col("min_x") <= col("xhi") && col("max_x") >= col("xlo") &&
        col("min_y") <= col("yhi") && col("max_y") >= col("ylo")
      bs.agg(count(lit(1)).as("n_buckets"),
          sum(when(scanned, 1L).otherwise(0L)).as("n_scanned"),
          sum(col("n_rows")).as("rows_total"),
          sum(when(scanned, col("n_rows")).otherwise(0L)).as("rows_read"),
          sum(col("n_match")).as("rows_match"))
        .select(lit(tag).as("layout"), col("n_buckets"), col("n_scanned"),
          col("rows_total"), col("rows_read"), col("rows_match"))
    }
    layout("xsort", col("b_x")).unionByName(layout("zorder", col("b_z")))
      .orderBy("layout")
  }

  /** DuckDB twin of [[pruningReport]] over `table` — CTE-fragment style
    * (no leading WITH) so callers can prepend their own source CTEs, like
    * [[zOrderBucketsSql]]. */
  def pruningReportSql(table: String, xExpr: String, yExpr: String,
                       nBuckets: Int = 32): String =
    s"""pr0 AS (
       |  SELECT CAST($xExpr AS BIGINT) AS x0, CAST($yExpr AS BIGINT) AS y0
       |  FROM $table
       |), prs AS (
       |  SELECT min(x0) AS mx, max(x0) AS xm, min(y0) AS my, max(y0) AS ym
       |  FROM pr0
       |), prk AS (
       |  SELECT x0 - mx AS xv, y0 - my AS yv, xm - mx AS xr, ym - my AS yr
       |  FROM pr0, prs
       |), prz AS (
       |  SELECT xv, yv, xr, yr, ${zValueSql("xv", "yv")} AS z FROM prk
       |), przm AS (SELECT max(z) AS zmax FROM prz),
       |prb AS (
       |  SELECT xv, yv,
       |    ($nBuckets * z) // (zmax + 1) AS b_z,
       |    ($nBuckets * xv) // (xr + 1) AS b_x,
       |    xr // 4 AS xlo, xr // 2 AS xhi, yr // 4 AS ylo, yr // 2 AS yhi
       |  FROM prz, przm
       |), prl AS (
       |  SELECT 'xsort' AS layout, b_x AS bucket, xv, yv, xlo, xhi, ylo, yhi
       |  FROM prb
       |  UNION ALL
       |  SELECT 'zorder', b_z, xv, yv, xlo, xhi, ylo, yhi FROM prb
       |), prbs AS (
       |  SELECT layout, bucket, count(*) AS n_rows,
       |    min(xv) AS min_x, max(xv) AS max_x,
       |    min(yv) AS min_y, max(yv) AS max_y,
       |    sum(CASE WHEN xv >= xlo AND xv <= xhi AND yv >= ylo AND yv <= yhi
       |        THEN 1 ELSE 0 END) AS n_match,
       |    min(xlo) AS xlo, min(xhi) AS xhi, min(ylo) AS ylo, min(yhi) AS yhi
       |  FROM prl GROUP BY layout, bucket
       |)
       |SELECT layout, CAST(count(*) AS BIGINT) AS n_buckets,
       |  CAST(sum(CASE WHEN min_x <= xhi AND max_x >= xlo
       |      AND min_y <= yhi AND max_y >= ylo THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_scanned,
       |  CAST(sum(n_rows) AS BIGINT) AS rows_total,
       |  CAST(sum(CASE WHEN min_x <= xhi AND max_x >= xlo
       |      AND min_y <= yhi AND max_y >= ylo THEN n_rows ELSE 0 END) AS BIGINT)
       |    AS rows_read,
       |  CAST(sum(n_match) AS BIGINT) AS rows_match
       |FROM prbs GROUP BY layout ORDER BY layout""".stripMargin

  /** DuckDB twin of [[zOrderBuckets]] over `table`; `xExpr`/`yExpr` must
    * already be bounded non-negative BIGINTs. */
  def zOrderBucketsSql(table: String, xExpr: String, yExpr: String,
                       nBuckets: Int = 32): String =
    s"""zk0 AS (
       |  SELECT CAST($xExpr AS BIGINT) AS x0, CAST($yExpr AS BIGINT) AS y0
       |  FROM $table
       |), zmn AS (SELECT min(x0) AS mx, min(y0) AS my FROM zk0),
       |zk AS (
       |  SELECT x0 - mx AS xv, y0 - my AS yv FROM zk0, zmn
       |), zz AS (
       |  SELECT xv, yv, ${zValueSql("xv", "yv")} AS z FROM zk
       |), zm AS (SELECT max(z) AS zmax FROM zz),
       |zb AS (
       |  SELECT CAST(($nBuckets * z) // (zmax + 1) AS BIGINT) AS bucket,
       |    xv, yv
       |  FROM zz, zm
       |)
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(min(xv) AS BIGINT) AS min_x, CAST(max(xv) AS BIGINT) AS max_x,
       |  CAST(min(yv) AS BIGINT) AS min_y, CAST(max(yv) AS BIGINT) AS max_y,
       |  CAST(max(xv) - min(xv) AS BIGINT) AS x_span,
       |  CAST(max(yv) - min(yv) AS BIGINT) AS y_span
       |FROM zb GROUP BY bucket""".stripMargin

  /** RENDEZVOUS (highest-random-weight) shard of an id for `k` shards:
    * argmax over s ∈ [0, k) of hash60(id ":" s). The property that
    * matters for training-data layout: growing k → k+1 relocates ONLY
    * the ~1/(k+1) of keys whose new argmax IS the added shard — every
    * other doc keeps its shard, so an incremental re-shard rewrites one
    * shard's worth of files, where mod-hashing rewrites ~k/(k+1) of the
    * corpus. k hashes per row as one codegen'd array expression (k is a
    * config constant, not data-sized); first-max tie-break matches
    * DuckDB list_indexof. */
  def rendezvousShard(id: Column, k: Int): Column = {
    val hs = transform(sequence(lit(0), lit(k - 1)),
      x => graft.functions.TextFunctions.hash60(
        concat(id.cast("string"), lit(":"), x.cast("string"))))
    (array_position(hs, array_max(hs)) - 1).cast("int")
  }

  /** DuckDB twin of [[rendezvousShard]]. */
  def rendezvousShardSql(idExpr: String, k: Int): String = {
    val h = graft.functions.TextFunctions.hash60Sql(
      s"CAST($idExpr AS VARCHAR) || ':' || CAST(x AS VARCHAR)")
    s"CAST(list_indexof(list_transform(generate_series(0, ${k - 1}), " +
      s"x -> $h), list_max(list_transform(generate_series(0, ${k - 1}), " +
      s"x -> $h))) - 1 AS INT)"
  }

  /** Re-shard stability report, HRW vs mod-hash, growing `k1` → `k2`
    * shards: per method, the doc count, how many docs change shards,
    * the moved fraction in milli, and the k1-assignment balance
    * (max/min per-shard count). Two corpus scans + two shard-sized
    * aggregations — linear, map-side combinable, no shuffle wider than
    * the shard count. */
  def reshardReport(docs: DataFrame, idCol: String,
                    k1: Int, k2: Int): DataFrame = {
    val base = graft.CacheScope.cached(docs.select(col(idCol).as("id"))
      .withColumn("h1", rendezvousShard(col("id"), k1))
      .withColumn("h2", rendezvousShard(col("id"), k2))
      .withColumn("m1", pmod(col("id"), lit(k1.toLong)).cast("int"))
      .withColumn("m2", pmod(col("id"), lit(k2.toLong)).cast("int")))
    def methodRow(method: String, a: String, b: String) = {
      val mv = base.agg(count(lit(1)).as("n_docs"),
        sum(when(col(a) =!= col(b), 1L).otherwise(0L)).as("n_moved"))
      val bal = base.groupBy(col(a)).agg(count(lit(1)).as("n"))
        .agg(max(col("n")).as("max_shard_n"), min(col("n")).as("min_shard_n"))
      broadcast(mv).crossJoin(broadcast(bal))
        .select(lit(method).as("method"), col("n_docs"), col("n_moved"),
          expr("(1000 * n_moved) div n_docs").as("moved_milli"),
          col("max_shard_n"), col("min_shard_n"))
    }
    methodRow("hrw", "h1", "h2").unionByName(methodRow("mod", "m1", "m2"))
      .orderBy("method")
  }
}
