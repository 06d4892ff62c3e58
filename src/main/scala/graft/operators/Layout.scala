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
}
