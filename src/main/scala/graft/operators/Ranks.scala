package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row-numbering — the house rank idiom, factored out of
  * the d_auc midrank machinery (Classify.rocAuc) and Sampling.epochOrder so
  * every corpus/node-sized rank table shares one scale-correct plan shape:
  *
  *   1. range-repartition on the total order's sort keys,
  *   2. per-partition row counts → a partitions-row offset frame whose
  *      cumulative window is bounded by the partition count (the only
  *      unpartitioned window in the plan, over ≤ defaultParallelism rows),
  *   3. broadcast the offsets back and row_number WITHIN each partition.
  *
  * rank = partition offset + local row_number, which is exactly the global
  * row_number over the same total order regardless of where the range
  * boundaries land (prefix sums recombine exactly) — deterministic as long
  * as the order is total (callers append a unique tiebreaker column).
  *
  * NEVER `row_number().over(Window.orderBy(...))` on an unbounded frame: a
  * single-partition sort of the whole corpus is the canonical 100 TB
  * scale-killer this helper exists to replace. */
object Ranks {

  /** Adds `rkCol` = 1-based global row_number of each row under the TOTAL
    * order `order` (pass `.desc` columns for descending keys; include a
    * unique tiebreaker). The ranged intermediate is registered with
    * [[graft.CacheScope]] because its partition-id column is a physical
    * artifact both consumers (the offset frame and the final join) must
    * read from the SAME materialization. */
  def rowNumber(df: DataFrame, rkCol: String, order: Column*): DataFrame = {
    val nParts =
      math.max(df.sparkSession.sparkContext.defaultParallelism / 2, 1)
    val ranged = graft.CacheScope.cached(
      df.repartitionByRange(nParts, order: _*)
        .withColumn("__pid", spark_partition_id()))
    // one row per partition — bounded by construction, so ITS cumulative
    // window may run unpartitioned (the rocAuc offset-frame discipline)
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__off"))
    val wIn = Window.partitionBy(col("__pid")).orderBy(order: _*)
    ranged.join(broadcast(offs), Seq("__pid"))
      .withColumn(rkCol,
        col("__off") + row_number().over(wIn).cast("long"))
      .drop("__pid", "__off")
  }
}
