package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join operators the reference has no analog for, but which every
  * event/training-data pipeline needs: backward as-of join and
  * point-in-interval (range) join. Both are expressed as single-shuffle
  * relational plans — never as a range cross-product — so they survive a
  * 100 TB event table.
  */
object TemporalJoins {

  /** Backward as-of join: for every left row, attach the payload of the
    * single LATEST right row in the same key group with
    * `right.ts <= left.ts` (inclusive), or nulls when no prior right row
    * exists.
    *
    * Plan shape (the scale story): union the two inputs, ONE shuffle on the
    * key columns, one in-partition sort, then a running
    * `last(_, ignoreNulls)` window — no per-left-row probe, no range-join
    * blowup, and the window frame is running (Spark evaluates it in a
    * single pass, no O(n²) re-scan).
    *
    * The payload columns travel inside ONE struct so all output fields come
    * from the SAME matched right row — per-column `last(ignoreNulls)` could
    * stitch different rows together when a payload field is legitimately
    * null.
    *
    * Determinism: right rows order before left rows at equal ts (a right
    * row AT the left timestamp matches, mirroring `ASOF JOIN`'s `>=`), and
    * equal-(key, ts) right rows resolve to the greatest payload struct, so
    * the result is stable under any input partitioning.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, on: Seq[String],
                       leftTs: String, rightTs: String,
                       payload: Seq[String],
                       prefix: String = "matched_"): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equality key")
    require(payload.nonEmpty, "payload columns required")
    val l2 = left.select(
      on.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__is_left"),
        struct(left.columns.map(col): _*).as("__left")): _*)
    val r2 = right.select(
      on.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__is_left"),
        struct(payload.map(col): _*).as("__payload")): _*)
    val unioned = l2
      .withColumn("__payload", lit(null).cast(r2.schema("__payload").dataType))
      .unionByName(
        r2.withColumn("__left", lit(null).cast(l2.schema("__left").dataType)))
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_left").asc, col("__payload").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(
        left.columns.map(c => col(s"__left.`$c`").as(c)) ++
          payload.map(p => col(s"__m.`$p`").as(prefix + p)): _*)
  }

  /** Forward as-of join: for every left row, attach the payload of the
    * single EARLIEST right row in the same key group with
    * `right.ts >= left.ts` (inclusive), or nulls when no later right row
    * exists. Mirror image of [[asofJoinBackward]] — same single-shuffle
    * union+window plan, sorted ts-DESCENDING so the frame stays the running
    * unboundedPreceding..currentRow shape (Spark evaluates it in one pass;
    * a currentRow..unboundedFollowing frame re-scans the tail per row).
    *
    * Determinism: right rows order before left rows at equal ts (so a right
    * row AT the left timestamp matches, mirroring `>=`), and equal-(key, ts)
    * right rows resolve to the least payload struct. */
  def asofJoinForward(left: DataFrame, right: DataFrame, on: Seq[String],
                      leftTs: String, rightTs: String,
                      payload: Seq[String],
                      prefix: String = "matched_"): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equality key")
    require(payload.nonEmpty, "payload columns required")
    val l2 = left.select(
      on.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__is_left"),
        struct(left.columns.map(col): _*).as("__left")): _*)
    val r2 = right.select(
      on.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__is_left"),
        struct(payload.map(col): _*).as("__payload")): _*)
    val unioned = l2
      .withColumn("__payload", lit(null).cast(r2.schema("__payload").dataType))
      .unionByName(
        r2.withColumn("__left", lit(null).cast(l2.schema("__left").dataType)))
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts").desc, col("__is_left").asc, col("__payload").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(
        left.columns.map(c => col(s"__left.`$c`").as(c)) ++
          payload.map(p => col(s"__m.`$p`").as(prefix + p)): _*)
  }

  /** Time-series resample + forward fill: per key, an even `stepUs` grid
    * from floor(min ts) to floor(max ts), each grid point carrying the
    * value of the LATEST observation at-or-before it (null before the
    * first observation — the leading gap is not back-filled).
    *
    * Plan: one aggregation for the per-key bounds (grid explode), then the
    * same union+running-window shape as the as-of joins — ONE shuffle on
    * the key, no per-grid-point probe join. Observations order before grid
    * points at equal ts (a grid point ON an observation takes it); equal-ts
    * observations resolve to the greatest value, deterministically.
    *
    * `maxGridPoints` bounds the per-key explode the same way
    * [[pointInIntervalJoin]] bounds interval replication: a span/step ratio
    * past it is a misconfigured step, not a bigger query. */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, stepUs: Long = 3600000000L,
                    maxGridPoints: Int = 100000): DataFrame = {
    require(stepUs > 0, "step must be positive")
    require(maxGridPoints > 0, "grid cap must be positive")
    def floorTs(c: Column): Column =
      timestamp_micros((floor(unix_micros(c) / stepUs) * stepUs).cast("long"))
    val vType = df.schema(valueCol).dataType
    val obs = df.select(col(keyCol).as("key"), col(tsCol).as("__ts"),
      col(valueCol).as("__v"), lit(0).as("__is_grid"))
    val bounds = df.groupBy(col(keyCol).as("key"))
      .agg(min(col(tsCol)).as("mn"), max(col(tsCol)).as("mx"))
    val startTs = when(
      (unix_micros(floorTs(col("mx"))) - unix_micros(floorTs(col("mn")))) / stepUs
        >= lit(maxGridPoints.toLong),
      raise_error(concat(
        lit(s"resampleFfill: key "), col("key").cast("string"),
        lit(s" spans more than maxGridPoints=$maxGridPoints grid steps; " +
          s"widen stepUs (currently $stepUs us) or raise the cap"))))
      .otherwise(floorTs(col("mn")))
    val grid = bounds.select(col("key"),
        explode(sequence(startTs, floorTs(col("mx")),
          expr(s"INTERVAL $stepUs MICROSECOND"))).as("__ts"))
      .withColumn("__v", lit(null).cast(vType))
      .withColumn("__is_grid", lit(1))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("__ts").asc, col("__is_grid").asc, col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    obs.unionByName(grid)
      .withColumn("__f", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__is_grid") === 1)
      .select(col("key"), col("__ts").as("grid_ts"), col("__f").as("value"))
  }

  /** NEAREST as-of join with tolerance — pandas merge_asof
    * direction='nearest' semantics: each left row matches the right row
    * minimizing |Δts| within `toleranceUs`, the backward candidate
    * winning ties. Composed from the backward and forward single-shuffle
    * passes (each one union+window — still no range join anywhere), then
    * ONE row-local arbitration on the two candidates; `payload` must
    * carry `rightTs` so the arbitration can read both gaps. `leftId`
    * must uniquely key left rows (it stitches the two passes together).
    * Out-of-tolerance and missing candidates null out the matched
    * columns rather than dropping the left row. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, on: Seq[String],
                      leftId: String, leftTs: String, rightTs: String,
                      payload: Seq[String], toleranceUs: Long,
                      prefix: String = "matched_"): DataFrame = {
    require(payload.contains(rightTs),
      "payload must include rightTs (arbitration reads both gaps)")
    val b = asofJoinBackward(left, right, on, leftTs, rightTs, payload, "__b_")
    val f = asofJoinForward(left, right, on, leftTs, rightTs, payload, "__f_")
      .select((Seq(leftId) ++ payload.map(p => s"__f_$p")).map(col): _*)
    val j = b.join(f, Seq(leftId))
    val bgap = unix_micros(col(leftTs)) - unix_micros(col(s"__b_$rightTs"))
    val fgap = unix_micros(col(s"__f_$rightTs")) - unix_micros(col(leftTs))
    val useB = col(s"__b_$rightTs").isNotNull &&
      (col(s"__f_$rightTs").isNull || bgap <= fgap)
    val within = when(useB, bgap <= toleranceUs).otherwise(fgap <= toleranceUs)
    val out = payload.foldLeft(j) { (df, p) =>
      df.withColumn(prefix + p,
        when(within && useB, col(s"__b_$p"))
          .when(within && !useB, col(s"__f_$p")))
    }
    out.drop(payload.map(p => s"__b_$p") ++ payload.map(p => s"__f_$p"): _*)
  }

  /** Point-in-interval join: every (point, interval) pair with
    * `start <= ts <= end` (inclusive bounds). No equality key relates the
    * two sides, so a naive join is a cartesian product with a residual
    * filter; this plan buckets time instead:
    *
    *  - each point lands in exactly ONE bucket (`floor(ts / width)`),
    *  - each interval is exploded to every bucket it covers,
    *  - the join is an equi-join on bucket + the exact range residual.
    *
    * Because a point belongs to one bucket only, no dedup pass is needed.
    * `bucketWidthUs` should be on the order of the typical interval length:
    * wider buckets mean fewer interval replicas but a weaker pre-filter.
    * Intervals with `end < start` fail fast (Spark's `sequence` rejects
    * inverted bounds with a positive step) rather than silently matching
    * nothing or everything, and an interval spanning more than
    * `maxBucketsPerInterval` buckets fails with an actionable error (the
    * replication factor IS the cost model — an unbounded explode is a
    * misconfigured bucket width, not a bigger join).
    *
    * The residual predicate is qualified against each side's frame, so the
    * two inputs may freely share column names (e.g. both carrying `ts`). */
  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
                          pointTs: String, startTs: String, endTs: String,
                          bucketWidthUs: Long = 3600000000L,
                          maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketWidthUs > 0, "bucket width must be positive")
    require(maxBucketsPerInterval > 0, "bucket cap must be positive")
    val p = points.withColumn("__pb",
      floor(unix_micros(col(pointTs)) / bucketWidthUs))
    val startB = floor(unix_micros(col(startTs)) / bucketWidthUs)
    val endB = floor(unix_micros(col(endTs)) / bucketWidthUs)
    val guarded = when(
      endB - startB >= lit(maxBucketsPerInterval.toLong),
      raise_error(concat(
        lit("pointInIntervalJoin: interval spans "),
        (endB - startB + lit(1L)).cast("string"),
        lit(s" buckets (> maxBucketsPerInterval=$maxBucketsPerInterval); " +
          s"widen bucketWidthUs (currently $bucketWidthUs us) or raise the cap"))))
      .otherwise(startB)
    val i = intervals.withColumn("__ib",
      explode(sequence(guarded, endB, lit(1L))))
    p.join(i, p("__pb") === i("__ib") &&
        p(pointTs) >= i(startTs) && p(pointTs) <= i(endTs))
      .drop("__pb", "__ib")
  }
}
