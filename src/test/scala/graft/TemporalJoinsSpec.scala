package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.operators.TemporalJoins

/** As-of and point-in-interval join semantics + plan shape. */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // clicks (right) / purchases (left) for one user, plus a user with no clicks
  lazy val clicks = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100L),
    (1L, ts("2024-01-01 10:05:00"), 101L),
    (1L, ts("2024-01-01 10:30:00"), 102L),
    (2L, ts("2024-01-01 09:00:00"), 200L)
  ).toDF("user_id", "ts", "click_id")

  lazy val purchases = Seq(
    (1L, ts("2024-01-01 10:04:00"), 900L), // after click 100
    (1L, ts("2024-01-01 10:05:00"), 901L), // ties click 101 -> inclusive match
    (1L, ts("2024-01-01 11:00:00"), 902L), // after click 102
    (2L, ts("2024-01-01 08:00:00"), 903L), // before user 2's only click -> null
    (3L, ts("2024-01-01 12:00:00"), 904L)  // user with no clicks -> null
  ).toDF("user_id", "ts", "purchase_id")

  test("asofJoinBackward matches the latest right row at-or-before each left ts") {
    val out = TemporalJoins.asofJoinBackward(purchases, clicks, Seq("user_id"),
        "ts", "ts", Seq("click_id"))
      .select($"purchase_id", $"matched_click_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(900L).contains(100L))
    assert(out(901L).contains(101L)) // inclusive: right AT left ts matches
    assert(out(902L).contains(102L))
    assert(out(903L).isEmpty)
    assert(out(904L).isEmpty)
  }

  test("asofJoinBackward equals the naive max-per-left join on random data") {
    val r = new scala.util.Random(7)
    val right = Seq.tabulate(300)(i =>
      (r.nextInt(5).toLong, new Timestamp(r.nextInt(100000) * 1000L), i.toLong))
      .toDF("k", "ts", "rid")
    val left = Seq.tabulate(200)(i =>
      (r.nextInt(6).toLong, new Timestamp(r.nextInt(100000) * 1000L), (1000 + i).toLong))
      .toDF("k", "ts", "lid")
    val fast = TemporalJoins.asofJoinBackward(left, right, Seq("k"),
        "ts", "ts", Seq("rid", "ts"), prefix = "m_")
      .select($"lid", $"m_rid").as[(Long, Option[Long])].collect().toMap
    // naive: range join + argmax (largest ts, then largest rid on ties)
    val naive = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" && $"r.ts" <= $"l.ts", "left")
      .groupBy($"lid")
      .agg(max_by(struct($"r.ts", $"rid"), struct($"r.ts", $"rid")).as("m"))
      .select($"lid", $"m.rid").as[(Long, Option[Long])].collect().toMap
    assert(fast == naive)
  }

  test("asofJoinBackward payload fields all come from the same matched row") {
    val right = Seq((1L, ts("2024-01-01 10:00:00"), Some("a"), 10L),
                    (1L, ts("2024-01-01 10:10:00"), None, 20L))
      .toDF("k", "ts", "tag", "v") // latest row has a NULL payload field
    val left = Seq((1L, ts("2024-01-01 10:20:00"), 1L)).toDF("k", "ts", "lid")
    val row = TemporalJoins.asofJoinBackward(left, right, Seq("k"),
        "ts", "ts", Seq("tag", "v")).select($"matched_tag", $"matched_v")
      .collect().head
    // per-column last(ignoreNulls) would have stitched ("a", 20); the
    // struct transport keeps the matched row intact: (null, 20)
    assert(row.isNullAt(0) && row.getLong(1) == 20L)
  }

  test("asofJoinBackward plan has exactly one shuffle (union+window, no range join)") {
    val out = TemporalJoins.asofJoinBackward(purchases, clicks, Seq("user_id"),
      "ts", "ts", Seq("click_id"))
    out.collect() // finalize the adaptive plan
    // count Exchanges in the FINAL adaptive plan only (the plan string
    // repeats the pre-AQE plan under "== Initial Plan ==")
    val planStr = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val shuffles = planStr.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles\n$planStr")
  }

  test("asofJoinForward matches the earliest right row at-or-after each left ts") {
    val out = TemporalJoins.asofJoinForward(purchases, clicks, Seq("user_id"),
        "ts", "ts", Seq("click_id"))
      .select($"purchase_id", $"matched_click_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(900L).contains(101L)) // next click after 10:04 is 10:05
    assert(out(901L).contains(101L)) // inclusive: right AT left ts matches
    assert(out(902L).isEmpty)        // no click after 11:00
    assert(out(903L).contains(200L)) // user 2's click is later
    assert(out(904L).isEmpty)        // user with no clicks
  }

  test("asofJoinForward equals the naive min-per-left join on random data") {
    val r = new scala.util.Random(11)
    val right = Seq.tabulate(300)(i =>
      (r.nextInt(5).toLong, new Timestamp(r.nextInt(100000) * 1000L), i.toLong))
      .toDF("k", "ts", "rid")
    val left = Seq.tabulate(200)(i =>
      (r.nextInt(6).toLong, new Timestamp(r.nextInt(100000) * 1000L), (1000 + i).toLong))
      .toDF("k", "ts", "lid")
    val fast = TemporalJoins.asofJoinForward(left, right, Seq("k"),
        "ts", "ts", Seq("rid", "ts"), prefix = "m_")
      .select($"lid", $"m_rid").as[(Long, Option[Long])].collect().toMap
    // naive: range join + argmin (smallest ts, then smallest rid on ties)
    val naive = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" && $"r.ts" >= $"l.ts", "left")
      .groupBy($"lid")
      .agg(min_by(struct($"r.ts", $"rid"), struct($"r.ts", $"rid")).as("m"))
      .select($"lid", $"m.rid").as[(Long, Option[Long])].collect().toMap
    assert(fast == naive)
  }

  test("asofJoinForward plan has exactly one shuffle") {
    val out = TemporalJoins.asofJoinForward(purchases, clicks, Seq("user_id"),
      "ts", "ts", Seq("click_id"))
    out.collect()
    val planStr = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val shuffles = planStr.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles\n$planStr")
  }

  test("resampleFfill grids per key, forward-fills, leaves leading gaps null") {
    val series = Seq(
      (1L, ts("2024-01-01 10:30:00"), 10.0), // first obs mid-hour
      (1L, ts("2024-01-01 13:00:00"), 20.0), // obs exactly ON a grid point
      (1L, ts("2024-01-01 14:45:00"), 30.0),
      (2L, ts("2024-01-01 09:15:00"), 5.0)
    ).toDF("k", "ts", "v")
    val out = TemporalJoins.resampleFfill(series, "k", "ts", "v")
      .as[(Long, Timestamp, Option[Double])].collect()
      .map(r => (r._1, r._2.toString) -> r._3).toMap
    // key 1: grid 10:00..14:00 (floor of min/max)
    assert(out((1L, "2024-01-01 10:00:00.0")).isEmpty)      // before first obs
    assert(out((1L, "2024-01-01 11:00:00.0")).contains(10.0)) // ffill
    assert(out((1L, "2024-01-01 12:00:00.0")).contains(10.0))
    assert(out((1L, "2024-01-01 13:00:00.0")).contains(20.0)) // obs ON the grid
    assert(out((1L, "2024-01-01 14:00:00.0")).contains(20.0)) // 14:45 not yet
    assert(out((2L, "2024-01-01 09:00:00.0")).isEmpty)
    assert(out.count(_._1._1 == 1L) == 5 && out.count(_._1._1 == 2L) == 1)
  }

  test("resampleFfill fails fast when a key spans more than the grid cap") {
    val series = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-03-01 00:00:00"), 2.0)).toDF("k", "ts", "v")
    val ex = intercept[Exception] {
      TemporalJoins.resampleFfill(series, "k", "ts", "v",
        stepUs = 60000000L, maxGridPoints = 1000).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("maxGridPoints")))
  }

  test("pointInIntervalJoin tolerates shared column names across the two sides") {
    // both sides carry a column literally named `ts` — the residual
    // predicate must resolve per-side, not ambiguously
    val points = Seq((1L, ts("2024-01-01 10:05:00")), (2L, ts("2024-01-01 12:00:00")))
      .toDF("pid", "ts")
    val ivals = Seq((10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"),
        ts("2024-01-01 00:00:00")))
      .toDF("iid", "start", "end", "ts") // interval side ALSO has `ts`
    val out = TemporalJoins.pointInIntervalJoin(points, ivals,
        "ts", "start", "end", bucketWidthUs = 600000000L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L)))
  }

  test("pointInIntervalJoin fails fast with a clear error on overlong intervals") {
    val points = Seq((1L, ts("2024-01-01 10:05:00"))).toDF("pid", "pts")
    val ivals = Seq((10L, ts("2024-01-01 00:00:00"), ts("2024-12-31 00:00:00")))
      .toDF("iid", "start", "end")
    val ex = intercept[Exception] {
      TemporalJoins.pointInIntervalJoin(points, ivals, "pts", "start", "end",
        bucketWidthUs = 60000000L, maxBucketsPerInterval = 1000).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("maxBucketsPerInterval")),
      s"expected actionable error, got: ${messages(ex).mkString(" | ")}")
  }

  test("pointInIntervalJoin equals the naive range join; spans bucket boundaries") {
    val points = (0 until 500).map(i =>
      (i.toLong, new Timestamp(i * 60L * 1000000L / 1000))) // every minute
      .toDF("pid", "pts")
    // intervals of varied length incl. several crossing the 10-min buckets
    val ivals = Seq(
      (1L, 0L, 5L), (2L, 8L, 23L), (3L, 100L, 100L), (4L, 250L, 400L))
      .map { case (id, a, b) =>
        (id, new Timestamp(a * 60000L), new Timestamp(b * 60000L)) }
      .toDF("iid", "start", "end")
    val fast = TemporalJoins.pointInIntervalJoin(points, ivals,
        "pts", "start", "end", bucketWidthUs = 600000000L) // 10-min buckets
      .select($"iid", $"pid").as[(Long, Long)].collect().toSet
    val naive = points.join(ivals,
        $"pts" >= $"start" && $"pts" <= $"end")
      .select($"iid", $"pid").as[(Long, Long)].collect().toSet
    assert(fast == naive)
    assert(fast.nonEmpty && fast.count(_._1 == 3L) == 1) // degenerate interval
  }

  test("asofJoinNearest picks the closer side, backward on ties, nulls past tolerance") {
    // left = clicks; candidates exist on both sides with varied gaps
    val out = TemporalJoins.asofJoinNearest(clicks, purchases, Seq("user_id"),
        "click_id", "ts", "ts", Seq("purchase_id", "ts"),
        toleranceUs = 3600000000L) // 1 hour
      .select($"click_id", $"matched_purchase_id")
      .as[(Long, Option[Long])].collect().toMap
    // click 100 @10:00: backward none, forward 900 @10:04 (4 min) -> 900
    assert(out(100L).contains(900L))
    // click 101 @10:05: purchase 901 AT the same ts -> backward gap 0 wins
    assert(out(101L).contains(901L))
    // click 102 @10:30: backward 901 @10:05 (25 min) vs forward 902 @11:00
    // (30 min) -> backward nearer
    assert(out(102L).contains(901L))
    // click 200 @09:00: only candidate 903 @08:00, 1 h back — INSIDE the
    // 1 h tolerance (<=) -> matched
    assert(out(200L).contains(903L))
    // tightening tolerance below each gap nulls every match
    val tight = TemporalJoins.asofJoinNearest(clicks, purchases, Seq("user_id"),
        "click_id", "ts", "ts", Seq("purchase_id", "ts"),
        toleranceUs = 60000000L) // 1 minute
      .select($"click_id", $"matched_purchase_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(tight(100L).isEmpty && tight(102L).isEmpty && tight(200L).isEmpty)
    assert(tight(101L).contains(901L), "zero-gap tie must survive any tolerance")
  }
}
