package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.TemporalJoins
import graft.sources.Tables

/** Relational analytics surface: aggregation, join, window, sort/top-k and
  * set operators over the star schema (SURVEY.md §2.2-2.7), plus event-time
  * windowing over `events` (batch form of the streaming ext, §2.9).
  *
  * Scale notes: every aggregate is partial+final (map-side combine free via
  * Catalyst); joins go through AQE which picks broadcast for the dimension
  * sides at real scale; windows partition by high-cardinality keys so no
  * single-partition sort appears anywhere except deliberately-tiny top-k. */
object AnalyticsQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: full-scan partial agg
    "q1_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Exact-units twin of q1_agg: the flagship's double SUM is
    // order-dependent and flips its last rounded digit between engines at
    // ~60M rows (FLOAT_ULP at sf10, r17). Here each measure is quantized
    // per row with floor(x * 10^4) — one correctly-rounded IEEE multiply +
    // exact floor, bit-identical in Spark and DuckDB — and summed as
    // BIGINT micro-units (order-free, exact, hash-stable at any scale).
    // r18 presented these as DECIMAL(38,4); the values were bit-identical
    // in both engines yet the driver's hasher flagged hash_match=false
    // (q1_agg_dec was the repo's only DECIMAL output column and its only
    // hash failure) — BIGINT is the repo-wide integer-units discipline and
    // demonstrably hash-safe, so the presentation stays in u4 units.
    "q1_agg_dec" -> ((s, dir) => {
      def u4(c: org.apache.spark.sql.Column) = floor(c * lit(10000))
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(u4(col("l_quantity"))).as("sum_qty_u4"),
          sum(u4(col("l_extendedprice"))).as("sum_base_price_u4"),
          sum(u4(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc_price_u4"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")}),

    // Q3-style: 3-way join + agg + top-k
    "q3_top" -> ((s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)}),

    // Q5-style: snowflake join chain to region, revenue per nation
    "q5_region" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
        .orderBy("n_name")}),

    // Full MERGE INTO semantics without a table format, all three
    // branches: WHEN MATCHED AND s.del THEN DELETE (source rows k%15=0
    // carry the delete flag), WHEN MATCHED THEN UPDATE (k%3=0 takes
    // source values), WHEN NOT MATCHED THEN INSERT (keys above the key
    // space for k%7=0) — one full-outer coalesce, deletes filtered out
    // of the merged state AFTER the per-row branch classification so the
    // audit counts them. The audit row carries exact counts plus an
    // order-free Σhash32(key:cents) checksum over the SURVIVING state,
    // so the hash proves row-level content, not just cardinalities. The
    // insert offset is DATA-ADAPTIVE (max key via a broadcast 1-row
    // frame / scalar subquery — the gx_kcore discipline), never a
    // literal: a fixed offset would collide with real keys once the
    // fixture outgrows it, silently turning inserts into updates
    "q_merge" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      val mx = c.agg(max(col("k")).as("mx"))
      val source = c.filter(pmod(col("k"), lit(3)) === 0)
        .select(col("k"), (col("bal") + 100).as("bal"),
          (pmod(col("k"), lit(15)) === 0).as("del"))
        .unionByName(c.filter(pmod(col("k"), lit(7)) === 0)
          .crossJoin(broadcast(mx))
          .select((col("k") + col("mx")).as("k"), col("bal"),
            lit(false).as("del")))
      c.select(col("k"), col("bal").as("tbal"))
        .join(source.select(col("k"), col("bal").as("sbal"), col("del")),
          Seq("k"), "full_outer")
        .select(col("k"), coalesce(col("sbal"), col("tbal")).as("bal"),
          (col("sbal").isNotNull && col("tbal").isNotNull &&
            !coalesce(col("del"), lit(false))).as("updated"),
          col("tbal").isNull.as("inserted"),
          (col("sbal").isNotNull && col("tbal").isNotNull &&
            coalesce(col("del"), lit(false))).as("deleted"))
        .agg(sum(when(!col("deleted"), 1L).otherwise(0L)).as("n_result"),
          sum(when(col("updated"), 1L).otherwise(0L)).as("n_updated"),
          sum(when(col("inserted"), 1L).otherwise(0L)).as("n_inserted"),
          sum(when(col("deleted"), 1L).otherwise(0L)).as("n_deleted"),
          sum(when(!col("deleted"),
            graft.functions.TextFunctions.hash32(
              concat(col("k").cast("string"), lit(":"),
                floor(col("bal") * 100).cast("long").cast("string"))))
            .otherwise(0L)).as("checksum"))}),

    // SCD TYPE-2 dimension build (the warehouse versioning op MERGE's
    // upsert flattens away): each (customer, order date) becomes a
    // version row with valid_from/valid_to half-open intervals (lead
    // date; NULL = current) and running cumulative state (order count,
    // lifetime cents — exact i64 via the half-up cents cast). One
    // window partition per customer, no self-join; at scale this is a
    // single shuffle on the customer key.
    "q_scd2" -> ((s, dir) => {
      val v = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderdate").as("valid_from"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .groupBy("o_custkey", "valid_from")
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
      val w = Window.partitionBy("o_custkey").orderBy("valid_from")
      v.select(col("o_custkey"), col("valid_from"),
          lead(col("valid_from"), 1).over(w).as("valid_to"),
          sum(col("n_orders")).over(w).as("n_orders_cum"),
          sum(col("cents")).over(w).as("cents_cum"))
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy("o_custkey", "valid_from")}),

    // revenue concentration: what share of total order value sits with
    // the top-1% customers (data-adaptive p99 cut on per-customer cents
    // totals). Dollars go through the half-up cents cast BEFORE any sum
    // so every aggregate is exact i64 — a float revenue sum would be
    // order-dependent in the low bits; share is one integer division
    "q_revenue_concentration" -> ((s, dir) => {
      val pc = Tables.orders(s, dir)
        .select(col("o_custkey"),
          floor(col("o_totalprice") * 100 + 0.5).as("cents"))
        .groupBy("o_custkey").agg(sum(col("cents")).as("cents"))
      val cut = pc.agg(expr("percentile(cents, 0.99D)").as("cut"))
      pc.crossJoin(broadcast(cut))
        .agg(count(lit(1)).as("n_customers"),
          sum(when(col("cents") > col("cut"), 1L).otherwise(0L)).as("n_top"),
          sum(when(col("cents") > col("cut"), col("cents")).otherwise(0L))
            .as("top_cents"),
          sum(col("cents")).as("total_cents"))
        .select(col("n_customers"), col("n_top"), col("top_cents"),
          col("total_cents"),
          expr("(1000 * top_cents) div total_cents").as("share_milli"))}),

    // data-contract integrity audit — the constraint checks a warehouse
    // runs before trusting a load: referential orphans (lineitem →
    // orders), duplicate primary keys, and a domain rule (discount ∈
    // [0,1]). Audited over a view with PLANTED violations (5 orphan
    // lineitems with discount 2.0, one duplicated order key) so every
    // branch is provably non-vacuous — the clean fixture alone would
    // gate all-zeros, which can't tell a working audit from a no-op
    "q_integrity" -> ((s, dir) => {
      val planted = s.range(5).select(
        (col("id") * -1 - 1).as("l_orderkey"), lit(2.0).as("l_discount"))
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_discount")
        .unionByName(planted)
      val o = Tables.orders(s, dir)
      val okeys = o.select(col("o_orderkey"))
        .unionByName(s.range(1).select(lit(-7L).as("o_orderkey")))
        .unionByName(s.range(1).select(lit(-7L).as("o_orderkey")))
      val orphans = li.join(okeys, li("l_orderkey") === okeys("o_orderkey"),
        "left_anti")
      val dups = okeys.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
        .filter(col("c") > 1)
      orphans.agg(count(lit(1)).as("n_orphan_lineitems"))
        .crossJoin(dups.agg(count(lit(1)).as("n_dup_orderkeys")))
        .crossJoin(li.agg(
          sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
            .otherwise(0L)).as("n_bad_discount")))}),

    // grouped exact quantiles: the p25/p50/p75 account-balance envelope
    // per market segment. Balances go through the half-up cents cast
    // (floor(x·100 + 0.5) — IEEE-exact, unlike round's half-even split)
    // so the interpolated quantiles run on integers, where Spark
    // percentile == DuckDB quantile_cont exactly
    "q_group_quantiles" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_mktsegment"),
          floor(col("c_acctbal") * 100 + 0.5).as("cents"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          expr("percentile(cents, 0.25D)").as("p25_cents"),
          expr("percentile(cents, 0.5D)").as("p50_cents"),
          expr("percentile(cents, 0.75D)").as("p75_cents"))
        .orderBy("c_mktsegment")),

    // correlated EXISTS / NOT EXISTS through the SQL text path — the
    // predicate-subquery rewrite (semi + anti join) Catalyst must plan;
    // customers with a big order but no urgent one
    "q_exists" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("q_exists_customer")
      Tables.orders(s, dir).createOrReplaceTempView("q_exists_orders")
      s.sql("""
        SELECT c_custkey, c_name FROM q_exists_customer c
        WHERE EXISTS (SELECT 1 FROM q_exists_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 100000)
          AND NOT EXISTS (SELECT 1 FROM q_exists_orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderpriority = '1-URGENT')
        ORDER BY c_custkey""")}),

    // correlated LATERAL subquery with per-row ORDER BY/LIMIT — each
    // customer's two largest orders via the lateral join operator (the
    // dependent-join form of top-k-per-key, vs q_window_topk's window)
    "q_lateral" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("q_lat_customer")
      Tables.orders(s, dir).createOrReplaceTempView("q_lat_orders")
      s.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM q_lat_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM q_lat_orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        ORDER BY c_custkey, o_orderkey""")}),

    // distribution window functions: percent_rank/cume_dist (exact
    // single-division rationals in floor-micro units — the ordering is
    // unique so ranks are deterministic) + first/nth_value over the
    // default running frame
    "q_window_dist" -> ((s, dir) => {
      val o = Tables.orders(s, dir).filter(col("o_custkey") < 50)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      o.select(col("o_custkey"), col("o_orderkey"),
        floor(lit(1e6) * percent_rank().over(w)).cast("long").as("pr_micro"),
        floor(lit(1e6) * cume_dist().over(w)).cast("long").as("cd_micro"),
        first(col("o_orderkey")).over(w).as("first_order"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
        .orderBy("o_custkey", "o_orderkey")}),

    // fuzzy entity matching (record linkage): edit-distance-1 customer-
    // name neighborhoods via the FastSS deletion-variant equi-join —
    // complete candidate generation with NO name cross product, exact
    // levenshtein verification on candidates only
    "q_fuzzy_match" -> ((s, dir) =>
      graft.operators.Dedup.editOneNeighborCounts(
        Tables.customer(s, dir), col("c_name"))),

    // TPC-H Q7-shaped bilateral trade volume: the 6-table join (lineitem
    // ⋈ orders ⋈ customer with three broadcast dims) grouped by
    // (supplier nation, customer nation, ship year) — no fixed nation
    // pair (a literal pair can be supplier-less at small SF), so the
    // full matrix is non-vacuous at every scale
    "q7_trade" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val n1 = n.select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = n.select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), su("s_nationkey") === col("sk"))
        .join(broadcast(n2), c("c_nationkey") === col("ck"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")}),

    // TPC-H Q10-shaped returned-item ranking: customers by revenue lost
    // to returns — fact ⋈ fact shuffle join + broadcast customer/nation,
    // deterministic top-20 under (rounded revenue DESC, custkey)
    "q10_returns" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey")).limit(20)}),

    // unpivot/melt (the inverse of q_pivot, via the Spark 4 Dataset API):
    // three measure columns become (measure, value) rows, then one
    // grouped rollup per measure — wide-to-long reshaping without
    // hand-written unions
    "q_unpivot" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "value")
        .groupBy("l_returnflag", "measure")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
        .orderBy("l_returnflag", "measure")),

    // window functions: top-3 parts per supplier by shipped quantity
    // SKYLINE (Pareto frontier): the parts no other part dominates on
    // (minimize p_retailprice, maximize p_size). NOT the n² dominance
    // join — the 2-D skyline collapses to a grouped sweep: max size per
    // distinct price, then a prefix-max over the price-ordered GROUP
    // frame (bounded price domain, never the part table), keep groups
    // whose max strictly exceeds every cheaper group's, re-attach
    // tied parts. The oracle is the INDEPENDENT quadratic NOT EXISTS
    // dominance formulation — a semantic check, not a plan replay.
    // Price is a raw parquet double compared, never computed — exact
    "q_skyline" -> ((s, dir) => {
      val p = Tables.part(s, dir)
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      val byPrice = p.groupBy(col("p_retailprice"))
        .agg(max(col("p_size")).as("msz"))
      val w = Window.orderBy(col("p_retailprice"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val sky = byPrice.withColumn("prevmax", max(col("msz")).over(w))
        .filter(col("prevmax").isNull || col("msz") > col("prevmax"))
      p.join(sky, Seq("p_retailprice"))
        .filter(col("p_size") === col("msz"))
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
        .orderBy(col("p_retailprice"), col("p_partkey"))}),

    "q_window_topk" -> ((s, dir) => {
      val per = Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("qty").desc, col("l_partkey"))
      per.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("l_suppkey", "l_partkey", "qty", "rk")
        .orderBy("l_suppkey", "rk")}),

    // running windows: cumulative revenue per supplier over ship dates
    "q_window_running" -> ((s, dir) => {
      val daily = Tables.lineitem(s, dir)
        .filter(col("l_suppkey") < 10)
        .groupBy(col("l_suppkey"), col("l_shipdate"))
        .agg(round(sum(col("l_extendedprice")), 2).as("rev"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_shipdate"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.withColumn("cum_rev", round(sum(col("rev")).over(w), 2))
        .select("l_suppkey", "l_shipdate", "rev", "cum_rev")
        .orderBy("l_suppkey", "l_shipdate")}),

    // RANGE window frame (time-valued bounds): per event, how many events
    // the same user produced in the trailing hour — integer counts only,
    // so no float-sum-order hazard inside the sliding frame
    "q_window_range" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id") < 50)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, 0)
      ev.select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_trailing_hour"))
        .orderBy("event_id")}),

    // INTERSECT: customers ordering in both 1995 and 1996
    "q_intersect" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val y95 = o.filter(year(col("o_orderdate")) === 1995)
        .select(col("o_custkey").as("custkey")).distinct()
      val y96 = o.filter(year(col("o_orderdate")) === 1996)
        .select(col("o_custkey").as("custkey")).distinct()
      y95.intersect(y96).orderBy("custkey")}),

    // set operators: customers with orders but no high-value (> 400k) order
    // — 400k leaves a non-empty EXCEPT at every SF (200k was empty at
    // sf0.001, a vacuous check)
    "q_set_ops" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val withOrders = o.select(col("o_custkey").as("custkey")).distinct()
      val highValue = o.filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("custkey")).distinct()
      withOrders.except(highValue).orderBy("custkey")}),

    // semi/anti joins: parts never shipped in a high-quantity (>= 48)
    // lineitem — "never shipped at all" was the empty set at every SF, a
    // vacuous check; this predicate leaves a real anti-join survivor set
    "q_anti_join" -> ((s, dir) => {
      val p = Tables.part(s, dir)
      val l = Tables.lineitem(s, dir).filter(col("l_quantity") >= 48)
      p.join(l, p("p_partkey") === l("l_partkey"), "left_anti")
        .select(col("p_partkey")).orderBy("p_partkey")}),

    // scalar-function surface: string/date/math over lineitem
    "q_scalar_funcs" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          upper(col("l_returnflag")).as("flag_u"),
          length(col("l_linestatus")).as("status_len"),
          year(col("l_shipdate")).as("ship_year"),
          month(col("l_shipdate")).as("ship_month"),
          round(col("l_extendedprice") * col("l_discount"), 4).as("discount_amt"),
          round(abs(col("l_quantity") - 25.0), 2).as("qty_dev"))
        .orderBy("l_orderkey", "l_linenumber")),

    // the ACTUAL streaming pipeline in the correctness gate: tumblingCounts
    // read from the parquet micro-batch source, drained through the memory
    // sink, checked against the SAME DuckDB oracle as its batch twin
    // s_events_window — a streaming regression now shows up as a hash
    // mismatch, not just a spec failure
    "s_stream_tumbling" -> ((s, dir) => {
      val st = graft.streaming.EventStreams.tumblingCounts(
        graft.streaming.EventStreams.readEvents(s, dir))
      graft.streaming.EventStreams.runToMemory(st, "s_stream_tumbling_sink",
        shufflePartitions = Some(8))
        .orderBy("window_start", "event_type")}),

    // STREAMING WINDOWED-HLL cardinality in the gate: distinct users per
    // 1-hour window maintained as 64 integers of state per window (the
    // production replacement for the windowed count(DISTINCT) streams
    // can't run at scale — s_stream_degree keeps every dedup key in
    // state); registers drain in update mode, collapse by max, and the
    // IEEE-exact estimate + exact distinct + milli error attach
    // post-drain. Full register/float-tree replay in the oracle
    "s_stream_whll" -> ((s, dir) => {
      import graft.operators.Sketches
      val st = graft.streaming.EventStreams.windowedHllRegisters(
        graft.streaming.EventStreams.readEvents(s, dir))
      val drained = graft.streaming.EventStreams.runToMemory(st,
        "s_stream_whll_sink",
        org.apache.spark.sql.streaming.OutputMode.Update(),
        shufflePartitions = Some(8))
      val regs = drained.groupBy("window_start", "register")
        .agg(max(col("rho_max")).as("rho_max"))
      val est = Sketches.hllEstimateBy(
          regs.withColumnRenamed("window_start", "grp"))
        .withColumnRenamed("grp", "window_start")
      val exact = Tables.events(s, dir)
        .select(date_trunc("hour", col("ts")).as("window_start"),
          col("user_id"))
        .groupBy("window_start")
        .agg(countDistinct(col("user_id")).as("exact"))
      est.join(exact, "window_start")
        .select(col("window_start"), col("s_pow"), col("est"), col("exact"),
          expr("(1000 * abs(est - exact)) div exact").as("err_milli"))
        .orderBy("window_start")}),

    // streaming SESSION windows in the gate: session_window(ts, 30 min)
    // drained to memory; the oracle replays the 30-min-gap rule with the
    // lag/running-sum sessionization and session_start = min(ts), using a
    // >=-gap new-session rule that matches Spark's strict-< merge
    // bit-for-bit on any input (a gap of exactly 30 min splits in both)
    "s_stream_sessions" -> ((s, dir) => {
      val st = graft.streaming.EventStreams.sessionCounts(
        graft.streaming.EventStreams.readEvents(s, dir))
      graft.streaming.EventStreams.runToMemory(st, "s_stream_sessions_sink",
        shufflePartitions = Some(8))
        .orderBy("user_id", "session_start")}),

    // streaming SLIDING windows in the gate: window(ts, 1h, 15min) — each
    // event lands in 4 overlapping epoch-aligned windows; the oracle
    // replays the window assignment by exploding each event into its 4
    // window starts (floor-to-15min minus k slides, k = 0..3)
    "s_stream_sliding" -> ((s, dir) => {
      val st = graft.streaming.EventStreams.slidingCounts(
        graft.streaming.EventStreams.readEvents(s, dir))
      graft.streaming.EventStreams.runToMemory(st, "s_stream_sliding_sink",
        shufflePartitions = Some(8))
        .orderBy("window_start", "event_type")}),

    // streaming exact dedup in the gate: dropDuplicatesWithinWatermark on
    // (user_id, event_type) — the ingest-time dedup operator. Only the
    // dedup-key columns are emitted (which duplicate's payload survives
    // depends on arrival order — not a semantic of the operator), so the
    // oracle is the order-free SELECT DISTINCT
    "s_stream_dedup" -> ((s, dir) => {
      val st = graft.streaming.EventStreams.dedupedEvents(
        graft.streaming.EventStreams.readEvents(s, dir),
        Seq("user_id", "event_type"))
        .select(col("user_id"), col("event_type"))
      graft.streaming.EventStreams.runToMemory(st, "s_stream_dedup_sink",
        org.apache.spark.sql.streaming.OutputMode.Append(),
        shufflePartitions = Some(8))
        .orderBy("user_id", "event_type")}),

    // streaming stream-stream interval join in the gate: purchases
    // attributed to same-user clicks in the preceding hour, drained in
    // append mode; oracle = the equivalent relational interval join
    // streaming graph ingest in the gate: user → event_type edges deduped
    // within their window, then counted = per-window distinct-neighbor
    // out-degree (the streaming twin of count(DISTINCT) GROUP BY window)
    "s_stream_degree" -> ((s, dir) => {
      val st = graft.streaming.EventStreams.windowedDegrees(
        graft.streaming.EventStreams.readEvents(s, dir))
      graft.streaming.EventStreams.runToMemory(st, "s_stream_degree_sink",
        shufflePartitions = Some(8))
        .orderBy("window_start", "user_id")}),

    // CUSTOM STATE in the gate: mapGroupsWithState running per-user totals
    // drained in update mode. Each update re-emits the user's running
    // (n, total_micro); the outer max(struct(n, ...)) keeps only the LAST
    // update per user (n strictly increases), so the result is the final
    // state whatever the micro-batch split. total_micro accumulates
    // per-event floor(1e6·value) — integer, order-free, hash-checkable
    "s_stream_totals" -> ((s, dir) => {
      val st = graft.streaming.EventStreams.runningUserTotals(
        graft.streaming.EventStreams.readEvents(s, dir)).toDF()
      graft.streaming.EventStreams.runToMemory(st, "s_stream_totals_sink",
        org.apache.spark.sql.streaming.OutputMode.Update(),
        shufflePartitions = Some(8))
        .groupBy("user_id")
        .agg(max(struct(col("n"), col("total_micro"))).as("m"))
        .select(col("user_id"), col("m.n").as("n_events"),
          col("m.total_micro").as("total_micro"))
        .orderBy("user_id")}),

    // the SAME running totals on the transformWithState state-v2 API
    // (explicit ValueState handle, RocksDB provider — the only one tws
    // supports): same update-mode drain and max(struct) collapse, same
    // oracle — a hash match proves the v2 path end-to-end, not just
    // StreamingSpec's batch parity
    "s_stream_totals_tws" -> ((s, dir) => {
      val st = graft.streaming.EventStreams.runningUserTotalsTws(
        graft.streaming.EventStreams.readEvents(s, dir)).toDF()
      graft.streaming.EventStreams.runToMemoryRocksDB(st, "s_stream_totals_tws_sink",
        org.apache.spark.sql.streaming.OutputMode.Update(),
        shufflePartitions = Some(8))
        .groupBy("user_id")
        .agg(max(struct(col("n"), col("total_micro"))).as("m"))
        .select(col("user_id"), col("m.n").as("n_events"),
          col("m.total_micro").as("total_micro"))
        .orderBy("user_id")}),

    // LEFT OUTER stream-stream join in the gate: null-padded unmatched
    // purchases emit only below the final query watermark
    // (min(max click, max purchase) - 2h); the oracle replays matches as
    // the relational interval join and null rows with the same cutoff
    "s_stream_join_outer" -> ((s, dir) => {
      val st = graft.streaming.EventStreams.purchaseAfterClickOuter(
        graft.streaming.EventStreams.readEvents(s, dir))
      graft.streaming.EventStreams.runToMemory(st, "s_stream_join_outer_sink",
        org.apache.spark.sql.streaming.OutputMode.Append(),
        shufflePartitions = Some(8))
        .orderBy(col("user_id"), col("purchase_ts"),
          col("click_ts").asc_nulls_first)}),

    // UNWINDOWED global aggregation in COMPLETE mode — the one streaming
    // output mode not otherwise in the gate: the running corpus card
    // (docs + token volume) re-emits per micro-batch and the final
    // memory-sink table is the full-corpus aggregate, batch == stream
    "s_stream_card" -> ((s, dir) => {
      val st = graft.streaming.EventStreams.readDocuments(s, dir)
        .agg(count(lit(1)).as("n_docs"),
          sum(graft.functions.TextFunctions.tokenCount(col("text")))
            .as("n_tokens"))
      graft.streaming.EventStreams.runToMemory(st, "s_stream_card_sink",
        org.apache.spark.sql.streaming.OutputMode.Complete(),
        shufflePartitions = Some(8))}),

    // streaming near-dup suppression in the gate: per-row simhash
    // projection + streaming dedup on the document stream. WHICH doc
    // survives per signature depends on arrival order, so the gate pins
    // the deterministic part — the surviving signature set with exactly
    // one survivor each — against the batch distinct-signature oracle
    "s_stream_neardup" -> ((s, dir) => {
      val st = graft.streaming.EventStreams.nearDupFreeDocs(
        graft.streaming.EventStreams.readDocuments(s, dir), "text")
      val drained = graft.streaming.EventStreams.runToMemory(st,
        "s_stream_neardup_sink",
        org.apache.spark.sql.streaming.OutputMode.Append(),
        shufflePartitions = Some(8))
      graft.operators.Dedup.withSimhash(
          drained.filter(col("text").isNotNull), "text", "sig")
        .groupBy("sig").agg(count(lit(1)).as("n"))
        .orderBy("sig")}),

    // FULL outer in the gate: both sides' watermark-gated null padding,
    // each side's emission cutoff replayed in the oracle (purchases below
    // W, clicks below W − 1h — the condition-derived state watermarks)
    "s_stream_join_full" -> ((s, dir) => {
      val st = graft.streaming.EventStreams.purchaseAfterClickFull(
        graft.streaming.EventStreams.readEvents(s, dir))
      graft.streaming.EventStreams.runToMemory(st, "s_stream_join_full_sink",
        org.apache.spark.sql.streaming.OutputMode.Append(),
        shufflePartitions = Some(8))
        .orderBy(col("user_id"), col("purchase_ts").asc_nulls_first,
          col("click_ts").asc_nulls_first)}),

    "s_stream_join" -> ((s, dir) => {
      val st = graft.streaming.EventStreams.purchaseAfterClick(
        graft.streaming.EventStreams.readEvents(s, dir))
      graft.streaming.EventStreams.runToMemory(st, "s_stream_join_sink",
        org.apache.spark.sql.streaming.OutputMode.Append(),
        shufflePartitions = Some(8))
        .orderBy("user_id", "purchase_ts", "click_ts")}),

    // STREAMING AS-OF enrichment: each event picks up the user's
    // loyalty tier AT EVENT TIME via a stateless stream-static
    // equi+range join against the broadcast tier-interval dimension
    // (EventStreams.asOfTier) — the streaming "latest dim version
    // at-or-before" that batch as-of does with a window replay, which
    // streams cannot run. Append mode, no state store; the oracle
    // replays the identical interval construction in SQL
    "s_stream_asof" -> ((s, dir) => {
      val st = graft.streaming.EventStreams.asOfTier(
        graft.streaming.EventStreams.readEvents(s, dir),
        graft.streaming.EventStreams.tierIntervals(Tables.events(s, dir)))
      graft.streaming.EventStreams.runToMemory(st, "s_stream_asof_sink",
        org.apache.spark.sql.streaming.OutputMode.Append(),
        shufflePartitions = Some(8))
        .orderBy("event_id")}),

    // event-time tumbling window (batch form of the streaming pipeline —
    // identical semantics to EventStreams.tumblingCounts)
    "s_events_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(
          date_trunc("hour", col("ts")).as("window_start"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy("window_start", "event_type")),

    // conversion-funnel analysis: per user, earliest view, first click
    // strictly after it, first purchase strictly after that. Three
    // min-aggregations chained on user_id (every join and groupBy keys on
    // user_id, so the exchange is reused; no per-user window sort) —
    // timestamps compare in integer micros, exact in both engines
    // SEQUENCE PATTERN MATCHING over per-user event streams — the
    // MATCH_RECOGNIZE analog: each user's events collapse (ts, event_id
    // order) to a symbol string (first letter of event_type — v/c/p/s/e,
    // all distinct) and regex counts detect ordered patterns: the full
    // view→clicks→purchase run and error bursts. Non-overlapping
    // leftmost matching agrees across engines for this pattern class
    // (the emailCount regexp_count discipline); the order-sensitive
    // collapse is a per-user sorted collect, never a window over the
    // whole stream
    "s_seq_pattern" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("substring(event_type, 1, 1)").as("sym"))
        .groupBy("user_id")
        .agg(expr("array_join(transform(array_sort(" +
          "collect_list(struct(ts, event_id, sym))), x -> x.sym), '')")
          .as("seq"))
        .select(col("user_id"), length(col("seq")).as("n_events"),
          regexp_count(col("seq"), lit("vc+p")).as("n_funnels"),
          regexp_count(col("seq"), lit("e{2,}")).as("n_error_bursts"))
        .orderBy("user_id")}),

    "s_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("view_ts"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") > col("view_ts"))
        .groupBy("user_id").agg(min("ts").as("click_ts"))
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") > col("click_ts"))
        .groupBy("user_id").agg(min("ts").as("purchase_ts"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .withColumn("stage",
          when(col("purchase_ts").isNotNull, lit(3))
            .when(col("click_ts").isNotNull, lit(2)).otherwise(lit(1)))
        .orderBy("user_id")
    }),

    // conversion latency: among users who complete the view→click→
    // purchase funnel, the view-to-purchase latency envelope in exact
    // integer micros (count, engine-exact p50/p90, max) — the metric
    // behind attribution-window sizing, composed from the same chained
    // min-aggregations as s_funnel
    "s_conversion_time" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("view_ts"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") > col("view_ts"))
        .groupBy("user_id").agg(min("ts").as("click_ts"))
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") > col("click_ts"))
        .groupBy("user_id").agg(min("ts").as("purchase_ts"))
      p.join(v, "user_id")
        .select((unix_micros(col("purchase_ts")) -
          unix_micros(col("view_ts"))).as("lat_us"))
        .agg(count(lit(1)).as("n_converted"),
          expr("percentile(lat_us, 0.5D)").as("p50_us"),
          expr("percentile(lat_us, 0.9D)").as("p90_us"),
          max(col("lat_us")).as("max_us"))}),

    // event path mining: the per-user TRANSITION MATRIX (which event type
    // follows which — the Markov view funnels are a special case of).
    // One lead window over (user_id; ts, event_id — a total order, ids
    // are unique) shares a single user_id shuffle; the transition counts
    // and milli-probabilities run on the TYPE×TYPE-bounded frame. At
    // scale this is one corpus shuffle + a 25-row aggregate
    "s_paths" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val bi = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      bi.withColumn("from_total", sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("from_type"))))
        .select(col("from_type"), col("to_type"), col("n"),
          expr("(1000 * n) div from_total").as("p_milli"))
        .orderBy("from_type", "to_type")
    }),

    // inter-event gap envelope per event type — the arrival-cadence
    // diagnostic (session gap sizing, bot detection): per-user lag gaps
    // in exact integer MICROS (unix_micros == epoch_us), then count /
    // engine-exact p50/p90 quantiles / max per the LATER event's type.
    // Same single user_id window shuffle as s_paths
    // GAPS-AND-ISLANDS: per-user runs of CONSECUTIVE active days (the
    // streak pattern: day − row_number is constant within a run, the
    // classic island key). One distinct + two user-keyed aggregations,
    // both reusing the user_id exchange; exact integer day arithmetic
    // (UTC session ⇒ to_date == DuckDB CAST(ts AS DATE))
    "s_islands" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("day")
      val days = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      days
        .withColumn("grp",
          datediff(col("day"), lit("1970-01-01")) - row_number().over(w))
        .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
        .groupBy("user_id").agg(
          count(lit(1)).as("n_islands"),
          max(col("len")).as("max_streak"),
          sum(col("len")).as("active_days"))
        .orderBy("user_id")}),

    "s_gaps" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("gap_us",
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .filter(col("gap_us").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          expr("percentile(gap_us, 0.5D)").as("p50_gap_us"),
          expr("percentile(gap_us, 0.9D)").as("p90_gap_us"),
          max(col("gap_us")).as("max_gap_us"))
        .orderBy("event_type")
    }),

    // Q18-shaped large-volume orders: per-order quantity rollup, a
    // DATA-ADAPTIVE p99 volume cut (Spark percentile == DuckDB
    // quantile_cont exactly; a fixed literal would go vacuous or
    // all-pass as SF moves), then the customer join on the survivors
    // only. sum_qty is a sum of integer-valued doubles — order-free
    // exact — cast to BIGINT for the gate
    "q18_bigorders" -> ((s, dir) => {
      val sums = Tables.lineitem(s, dir).groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"))
      val cut = sums.agg(expr("percentile(sum_qty, 0.99D)").as("cut"))
      val big = sums.crossJoin(broadcast(cut))
        .filter(col("sum_qty") > col("cut"))
        .select(col("l_orderkey"), col("sum_qty"))
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(big, o("o_orderkey") === big("l_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(20)
    }),

    // cohort retention: users grouped by first-active day, distinct-user
    // counts per (cohort_day, day_offset) cell — the classic retention
    // triangle. Dates derive from UTC-session timestamp truncation and
    // offsets are integer day diffs, so every cell is engine-exact
    // GROWTH ACCOUNTING (the classic new/retained/resurrected/churned
    // decomposition product analytics runs on every activity table):
    // per 7-day epoch week, each active user classifies by first-ever
    // week and exact previous-week adjacency; churn = active this week,
    // absent the next (the final week reports everyone churned — the
    // honest right-edge of the decomposition). One distinct + three
    // (user, week)-keyed equi-joins, exact integer counts. The fixture's
    // 15 users are active EVERY week (the density trap: resurrection
    // would be vacuous at every SF), so the activity table hash-thins
    // 25% of user-weeks — deterministic in both engines — planting the
    // gaps the resurrected/churned classes classify
    "s_growth" -> ((s, dir) => {
      val aw = Tables.events(s, dir).select(col("user_id"),
          expr("datediff(to_date(ts), date '1970-01-01') div 7").as("w"))
        .distinct()
        .filter(pmod(graft.functions.TextFunctions.hash60(
          concat(col("user_id").cast("string"), lit("|"),
            col("w").cast("string"), lit("gw"))), lit(4L)) =!= 0)
      val first = aw.groupBy("user_id").agg(min("w").as("fw"))
      val prev = aw.select(col("user_id"), (col("w") + 1).as("w"),
        lit(1).as("had_prev"))
      val nxt = aw.select(col("user_id"), (col("w") - 1).as("w"),
        lit(1).as("has_next"))
      aw.join(first, "user_id")
        .join(prev, Seq("user_id", "w"), "left")
        .join(nxt, Seq("user_id", "w"), "left")
        .groupBy("w").agg(
          count(lit(1)).as("n_active"),
          sum(when(col("w") === col("fw"), 1L).otherwise(0L)).as("n_new"),
          sum(when(col("w") =!= col("fw") && col("had_prev").isNotNull, 1L)
            .otherwise(0L)).as("n_retained"),
          sum(when(col("w") =!= col("fw") && col("had_prev").isNull, 1L)
            .otherwise(0L)).as("n_resurrected"),
          sum(when(col("has_next").isNull, 1L).otherwise(0L)).as("n_churned"))
        .orderBy("w")}),

    "s_retention" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val first = ev.groupBy("user_id").agg(min("d").as("cohort_day"))
      ev.join(first, "user_id")
        .withColumn("day_offset", datediff(col("d"), col("cohort_day")))
        .groupBy("cohort_day", "day_offset")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // per-user activity anomaly score: z-score of event volume vs the
    // population, in integer micro-units. The mean/sd step uses only
    // correctly-rounded IEEE ops (÷, ×, −, sqrt) + floor on exact BIGINT
    // sufficient statistics (n, Σc, Σc²), so it is bit-stable across
    // engines. The zero-variance guard tests the COMPUTED double
    // (var_d <= 0) identically in both engines: the integer identity
    // n·Σc² = (Σc)² misses the case where double cancellation drives
    // s2/n - (s1/n)² to exactly 0 or below with a nonzero true variance
    // (sqrt would go NaN / division by zero — Spark casts that silently,
    // DuckDB errors); since var_d is the same correctly-rounded double in
    // both engines, the guard decision is also identical
    "s_user_zscore" -> ((s, dir) => {
      val c = Tables.events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).as("n_events"))
      val st = c.agg(count(lit(1)).as("n_users"),
        sum("n_events").as("s1"),
        sum(col("n_events") * col("n_events")).as("s2"))
      def d(n: String) = col(n).cast("double")
      c.crossJoin(broadcast(st))
        .withColumn("var_d",
          d("s2") / d("n_users") -
            (d("s1") / d("n_users")) * (d("s1") / d("n_users")))
        .withColumn("z_micro",
          when(col("var_d") <= 0.0, lit(0L))
            .otherwise(floor(lit(1000000.0) *
              (d("n_events") - d("s1") / d("n_users")) / sqrt(col("var_d")))
              .cast("long")))
        .select("user_id", "n_events", "z_micro")
        .orderBy("user_id")
    }),

    // SQL-text entry path: the same engine surface via spark.sql over
    // registered views (what a SQL-first user of the library would run)
    "q_sql_api" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM v_orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")}),

    // exact percentiles (linear interpolation in both engines)
    "q_percentiles" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
        .orderBy("l_returnflag")),

    // statistical aggregates: correlation / sample stddev / variance
    "q_stats" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
          round(stddev_samp(col("l_discount")), 6).as("discount_sd"),
          round(var_samp(col("l_tax")), 6).as("tax_var"))
        .orderBy("l_returnflag")),

    // json functions over the events props column
    "q_json_funcs" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_id") < 100)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("prop_k"))
        .orderBy("event_id")),

    // array functions over the embeddings column
    "q_array_funcs" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .filter(col("vec_id") < 50)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 4).as("first_val"),
          round(aggregate(col("embedding").cast("array<double>"), lit(0.0),
            (acc, x) => acc + x), 4).as("vec_sum"))
        .orderBy("vec_id")),

    // rollup: hierarchical subtotals (flag, status) -> (flag) -> ()
    "q_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // explicit grouping sets (the third grouping form next to rollup and
    // cube): per-flag totals, per-status totals and the grand total in one
    // pass, disambiguated by grouping_id — one shuffle, Expand feeds all
    // three groupings map-side
    "q_grouping_sets" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          sum(col("l_quantity")).as("qty"))
        .select("l_returnflag", "l_linestatus", "gid", "n", "qty")
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // pivot: return flags to columns
    "q_pivot" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity")))
        .orderBy("l_linestatus")),

    // window-function family: rank/dense_rank on a tied key, lag/lead/ntile
    // on a unique ordering
    "q_window_funcs" -> ((s, dir) => {
      val o = Tables.orders(s, dir).filter(col("o_custkey") < 50)
      val tied = Window.partitionBy(col("o_custkey"))
        .orderBy(floor(col("o_totalprice") / 50000).asc)
      val uniq = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      o.select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(tied).as("rk"),
        dense_rank().over(tied).as("drk"),
        ntile(4).over(uniq).as("quartile"),
        lag(col("o_orderkey"), 1).over(uniq).as("prev_order"),
        lead(col("o_orderkey"), 1).over(uniq).as("next_order"))
        .orderBy("o_custkey", "o_orderkey")}),

    // sketch aggregation: HLL approx distinct. The raw estimate is
    // engine-specific (DuckDB's sketch differs), so the HASH-CHECKED
    // surface is the exact count plus the ERROR-BOUND VERDICT: Spark
    // computes |hll − exact| ≤ 3·rsd·exact (rsd 0.02; HLL++ is
    // deterministic for a fixed input, so the boolean is stable) and the
    // oracle pins exact + TRUE — an HLL regression past the bound now
    // breaks the gate, not just FunctionsSpec
    "q_approx_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey"), 0.02).as("hll"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("hll") - col("exact_parts")).cast("double") <=
            lit(0.06) * col("exact_parts").cast("double")).as("within_bound"))
        .orderBy("l_returnflag")),

    // approx-percentile sketch under an error-bound gate (the
    // q_approx_distinct discipline: the estimate itself is
    // engine-specific, so the hashed output is the exact row count plus a
    // VERDICT — the rank of the approx median must sit within 4x the
    // sketch's 1% rank-error guarantee; a broken sketch flips the boolean
    // and the gate catches it)
    "q_approx_pct" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val ap = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          expr("approx_percentile(value, 0.5, 100)").as("ap"))
      val rk = e.join(ap.select(col("event_type"), col("ap")), "event_type")
        .groupBy(col("event_type"))
        .agg(sum(when(col("value") <= col("ap"), 1L).otherwise(0L)).as("n_le"))
      ap.join(rk, "event_type")
        .select(col("event_type"), col("n_rows"),
          (abs(col("n_le").cast("double") - lit(0.5) * col("n_rows")) <=
            lit(0.04) * col("n_rows").cast("double")).as("within_bound"))
        .orderBy("event_type")}),

    // distinct aggregation
    "q_distinct_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    // correlated-subquery shape: parts priced above their brand average
    "q_above_brand_avg" -> ((s, dir) => {
      val p = Tables.part(s, dir)
      val brandAvg = Window.partitionBy(col("p_brand"))
      // filter on the UNROUNDED average: 2-decimal prices essentially never
      // sit within fp noise of a brand mean, so both engines agree; the
      // mean itself is not output (its rounding is the only boundary risk)
      p.withColumn("brand_avg", avg(col("p_retailprice")).over(brandAvg))
        .filter(col("p_retailprice") > col("brand_avg"))
        .select(col("p_partkey"), col("p_brand"),
          round(col("p_retailprice"), 2).as("price"))
        .orderBy("p_partkey")}),

    // TPC-H Q21 shape (suppliers-who-kept-orders-waiting): the supplier
    // UNIQUELY last to ship on a multi-supplier order — the classic
    // semi+anti double correlation on the fact table, expressed as two
    // keyed re-aggregations of the per-(order, supplier) frame instead
    // of correlated subqueries (one fact shuffle, two group-sized joins)
    "q_late_supplier" -> ((s, dir) => {
      val ps = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("l_shipdate")).as("sd"))
      // r19 (guide §2.4 remove shuffles): the old form derived os/lc as two
      // aggregations of ps and joined all three back on l_orderkey — three
      // exchanges downstream of ps plus two joins. The per-order max/count/
      // last-count are all window functions over ONE l_orderkey partition
      // (two chained Window ops, same partitioning, one exchange + sort) —
      // the orderkey-level filter then feeds the supplier aggregation
      // directly. Same rows by construction (omax/nsupp/nlast definitions
      // unchanged); oracle untouched, parity re-proven at sf0.001+sf0.01.
      val w = Window.partitionBy("l_orderkey")
      ps.withColumn("omax", max(col("sd")).over(w))
        .withColumn("nsupp", count(lit(1)).over(w))
        .withColumn("nlast",
          sum(when(col("sd") === col("omax"), 1).otherwise(0)).over(w))
        .filter(col("sd") === col("omax") && col("nsupp") > 1 &&
          col("nlast") === 1)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("l_suppkey")).limit(20)}),

    // cube: all grouping-set combinations over (flag, status)
    "q_cube" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // backward as-of join: each purchase matched to the user's latest click
    // at-or-before it (single-shuffle union+window plan, TemporalJoins)
    "s_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      TemporalJoins.asofJoinBackward(purchases, clicks, Seq("user_id"),
          "ts", "ts", Seq("click_id", "ts"), prefix = "m_")
        .select(col("purchase_id"), col("user_id"),
          col("m_click_id").as("click_id"),
          (unix_micros(col("ts")) - unix_micros(col("m_ts"))).as("gap_us"))
        .orderBy("purchase_id")}),

    // NEAREST as-of join with ±30 min tolerance: each click matched to
    // the user's closest purchase in either direction (backward wins
    // ties), out-of-tolerance matches nulled — pandas merge_asof
    // direction='nearest'. Two single-shuffle passes + one row-local
    // arbitration; the oracle replays both window constructions and the
    // same arbitration CASE
    "s_asof_nearest" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      TemporalJoins.asofJoinNearest(clicks, purchases, Seq("user_id"),
          "click_id", "ts", "ts", Seq("purchase_id", "ts"),
          toleranceUs = 1800000000L, prefix = "m_")
        .select(col("click_id"), col("user_id"),
          col("m_purchase_id").as("purchase_id"),
          (unix_micros(col("m_ts")) - unix_micros(col("ts"))).as("gap_us"))
        .orderBy("click_id")}),

    // forward as-of join: each click matched to the user's next purchase
    // at-or-after it (ts-descending running-window plan, TemporalJoins)
    "s_asof_fwd" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      TemporalJoins.asofJoinForward(clicks, purchases, Seq("user_id"),
          "ts", "ts", Seq("purchase_id", "ts"), prefix = "m_")
        .select(col("click_id"), col("user_id"),
          col("m_purchase_id").as("purchase_id"),
          (unix_micros(col("m_ts")) - unix_micros(col("ts"))).as("gap_us"))
        .orderBy("click_id")}),

    // point-in-interval (range) join: views falling inside the 30-minute
    // window after each error event — bucketed plan, no cartesian residual
    "s_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
          col("ts").as("v_ts"))
      TemporalJoins.pointInIntervalJoin(views, errors,
          "v_ts", "w_start", "w_end", bucketWidthUs = 1800000000L)
        .groupBy(col("error_id"))
        .agg(count(lit(1)).as("n_views"),
          countDistinct(col("view_user")).as("n_users"))
        .orderBy("error_id")}),

    // time-series resample: per-user hourly grid with forward-filled
    // values (union + one running window — no per-grid-point probe join)
    "s_resample" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id") < 20)
        .select(col("user_id"), col("ts"), col("value"))
      TemporalJoins.resampleFfill(ev, "user_id", "ts", "value")
        .select(col("key").as("user_id"), col("grid_ts"), col("value"))
        .orderBy("user_id", "grid_ts")}),

    // Z-order layout locality report: Morton-interleave (user_id,
    // epoch-hour), slice the key space into 32 value-range "files" (one
    // broadcast scalar, no global sort) and report each bucket's row
    // count + BOTH dimensions' min/max spans — the parquet min/max
    // pruning guarantee a single-column sort can't give both columns.
    // The write-side op is repartitionByRange(zValue) +
    // sortWithinPartitions; this query hash-pins the layout quality
    "s_zorder" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(
        pmod(col("user_id"), lit(1L << 21)).as("u"),
        expr("unix_micros(ts) div 3600000000").as("hr"))
      graft.operators.Layout.zOrderBuckets(ev, col("u"), col("hr"), 32)}),

    // per-user activity trend: least-squares slope of events-per-day in
    // EXACT integer sufficient stats (num = n·Σxy − Σx·Σy, den = n·Σx² −
    // (Σx)², both i64-exact) with the slope itself one IEEE division in
    // floor-micro units — the trend/anomaly readout next to s_user_zscore,
    // engine-exact end to end; single-day users yield NULL (den 0)
    "s_trend" -> ((s, dir) => {
      val byDay = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .groupBy("user_id", "day").agg(count(lit(1)).as("n"))
      val minDay = byDay.agg(min(col("day")).as("d0"))
      val st = byDay.crossJoin(broadcast(minDay))
        .select(col("user_id"), (col("day") - col("d0")).as("x"), col("n"))
        .groupBy("user_id").agg(count(lit(1)).as("n_days"),
          sum(col("x")).as("sx"), sum(col("n")).as("sn"),
          sum(col("x") * col("n")).as("sxn"),
          sum(col("x") * col("x")).as("sxx"))
      st.select(col("user_id"), col("n_days"),
          (col("n_days") * col("sxn") - col("sx") * col("sn")).as("num"),
          (col("n_days") * col("sxx") - col("sx") * col("sx")).as("den"))
        .withColumn("slope_micro", when(col("den") =!= 0,
          floor(lit(1e6) * (col("num").cast("double") / col("den").cast("double")))
            .cast("long")))
        .orderBy("user_id")}),

    // file-skipping effectiveness: for the same (user, hour) box
    // predicate, how many range-partitioned "files" a Z-order layout
    // reads vs a single-column sort — the min/max-stats pruning decision
    // parquet row groups actually make, as one integer report per layout
    "s_zorder_prune" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(
        pmod(col("user_id"), lit(1L << 21)).as("u"),
        expr("unix_micros(ts) div 3600000000").as("hr"))
      graft.operators.Layout.pruningReport(ev, col("u"), col("hr"), 32)}),

    // sessionization: 30-min-gap sessions per user via lag + running sum
    "s_events_sessions" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val wUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val withGap = ev
        .withColumn("prev_ts", lag(col("ts"), 1).over(wUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1)
            .otherwise(0))
      val withSession = withGap
        .withColumn("session_id", sum(col("new_session")).over(
          wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      withSession.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("session_value"))
        .orderBy("user_id", "session_id")})
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |sum(l_quantity) AS sum_qty,
        |round(sum(l_extendedprice), 2) AS sum_base_price,
        |round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q1_agg_dec" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(floor(l_quantity * 10000) AS BIGINT)) AS BIGINT) AS sum_qty_u4,
        |CAST(SUM(CAST(floor(l_extendedprice * 10000) AS BIGINT)) AS BIGINT) AS sum_base_price_u4,
        |CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_price_u4,
        |count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top" ->
      """SELECT l_orderkey,
        |round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_region" ->
      """SELECT n_name,
        |round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_fuzzy_match" ->
      graft.operators.Dedup.editOneNeighborCountsSql("customer", "c_name"),

    "q_merge" ->
      s"""WITH mt AS (
         |  SELECT c_custkey AS k, c_acctbal AS bal FROM customer
         |), ms AS (
         |  SELECT k, bal + 100 AS bal, k % 15 = 0 AS del FROM mt WHERE k % 3 = 0
         |  UNION ALL
         |  SELECT k + (SELECT max(k) FROM mt), bal, false FROM mt WHERE k % 7 = 0
         |), mm AS (
         |  SELECT coalesce(t.k, s.k) AS k,
         |    coalesce(s.bal, t.bal) AS bal,
         |    (s.k IS NOT NULL AND t.k IS NOT NULL
         |      AND NOT coalesce(s.del, false)) AS updated,
         |    t.k IS NULL AS inserted,
         |    (s.k IS NOT NULL AND t.k IS NOT NULL
         |      AND coalesce(s.del, false)) AS deleted
         |  FROM mt t FULL OUTER JOIN ms s ON s.k = t.k
         |)
         |SELECT CAST(sum(CASE WHEN NOT deleted THEN 1 ELSE 0 END) AS BIGINT) AS n_result,
         |  CAST(sum(CASE WHEN updated THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
         |  CAST(sum(CASE WHEN inserted THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
         |  CAST(sum(CASE WHEN deleted THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
         |  CAST(sum(CASE WHEN NOT deleted THEN ${graft.functions.TextFunctions.hash32Sql(
              "CAST(k AS VARCHAR) || ':' || CAST(CAST(floor(bal * 100) AS BIGINT) AS VARCHAR)")}
         |    ELSE 0 END) AS BIGINT) AS checksum
         |FROM mm""".stripMargin,

    "q_scd2" ->
      """WITH scdv AS (
        |  SELECT o_custkey, o_orderdate AS valid_from,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2
        |)
        |SELECT o_custkey, valid_from,
        |  lead(valid_from) OVER w AS valid_to,
        |  CAST(sum(n_orders) OVER w AS BIGINT) AS n_orders_cum,
        |  CAST(sum(cents) OVER w AS BIGINT) AS cents_cum,
        |  lead(valid_from) OVER w IS NULL AS is_current
        |FROM scdv
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from)
        |ORDER BY o_custkey, valid_from""".stripMargin,

    "q_revenue_concentration" ->
      """WITH pc AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey
        |), pcut AS (SELECT quantile_cont(cents, 0.99) AS cut FROM pc)
        |SELECT CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(CASE WHEN cents > cut THEN 1 ELSE 0 END) AS BIGINT) AS n_top,
        |  CAST(sum(CASE WHEN cents > cut THEN cents ELSE 0 END) AS BIGINT) AS top_cents,
        |  CAST(sum(cents) AS BIGINT) AS total_cents,
        |  CAST((1000 * sum(CASE WHEN cents > cut THEN cents ELSE 0 END))
        |    // sum(cents) AS BIGINT) AS share_milli
        |FROM pc, pcut""".stripMargin,

    "q_integrity" ->
      """WITH planted AS (
        |  SELECT -(i.range + 1) AS l_orderkey, 2.0 AS l_discount
        |  FROM range(5) i
        |), li AS (
        |  SELECT l_orderkey, l_discount FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_discount FROM planted
        |), okeys AS (
        |  SELECT o_orderkey FROM orders
        |  UNION ALL SELECT -7 UNION ALL SELECT -7
        |)
        |SELECT
        |  CAST((SELECT count(*) FROM li
        |        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM okeys))
        |    AS BIGINT) AS n_orphan_lineitems,
        |  CAST((SELECT count(*) FROM (
        |        SELECT o_orderkey FROM okeys GROUP BY 1 HAVING count(*) > 1))
        |    AS BIGINT) AS n_dup_orderkeys,
        |  CAST((SELECT sum(CASE WHEN l_discount < 0 OR l_discount > 1
        |                        THEN 1 ELSE 0 END) FROM li)
        |    AS BIGINT) AS n_bad_discount""".stripMargin,

    "q_group_quantiles" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  quantile_cont(cents, 0.25) AS p25_cents,
        |  quantile_cont(cents, 0.5) AS p50_cents,
        |  quantile_cont(cents, 0.75) AS p75_cents
        |FROM (SELECT c_mktsegment, floor(c_acctbal * 100 + 0.5) AS cents
        |      FROM customer)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 100000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c.c_custkey
        |                    AND o2.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_lateral" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, o_orderkey""".stripMargin,

    "q_window_dist" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(floor(1000000.0 * percent_rank() OVER w) AS BIGINT) AS pr_micro,
        |  CAST(floor(1000000.0 * cume_dist() OVER w) AS BIGINT) AS cd_micro,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  nth_value(o_orderkey, 2) OVER w AS second_order
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q7_trade" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  count(*) AS n_items,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q10_returns" ->
      """SELECT c_custkey, c_name, n_name, count(*) AS n_items,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q_unpivot" ->
      """SELECT l_returnflag, measure, count(*) AS n,
        |  round(sum(value), 4) AS total
        |FROM (
        |  UNPIVOT (SELECT l_returnflag, l_quantity, l_extendedprice, l_discount
        |           FROM lineitem)
        |  ON l_quantity, l_extendedprice, l_discount
        |  INTO NAME measure VALUE value)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // independent dominance formulation — quadratic is fine at oracle
    // scale and checks the SEMANTICS, not the Spark plan's sweep
    "q_skyline" ->
      """SELECT p1.p_partkey, p1.p_retailprice, p1.p_size
        |FROM part p1
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part p2
        |  WHERE p2.p_retailprice <= p1.p_retailprice
        |    AND p2.p_size >= p1.p_size
        |    AND (p2.p_retailprice < p1.p_retailprice
        |         OR p2.p_size > p1.p_size))
        |ORDER BY p1.p_retailprice, p1.p_partkey""".stripMargin,

    "q_window_topk" ->
      """SELECT l_suppkey, l_partkey, qty, rk FROM (
        |  SELECT l_suppkey, l_partkey, qty,
        |  CAST(row_number() OVER (PARTITION BY l_suppkey ORDER BY qty DESC, l_partkey) AS INT) AS rk
        |  FROM (SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
        |        FROM lineitem GROUP BY l_suppkey, l_partkey))
        |WHERE rk <= 3 ORDER BY l_suppkey, rk""".stripMargin,

    "q_window_running" ->
      """SELECT l_suppkey, l_shipdate, rev,
        |round(sum(rev) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_rev
        |FROM (SELECT l_suppkey, l_shipdate, round(sum(l_extendedprice), 2) AS rev
        |      FROM lineitem WHERE l_suppkey < 10 GROUP BY l_suppkey, l_shipdate)
        |ORDER BY l_suppkey, l_shipdate""".stripMargin,

    "q_window_range" ->
      """SELECT event_id, user_id,
        |  count(*) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_trailing_hour
        |FROM events WHERE user_id < 50 ORDER BY event_id""".stripMargin,

    "q_intersect" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY custkey""".stripMargin,

    "q_set_ops" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders
        |EXCEPT SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000
        |ORDER BY custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT p_partkey FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND l_quantity >= 48)
        |ORDER BY p_partkey""".stripMargin,

    "q_scalar_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |upper(l_returnflag) AS flag_u,
        |CAST(length(l_linestatus) AS INT) AS status_len,
        |CAST(year(l_shipdate) AS INT) AS ship_year,
        |CAST(month(l_shipdate) AS INT) AS ship_month,
        |round(l_extendedprice * l_discount, 4) AS discount_amt,
        |round(abs(l_quantity - 25.0), 2) AS qty_dev
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_sql_api" ->
      """SELECT o_orderpriority, count(*) AS n,
        |round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_percentiles" ->
      """SELECT l_returnflag,
        |round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        |round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_stats" ->
      """SELECT l_returnflag,
        |round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        |round(stddev_samp(l_discount), 6) AS discount_sd,
        |round(var_samp(l_tax), 6) AS tax_var
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_json_funcs" ->
      """SELECT event_id,
        |CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
        |FROM events WHERE event_id < 100 ORDER BY event_id""".stripMargin,

    "q_array_funcs" ->
      """SELECT vec_id,
        |CAST(len(embedding) AS INT) AS dim,
        |round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
        |round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS vec_sum
        |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n, sum(l_quantity) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT l_linestatus,
        |sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS "A",
        |sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS "N",
        |sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS "R"
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(rank() OVER (PARTITION BY o_custkey ORDER BY floor(o_totalprice / 50000)) AS INT) AS rk,
        |CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY floor(o_totalprice / 50000)) AS INT) AS drk,
        |CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS quartile,
        |lag(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
        |lead(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |count(DISTINCT l_partkey) AS n_parts,
        |count(DISTINCT l_suppkey) AS n_supps,
        |count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_above_brand_avg" ->
      """SELECT p_partkey, p_brand, round(p_retailprice, 2) AS price
        |FROM (
        |  SELECT p_partkey, p_brand, p_retailprice,
        |  avg(p_retailprice) OVER (PARTITION BY p_brand) AS brand_avg
        |  FROM part)
        |WHERE p_retailprice > brand_avg ORDER BY p_partkey""".stripMargin,

    "s_events_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "s_growth" ->
      s"""WITH ev0 AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) // 7 AS w
        |  FROM events
        |), ev AS (
        |  SELECT user_id, w FROM ev0
        |  WHERE ${graft.functions.TextFunctions.hash60Sql(
             "CAST(user_id AS VARCHAR) || '|' || CAST(w AS VARCHAR) || 'gw'")}
        |    % 4 <> 0
        |), f AS (SELECT user_id, min(w) AS fw FROM ev GROUP BY 1)
        |SELECT e.w,
        |  CAST(count(*) AS BIGINT) AS n_active,
        |  CAST(sum(CASE WHEN e.w = f.fw THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new,
        |  CAST(sum(CASE WHEN e.w <> f.fw AND EXISTS (
        |    SELECT 1 FROM ev p WHERE p.user_id = e.user_id AND p.w = e.w - 1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |  CAST(sum(CASE WHEN e.w <> f.fw AND NOT EXISTS (
        |    SELECT 1 FROM ev p WHERE p.user_id = e.user_id AND p.w = e.w - 1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
        |  CAST(sum(CASE WHEN NOT EXISTS (
        |    SELECT 1 FROM ev n WHERE n.user_id = e.user_id AND n.w = e.w + 1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
        |FROM ev e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1 ORDER BY w""".stripMargin,

    "s_retention" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events
        |), f AS (
        |  SELECT user_id, min(d) AS cohort_day FROM ev GROUP BY 1
        |)
        |SELECT cohort_day,
        |  CAST(date_diff('day', cohort_day, d) AS INT) AS day_offset,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM ev e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,

    // identical expression association to the Spark column: ((1e6·diff) /
    // sqrt(E[x²]−E[x]²)) with every cast spelled out — floor is IEEE-exact
    "s_user_zscore" ->
      """WITH c AS (
        |  SELECT user_id, count(*) AS n_events FROM events GROUP BY 1
        |), st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(n_events) AS BIGINT) AS s1,
        |    CAST(sum(n_events * n_events) AS BIGINT) AS s2
        |  FROM c
        |), v AS (
        |  SELECT user_id, n_events, n_users, s1,
        |    CAST(s2 AS DOUBLE) / CAST(n_users AS DOUBLE)
        |      - (CAST(s1 AS DOUBLE) / CAST(n_users AS DOUBLE))
        |      * (CAST(s1 AS DOUBLE) / CAST(n_users AS DOUBLE)) AS var_d
        |  FROM c CROSS JOIN st
        |)
        |SELECT user_id, n_events,
        |  CASE WHEN var_d <= 0 THEN 0
        |       ELSE CAST(floor(1000000.0 *
        |         (CAST(n_events AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n_users AS DOUBLE)) /
        |         sqrt(var_d)) AS BIGINT) END AS z_micro
        |FROM v ORDER BY user_id""".stripMargin,

    // funnel replay: the same three chained min-aggregations; ts compared
    // in micros after the ns→us cast (matches Tables.events truncation)
    "s_seq_pattern" ->
      """SELECT user_id, CAST(length(seq) AS INT) AS n_events,
        |  CAST(len(regexp_extract_all(seq, 'vc+p')) AS INT) AS n_funnels,
        |  CAST(len(regexp_extract_all(seq, 'e{2,}')) AS INT) AS n_error_bursts
        |FROM (
        |  SELECT user_id,
        |    string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |ORDER BY user_id""".stripMargin,

    "s_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
        |), v AS (
        |  SELECT user_id, min(ts) AS view_ts FROM ev
        |  WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, min(e.ts) AS click_ts
        |  FROM ev e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.view_ts GROUP BY 1
        |), p AS (
        |  SELECT e.user_id, min(e.ts) AS purchase_ts
        |  FROM ev e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts GROUP BY 1
        |)
        |SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
        |  CASE WHEN p.purchase_ts IS NOT NULL THEN 3
        |       WHEN c.click_ts IS NOT NULL THEN 2 ELSE 1 END AS stage
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,

    "s_conversion_time" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
        |), v AS (
        |  SELECT user_id, min(ts) AS view_ts FROM ev
        |  WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, min(e.ts) AS click_ts
        |  FROM ev e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.view_ts GROUP BY 1
        |), p AS (
        |  SELECT e.user_id, min(e.ts) AS purchase_ts
        |  FROM ev e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts GROUP BY 1
        |), lat AS (
        |  SELECT epoch_us(p.purchase_ts) - epoch_us(v.view_ts) AS lat_us
        |  FROM p JOIN v ON v.user_id = p.user_id
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |  quantile_cont(lat_us, 0.5) AS p50_us,
        |  quantile_cont(lat_us, 0.9) AS p90_us,
        |  CAST(max(lat_us) AS BIGINT) AS max_us
        |FROM lat""".stripMargin,

    "s_paths" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
        |  FROM events
        |), bi AS (
        |  SELECT event_type AS from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n,
        |  CAST((1000 * n) // sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_milli
        |FROM bi ORDER BY from_type, to_type""".stripMargin,

    "s_islands" ->
      """WITH iad AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), iir AS (
        |  SELECT user_id,
        |    date_diff('day', DATE '1970-01-01', day)
        |      - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM iad
        |), iil AS (
        |  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
        |  FROM iir GROUP BY 1, 2
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(max(len) AS BIGINT) AS max_streak,
        |  CAST(sum(len) AS BIGINT) AS active_days
        |FROM iil GROUP BY user_id ORDER BY user_id""".stripMargin,

    "s_gaps" ->
      """WITH seq AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) -
        |      lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |        PARTITION BY user_id
        |        ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap_us
        |  FROM events
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |  quantile_cont(gap_us, 0.5) AS p50_gap_us,
        |  quantile_cont(gap_us, 0.9) AS p90_gap_us,
        |  CAST(max(gap_us) AS BIGINT) AS max_gap_us
        |FROM seq WHERE gap_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q18_bigorders" ->
      """WITH sums AS (
        |  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |), cut AS (SELECT quantile_cont(sum_qty, 0.99) AS cut FROM sums),
        |big AS (
        |  SELECT l_orderkey, sum_qty FROM sums, cut WHERE sum_qty > cut.cut
        |)
        |SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    // identical oracle for the drained streaming form — window(ts, '1 hour')
    // .start over micros-truncated nanos == date_trunc('hour', ts)
    "s_stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    // windowed-HLL replay: per-hour register table from the md5-derived
    // user hashes, the absent-registers-as-2^55 estimate fold (the
    // hllEstimateBy arithmetic), exact distincts and integer milli error
    "s_stream_whll" ->
      """WITH wpre AS (
        |  SELECT date_trunc('hour', ts) AS window_start,
        |    CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM events
        |), wrho AS (
        |  SELECT window_start, CAST(h % 64 AS INT) AS register,
        |    CASE WHEN h // 64 = 0 THEN 55
        |         ELSE 55 - length(bin(h // 64)) END AS rho
        |  FROM wpre
        |), wreg AS (
        |  SELECT window_start, register, max(rho) AS rho_max
        |  FROM wrho GROUP BY 1, 2
        |), wsp AS (
        |  SELECT window_start,
        |    CAST(sum(1::BIGINT << (55 - rho_max)) AS BIGINT)
        |      + (64 - CAST(count(*) AS BIGINT)) * (1::BIGINT << 55) AS s_pow
        |  FROM wreg GROUP BY 1
        |), west AS (
        |  SELECT window_start, s_pow,
        |    CAST(floor(CAST(0.709 AS DOUBLE) * CAST(4096.0 AS DOUBLE)
        |        * CAST(36028797018963968.0 AS DOUBLE)
        |      / CAST(s_pow AS DOUBLE)) AS BIGINT) AS est
        |  FROM wsp
        |), wex AS (
        |  SELECT date_trunc('hour', ts) AS window_start,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS exact
        |  FROM events GROUP BY 1
        |)
        |SELECT e.window_start, e.s_pow, e.est, x.exact,
        |  CAST((1000 * abs(e.est - x.exact)) // x.exact AS BIGINT) AS err_milli
        |FROM west e JOIN wex x ON e.window_start = x.window_start
        |ORDER BY e.window_start""".stripMargin,

    // sliding-window replay: Spark's window(ts, 1h, 15min) assigns each
    // event to the 4 epoch-aligned 15-min starts covering it; explode
    // k = 0..3 and bucket ts down to (floor15(ts) - k) slides. Integer
    // micros arithmetic — no float, exact in both engines
    "s_stream_sliding" ->
      """SELECT make_timestamp(((epoch_us(CAST(ts AS TIMESTAMP)) // 900000000) - k.k) * 900000000) AS window_start,
        |event_type, count(*) AS n
        |FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    // streaming dedup replay: only the dedup-key columns are emitted, so
    // first-arrival-wins reduces to DISTINCT
    "s_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    // session_window replay: 30-min-gap sessionization, session_start =
    // first event ts (ns->us truncation matches Spark's micros read).
    // >= replays Spark's strict-< merge exactly: a gap of EXACTLY 30 min
    // starts a new session in both engines on any input
    "s_stream_sessions" ->
      """WITH g AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |       OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800000000
        |       THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g)
        |SELECT min(ts) AS session_start, user_id, count(*) AS n_events,
        |round(sum(value), 2) AS session_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,

    // relational replay of the stream-stream interval join
    "s_stream_degree" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
        |  user_id, count(DISTINCT event_type) AS degree
        |FROM events GROUP BY 1, 2
        |ORDER BY window_start, user_id""".stripMargin,

    // the estimate itself is engine-specific; the gate checks the exact
    // count and that Spark's HLL landed within its declared error bound
    "q_approx_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  TRUE AS within_bound
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_approx_pct" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
        |  TRUE AS within_bound
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // final mapGroupsWithState state = plain per-user aggregate; the
    // micro-unit sum floors each term before summing (engine-exact)
    "s_stream_totals" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(floor(1000000.0 * value) AS BIGINT)) AS BIGINT) AS total_micro
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // the transformWithState path computes the identical final state
    "s_stream_totals_tws" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(floor(1000000.0 * value) AS BIGINT)) AS BIGINT) AS total_micro
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // outer-join replay: matches = the same interval join; null-padded
    // rows replay Spark's watermark cutoff EXACTLY — the watermark tracks
    // max event time in MILLISECONDS (floor of the micros max), minus the
    // 2h delay, min'd across the two watermarked inputs; a purchase
    // null-emits iff strictly below it
    "s_stream_join_outer" ->
      """WITH c AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |  WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
        |  WHERE event_type = 'purchase'
        |), wm AS (
        |  SELECT (least((SELECT epoch_us(max(ts)) FROM c),
        |                (SELECT epoch_us(max(ts)) FROM p)) // 1000
        |          - 7200000) * 1000 AS w_us
        |), matched AS (
        |  SELECT p.user_id, p.ts AS purchase_ts, c.ts AS click_ts,
        |    p.value AS purchase_value
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0 AND 3600000000
        |), unmatched AS (
        |  SELECT p.user_id, p.ts AS purchase_ts,
        |    CAST(NULL AS TIMESTAMP) AS click_ts, p.value AS purchase_value
        |  FROM p CROSS JOIN wm
        |  WHERE epoch_us(p.ts) < wm.w_us AND NOT EXISTS (
        |    SELECT 1 FROM c WHERE c.user_id = p.user_id
        |      AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0 AND 3600000000)
        |)
        |SELECT * FROM matched UNION ALL SELECT * FROM unmatched
        |ORDER BY user_id, purchase_ts, click_ts NULLS FIRST""".stripMargin,

    "s_stream_card" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(${graft.functions.TextFunctions.tokenCountSql("text")}) AS BIGINT) AS n_tokens
         |FROM documents""".stripMargin,

    "s_stream_neardup" ->
      s"""SELECT sig, CAST(1 AS BIGINT) AS n FROM (
         |  SELECT DISTINCT simhash AS sig FROM (
         |    ${graft.operators.Dedup.simhashSignaturesSql("documents", "doc_id", "text")}
         |  )
         |) ORDER BY sig""".stripMargin,

    "s_stream_join_full" ->
      """WITH c AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |  WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
        |  WHERE event_type = 'purchase'
        |), wm AS (
        |  SELECT (least((SELECT epoch_us(max(ts)) FROM c),
        |                (SELECT epoch_us(max(ts)) FROM p)) // 1000
        |          - 7200000) * 1000 AS w_us
        |), matched AS (
        |  SELECT p.user_id, p.ts AS purchase_ts, c.ts AS click_ts,
        |    p.value AS purchase_value
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0 AND 3600000000
        |), punmatched AS (
        |  SELECT p.user_id, p.ts AS purchase_ts,
        |    CAST(NULL AS TIMESTAMP) AS click_ts, p.value AS purchase_value
        |  FROM p CROSS JOIN wm
        |  WHERE epoch_us(p.ts) < wm.w_us AND NOT EXISTS (
        |    SELECT 1 FROM c WHERE c.user_id = p.user_id
        |      AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0 AND 3600000000)
        |), cunmatched AS (
        |  SELECT c.user_id, CAST(NULL AS TIMESTAMP) AS purchase_ts,
        |    c.ts AS click_ts, CAST(NULL AS DOUBLE) AS purchase_value
        |  FROM c CROSS JOIN wm
        |  WHERE epoch_us(c.ts) < wm.w_us - 3600000000 AND NOT EXISTS (
        |    SELECT 1 FROM p WHERE p.user_id = c.user_id
        |      AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0 AND 3600000000)
        |)
        |SELECT * FROM matched
        |UNION ALL SELECT * FROM punmatched
        |UNION ALL SELECT * FROM cunmatched
        |ORDER BY user_id, purchase_ts NULLS FIRST, click_ts NULLS FIRST""".stripMargin,

    "s_stream_join" ->
      """SELECT p.user_id, CAST(p.ts AS TIMESTAMP) AS purchase_ts,
        |  CAST(c.ts AS TIMESTAMP) AS click_ts, p.value AS purchase_value
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        |  AND p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0 AND 3600000000
        |ORDER BY p.user_id, purchase_ts, click_ts""".stripMargin,

    // same half-open interval dimension the Spark side builds
    // (EventStreams.tierIntervals): i-th purchase opens era i, era 0 is
    // (-inf, first purchase), last era to +inf — each event matches
    // exactly one row, non-purchasers fall to tier 0 via the LEFT join
    "s_stream_asof" ->
      """WITH satp AS MATERIALIZED (
        |  SELECT user_id, epoch_us(ts) AS pus, event_id,
        |    CAST(row_number() OVER w AS INT) AS tier,
        |    lead(epoch_us(ts), 1, 9223372036854775807) OVER w AS to_us
        |  FROM events WHERE event_type = 'purchase'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), satd AS MATERIALIZED (
        |  SELECT user_id, tier, pus AS from_us, to_us FROM satp
        |  UNION ALL
        |  SELECT user_id, 0, -9223372036854775807 - 1, pus
        |  FROM satp WHERE tier = 1
        |)
        |SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
        |  e.event_type, CAST(coalesce(d.tier, 0) AS INT) AS tier
        |FROM events e LEFT JOIN satd d
        |  ON d.user_id = e.user_id
        | AND epoch_us(e.ts) >= d.from_us
        | AND epoch_us(e.ts) < d.to_us
        |ORDER BY e.event_id""".stripMargin,

    "q_late_supplier" ->
      """WITH ps AS (
        |  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS sd
        |  FROM lineitem GROUP BY 1, 2
        |), os AS (
        |  SELECT l_orderkey, max(sd) AS omax,
        |    CAST(count(*) AS BIGINT) AS nsupp
        |  FROM ps GROUP BY 1
        |), lc AS (
        |  SELECT ps.l_orderkey, CAST(count(*) AS BIGINT) AS nlast
        |  FROM ps JOIN os ON ps.l_orderkey = os.l_orderkey
        |  WHERE ps.sd = os.omax GROUP BY 1
        |)
        |SELECT ps.l_suppkey, CAST(count(*) AS BIGINT) AS numwait
        |FROM ps
        |JOIN os ON ps.l_orderkey = os.l_orderkey
        |JOIN lc ON ps.l_orderkey = lc.l_orderkey
        |WHERE ps.sd = os.omax AND os.nsupp > 1 AND lc.nlast = 1
        |GROUP BY 1 ORDER BY numwait DESC, l_suppkey LIMIT 20""".stripMargin,

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    // window replay of the as-of join (same running last-non-null trick the
    // Spark plan uses; ties resolve identically: right-before-left at equal
    // ts, greatest click_id among equal-ts clicks). ts is cast to
    // microsecond TIMESTAMP so ordering matches Spark's nanos->micros read.
    "s_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |         CAST(NULL AS BIGINT) AS purchase_id, 0 AS is_left,
        |         event_id AS c_id, CAST(ts AS TIMESTAMP) AS c_ts
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, CAST(ts AS TIMESTAMP), event_id, 1, NULL, NULL
        |  FROM events WHERE event_type = 'purchase'
        |), w AS (
        |  SELECT purchase_id, user_id, ts, is_left,
        |    last_value(c_id IGNORE NULLS) OVER win AS click_id,
        |    last_value(c_ts IGNORE NULLS) OVER win AS m_ts
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, is_left, c_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT purchase_id, user_id, click_id,
        |  epoch_us(ts) - epoch_us(m_ts) AS gap_us
        |FROM w WHERE is_left = 1 ORDER BY purchase_id""".stripMargin,

    // forward replay: ts-DESCENDING running last-non-null (the same
    // one-pass trick the Spark plan uses); ties resolve identically:
    // right-before-left at equal ts, least purchase_id among equal-ts rows.
    "s_asof_fwd" ->
      """WITH u AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |         CAST(NULL AS BIGINT) AS click_id, 0 AS is_left,
        |         event_id AS p_id, CAST(ts AS TIMESTAMP) AS p_ts
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, CAST(ts AS TIMESTAMP), event_id, 1, NULL, NULL
        |  FROM events WHERE event_type = 'click'
        |), w AS (
        |  SELECT click_id, user_id, ts, is_left,
        |    last_value(p_id IGNORE NULLS) OVER win AS purchase_id,
        |    last_value(p_ts IGNORE NULLS) OVER win AS m_ts
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts DESC, is_left, p_id DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT click_id, user_id, purchase_id,
        |  epoch_us(m_ts) - epoch_us(ts) AS gap_us
        |FROM w WHERE is_left = 1 ORDER BY click_id""".stripMargin,

    // nearest replay: the backward and forward window constructions
    // verbatim (same tie rules: greatest payload struct backward, least
    // forward), then the identical arbitration CASE with tolerance
    "s_asof_nearest" ->
      """WITH bu AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |         CAST(NULL AS BIGINT) AS click_id, 0 AS is_left,
        |         event_id AS p_id, CAST(ts AS TIMESTAMP) AS p_ts
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, CAST(ts AS TIMESTAMP), event_id, 1, NULL, NULL
        |  FROM events WHERE event_type = 'click'
        |), bw AS (
        |  SELECT click_id, user_id, ts, is_left,
        |    last_value(p_id IGNORE NULLS) OVER win AS b_id,
        |    last_value(p_ts IGNORE NULLS) OVER win AS b_ts
        |  FROM bu
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, is_left, p_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), fw AS (
        |  SELECT click_id, user_id, ts, is_left,
        |    last_value(p_id IGNORE NULLS) OVER win AS f_id,
        |    last_value(p_ts IGNORE NULLS) OVER win AS f_ts
        |  FROM bu
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts DESC, is_left, p_id DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), nb AS (SELECT click_id, user_id, ts, b_id, b_ts FROM bw WHERE is_left = 1),
        |nf AS (SELECT click_id, f_id, f_ts FROM fw WHERE is_left = 1),
        |nj AS (
        |  SELECT b.click_id, b.user_id,
        |    epoch_us(b.ts) - epoch_us(b.b_ts) AS bgap,
        |    epoch_us(f.f_ts) - epoch_us(b.ts) AS fgap,
        |    b.b_id, f.f_id,
        |    (b.b_ts IS NOT NULL AND (f.f_ts IS NULL
        |       OR epoch_us(b.ts) - epoch_us(b.b_ts) <= epoch_us(f.f_ts) - epoch_us(b.ts)))
        |      AS use_b
        |  FROM nb b JOIN nf f ON f.click_id = b.click_id
        |), na AS (
        |  SELECT click_id, user_id, use_b, b_id, f_id, bgap, fgap,
        |    CASE WHEN use_b THEN bgap <= 1800000000
        |         ELSE fgap <= 1800000000 END AS within
        |  FROM nj
        |)
        |SELECT click_id, user_id,
        |  CASE WHEN within AND use_b THEN b_id
        |       WHEN within AND NOT use_b THEN f_id END AS purchase_id,
        |  CASE WHEN within AND use_b THEN -bgap
        |       WHEN within AND NOT use_b THEN fgap END AS gap_us
        |FROM na ORDER BY click_id""".stripMargin,

    "s_range_join" ->
      """SELECT e.event_id AS error_id, count(*) AS n_views,
        |  count(DISTINCT v.user_id) AS n_users
        |FROM events e JOIN events v
        |  ON e.event_type = 'error' AND v.event_type = 'view'
        | AND CAST(v.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP)
        | AND CAST(v.ts AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // same running last-non-null replay as the as-of oracles; obs sort
    // before grid rows at equal ts, equal-ts observations resolve to the
    // greatest value in both engines (v NULLS LAST never ties: grid rows
    // are unique per (user, ts))
    "s_resample" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE user_id < 20
        |), b AS (
        |  SELECT user_id, min(ts) AS mn, max(ts) AS mx FROM ev GROUP BY 1
        |), g AS (
        |  SELECT user_id, unnest(generate_series(
        |    make_timestamp(CAST(floor(epoch_us(mn) / 3600000000) * 3600000000 AS BIGINT)),
        |    make_timestamp(CAST(floor(epoch_us(mx) / 3600000000) * 3600000000 AS BIGINT)),
        |    INTERVAL 1 HOUR)) AS ts
        |  FROM b
        |), u AS (
        |  SELECT user_id, ts, value AS v, 0 AS is_grid FROM ev
        |  UNION ALL SELECT user_id, ts, NULL, 1 FROM g
        |), w AS (
        |  SELECT user_id, ts, is_grid,
        |    last_value(v IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, is_grid, v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
        |  FROM u
        |)
        |SELECT user_id, ts AS grid_ts, value FROM w WHERE is_grid = 1
        |ORDER BY user_id, grid_ts""".stripMargin,

    "s_zorder" ->
      s"""WITH zev AS (
         |  SELECT user_id % ${1L << 21} AS u,
         |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr
         |  FROM events
         |), ${graft.operators.Layout.zOrderBucketsSql("zev", "u", "hr", 32)}
         |ORDER BY bucket""".stripMargin,

    "s_trend" ->
      """WITH tbd AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), tmn AS (SELECT min(day) AS d0 FROM tbd),
        |tst AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(day - d0) AS BIGINT) AS sx,
        |    CAST(sum(n) AS BIGINT) AS sn,
        |    CAST(sum((day - d0) * n) AS BIGINT) AS sxn,
        |    CAST(sum((day - d0) * (day - d0)) AS BIGINT) AS sxx
        |  FROM tbd, tmn GROUP BY user_id
        |)
        |SELECT user_id, n_days,
        |  CAST(n_days * sxn - sx * sn AS BIGINT) AS num,
        |  CAST(n_days * sxx - sx * sx AS BIGINT) AS den,
        |  CASE WHEN n_days * sxx - sx * sx <> 0 THEN
        |    CAST(floor(1000000.0 * (CAST(n_days * sxn - sx * sn AS DOUBLE)
        |      / CAST(n_days * sxx - sx * sx AS DOUBLE))) AS BIGINT)
        |  END AS slope_micro
        |FROM tst ORDER BY user_id""".stripMargin,

    "s_zorder_prune" ->
      s"""WITH zev AS (
         |  SELECT user_id % ${1L << 21} AS u,
         |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr
         |  FROM events
         |), ${graft.operators.Layout.pruningReportSql("zev", "u", "hr", 32)}""".stripMargin,

    "s_events_sessions" ->
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |       OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
        |       THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (
        |  SELECT user_id, value,
        |  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        |round(sum(value), 2) AS session_value
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin
  )
}
