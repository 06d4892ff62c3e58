package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Fixed-size sketch operators for corpus-scale frequency and membership
  * questions — the structures a 100 TB pipeline uses when the exact answer
  * (a full groupBy over every token, an exact anti-join against a reference
  * corpus) would shuffle the world:
  *
  *  - count-min sketch: frequency estimation in depth × width integer
  *    cells. The build is one map-side-combinable aggregation whose result
  *    is AT MOST depth·width rows regardless of input size; estimation
  *    broadcasts the sketch and stays narrow.
  *  - Bloom filter: set membership in `m` bits with `k` probes, built as a
  *    distinct set of bit positions (≤ m rows however large the input);
  *    probing broadcasts the bit set. No false negatives, quantifiable
  *    false positives.
  *
  * Both use the md5-derived hash family (TextFunctions.hash32) with
  * Knuth-style coefficient schedules, so a DuckDB oracle replays every cell
  * bit-for-bit — the `*Sql` builders generate that twin. All arithmetic
  * stays in i64: a < 2^20, h < 2^32 ⇒ a·h + b < 2^53. */
object Sketches {

  // ---------------------------------------------------------- count-min
  val CmsDepth = 4
  val CmsWidth = 512
  val CmsP = 4294967311L // prime > 2^32 (same modulus family as MinHash)
  /** Coefficient schedule offset from the MinHash family (seeds 7..) so the
    * two operators' hash rows are independent. */
  val CmsA: IndexedSeq[Long] =
    (0 until CmsDepth).map(i => ((i + 7) * 2654435761L % 1048573L) + 1L)
  val CmsB: IndexedSeq[Long] =
    (0 until CmsDepth).map(i => ((i + 7) * 97781L * 69069L) % CmsP)

  private def cmsBucket(h: Column, r: Int): Column =
    pmod(lit(CmsA(r)) * h + lit(CmsB(r)), lit(CmsP)) % CmsWidth
  private[graft] def cmsBucketSql(h: String, r: Int): String =
    s"(((${CmsA(r)} * $h + ${CmsB(r)}) % $CmsP) % $CmsWidth)"

  /** Build the sketch: (r, bucket, cnt) with at most depth·width rows.
    * One explode(depth) + one map-side-combinable count — the sketch of a
    * petabyte token stream is still ≤ 2048 rows. */
  def cmsBuild(items: DataFrame, itemCol: String): DataFrame =
    cmsBucketRows(items, itemCol)
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))

  /** The stateless (r, bucket) pre-aggregation rows of [[cmsBuild]] —
    * depth rows per item, shared with the STREAMING cell maintenance
    * (whose per-cell count is the streaming aggregation state). */
  def cmsBucketRows(items: DataFrame, itemCol: String,
                    carry: Seq[String] = Nil): DataFrame = {
    val cs = carry.map(col)
    val h = items.select(cs :+ hash32(col(itemCol)).as("h"): _*)
    val rows = (0 until CmsDepth).map(r =>
      struct(lit(r).as("r"), cmsBucket(col("h"), r).as("bucket")))
    h.select(cs :+ explode(array(rows: _*)).as("rb"): _*)
      .select(cs :+ col("rb.r").as("r") :+ col("rb.bucket").as("bucket"): _*)
  }

  /** Cell-wise merge of two [[cmsBuild]] sketches — counts are additive,
    * so merge(sketch(A), sketch(B)) == sketch(A ⊎ B) exactly (multiset
    * union). Like [[hllMerge]], this is the property that makes the
    * sketch carryable: shards/days keep ≤ depth·width rows each and
    * combine by one tiny aggregation, never a re-scan. */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.select("r", "bucket", "cnt").unionByName(b.select("r", "bucket", "cnt"))
      .groupBy("r", "bucket").agg(sum(col("cnt")).as("cnt"))

  /** DuckDB twin of [[cmsBuild]] over item CTE `items`(item); `p`
    * prefixes the fragment names (`${p}sk` holds the cells) so several
    * sketches can coexist in one oracle. */
  def cmsBuildSql(items: String, p: String): String = {
    val buildRows = (0 until CmsDepth).map(r =>
      s"SELECT $r AS r, ${cmsBucketSql("h", r)} AS bucket FROM ${p}h")
      .mkString("\n    UNION ALL ")
    s"""${p}h AS (
       |  SELECT ${hash32Sql("item")} AS h FROM $items
       |), ${p}sk AS (
       |  SELECT r, bucket, CAST(count(*) AS BIGINT) AS cnt FROM (
       |    $buildRows
       |  ) GROUP BY r, bucket
       |)""".stripMargin
  }

  /** Point estimates for (distinct) probe items: min over the depth rows of
    * the probed cells — the classic CMS upper-bound estimate (est >= true,
    * overestimation bounded by collisions). The sketch side is tiny and
    * broadcast; the probe side never shuffles more than its distinct. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, itemCol: String): DataFrame = {
    val pr = probes.select(col(itemCol).as("item")).distinct()
      .withColumn("h", hash32(col("item")))
    val rbs = (0 until CmsDepth).map(r =>
      struct(lit(r).as("r"), cmsBucket(col("h"), r).as("bucket")))
    pr.select(col("item"), explode(array(rbs: _*)).as("rb"))
      .select(col("item"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** DuckDB twin of cmsBuild + cmsEstimate over a token expression:
    * heavy hitters by TRUE count (top `topK`, ties broken by token) with
    * their sketch estimates alongside — the estimator-quality view. */
  def cmsHeavyHittersSql(table: String, tokensExpr: String, topK: Int): String = {
    val buildRows = (0 until CmsDepth).map(r =>
      s"SELECT $r AS r, ${cmsBucketSql("h", r)} AS bucket FROM h")
      .mkString("\n    UNION ALL ")
    val probeRows = (0 until CmsDepth).map(r =>
      s"SELECT token, $r AS r, ${cmsBucketSql("h", r)} AS bucket FROM probe")
      .mkString("\n    UNION ALL ")
    s"""WITH tok AS (
       |  SELECT unnest($tokensExpr) AS token FROM $table
       |), h AS (
       |  SELECT token, ${hash32Sql("token")} AS h FROM tok
       |), sk AS (
       |  SELECT r, bucket, CAST(count(*) AS BIGINT) AS cnt FROM (
       |    $buildRows
       |  ) GROUP BY r, bucket
       |), probe AS (
       |  SELECT DISTINCT token, h FROM h
       |), pb AS (
       |    $probeRows
       |), est AS (
       |  SELECT token, CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS est_cnt
       |  FROM pb LEFT JOIN sk ON pb.r = sk.r AND pb.bucket = sk.bucket
       |  GROUP BY token
       |), truth AS (
       |  SELECT token, CAST(count(*) AS BIGINT) AS true_cnt FROM tok GROUP BY token
       |)
       |SELECT t.token, t.true_cnt, e.est_cnt
       |FROM truth t JOIN est e ON t.token = e.token
       |ORDER BY t.true_cnt DESC, t.token LIMIT $topK""".stripMargin
  }

  // -------------------------------------------------------------- bloom
  val BloomBits = 2048
  val BloomHashes = 6
  val BloomA: IndexedSeq[Long] =
    (0 until BloomHashes).map(i => ((i + 13) * 2654435761L % 1048573L) + 1L)
  val BloomB: IndexedSeq[Long] =
    (0 until BloomHashes).map(i => ((i + 13) * 40087L * 69069L) % CmsP)

  private def bloomPos(h: Column, i: Int): Column =
    pmod(lit(BloomA(i)) * h + lit(BloomB(i)), lit(CmsP)) % BloomBits
  private def bloomPosSql(h: String, i: Int): String =
    s"(((${BloomA(i)} * $h + ${BloomB(i)}) % $CmsP) % $BloomBits)"

  /** Build the filter: the distinct set of set bit positions (≤ BloomBits
    * rows regardless of input size). */
  def bloomBits(items: DataFrame, itemCol: String): DataFrame = {
    val h = items.select(hash32(col(itemCol)).as("h"))
    val positions = (0 until BloomHashes).map(i => bloomPos(col("h"), i))
    h.select(explode(array(positions: _*)).as("pos")).distinct()
  }

  /** Membership probe: `maybe = true` iff all k probed bits are set. The
    * bit set is broadcast; no false negatives by construction. */
  def bloomMayContain(bits: DataFrame, probes: DataFrame, itemCol: String): DataFrame = {
    val pr = probes.select(col(itemCol).as("item")).distinct()
      .withColumn("h", hash32(col("item")))
    val positions = (0 until BloomHashes).map(i => bloomPos(col("h"), i))
    pr.select(col("item"), explode(array(positions: _*)).as("pos"))
      .join(broadcast(bits.withColumn("__set", lit(1))), Seq("pos"), "left")
      .groupBy("item")
      .agg((sum(coalesce(col("__set"), lit(0))) === BloomHashes).as("maybe"))
  }

  /** Bit-set union of two [[bloomBits]] filters — Bloom's shard-merge law,
    * completing the trilogy with [[cmsMerge]] (cell sum) and [[hllMerge]]
    * (register max): the set bits of a filter are the union of per-item
    * probe positions, so merge(bits(A), bits(B)) == bits(A ∪ B) exactly
    * (bitwise OR in the position-set representation). Each shard carries
    * ≤ BloomBits rows; shards/days OR together with one tiny distinct,
    * never a re-scan, and the merged filter keeps the no-false-negative
    * guarantee over the union. */
  def bloomMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).distinct()

  /** DuckDB twin of [[bloomBits]] over item CTE `items`(item): emits
    * fragments `${p}h` and `${p}bits`(pos) so several filters can coexist
    * in one oracle (the merge query builds three). */
  def bloomBitsSql(items: String, p: String): String = {
    val posRows = (0 until BloomHashes).map(i =>
      s"SELECT ${bloomPosSql("h", i)} AS pos FROM ${p}h").mkString("\n    UNION ALL ")
    s"""${p}h AS (
       |  SELECT ${hash32Sql("item")} AS h FROM (SELECT DISTINCT item FROM $items)
       |), ${p}bits AS (
       |  SELECT DISTINCT pos FROM (
       |    $posRows
       |  )
       |)""".stripMargin
  }

  // ------------------------------------------- sampled quantile sketch
  /** Hash-sampled quantile sketch: deterministic quantile estimation with
    * an EXACT accuracy gate. The "sketch" is the hash-sampled subset
    * itself (a pure per-row predicate on the md5-derived key hash), so
    * per-shard samples union into the global sample with zero
    * coordination — the fourth shard-merge law next to [[cmsMerge]]
    * (sum), [[hllMerge]] (max) and [[bloomMerge]] (or), with set union.
    * The estimate is the exact interpolated quantile OF the sample
    * (Spark `percentile` == DuckDB `quantile_cont` on identical doubles);
    * the gate is the exact rank of each estimate in the FULL data,
    * `rank_milli = (1000·|{v ≤ est}|) div n` — integer counts and one
    * IEEE-exact int-vs-double comparison per row, so estimate AND error
    * are both hash-checkable (the q_approx_pct built-in can only gate a
    * bound; this sketch is engine-exact like d_hll vs q_approx_distinct).
    *
    * Scale shape: one narrow filtered aggregation on the sample, then ONE
    * full scan against the ≤|qs|-row broadcast estimate frame with a
    * map-side-combinable conditional count — no shuffle wider than |qs|
    * rows anywhere. `df` must carry `keyCol` (sampling identity) and an
    * integral `valCol`. */
  def sampledQuantiles(df: DataFrame, keyCol: Column, valCol: Column,
                       rate: Double, qMilli: Seq[Int],
                       salt: String = "pct"): DataFrame = {
    val v = df.select(keyCol.as("k"), valCol.as("v"))
    val sample = graft.operators.Sampling.hashSample(v, col("k"), rate, salt)
    sampledQuantilesFrom(sample, v, qMilli)
  }

  /** Estimate + exact-rank gate from an ALREADY-MATERIALIZED sample
    * frame `sample`(…, v) against the full values `full`(…, v) — the
    * shared tail of [[sampledQuantiles]], also fed by the streaming
    * drain (which reconstructs the sample multiset from its histogram
    * state, so stream == batch bit-identically). */
  def sampledQuantilesFrom(sample: DataFrame, full: DataFrame,
                           qMilli: Seq[Int]): DataFrame = {
    // foldable literal division: each fraction is ONE double division of
    // exact integers in BOTH engines (never a decimal literal)
    val fracList = qMilli.map(q => s"CAST($q AS DOUBLE) / 1000").mkString(", ")
    val perQ = sample
      .agg(expr(s"percentile(v, array($fracList))").as("ests"),
        count(lit(1)).as("n_sample"))
      .select(col("n_sample"), posexplode(col("ests")).as(Seq("i", "est")))
      .withColumn("q_milli",
        element_at(array(qMilli.map(q => lit(q.toLong)): _*), col("i") + 1))
      .select(col("q_milli"), col("est"), col("n_sample"))
    full.crossJoin(broadcast(perQ))
      .groupBy("q_milli", "est", "n_sample")
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") <= col("est"), 1L).otherwise(0L)).as("cnt_le"))
      .select(col("q_milli"), col("est"), col("n_sample"), col("n"),
        col("cnt_le"),
        abs(expr("(1000 * cnt_le) div n") - col("q_milli"))
          .as("rank_err_milli"))
      .orderBy("q_milli")
  }

  /** DuckDB twin of [[sampledQuantiles]] over value CTE `vals`(k, v). */
  def sampledQuantilesSql(vals: String, rate: Double, qMilli: Seq[Int],
                          salt: String = "pct"): String = {
    val bound = (rate * 1000000L).toLong
    val qsSel = qMilli.map(q =>
      s"""SELECT CAST($q AS BIGINT) AS q_milli,
         |      quantile_cont(v, CAST($q AS DOUBLE) / 1000) AS est,
         |      CAST(count(*) AS BIGINT) AS n_sample FROM qsmp""".stripMargin)
      .mkString("\n    UNION ALL ")
    s"""qsmp AS (
       |  SELECT v FROM $vals
       |  WHERE ${hash60Sql(s"CAST(k AS VARCHAR) || '$salt'")} % 1000000 < $bound
       |), qest AS (
       |    $qsSel
       |), qgate AS (
       |  SELECT q.q_milli, q.est, q.n_sample,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN t.v <= q.est THEN 1 ELSE 0 END) AS BIGINT) AS cnt_le
       |  FROM $vals t, qest q
       |  GROUP BY q.q_milli, q.est, q.n_sample
       |)
       |SELECT q_milli, est, n_sample, n, cnt_le,
       |  abs((1000 * cnt_le) // n - q_milli) AS rank_err_milli
       |FROM qgate ORDER BY q_milli""".stripMargin
  }

  /** DuckDB twin: contamination check of `probeFilter` rows against a
    * filter built from `buildFilter` rows (same table), by fingerprint.
    * Output per probe doc: (doc_id, maybe, exact). */
  def bloomContaminationSql(table: String, fpExpr: String,
                            buildFilter: String, probeFilter: String): String = {
    val buildPos = (0 until BloomHashes).map(i =>
      s"SELECT ${bloomPosSql("h", i)} AS pos FROM bh").mkString("\n    UNION ALL ")
    val probePos = (0 until BloomHashes).map(i =>
      s"SELECT fp, $i AS i, ${bloomPosSql("h", i)} AS pos FROM ph")
      .mkString("\n    UNION ALL ")
    s"""WITH bfp AS (
       |  SELECT DISTINCT $fpExpr AS fp FROM $table WHERE $buildFilter
       |), bh AS (
       |  SELECT ${hash32Sql("fp")} AS h FROM bfp
       |), bits AS (
       |  SELECT DISTINCT pos FROM (
       |    $buildPos
       |  )
       |), probes AS (
       |  SELECT doc_id, $fpExpr AS fp FROM $table WHERE $probeFilter
       |), pfp AS (
       |  SELECT DISTINCT fp FROM probes
       |), ph AS (
       |  SELECT fp, ${hash32Sql("fp")} AS h FROM pfp
       |), pp AS (
       |    $probePos
       |), may AS (
       |  SELECT fp, (count(bits.pos) = $BloomHashes) AS maybe
       |  FROM pp LEFT JOIN bits ON pp.pos = bits.pos
       |  GROUP BY fp
       |)
       |SELECT p.doc_id, m.maybe, (b.fp IS NOT NULL) AS exact
       |FROM probes p
       |JOIN may m ON p.fp = m.fp
       |LEFT JOIN bfp b ON p.fp = b.fp
       |ORDER BY p.doc_id""".stripMargin
  }

  // ------------------------------------------------------- hyperloglog
  /** Deterministic HyperLogLog (Flajolet et al. 2007): the cardinality
    * sketch behind every engine's approx_count_distinct, rebuilt on the
    * md5-derived hash family so BOTH the register table and the estimate
    * replay exactly in SQL — unlike the built-in HLL (q_approx_distinct),
    * whose raw estimate stays engine-specific. 64 registers: the low 6
    * hash bits pick the register, rho = leading-zero rank of the
    * remaining 54 bits (computed as 55 − bitlength, pure integer via the
    * binary-string length — no libm log2 at a power-of-two boundary).
    * The harmonic denominator is kept as Σ 2^(55−rho) — an EXACT BIGINT
    * (≤ 64·2^55 < 2^62) — and the single float step (alpha·m²·2^55 / S)
    * is one multiply-divide chain over exact inputs, IEEE-identical in
    * both engines.
    *
    * Scale shape: one map-side-combinable max per register — the sketch
    * of a petabyte stream is 64 rows; merging shards is a further max. */
  val HllM = 64
  /** alpha_64 = 0.709, the standard bias constant for m = 64. */
  val HllAlpha = 0.709

  /** (register, rho_max) — all 64 registers, 0 where the register never
    * saw an item. */
  def hllRegisters(items: DataFrame, itemCol: String): DataFrame = {
    val sp = items.sparkSession
    val regs = hllRhoRows(items, itemCol)
      .groupBy("register").agg(max(col("rho")).as("rho_max"))
    sp.range(HllM.toLong).select(col("id").cast("int").as("register"))
      .join(regs, Seq("register"), "left")
      .select(col("register"),
        coalesce(col("rho_max"), lit(0)).cast("int").as("rho_max"))
  }

  /** The stateless (register, rho) pre-aggregation rows of
    * [[hllRegisters]] — one row per item, shared with the STREAMING
    * register maintenance (whose per-register max is the streaming
    * aggregation state). */
  def hllRhoRows(items: DataFrame, itemCol: String,
                 carry: Seq[String] = Nil): DataFrame = {
    val cs = carry.map(col)
    items.select(cs :+ hash60(col(itemCol)).as("h"): _*)
      .select(cs :+ pmod(col("h"), lit(64L)).cast("int").as("register")
        :+ expr("h div 64").as("v"): _*)
      .select(cs :+ col("register")
        :+ when(col("v") === 0L, lit(55))
          .otherwise(lit(55) - length(bin(col("v")))).as("rho"): _*)
  }

  /** One-row estimate off a [[hllRegisters]] table: the exact integer
    * denominator, the raw HLL estimate (floored to BIGINT), plus
    * diagnostics when `exact` is supplied by the caller. */
  def hllEstimate(regs: DataFrame): DataFrame =
    regs.agg(sum(expr("shiftleft(cast(1 as bigint), cast(55 - rho_max as int))"))
        .as("s_pow"))
      .select(col("s_pow"),
        floor(lit(HllAlpha) * lit(4096.0) * lit(36028797018963968.0) /
          col("s_pow").cast("double")).cast("long").as("est"))

  /** Per-group [[hllRegisters]]: one 64-register sketch per value of
    * `groupCol` — the GROUP BY form that makes the sketch a first-class
    * aggregation (per-source/per-day distinct counts in one pass, each
    * group's sketch independently mergeable across shards). Absent
    * registers are NOT materialized per group (a dense groups×64 frame
    * would be a cross join); [[hllEstimateBy]] folds them in
    * arithmetically instead. */
  def hllRegistersBy(items: DataFrame, groupCol: String,
                     itemCol: String): DataFrame =
    hllRhoRows(items.select(col(groupCol).as("grp"), col(itemCol)),
        itemCol, carry = Seq("grp"))
      .groupBy("grp", "register").agg(max(col("rho")).as("rho_max"))

  /** Per-group estimate off a [[hllRegistersBy]] table. Absent registers
    * enter as rho 0 — the term 2^55 each — via the (64 − present) count,
    * which is arithmetically identical to the dense single-sketch
    * [[hllEstimate]] (PipelineSpec pins the equality per group). */
  def hllEstimateBy(regs: DataFrame): DataFrame =
    regs.groupBy("grp")
      .agg(sum(expr("shiftleft(cast(1 as bigint), cast(55 - rho_max as int))"))
          .as("s_present"),
        count(lit(1)).as("n_regs"))
      .select(col("grp"),
        (col("s_present") + (lit(64L) - col("n_regs")) * lit(1L << 55))
          .as("s_pow"))
      .select(col("grp"), col("s_pow"),
        floor(lit(HllAlpha) * lit(4096.0) * lit(36028797018963968.0) /
          col("s_pow").cast("double")).cast("long").as("est"))

  /** Register-wise merge of two [[hllRegisters]] tables — THE operation
    * that makes the sketch worth carrying at scale: every shard keeps 64
    * rows and union-distinct-cardinality is a per-register max, never a
    * re-scan. Exact identity: merge(regs(A), regs(B)) == regs(A ∪ B),
    * because max is associative over the per-item rho values. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("register"), col("rho_max").as("ra"))
      .join(b.select(col("register"), col("rho_max").as("rb")), "register")
      .select(col("register"), greatest(col("ra"), col("rb")).as("rho_max"))

  /** DuckDB twin of [[hllRegisters]] over item CTE `items`(item);
    * `p` prefixes the fragment names so several register tables can
    * coexist in one oracle (the merge query builds three). */
  def hllRegistersSql(items: String, p: String = "h"): String =
    s"""${p}pre AS (
       |  SELECT CAST(h % 64 AS INT) AS register, h // 64 AS v FROM (
       |    SELECT ${hash60Sql("item")} AS h FROM $items)
       |), ${p}regs AS (
       |  SELECT register,
       |    max(CASE WHEN v = 0 THEN 55 ELSE 55 - length(bin(v)) END) AS rho_max
       |  FROM ${p}pre GROUP BY register
       |), ${p}full AS (
       |  SELECT CAST(g.r AS INT) AS register,
       |    CAST(coalesce(${p}regs.rho_max, 0) AS INT) AS rho_max
       |  FROM (SELECT unnest(generate_series(0, 63)) AS r) g
       |  LEFT JOIN ${p}regs ON ${p}regs.register = g.r
       |)""".stripMargin

  /** DuckDB twin of [[hllEstimate]] over the `hfull` fragment: CTE
    * `hest`(s_pow, est) — the float step mirrors the Spark op tree. */
  def hllEstimateSql: String =
    s"""hest AS (
       |  SELECT s_pow,
       |    CAST(floor(CAST($HllAlpha AS DOUBLE) * CAST(4096.0 AS DOUBLE)
       |        * CAST(36028797018963968.0 AS DOUBLE)
       |      / CAST(s_pow AS DOUBLE)) AS BIGINT) AS est
       |  FROM (SELECT CAST(sum(1::BIGINT << (55 - rho_max)) AS BIGINT) AS s_pow
       |        FROM hfull)
       |)""".stripMargin
}
