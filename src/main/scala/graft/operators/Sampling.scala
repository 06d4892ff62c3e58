package graft.operators


import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions.{hash60, hash60Sql, tokensSql}

/** Deterministic sampling for training-data pipelines.
  *
  * All sampling here is HASH-based, not RNG-based: membership depends only
  * on the row's key and the salt, so samples are reproducible across runs,
  * engines and partitionings, can be audited by the DuckDB oracle, and
  * stay stable when the dataset is appended to (a row never flips split).
  * `df.sample()`-style RNG sampling gives none of those properties at
  * pipeline scale. */
object Sampling {

  /** Keep rows whose salted key hash lands below `rate` (0..1) of the
    * hash space (here: first 60 md5 bits, uniform). */
  def hashSample(df: DataFrame, keyCol: Column, rate: Double,
                 salt: String = "s0"): DataFrame = {
    val bound = (rate * 1000000L).toLong
    df.filter(pmod(hash60(concat(keyCol.cast("string"), lit(salt))), lit(1000000L)) < bound)
  }

  def hashSampleSql(table: String, keyCol: String, rate: Double,
                    salt: String = "s0"): String = {
    val bound = (rate * 1000000L).toLong
    s"""SELECT * FROM $table
       |WHERE ${hash60Sql(s"CAST($keyCol AS VARCHAR) || '$salt'")} % 1000000 < $bound""".stripMargin
  }

  /** Deterministic train/validation/test split: assigns each row a split
    * label from its key hash; fractions must sum to <= 1 (remainder goes
    * to "train"). */
  def splitColumn(keyCol: Column, valFrac: Double, testFrac: Double,
                  salt: String = "split"): Column = {
    val h = pmod(hash60(concat(keyCol.cast("string"), lit(salt))), lit(1000000L))
    val valBound = (valFrac * 1000000L).toLong
    val testBound = valBound + (testFrac * 1000000L).toLong
    when(h < valBound, "validation")
      .when(h < testBound, "test")
      .otherwise("train")
  }

  /** Stratified deterministic sampling: a per-stratum keep rate (strata
    * missing from `rates` fall back to `defaultRate`). Same hash-threshold
    * membership as [[hashSample]] — reproducible, append-stable, and a
    * single narrow filter (no shuffle, no per-stratum pass: the rate
    * lookup is a constant-folded CASE on the stratum column). */
  def stratifiedSample(df: DataFrame, stratumCol: Column, keyCol: Column,
                       rates: Seq[(String, Double)], defaultRate: Double,
                       salt: String = "strat"): DataFrame = {
    val h = pmod(hash60(concat(keyCol.cast("string"), lit(salt))), lit(1000000L))
    val bound = rates.foldRight(lit((defaultRate * 1000000L).toLong): Column) {
      case ((stratum, rate), acc) =>
        when(stratumCol === stratum, lit((rate * 1000000L).toLong)).otherwise(acc)
    }
    df.filter(h < bound)
  }

  /** Weight-proportional deterministic sampling (the Bernoulli form of
    * importance sampling): each row keeps with probability
    * min(w, cap)/cap, decided by the SAME salted-hash membership as
    * [[hashSample]] — reproducible, append-stable,
    * partition-independent, and pure-integer replayable: keep iff
    * `h % cap < min(w, cap)`. Weights are integral (token counts, a
    * milli-unit quality score); rows at or above `cap` keep with
    * certainty. One narrow filter — no shuffle and no global
    * normalization pass (the cap stands in for the Σw a true
    * weighted-without-replacement draw would need). */
  def weightedHashSample(df: DataFrame, keyCol: Column, weightCol: Column,
                         cap: Long, salt: String = "ws"): DataFrame = {
    require(cap > 0, "cap > 0")
    df.filter(
      pmod(hash60(concat(keyCol.cast("string"), lit(salt))), lit(cap)) <
        least(weightCol.cast("long"), lit(cap)))
  }

  def weightedHashSampleSql(table: String, keyCol: String, weightExpr: String,
                            cap: Long, salt: String = "ws"): String =
    s"""SELECT * FROM $table
       |WHERE ${hash60Sql(s"CAST($keyCol AS VARCHAR) || '$salt'")} % $cap <
       |  least(CAST($weightExpr AS BIGINT), $cap)""".stripMargin

  def stratifiedSampleSql(table: String, stratumCol: String, keyCol: String,
                          rates: Seq[(String, Double)], defaultRate: Double,
                          salt: String = "strat"): String = {
    val h = s"${hash60Sql(s"CAST($keyCol AS VARCHAR) || '$salt'")} % 1000000"
    // empty rates: a bare bound, not `CASE ELSE … END` (a WHEN-less CASE is
    // a DuckDB syntax error — the Spark twin's foldRight handles it fine)
    val bound =
      if (rates.isEmpty) s"${(defaultRate * 1000000L).toLong}"
      else {
        val cases = rates.map { case (stratum, rate) =>
          s"WHEN $stratumCol = '$stratum' THEN ${(rate * 1000000L).toLong}"
        }.mkString(" ")
        s"(CASE $cases ELSE ${(defaultRate * 1000000L).toLong} END)"
      }
    s"SELECT * FROM $table WHERE $h < $bound"
  }

  /** Data-mixture balancing: deterministically downsample every group to
    * (expected) the size of the SMALLEST group — the "equalize sources
    * before weighting" step of a training-data mixture. The keep decision
    * is the exact integer cross-multiplication
    * `hash(key) % 1e6 * n_group < min_n * 1e6` (keep probability
    * min_n/n_group, no float threshold), so membership is reproducible,
    * append-unstable only where group counts change, and replayable
    * bit-for-bit by [[balanceGroupsSql]].
    *
    * Scale: two scans of `df` (one column-pruned count pass, one filter
    * pass) and a broadcast join against the GROUP-sized count table — the
    * per-row decision never shuffles the data. */
  def balanceGroups(df: DataFrame, keyCol: Column, groupCol: Column,
                    salt: String = "mix"): DataFrame = {
    val counts = df.groupBy(groupCol.as("g")).agg(count(lit(1)).as("n_g"))
    val minN = counts.agg(min(col("n_g")).as("min_n"))
    val h = pmod(hash60(concat(keyCol.cast("string"), lit(salt))), lit(1000000L))
    df.join(broadcast(counts), groupCol === col("g"))
      .crossJoin(broadcast(minN))
      .filter(h * col("n_g") < col("min_n") * 1000000L)
      .drop("g", "n_g", "min_n")
  }

  def balanceGroupsSql(table: String, keyCol: String, groupCol: String,
                       salt: String = "mix"): String = {
    val h = s"${hash60Sql(s"CAST(t.$keyCol AS VARCHAR) || '$salt'")} % 1000000"
    s"""WITH cnt AS (
       |  SELECT $groupCol AS g, count(*) AS n_g FROM $table GROUP BY 1
       |), mn AS (SELECT min(n_g) AS min_n FROM cnt)
       |SELECT t.* FROM $table t
       |JOIN cnt ON t.$groupCol = cnt.g CROSS JOIN mn
       |WHERE $h * n_g < min_n * 1000000""".stripMargin
  }

  /** Temperature-flattened mixture sampling at T = 2: keep each row of
    * group g with probability sqrt(min_n / n_g), so group sizes land at
    * sqrt(min_n · n_g) — the square-root compression of the size-ratio
    * range that multilingual training mixes use, in its downsample-only
    * form (the smallest group is kept whole; T → ∞ full equalization is
    * [[balanceGroups]], T = 1 a plain pass-through). T = 2 is the one
    * temperature whose per-group keep-bound needs only sqrt, which IEEE
    * correctly-rounds in both engines — pow/exp/ln (any other T) differ
    * by 1 ulp between libms and would flip rows at the threshold. The
    * bound floor(1e6 · sqrt(min_n/n_g)) is therefore bit-identical in
    * [[temperatureSampleSql]], and membership is the usual salted-hash
    * rule: reproducible and partition-independent, but — like
    * [[balanceGroups]] and unlike the fixed-rate samplers — append-
    * UNSTABLE wherever group counts change (the keep bound depends on
    * min_n/n_g, so growing any group can flip rows near the threshold).
    *
    * Scale: identical shape to [[balanceGroups]] — one column-pruned
    * count pass, broadcast joins, per-row filter; no data shuffle. */
  def temperatureSample(df: DataFrame, keyCol: Column, groupCol: Column,
                        salt: String = "temp"): DataFrame = {
    val counts = df.groupBy(groupCol.as("g")).agg(count(lit(1)).as("n_g"))
    val minN = counts.agg(min(col("n_g")).as("min_n"))
    val h = pmod(hash60(concat(keyCol.cast("string"), lit(salt))), lit(1000000L))
    df.join(broadcast(counts), groupCol === col("g"))
      .crossJoin(broadcast(minN))
      .filter(h < floor(lit(1000000.0) *
        sqrt(col("min_n").cast("double") / col("n_g").cast("double"))))
      .drop("g", "n_g", "min_n")
  }

  def temperatureSampleSql(table: String, keyCol: String, groupCol: String,
                           salt: String = "temp"): String = {
    val h = s"${hash60Sql(s"CAST(t.$keyCol AS VARCHAR) || '$salt'")} % 1000000"
    s"""WITH cnt AS (
       |  SELECT $groupCol AS g, count(*) AS n_g FROM $table GROUP BY 1
       |), mn AS (SELECT min(n_g) AS min_n FROM cnt)
       |SELECT t.* FROM $table t
       |JOIN cnt ON t.$groupCol = cnt.g CROSS JOIN mn
       |WHERE $h < floor(1000000.0 *
       |  sqrt(CAST(min_n AS DOUBLE) / CAST(n_g AS DOUBLE)))""".stripMargin
  }

  /** Token-BUDGET mixture planning: split an integer token budget across
    * groups proportionally to sqrt(group tokens) — the T = 2 flattening
    * again, now as an ALLOCATION TABLE (the planning step before a
    * training run: "we will train on B tokens; how many from each
    * source?") rather than a row filter. Largest-remainder rounding makes
    * the allocations sum to exactly B: base_g = (B·w_g) div W and the
    * B − Σ base leftover goes +1 apiece to the largest (B·w_g) mod W
    * remainders (ties by group asc). w_g = floor(1e3·sqrt(tokens_g)) is
    * one correctly-rounded IEEE sqrt + exact floor; every other step is
    * integer — the whole plan is engine-exact ([[tokenBudgetSql]]).
    *
    * `budget` defaults to half the corpus tokens (callers pass absolute
    * budgets in production). B·w_g must fit i64 — fine through ~10¹²
    * tokens with milli-weights; past that, express B in mega-token units
    * (the allocation is a GROUP-sized table either way).
    *
    * Scale: one column-pruned token-count aggregation; everything after
    * runs on the group-sized table (broadcast 1-row total frames, a
    * group-count window). */
  def tokenBudget(perDoc: DataFrame, grpCol: Column, tokCol: Column): DataFrame = {
    val g = perDoc.groupBy(grpCol.as("grp")).agg(sum(tokCol).as("tokens"))
      .withColumn("w_milli",
        floor(lit(1000.0) * sqrt(col("tokens").cast("double"))).cast("long"))
    val tot = g.agg(sum(col("w_milli")).as("W"),
      expr("sum(tokens) div 2").as("B"))
    val j = g.crossJoin(broadcast(tot))
      .withColumn("base", expr("(B * w_milli) div W"))
      .withColumn("rem", expr("(B * w_milli) % W"))
    val lf = j.agg((max(col("B")) - sum(col("base"))).as("leftover"))
    val wr = Window.orderBy(col("rem").desc, col("grp"))
    j.withColumn("rk", row_number().over(wr))
      .crossJoin(broadcast(lf))
      .select(col("grp"), col("tokens"),
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("alloc_tokens"))
  }

  /** DuckDB twin of [[tokenBudget]] over `table` with a per-row token
    * expression. */
  def tokenBudgetSql(table: String, grpCol: String, tokExpr: String): String =
    s"""WITH t AS (
       |  SELECT $grpCol AS grp, CAST(sum($tokExpr) AS BIGINT) AS tokens
       |  FROM $table GROUP BY 1
       |), w AS (
       |  SELECT grp, tokens,
       |    CAST(floor(1000.0 * sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS w_milli
       |  FROM t
       |), tot AS (
       |  SELECT CAST(sum(w_milli) AS BIGINT) AS W,
       |    CAST(sum(tokens) AS BIGINT) // 2 AS B FROM w
       |), j AS (
       |  SELECT grp, tokens, w_milli, B,
       |    (B * w_milli) // W AS base, (B * w_milli) % W AS rem
       |  FROM w, tot
       |), lf AS (
       |  SELECT max(B) - sum(base) AS leftover FROM j
       |), r AS (
       |  SELECT grp, tokens, base, rem,
       |    row_number() OVER (ORDER BY rem DESC, grp) AS rk FROM j
       |)
       |SELECT grp, tokens,
       |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
       |    AS alloc_tokens
       |FROM r, lf""".stripMargin

  /** Deterministic oversampling: replicate every group's rows up toward
    * the LARGEST group's count (the mixture-balancing dual of
    * [[balanceGroups]], for when minority sources must be upweighted
    * rather than majority sources cut). Each row gets
    * `max_n div n_g` base copies plus one extra copy when its salted key
    * hash lands below the fractional remainder `(max_n mod n_g) / n_g` —
    * the same hash-threshold rule as [[balanceGroups]], so group sizes hit
    * max_n in expectation (exactly max_n when n_g divides max_n, e.g. the
    * argmax group itself is passed through with copy_id = 1 unchanged).
    * Adds `copy_id` (1..copies) so replicated rows stay distinct.
    * Replayed bit-for-bit by [[upsampleGroupsSql]].
    *
    * Scale: one column-pruned count pass, then a broadcast join and a
    * map-side `explode(sequence)` — the data rows themselves never
    * shuffle, and no per-group window/rank is involved (a
    * `partitionBy(group)` window would put an entire group on one task —
    * exactly the skew this avoids). The per-row `sequence` array is
    * `max_n div n_g` long, ENFORCED at most `maxCopies` (a pathological
    * group ratio — one doc in a 10⁹-row-majority corpus — would otherwise
    * explode a single row into max_n copies; unbounded replication of a
    * tiny group is a data-quality smell before it is a memory problem, so
    * the cap is a parameter, not a scaladoc note). Rows at the cap take
    * exactly `maxCopies` copies with no fractional top-up. */
  def upsampleGroups(df: DataFrame, keyCol: Column, groupCol: Column,
                     salt: String = "up", maxCopies: Long = 10000L): DataFrame = {
    require(maxCopies >= 1, "maxCopies >= 1")
    val counts = df.groupBy(groupCol.as("g")).agg(count(lit(1)).as("n_g"))
    val maxN = counts.agg(max(col("n_g")).as("max_n"))
    val h = pmod(hash60(concat(keyCol.cast("string"), lit(salt))), lit(1000000L))
    df.join(broadcast(counts), groupCol === col("g"))
      .crossJoin(broadcast(maxN))
      .withColumn("copies", least(expr("max_n div n_g") +
        when(h * col("n_g") < (col("max_n") % col("n_g")) * 1000000L, lit(1L))
          .otherwise(lit(0L)), lit(maxCopies)))
      .withColumn("copy_id", explode(sequence(lit(1L), col("copies"))))
      .drop("g", "n_g", "max_n", "copies")
  }

  def upsampleGroupsSql(table: String, keyCol: String, groupCol: String,
                        salt: String = "up", maxCopies: Long = 10000L): String = {
    val h = s"${hash60Sql(s"CAST(t.$keyCol AS VARCHAR) || '$salt'")} % 1000000"
    s"""WITH cnt AS (
       |  SELECT $groupCol AS g, count(*) AS n_g FROM $table GROUP BY 1
       |), mx AS (SELECT max(n_g) AS max_n FROM cnt)
       |SELECT t.*, unnest(generate_series(1, least(
       |  (max_n // n_g) + CASE WHEN $h * n_g < (max_n % n_g) * 1000000
       |                        THEN 1 ELSE 0 END, $maxCopies))) AS copy_id
       |FROM $table t
       |JOIN cnt ON t.$groupCol = cnt.g CROSS JOIN mx""".stripMargin
  }

  /** Approximate sequence packing for training — assign every doc to a
    * fixed-capacity context bin. The distributed form of first-fit: docs
    * are hash-split into `groups` independent shards; within a shard they
    * are dealt round-robin in DESCENDING length order (LPT scheduling)
    * into `ceil(shard_tokens / ctxLen)` bins, so every bin's load is at
    * most ~ctxLen + the longest doc. No global single-task window: the
    * rank window partitions by shard, and the only global step is the
    * `groups`-row bin-offset prefix sum.
    *
    * Deterministic (hash shard + length/id ordering), so the assignment is
    * exactly replayable — [[seqPackSql]] is the DuckDB twin. Returns
    * (doc_id, n_tokens, pack_id). */
  def seqPack(docs: DataFrame, idCol: String, lenCol: String,
              ctxLen: Long, groups: Int = 64): DataFrame = {
    require(ctxLen > 0, "ctxLen > 0")
    require(groups > 0, "groups > 0")
    val base = docs.select(col(idCol).as("doc_id"),
        col(lenCol).cast("long").as("n_tokens"))
      .withColumn("grp",
        pmod(hash60(col("doc_id").cast("string")), lit(groups.toLong)))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("n_tokens").desc, col("doc_id"))
    val ranked = base.withColumn("rk", row_number().over(wRank))
    val gs = base.groupBy(col("grp")).agg(sum(col("n_tokens")).as("gtok"))
      .withColumn("nbins",
        greatest(expr(s"(gtok + ${ctxLen - 1}) div $ctxLen"), lit(1L)))
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy(col("grp"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offs = gs.withColumn("off", coalesce(sum(col("nbins")).over(wOff), lit(0L)))
    ranked.join(broadcast(offs.select(col("grp"), col("nbins"), col("off"))), "grp")
      .select(col("doc_id"), col("n_tokens"),
        (col("off") + pmod(col("rk") - 1, col("nbins"))).as("pack_id"))
  }

  /** DuckDB twin of [[seqPack]] over a token-length expression. */
  def seqPackSql(table: String, idCol: String, lenExpr: String,
                 ctxLen: Long, groups: Int): String =
    s"""WITH base AS (
       |  SELECT $idCol AS doc_id, CAST($lenExpr AS BIGINT) AS n_tokens,
       |    ${hash60Sql(s"CAST($idCol AS VARCHAR)")} % $groups AS grp
       |  FROM $table
       |), ranked AS (
       |  SELECT doc_id, n_tokens, grp, row_number() OVER (
       |    PARTITION BY grp ORDER BY n_tokens DESC, doc_id) AS rk
       |  FROM base
       |), gs AS (
       |  SELECT grp, greatest((sum(n_tokens) + ${ctxLen - 1}) // $ctxLen, 1) AS nbins
       |  FROM base GROUP BY grp
       |), offs AS (
       |  SELECT grp, nbins, coalesce(sum(nbins) OVER (ORDER BY grp
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |  FROM gs
       |)
       |SELECT r.doc_id, r.n_tokens,
       |  CAST(o.off + ((r.rk - 1) % o.nbins) AS BIGINT) AS pack_id
       |FROM ranked r JOIN offs o ON r.grp = o.grp""".stripMargin

  /** MATERIALIZE the packed sequences — the step after [[seqPack]]'s bin
    * assignment that produces the actual training rows: per bin, member
    * docs concatenate in ascending doc_id order, every doc terminated by
    * the `eos` sentinel token, truncated to exactly `ctxLen` tokens (the
    * small overflow the LPT bound allows is cut and reported as
    * `n_overflow`). Output (pack_id, n_docs, raw_tokens, n_overflow,
    * packed_text); raw_tokens counts doc tokens plus one eos per doc.
    *
    * Scale shape: one doc_id-keyed join of the assignment back to the
    * text, then ONE pack_id shuffle carrying each doc's tokens exactly
    * once; per-bin assembly is array concat + slice over ~ctxLen
    * elements. Nothing is ever quadratic in the bin. */
  def packMaterialize(docs: DataFrame, idCol: String, textCol: String,
                      ctxLen: Long, groups: Int = 64,
                      eos: String = "<eos>"): DataFrame = {
    import graft.functions.TextFunctions.{tokens, tokenCount}
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("n_tokens", tokenCount(col("text")))
    val packed = seqPack(base, "doc_id", "n_tokens", ctxLen, groups)
      .select(col("doc_id"), col("pack_id"))
    val toked = base.withColumn("toks",
      when(col("n_tokens") > 0, tokens(col("text")))
        .otherwise(array().cast("array<string>")))
    packed.join(toked, "doc_id")
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sort_array(collect_list(struct(col("doc_id"), col("toks")))).as("ds"))
      .withColumn("pt",
        expr(s"flatten(transform(ds, d -> concat(d.toks, array('$eos'))))"))
      .select(col("pack_id"), col("n_docs"),
        size(col("pt")).cast("long").as("raw_tokens"),
        greatest(size(col("pt")) - lit(ctxLen), lit(0L)).cast("long")
          .as("n_overflow"),
        expr(s"array_join(slice(pt, 1, $ctxLen), ' ')").as("packed_text"))
  }

  /** DuckDB twin of [[packMaterialize]] (rides on [[seqPackSql]]'s
    * assignment CTE `$pm`(doc_id, n_tokens, pack_id) and the raw
    * `$table`). */
  def packMaterializeSql(table: String, idCol: String, textCol: String,
                         pm: String, ctxLen: Long,
                         eos: String = "<eos>"): String =
    s"""pmt AS (
       |  SELECT p.pack_id, p.doc_id,
       |    CASE WHEN length(trim(d.$textCol)) = 0 THEN CAST([] AS VARCHAR[])
       |         ELSE ${tokensSql(s"d.$textCol")} END AS toks
       |  FROM $pm p JOIN $table d ON d.$idCol = p.doc_id
       |), pma AS (
       |  SELECT pack_id, CAST(count(*) AS BIGINT) AS n_docs,
       |    flatten(list_transform(
       |      list(struct_pack(doc_id := doc_id, toks := toks) ORDER BY doc_id),
       |      s -> list_concat(s.toks, ['$eos']))) AS pt
       |  FROM pmt GROUP BY pack_id
       |)""".stripMargin

  /** Deterministic epoch-order shuffle for packed context bins — the
    * last step of the packing story: the training order of [[seqPack]]'s
    * bins for a given `epoch` is the dense rank of a salted 60-bit hash
    * of the pack id. A reproducible global permutation, independent of
    * source layout, partitioning and arrival order (the hash interleaves
    * sources by construction), and a new permutation per epoch.
    *
    * Scale shape: dense positions come from the two-pass range-bucket
    * construction — bucket = the hash's top 10 bits (order-preserving
    * prefix), per-bucket row_number windows, and a broadcast 1024-row
    * prefix-sum of bucket counts — NEVER a single-partition global
    * window. Same offs discipline as [[seqPack]]. Returns the input
    * columns plus `posCol` (1-based). */
  def epochOrder(packs: DataFrame, packIdCol: String, epoch: Long,
                 posCol: String = "epoch_pos"): DataFrame = {
    val bucketDiv = 1L << 50
    val b = packs
      .withColumn("__hk",
        hash60(concat(col(packIdCol).cast("string"), lit(s"#$epoch"))))
      .withColumn("__bk", expr(s"__hk div $bucketDiv"))
    val counts = b.groupBy(col("__bk")).agg(count(lit(1)).as("__n"))
    val wOff = Window.orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
    val wIn = Window.partitionBy(col("__bk"))
      .orderBy(col("__hk"), col(packIdCol))
    b.join(broadcast(offs.select(col("__bk"), col("__off"))), Seq("__bk"))
      .withColumn(posCol, col("__off") + row_number().over(wIn))
      .drop("__hk", "__bk", "__off")
  }

  /** CURRICULUM order: [[epochOrder]] with a MAJOR band key — the
    * quality-annealed training schedule (band 1 = highest-quality docs
    * first, then band 2, …), deterministically hash-shuffled WITHIN each
    * band. pos = band offset + dense in-band hash rank, same range-bucket
    * two-pass (the per-(band, bucket) count frame stays broadcast-sized).
    * Every band-k position precedes every band-(k+1) position by
    * construction. */
  def curriculumOrder(rows: DataFrame, keyCol: String, bandCol: String,
                      epoch: Long, posCol: String = "cur_pos"): DataFrame = {
    val bucketDiv = 1L << 50
    val b = rows
      .withColumn("__hk",
        hash60(concat(col(keyCol).cast("string"), lit(s"#$epoch"))))
      .withColumn("__bk", expr(s"__hk div $bucketDiv"))
    val counts = b.groupBy(col(bandCol), col("__bk"))
      .agg(count(lit(1)).as("__n"))
    val wOff = Window.orderBy(col(bandCol), col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
    val wIn = Window.partitionBy(col(bandCol), col("__bk"))
      .orderBy(col("__hk"), col(keyCol))
    b.join(broadcast(offs.select(col(bandCol), col("__bk"), col("__off"))),
        Seq(bandCol, "__bk"))
      .withColumn(posCol, col("__off") + row_number().over(wIn))
      .drop("__hk", "__bk", "__off")
  }

  /** DuckDB twin of [[curriculumOrder]]: `${p}out`(key, band, pos) over
    * `$table`(… $keyCol, $bandCol …). */
  def curriculumOrderSql(table: String, keyCol: String, bandCol: String,
                         epoch: Long, p: String): String = {
    val bucketDiv = 1L << 50
    s"""${p}b AS (
       |  SELECT $keyCol AS key, $bandCol AS band,
       |    ${hash60Sql(s"CAST($keyCol AS VARCHAR) || '#$epoch'")} AS hk
       |  FROM $table
       |), ${p}c AS (
       |  SELECT band, hk // $bucketDiv AS bk, count(*) AS n
       |  FROM ${p}b GROUP BY 1, 2
       |), ${p}o AS (
       |  SELECT band, bk, coalesce(sum(n) OVER (ORDER BY band, bk
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |  FROM ${p}c
       |), ${p}out AS (
       |  SELECT b.key, b.band, CAST(o.off + row_number() OVER (
       |    PARTITION BY b.band, b.hk // $bucketDiv
       |    ORDER BY b.hk, b.key) AS BIGINT) AS pos
       |  FROM ${p}b b JOIN ${p}o o
       |    ON o.band = b.band AND o.bk = b.hk // $bucketDiv
       |)""".stripMargin
  }

  /** DuckDB twin of [[epochOrder]] as CTE fragments: `${p}out`(key, pos)
    * over `$table`'s `$packIdCol`. */
  def epochOrderSql(table: String, packIdCol: String, epoch: Long,
                    p: String): String = {
    val bucketDiv = 1L << 50
    s"""${p}b AS (
       |  SELECT $packIdCol AS key,
       |    ${hash60Sql(s"CAST($packIdCol AS VARCHAR) || '#$epoch'")} AS hk
       |  FROM $table
       |), ${p}c AS (
       |  SELECT hk // $bucketDiv AS bk, count(*) AS n FROM ${p}b GROUP BY 1
       |), ${p}o AS (
       |  SELECT bk, coalesce(sum(n) OVER (ORDER BY bk
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |  FROM ${p}c
       |), ${p}out AS (
       |  SELECT b.key, CAST(o.off + row_number() OVER (
       |    PARTITION BY b.hk // $bucketDiv ORDER BY b.hk, b.key) AS BIGINT) AS pos
       |  FROM ${p}b b JOIN ${p}o o ON o.bk = b.hk // $bucketDiv
       |)""".stripMargin
  }

  def splitColumnSql(keyCol: String, valFrac: Double, testFrac: Double,
                     salt: String = "split"): String = {
    val valBound = (valFrac * 1000000L).toLong
    val testBound = valBound + (testFrac * 1000000L).toLong
    val h = s"${hash60Sql(s"CAST($keyCol AS VARCHAR) || '$salt'")} % 1000000"
    s"(CASE WHEN $h < $valBound THEN 'validation' " +
      s"WHEN $h < $testBound THEN 'test' ELSE 'train' END)"
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * how much more likely its hashed n-gram features are under the TARGET
    * domain's feature distribution than under the raw corpus's. Features
    * are unigrams + word bigrams hashed into `buckets` buckets; both
    * distributions get Laplace +1 smoothing over the bucket space, so
    * `w[b] = ln((cnt_t[b]+1)/(tot_t+B)) − ln((cnt_r[b]+1)/(tot_r+B))` and
    * a document's weight is `Σ_b tf[b]·w[b]`. Each ln is rounded to
    * integer micro-nats BEFORE the per-document sum (the d_surprisal
    * discipline), so the score is an order-free i64 sum and the whole
    * pipeline replays exactly in SQL ([[dsirWeightsSql]]).
    *
    * Output: (doc_id, n_feats, dsir_micro). High scores = "looks like the
    * target domain"; the caller samples/cuts on the score (d_dsir pairs it
    * with a data-adaptive percentile cut).
    *
    * Scale shape: one feature explode + two map-side-combinable
    * aggregations; the per-bucket weight table is `buckets` rows —
    * broadcast by construction — and the only corpus-sized shuffle is the
    * (doc, bucket) tf aggregation. i64 headroom: |w_micro| < 2·ln(tot)·1e6
    * < 6·10⁷ for any real corpus, so tf·w stays far below 2⁶³. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  targetPred: Column, buckets: Int = 128): DataFrame = {
    import graft.functions.TextFunctions.{bigrams, hash32, tokens}
    require(buckets > 0, "buckets > 0")
    val feats = docs.select(col(idCol).as("doc_id"), targetPred.as("is_t"),
        explode(concat(tokens(col(textCol)), bigrams(col(textCol)))).as("f"))
      .select(col("doc_id"), col("is_t"),
        pmod(hash32(col("f")), lit(buckets.toLong)).as("b"))
    val tf = feats.groupBy("doc_id", "b").agg(count(lit(1)).as("tf"))
    val per = feats.groupBy("b").agg(
      count(lit(1)).as("cnt_r"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("cnt_t"))
    val tots = per.agg(sum(col("cnt_r")).as("tot_r"), sum(col("cnt_t")).as("tot_t"))
    def lmicro(c: Column): Column = round(log(c) * 1e6, 0).cast("long")
    val w = per.crossJoin(broadcast(tots)).select(col("b"),
      ((lmicro(col("cnt_t") + lit(1)) - lmicro(col("tot_t") + lit(buckets))) -
        (lmicro(col("cnt_r") + lit(1)) - lmicro(col("tot_r") + lit(buckets))))
        .as("w_micro"))
    tf.join(broadcast(w), "b")
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_feats"),
        sum(col("tf") * col("w_micro")).as("dsir_micro"))
  }

  /** DuckDB twin of [[dsirWeights]]; `targetSql` is the boolean target-
    * domain predicate over `table`'s columns. */
  def dsirWeightsSql(table: String, idCol: String, textCol: String,
                     targetSql: String, buckets: Int = 128): String = {
    import graft.functions.TextFunctions.{bigramsSql, hash32Sql, tokensSql}
    s"""WITH f AS (
       |  SELECT doc_id, is_t, ${hash32Sql("f")} % $buckets AS b
       |  FROM (
       |    SELECT $idCol AS doc_id, $targetSql AS is_t,
       |      unnest(${tokensSql(textCol)} || ${bigramsSql(textCol)}) AS f
       |    FROM $table)
       |), tf AS (
       |  SELECT doc_id, b, count(*) AS tf FROM f GROUP BY 1, 2
       |), per AS (
       |  SELECT b, count(*) AS cnt_r,
       |    sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS cnt_t
       |  FROM f GROUP BY 1
       |), tot AS (
       |  SELECT sum(cnt_r) AS tot_r, sum(cnt_t) AS tot_t FROM per
       |), w AS (
       |  SELECT b,
       |    (CAST(round(ln(cnt_t + 1) * 1000000.0) AS BIGINT)
       |     - CAST(round(ln(tot_t + $buckets) * 1000000.0) AS BIGINT))
       |    - (CAST(round(ln(cnt_r + 1) * 1000000.0) AS BIGINT)
       |       - CAST(round(ln(tot_r + $buckets) * 1000000.0) AS BIGINT)) AS w_micro
       |  FROM per, tot
       |)
       |SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_feats,
       |  CAST(sum(tf.tf * w.w_micro) AS BIGINT) AS dsir_micro
       |FROM tf JOIN w ON tf.b = w.b
       |GROUP BY 1""".stripMargin
  }
}
