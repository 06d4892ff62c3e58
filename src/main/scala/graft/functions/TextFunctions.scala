package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis primitives for the training-data pipeline surface:
  * tokenization, token counting, quality scoring, document fingerprinting
  * and a stopword-profile language-ID heuristic.
  *
  * Every function here is pure `org.apache.spark.sql.functions` composition
  * — codegen'd, no UDFs — and each has a DuckDB-SQL twin generated from the
  * same constants (the `*Sql` members) so the driver oracle computes the
  * identical definition. */
object TextFunctions {

  /** Whitespace tokenization after trim (both engines split identically on
    * `\s+` once the string is trimmed). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")
  def tokensSql(c: String): String = s"regexp_split_to_array(trim($c), '\\s+')"

  /** Token count (whitespace tokens; a BPE-ish regex token count is
    * provided separately). */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, 0).otherwise(size(tokens(c)))
  def tokenCountSql(c: String): String =
    s"CAST(CASE WHEN length(trim($c)) = 0 THEN 0 ELSE len(${tokensSql(c)}) END AS INT)"

  /** BPE-ish subword proxy: count of non-overlapping word/number/punct
    * matches — a deterministic stand-in for a real tokenizer's token count.
    * Implemented by stripping everything that is NOT a match boundary. */
  def regexTokenCount(c: Column): Column =
    size(filter(split(c, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"), x => length(x) > 0))

  /** Normalized fingerprint: md5 of lowercased, whitespace-collapsed text
    * (rolling-hash-style document identity). */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(trim(lower(c)), "\\s+", " "))
  def fingerprintSql(c: String): String =
    s"md5(regexp_replace(trim(lower($c)), '\\s+', ' ', 'g'))"

  /** First 15 hex chars of md5 as a positive 60-bit long — the shared
    * deterministic 64-bit-ish hash both engines can compute exactly. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
  def hash60Sql(c: String): String =
    s"CAST('0x' || substring(md5($c), 1, 15) AS BIGINT)"

  /** 32-bit variant used where products must stay in i64 range. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")
  def hash32Sql(c: String): String =
    s"CAST('0x' || substring(md5($c), 1, 8) AS BIGINT)"

  // ------------------------------------------------------------- quality
  /** Stopword list for quality scoring (tiny, deterministic). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "in", "on", "to", "is")

  def stopwordCount(toks: Column): Column = {
    val sw = array(Stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(sw, t)))
  }
  def stopwordCountSql(toksExpr: String): String = {
    val list = Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter($toksExpr, t -> list_contains($list, t)))"
  }

  /** Punctuation character count. */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[.,!?;:'\"()\\-]", ""))
  def punctCountSql(c: String): String =
    s"""length($c) - length(regexp_replace($c, '[.,!?;:''"()\\-]', '', 'g'))"""

  /** Word 2-grams ([] when fewer than 2 tokens) — fused native loop
    * ([[WordBigrams]]); the token split is evaluated once per row, not once
    * per bigram as the composed transform/slice form would. */
  def bigrams(c: Column): Column =
    NgramExpressions.bigramsNative(tokens(c))
  def bigramsSql(c: String): String = {
    val w = tokensSql(c)
    s"""list_transform(generate_series(1, greatest(len($w) - 1, 0)),
       |  i -> ($w)[i] || ' ' || ($w)[i+1])""".stripMargin
  }

  /** Repetition signal (Gopher-style quality filter): fraction of word
    * 2-grams that are repeats of an earlier 2-gram in the same document.
    * High ratio = boilerplate/spam/looping text. Returned as exact integer
    * counts plus the rounded ratio so thresholds replay across engines. */
  def repetitionCounts(c: Column): (Column, Column) = {
    // total bigram count derives from the token count alone — building the
    // bigram array (an interpreted higher-order transform) only to size it
    // would evaluate the lambda a second time per row
    val n = greatest(size(tokens(c)) - 1, lit(0))
    (n, size(array_distinct(bigrams(c))))
  }

  /** Scale form of [[repetitionCounts]]: (doc_id, n_bigrams, n_distinct)
    * for every document. The column form's `transform`/`array_distinct`
    * run interpreted lambdas per element; this one is explode + window
    * lead + count(distinct) — fully codegen'd relational plan, ~8x faster
    * on a large corpus, identical counts (spec-pinned). Docs with < 2
    * tokens keep (0, 0) via the left join. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      greatest(size(tokens(col(textCol))) - 1, lit(0)).as("n_bigrams"))
    val tok = docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("i", "t")))
    val w = Window.partitionBy("doc_id").orderBy("i")
    val nd = tok.withColumn("nxt", lead("t", 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("t"), col("nxt")).as("bg"))
      .groupBy("doc_id")
      .agg(count_distinct(col("bg")).cast("int").as("n_distinct"))
    base.join(nd, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_bigrams"),
        coalesce(col("n_distinct"), lit(0)).as("n_distinct"))
  }

  // ---------------------------------------------------------- surprisal
  /** Corpus-relative unigram surprisal (the CCNet-style "how unusual is
    * this document against its own corpus" quality signal, with the
    * corpus itself as the language model): per doc,
    * `Σ_t tf(t) · (ln N − ln cnt(t))` — high = rare-token-heavy.
    *
    * Exact-replay form: each ln is rounded to integer MICRO-NATS first
    * (`round(ln(x)·1e6)` — deterministic across engines on identical
    * integer inputs), then summed as plain i64 — an order-free integer
    * sum, so partial-aggregation order can never perturb the result the
    * way a float Σln would. Output: (doc_id, n_tokens, surprisal_micro,
    * mean_micro = surprisal_micro div n_tokens).
    *
    * Scale shape: two map-side-combinable aggregations (tf per (doc,
    * token), corpus counts per token) + one join keyed on token; the
    * token-count side is vocabulary-sized. i64 headroom: terms are
    * ≤ tf · ln(N)·1e6 < 2^63 for any corpus below ~10^13 tokens/doc. */
  def surprisalStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("token"))
    val tf = graft.CacheScope.cached(
      tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf")))
    val cnt = tf.groupBy("token").agg(sum("tf").as("cnt"))
    val totals = cnt.agg(sum("cnt").as("n_total"))
    def lmicro(c: Column): Column = round(log(c) * 1e6, 0).cast("long")
    tf.join(cnt, "token")
      .crossJoin(broadcast(totals))
      .withColumn("term",
        col("tf") * (lmicro(col("n_total")) - lmicro(col("cnt"))))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"), sum("term").as("surprisal_micro"))
      .select(col("doc_id"), col("n_tokens"), col("surprisal_micro"),
        expr("surprisal_micro div n_tokens").as("mean_micro"))
  }

  def surprisalStatsSql(table: String, idCol: String, textCol: String): String =
    s"""WITH tok AS (
       |  SELECT $idCol AS doc_id, unnest(${tokensSql(textCol)}) AS token FROM $table
       |), tf AS (
       |  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
       |), cnt AS (
       |  SELECT token, sum(tf) AS cnt FROM tf GROUP BY 1
       |), tot AS (
       |  SELECT sum(cnt) AS n_total FROM cnt
       |), agg AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       |    CAST(sum(tf * (CAST(round(ln(n_total) * 1000000.0) AS BIGINT)
       |                 - CAST(round(ln(cnt) * 1000000.0) AS BIGINT))) AS BIGINT)
       |      AS surprisal_micro
       |  FROM tf JOIN cnt USING (token) CROSS JOIN tot
       |  GROUP BY doc_id
       |)
       |SELECT doc_id, n_tokens, surprisal_micro,
       |  CAST(surprisal_micro // n_tokens AS BIGINT) AS mean_micro
       |FROM agg ORDER BY doc_id""".stripMargin

  /** Within-document token entropy — the repetitiveness/diversity quality
    * signal that needs NO corpus statistics (unlike [[surprisalStats]],
    * which scores docs against the corpus LM): per doc,
    * `n·H = Σ_t tf·(ln n − ln tf)` in micro-nats, plus the distinct-type
    * count (type-token ratio numerator). Low entropy = repetitive/
    * boilerplate; high = diverse. Same exact-replay form — every ln is
    * rounded to integer micro-nats BEFORE the order-free i64 sum
    * ([[tokenEntropySql]]).
    *
    * Scale shape: one (doc, token) map-side-combinable aggregation; no
    * join against anything corpus-sized (the per-doc total rides the same
    * groupBy). */
  def tokenEntropyStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    def lmicro(c: Column): Column = round(log(c) * 1e6, 0).cast("long")
    val per = tf.groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("tf") * lmicro(col("tf"))).as("tl"))
    per.select(col("doc_id"), col("n_tokens"), col("n_types"),
      (col("n_tokens") * lmicro(col("n_tokens")) - col("tl")).as("ent_micro"))
  }

  def tokenEntropySql(table: String, idCol: String, textCol: String): String =
    s"""WITH tok AS (
       |  SELECT $idCol AS doc_id, unnest(${tokensSql(textCol)}) AS token FROM $table
       |), tf AS (
       |  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
       |)
       |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       |  CAST(count(*) AS BIGINT) AS n_types,
       |  CAST(sum(tf) * CAST(round(ln(sum(tf)) * 1000000.0) AS BIGINT)
       |    - sum(tf * CAST(round(ln(tf) * 1000000.0) AS BIGINT)) AS BIGINT)
       |    AS ent_micro
       |FROM tf GROUP BY doc_id""".stripMargin

  /** Bigram conditional surprisal — the next-word form of
    * [[surprisalStats]]: per doc, `Σ tf(p,c) · (ln cnt(p·) − ln cnt(p,c))`
    * ≈ −Σ ln P(cur|prev) under the corpus bigram LM (cnt(p·) = bigram
    * instances with context p, so probabilities normalize per context).
    * Same exact-replay construction: each ln rounded to integer micro-nats
    * first, then an order-free i64 sum. Docs with < 2 tokens get (0, 0, 0)
    * via the left join. Scale shape mirrors the unigram form: two
    * map-side-combinable counts + one vocabulary-keyed join. */
  def bigramSurprisalStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // bigrams form row-side in one codegen'd pass (no posexplode + per-doc
    // window sort — adjacency is already explicit in the token array)
    val bg = docs.select(col(idCol).as("doc_id"),
      explode(bigrams(col(textCol))).as("bg"))
    // no explicit persist: tf and cntBi each appear twice as IDENTICAL
    // subplans, so their shuffle output is shared via ReusedExchange —
    // measured faster than MEMORY_AND_DISK persists at every scale tried
    // (a persist adds serialization + a materialization barrier; reuse is
    // free) and nothing extra to evict on a 1000-executor cluster
    val tf = bg.groupBy("doc_id", "bg").agg(count(lit(1)).as("tf"))
    val cntBi = tf.groupBy("bg").agg(sum("tf").as("cnt_bi"))
    val cntCtx = cntBi
      .groupBy(substring_index(col("bg"), " ", 1).as("prev"))
      .agg(sum("cnt_bi").as("cnt_ctx"))
    def lmicro(c: Column): Column = round(log(c) * 1e6, 0).cast("long")
    // score per bigram TYPE first (vocabulary-sized joins), then hit the
    // occurrence-level tf frame exactly once — the old shape shuffled the
    // token-level frame twice (on bg, then again on prev)
    val perBg = cntBi
      .withColumn("prev", substring_index(col("bg"), " ", 1))
      .join(cntCtx, "prev")
      .select(col("bg"), (lmicro(col("cnt_ctx")) - lmicro(col("cnt_bi"))).as("s"))
    val scored = tf.join(perBg, "bg")
      .groupBy("doc_id")
      .agg(sum("tf").as("n_bigrams"), sum(col("tf") * col("s")).as("surprisal_micro"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("surprisal_micro"), lit(0L)).as("surprisal_micro"),
        coalesce(expr("surprisal_micro div n_bigrams"), lit(0L)).as("mean_micro"))
  }

  def bigramSurprisalStatsSql(table: String, idCol: String, textCol: String): String =
    s"""WITH bgr AS (
       |  SELECT $idCol AS doc_id, unnest(${bigramsSql(textCol)}) AS bg FROM $table
       |), tf AS (
       |  SELECT doc_id, bg, count(*) AS tf FROM bgr GROUP BY 1, 2
       |), cntbi AS (
       |  SELECT bg, sum(tf) AS cnt_bi FROM tf GROUP BY 1
       |), cntctx AS (
       |  SELECT split_part(bg, ' ', 1) AS prev, sum(cnt_bi) AS cnt_ctx
       |  FROM cntbi GROUP BY 1
       |), agg AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
       |    CAST(sum(tf * (CAST(round(ln(cnt_ctx) * 1000000.0) AS BIGINT)
       |                 - CAST(round(ln(cnt_bi) * 1000000.0) AS BIGINT))) AS BIGINT)
       |      AS surprisal_micro
       |  FROM tf
       |  JOIN cntbi USING (bg)
       |  JOIN cntctx ON split_part(bg, ' ', 1) = cntctx.prev
       |  GROUP BY doc_id
       |)
       |SELECT d.$idCol AS doc_id,
       |  CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |  CAST(coalesce(a.surprisal_micro, 0) AS BIGINT) AS surprisal_micro,
       |  CAST(coalesce(a.surprisal_micro // a.n_bigrams, 0) AS BIGINT) AS mean_micro
       |FROM $table d LEFT JOIN agg a ON d.$idCol = a.doc_id
       |ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------- pii scrub
  /** Redaction patterns shared by both engines. Kept to the regex subset
    * where Java regex and DuckDB's RE2 agree exactly (character classes,
    * bounded repetition — no backrefs, no lookaround). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9\\- ]{6,}[0-9]"

  /** Count of email/phone matches (for redaction accounting). */
  def emailCount(c: Column): Column = regexp_count(c, lit(EmailPattern))
  def phoneCount(c: Column): Column = regexp_count(c, lit(PhonePattern))
  def emailCountSql(c: String): String =
    s"CAST(len(regexp_extract_all($c, '$EmailPattern')) AS INT)"
  def phoneCountSql(c: String): String =
    s"CAST(len(regexp_extract_all($c, '$PhonePattern')) AS INT)"

  /** PII scrub: emails then phone numbers replaced with typed redaction
    * tags. Email first — the local part contains digits, so scrubbing
    * phones first could chew into an address. Pure codegen'd
    * regexp_replace, no UDF. */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")
  def scrubPiiSql(c: String): String =
    s"regexp_replace(regexp_replace($c, '$EmailPattern', '<EMAIL>', 'g'), " +
      s"'$PhonePattern', '<PHONE>', 'g')"

  // -------------------------------------------------------------- langid
  /** Stopword profiles per language — a classic n-gram/function-word
    * language-ID heuristic. Scores = profile-hit counts over tokens;
    * prediction = argmax with fixed precedence order for ties. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "an", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "de", "que", "un", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "这", "人"))

  def langScore(toks: Column, profile: Seq[String]): Column = {
    val sw = array(profile.map(lit): _*)
    size(filter(toks, t => array_contains(sw, t)))
  }

  /** Predicted language: argmax score, ties broken by profile order,
    * "und" (undetermined) when every score is zero. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangProfiles.map { case (lang, prof) => lang -> langScore(toks, prof) }
    val maxScore = greatest(scores.map(_._2): _*)
    val pick = scores.foldRight(lit("und")) { case ((lang, sc), acc) =>
      when(sc === maxScore && maxScore > 0, lit(lang)).otherwise(acc)
    }
    // foldRight gives earlier profiles precedence on ties
    pick
  }

  def langIdSql(c: String): String = {
    val toks = tokensSql(c)
    def scoreSql(prof: Seq[String]): String = {
      val list = prof.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter($toks, t -> list_contains($list, t)))"
    }
    val scores = LangProfiles.map { case (lang, prof) => lang -> scoreSql(prof) }
    val maxExpr = scores.map(_._2).mkString("greatest(", ", ", ")")
    val cases = scores.map { case (lang, sc) =>
      s"WHEN $sc = $maxExpr AND $maxExpr > 0 THEN '$lang'"
    }.mkString(" ")
    s"(CASE $cases ELSE 'und' END)"
  }
}
