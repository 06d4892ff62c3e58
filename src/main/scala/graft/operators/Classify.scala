package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{tokens, tokensSql}

/** Multinomial Naive Bayes over word tokens — the trainable analog of the
  * fasttext classifier every LLM data pipeline runs for language ID and
  * quality/domain routing. Training is two counting passes (class-token
  * counts + class priors with Laplace +1 smoothing over the shared
  * vocabulary); scoring is `argmax_c [ ln P(c) + Σ_t tf·ln P(t|c) ]`.
  * Every ln is rounded to integer micro-nats BEFORE any summing (the
  * d_surprisal discipline) and the argmax breaks ties on the class label,
  * so train + score replays exactly in SQL ([[naiveBayesSql]]).
  *
  * Scale shape: the corpus-sized shuffles are the (doc, token) tf
  * aggregation and the token-keyed scoring join; the model itself —
  * class-token likelihood grid — is vocabulary×L rows (L = #classes),
  * built from one map-side-combinable count and joined on token, never
  * collected. tf·likelihood stays far inside i64 (|likelihood_micro| ≤
  * ln(tot+V)·1e6 ≈ 10⁷·ln-scale). */
object Classify {

  /** Train on the full corpus and score every document. Output:
    * (doc_id, true_<labelCol>, pred_<labelCol>, score_micro) where
    * score_micro is the winning class's unnormalized log-posterior in
    * micro-nats (negative; higher = more confident). */
  def naiveBayes(docs: DataFrame, idCol: String, textCol: String,
                 labelCol: String): DataFrame =
    naiveBayesFromScored(docs, naiveBayesScored(docs, idCol, textCol, labelCol),
      idCol, labelCol)

  /** The full per-(doc, class) log-posterior frame (doc_id, lbl, score) —
    * the argmax over it is [[naiveBayes]]'s prediction, and a single
    * class's column sliced out of it is a RANKING signal ([[rocAuc]]
    * grades it). Exposed so both consumers share one train+score pass. */
  def naiveBayesScored(docs: DataFrame, idCol: String, textCol: String,
                       labelCol: String): DataFrame = {
    def lmicro(c: Column): Column = round(log(c) * 1e6, 0).cast("long")
    // ONE corpus explode feeds everything: the per-doc tf frame carries
    // the doc's label (doc → label is functional, so the extra key does
    // not change the groups), and the class-token counts, vocabulary and
    // grid token set all derive from it — the composed form re-exploded
    // the corpus four times (tf / cnt / voc / grid-distinct)
    val tf = graft.CacheScope.cached(
      docs.select(col(idCol).as("doc_id"), col(labelCol).as("lbl"),
          explode(tokens(col(textCol))).as("token"))
        .groupBy("doc_id", "lbl", "token").agg(count(lit(1)).as("tf")))
    val cnt = tf.groupBy("lbl", "token").agg(sum(col("tf")).as("n"))
    val tot = cnt.groupBy("lbl").agg(sum(col("n")).as("tot"))
    val voc = cnt.agg(countDistinct(col("token")).as("v"))
    val pri = docs.groupBy(col(labelCol).as("lbl"))
      .agg(count(lit(1)).as("nd"))
    val priN = pri.agg(sum(col("nd")).as("nn"))
    // vocabulary × classes likelihood grid; unseen (class, token) cells
    // surface via the left join and take the +1-smoothed floor
    val grid = cnt.select(col("token")).distinct()
      .crossJoin(broadcast(pri.select(col("lbl"))))
      .join(cnt, Seq("lbl", "token"), "left")
      .join(broadcast(tot), "lbl")
      .crossJoin(broadcast(voc))
      .select(col("lbl"), col("token"),
        (lmicro(coalesce(col("n"), lit(0L)) + lit(1)) -
          lmicro(col("tot") + col("v"))).as("likel_micro"))
    val prior = pri.crossJoin(broadcast(priN))
      .select(col("lbl"), (lmicro(col("nd")) - lmicro(col("nn"))).as("prior_micro"))
    tf.select("doc_id", "token", "tf").join(grid, "token")
      .groupBy("doc_id", "lbl")
      .agg(sum(col("tf") * col("likel_micro")).as("s"))
      .join(broadcast(prior), "lbl")
      .select(col("doc_id"), col("lbl"), (col("s") + col("prior_micro")).as("score"))
  }

  /** The argmax/attach tail of [[naiveBayes]] over a prebuilt
    * [[naiveBayesScored]] frame. */
  def naiveBayesFromScored(docs: DataFrame, scored: DataFrame,
                           idCol: String, labelCol: String): DataFrame = {
    // argmax with label tie-break: max(struct) compares score first, then
    // label — the same (max score, then max label) order the SQL twin takes
    val pred = scored.groupBy("doc_id")
      .agg(max(struct(col("score"), col("lbl"))).as("mx"))
      .select(col("doc_id"), col("mx.lbl").as(s"pred_$labelCol"),
        col("mx.score").as("score_micro"))
    docs.select(col(idCol).as("doc_id"), col(labelCol).as(s"true_$labelCol"))
      .join(pred, "doc_id")
  }

  /** Exact ROC-AUC of an integer ranking signal against a boolean label —
    * the Mann-Whitney U statistic with midrank tie handling, the number a
    * pipeline reads before trusting a quality/domain classifier's scores
    * as a filtering signal. Everything is integer until ONE final integer
    * division: per distinct score s with t rows (p positive), the doubled
    * midrank is 2·c_lt + t + 1 (c_lt = rows strictly below s), and
    * `auc_micro = (1e6·(Σ_pos 2mr − n_pos·(n_pos+1))) div (2·n_pos·n_neg)`
    * — engine-exact, no float anywhere. i64 headroom: the 1e6 scale
    * multiplies the U numerator (≤ 2·n_pos·n_neg ≤ n²/2), so exact
    * through n ≈ 4·10⁶ scored rows (shard the rank pass above, or drop
    * the 1e6 scale until after the division, to go further). Single-class
    * input (n_pos·n_neg = 0) yields NULL auc_micro in both engines via
    * the nullif guard — AUC is undefined with only one class.
    *
    * Scale shape: the ranking runs on the (score → t, p) aggregate via a
    * DISTRIBUTED prefix sum — range-repartition by score, per-partition
    * subtotals (one tiny frame), broadcast offsets, partition-local
    * cumulative window — never a single-partition global window. The
    * result is independent of where the range boundaries land (prefix
    * sums recombine exactly), so the output stays deterministic.
    *
    * `df` must carry `scoreCol` (integral) and `posCol` (boolean).
    * Returns one row: (n_pos, n_neg, auc_micro). */
  def rocAuc(df: DataFrame, scoreCol: String, posCol: String): DataFrame = {
    val grp = df.groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("t"),
        sum(when(col(posCol), 1L).otherwise(0L)).as("p"))
    val nParts = math.max(df.sparkSession.sparkContext.defaultParallelism / 2, 1)
    // pinned: the pid column is a physical artifact — both consumers
    // (offsets, midranks) must see the SAME materialized assignment
    val ranged = graft.CacheScope.cached(
      grp.repartitionByRange(nParts, col("s"))
        .withColumn("pid", org.apache.spark.sql.functions.spark_partition_id()))
    // per-partition totals are one row per partition — the offset frame is
    // tiny by construction, so ITS cumulative window may run unpartitioned
    val wOff = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy("pid").agg(sum(col("t")).as("pt"))
      .withColumn("off", coalesce(sum(col("pt")).over(wOff), lit(0L)))
      .select("pid", "off")
    val wIn = Window.partitionBy(col("pid")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val mr = ranged.join(broadcast(offsets), "pid")
      .withColumn("c_lt",
        col("off") + coalesce(sum(col("t")).over(wIn), lit(0L)))
      .select(col("t"), col("p"),
        (col("p") * (lit(2L) * col("c_lt") + col("t") + lit(1L))).as("pos2mr"))
    mr.agg(sum(col("p")).as("n_pos"), sum(col("t") - col("p")).as("n_neg"),
        sum(col("pos2mr")).as("s2mr"))
      .select(col("n_pos"), col("n_neg"),
        expr("(1000000 * (s2mr - n_pos * (n_pos + 1))) div nullif(2 * n_pos * n_neg, 0)")
          .as("auc_micro"))
  }

  /** DuckDB twin of [[naiveBayesScored]]: CTE fragments (tok..scored, no
    * WITH prefix) over `table`(idCol, textCol, labelCol); the per-(doc,
    * class) log-posteriors land in `scored`(doc_id, lbl, score). */
  def naiveBayesScoredCte(table: String, idCol: String, textCol: String,
                          labelCol: String): String =
    s"""tok AS (
       |  SELECT $idCol AS doc_id, $labelCol AS lbl,
       |    unnest(${tokensSql(textCol)}) AS token
       |  FROM $table
       |), tf AS (
       |  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
       |), cnt AS (
       |  SELECT lbl, token, count(*) AS n FROM tok GROUP BY 1, 2
       |), tot AS (
       |  SELECT lbl, sum(n) AS tot FROM cnt GROUP BY 1
       |), voc AS (
       |  SELECT count(DISTINCT token) AS v FROM tok
       |), pri AS (
       |  SELECT $labelCol AS lbl, count(*) AS nd FROM $table GROUP BY 1
       |), prin AS (
       |  SELECT sum(nd) AS nn FROM pri
       |), grid AS (
       |  SELECT l.lbl, t.token,
       |    CAST(round(ln(coalesce(c.n, 0) + 1) * 1000000.0) AS BIGINT)
       |      - CAST(round(ln(tot.tot + voc.v) * 1000000.0) AS BIGINT)
       |      AS likel_micro
       |  FROM (SELECT DISTINCT token FROM tok) t
       |  CROSS JOIN (SELECT lbl FROM pri) l
       |  LEFT JOIN cnt c ON c.lbl = l.lbl AND c.token = t.token
       |  JOIN tot ON tot.lbl = l.lbl
       |  CROSS JOIN voc
       |), prior AS (
       |  SELECT lbl,
       |    CAST(round(ln(nd) * 1000000.0) AS BIGINT)
       |      - CAST(round(ln(nn) * 1000000.0) AS BIGINT) AS prior_micro
       |  FROM pri, prin
       |), scored AS (
       |  SELECT s.doc_id, s.lbl, s.s + prior.prior_micro AS score
       |  FROM (
       |    SELECT tf.doc_id, grid.lbl, sum(tf.tf * grid.likel_micro) AS s
       |    FROM tf JOIN grid ON tf.token = grid.token
       |    GROUP BY 1, 2) s
       |  JOIN prior ON prior.lbl = s.lbl
       |)""".stripMargin

  /** DuckDB twin of [[naiveBayes]] over `table`(idCol, textCol, labelCol). */
  def naiveBayesSql(table: String, idCol: String, textCol: String,
                    labelCol: String): String =
    s"""WITH ${naiveBayesScoredCte(table, idCol, textCol, labelCol)}, best AS (
       |  SELECT doc_id, max(score) AS ms FROM scored GROUP BY 1
       |), pred AS (
       |  SELECT s.doc_id, max(s.lbl) AS pred_lbl, max(s.score) AS score_micro
       |  FROM scored s JOIN best b ON b.doc_id = s.doc_id AND s.score = b.ms
       |  GROUP BY 1
       |)
       |SELECT d.$idCol AS doc_id, d.$labelCol AS true_$labelCol,
       |  p.pred_lbl AS pred_$labelCol, CAST(p.score_micro AS BIGINT) AS score_micro
       |FROM $table d JOIN pred p ON p.doc_id = d.$idCol""".stripMargin
}
