package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — exact, one broadcast of the query
  * set, no shuffle of the corpus (the corpus scan stays partition-local;
  * only k rows per query per partition survive into the final top-k).
  *
  * Scale path: random-hyperplane LSH bucketing — each vector lands in a
  * small number of buckets, candidate generation is a bucket join, and the
  * exact cosine reranks only candidates. Hyperplanes are deterministic
  * (seeded md5 bits) so results are reproducible across runs/engines.
  *
  * All vector math is `functions.zip_with`/`aggregate` composition over
  * doubles — codegen'd, no UDFs. */
object Similarity {

  /** Σ a_i b_i with left-to-right accumulation (same order as DuckDB's
    * list functions, so rounded results agree across engines). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector. `queries` and
    * `corpus` both carry (id, vec: array<double>); self-matches excluded.
    * Queries are broadcast (the small side by construction). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("id").as("query_id"), col("vec").as("qvec")))
    val scored = corpus.select(col("id").as("vec_id"), col("vec"))
      .crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qvec"), col("vec")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  // ------------------------------------------------- LSH (scale path)
  /** Number of random hyperplanes = signature bits; vectors whose signs
    * agree on all bits share a bucket. */
  val LshBits = 12
  val LshDim = 64

  /** Deterministic pseudo-random hyperplanes: component j of plane i is
    * derived from md5(i_j) mapped to [-0.5, 0.5). Reproducible everywhere
    * with no RNG state. */
  lazy val hyperplanes: IndexedSeq[IndexedSeq[Double]] =
    (0 until LshBits).map { i =>
      (0 until LshDim).map { j =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"plane_${i}_$j".getBytes("UTF-8"))
        val v = java.nio.ByteBuffer.wrap(hex).getInt & 0x7fffffff
        (v.toDouble / Int.MaxValue.toDouble) - 0.5
      }
    }

  /** Bucket id: sign-bit signature of the vector against the hyperplanes. */
  def lshBucket(vec: Column): Column = {
    val bits = (0 until LshBits).map { i =>
      val plane = array(hyperplanes(i).map(lit): _*)
      when(dot(vec, plane) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: candidates share the query's bucket (multi-probe:
    * exact bucket plus 1-bit flips), reranked by exact cosine. Trades
    * recall for touching ~(1+bits)/2^bits of the corpus per query. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val bucketed = corpus.select(col("id").as("vec_id"), col("vec"),
      lshBucket(col("vec")).as("bucket"))
    val qb = queries.select(col("id").as("query_id"), col("vec").as("qvec"),
      lshBucket(col("vec")).as("qbucket"))
    // multi-probe: query bucket + all 1-bit flips (XOR with 1<<flip)
    val probed = qb.select(col("query_id"), col("qvec"),
        explode(array((-1 +: (0 until LshBits).toList).map(i => lit(i)): _*)).as("flip"),
        col("qbucket"))
      .withColumn("bucket", when(col("flip") === -1, col("qbucket"))
        .otherwise(expr("qbucket ^ CAST(pow(2, flip) AS BIGINT)")))
      .select("query_id", "qvec", "bucket").distinct()
    val cand = bucketed.join(broadcast(probed), "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qvec"), col("vec")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  /** Near-duplicate vector pairs: cosine >= threshold, candidates from
    * shared LSH buckets (no all-pairs product). */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val bucketed = corpus.select(col("id"), col("vec"),
      lshBucket(col("vec")).as("bucket"))
    val a = bucketed.select(col("bucket"), col("id").as("a"), col("vec").as("va"))
    val b = bucketed.select(col("bucket"), col("id").as("b"), col("vec").as("vb"))
    a.join(b, Seq("bucket")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), round(cosine(col("va"), col("vb")), 4).as("cos"))
      .distinct()
      .filter(col("cos") >= threshold)
  }

  /** Exact all-pairs near-dup (testdata-scale oracle-checkable form). */
  def cosineNearDupExact(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("id").as("a"), col("vec").as("va"))
    val b = corpus.select(col("id").as("b"), col("vec").as("vb"))
    a.join(b, col("a") < col("b"))
      .withColumn("cos", round(cosine(col("va"), col("vb")), 4))
      .filter(col("cos") >= threshold)
      .select("a", "b", "cos")
  }
}
