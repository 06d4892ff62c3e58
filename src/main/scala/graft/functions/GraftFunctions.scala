package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import graft.operators.Dedup

/** SQL-facing registration of the engine's custom functions (the
  * `hash_func` extension point of the reference, graph.py:41-43, 82-90,
  * generalized): after `GraftFunctions.register(spark)`, `graft_dot`,
  * `graft_l2norm` and `graft_minhash` are callable from `spark.sql`. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "graft_l2norm", exprs => L2Norm(exprs.head), "built-in")
    registry.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs.head), "built-in")
    spark.udf.register("graft_minhash", org.apache.spark.sql.functions.udaf(MinHashAggregator))
  }
}

/** MinHash signature as a typed `Aggregator[IN, BUF, OUT]` — the custom-
  * aggregation extension path (SURVEY §2.10/§7.3): merges element-wise
  * minima of the k hash values of each shingle hash. Produces the same
  * signature as Dedup.minhashSignatures' k min-columns (asserted in
  * DedupAggregatorSpec); useful when the signature must ride through a
  * single `agg()` as one array column (e.g. per-group dedup inside another
  * aggregation).
  *
  * Input is the 32-bit shingle hash (see TextFunctions.hash32), buffer and
  * output are the length-k signature. Commutative + associative merge =>
  * map-side partial aggregation applies. */
object MinHashAggregator extends Aggregator[Long, Array[Long], Array[Long]] {
  import Dedup.{CoeffA, CoeffB, MinhashP, NumHashes}

  def zero: Array[Long] = Array.fill(NumHashes)(Long.MaxValue)

  def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < NumHashes) {
      val v = (CoeffA(i) * h + CoeffB(i)) % MinhashP
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  def finish(buf: Array[Long]): Array[Long] = buf

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
