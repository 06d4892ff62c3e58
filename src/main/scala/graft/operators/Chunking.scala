package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Token-window document chunking — the context-length segmentation step of
  * a training-data pipeline (long documents split into model-sized windows,
  * adjacent windows overlapping by `window - stride` tokens so no span is
  * lost at a boundary).
  *
  * Chunk starts are 0, stride, 2*stride, ... and stop once a window
  * reaches the document end (no redundant tail chunk whose tokens the
  * previous window already covered): K = 1 + max(0, ceil((n-window)/
  * stride)). Every document yields at least one chunk; only the last can
  * be shorter than `window`. Purely row-local: no shuffle, no state — at
  * 100 TB this is a map-only stage that scales with input splits. */
object Chunking {

  /** (doc_id, chunk_id, n_tokens, chunk) — overlapping token windows.
    *
    * The token array is materialized once per document row and each
    * exploded chunk start slices it (`Generate` is a projection barrier, so
    * the split is NOT re-evaluated per chunk — the transform/slice-in-lambda
    * form would re-split the text once per chunk, O(n²/stride)). */
  def tokenChunks(docs: DataFrame, idCol: String, textCol: String,
                  window: Int, stride: Int): DataFrame = {
    require(window >= 1, "window >= 1")
    require(stride >= 1 && stride <= window, "1 <= stride <= window")
    docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0),
          greatest(lit(0),
            ceil((col("n") - window) / stride)).cast("int"))).as("chunk_id"))
      .select(
        col("doc_id"),
        col("chunk_id"),
        least(lit(window), col("n") - col("chunk_id") * stride).as("n_tokens"),
        array_join(
          slice(col("toks"), col("chunk_id") * stride + 1, lit(window)),
          " ").as("chunk"))
  }

  /** DuckDB twin: identical starts, 1-based inclusive list slice (DuckDB
    * `w[a:b]` == Spark `slice(w, a, b-a+1)`, both clamp past the end). */
  def tokenChunksSql(table: String, idCol: String, textCol: String,
                     window: Int, stride: Int): String =
    s"""WITH tk AS (
       |  SELECT $idCol AS doc_id, ${TextFunctions.tokensSql(textCol)} AS w
       |  FROM $table
       |), ch AS (
       |  SELECT doc_id, w,
       |    unnest(generate_series(0,
       |      greatest(0, CAST(ceil((len(w) - $window) / $stride) AS INT))))
       |      AS chunk_id
       |  FROM tk
       |)
       |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       |  CAST(least($window, len(w) - chunk_id * $stride) AS INT) AS n_tokens,
       |  array_to_string(
       |    w[chunk_id * $stride + 1 : chunk_id * $stride + $window],
       |    ' ') AS chunk
       |FROM ch""".stripMargin
}
