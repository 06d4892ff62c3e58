package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data export: the output stage of the pipeline — newline-
  * delimited JSON (the de-facto LLM training-data interchange format),
  * sharded to a bounded per-file row count so downstream loaders stream
  * shards independently.
  *
  * Sharding is `repartitionByRange` on the caller's order column: shard
  * boundaries come from range sampling, so files are approximately equal
  * AND globally ordered across shards (shard 0 holds the smallest keys) —
  * the layout data loaders expect for deterministic epoch iteration.
  * Compression is codec-pluggable (gzip default: splittable-per-shard is
  * what matters, shards are the parallelism unit). */
object Export {

  /** Write `df` as ~`maxRowsPerShard`-row JSONL shards ordered by
    * `orderCol`. Returns the shard count. */
  def jsonlShards(df: DataFrame, orderCol: String, outDir: String,
                  maxRowsPerShard: Long, compression: String = "gzip"): Int = {
    require(maxRowsPerShard > 0, "maxRowsPerShard > 0")
    val n = df.count()
    val shards = math.max(1, math.ceil(n.toDouble / maxRowsPerShard).toInt)
    df.repartitionByRange(shards, col(orderCol))
      .sortWithinPartitions(orderCol)
      .write.mode("overwrite")
      .option("compression", compression)
      .json(outDir)
    shards
  }

  /** Read a JSONL shard directory back (schema inferred or supplied). */
  def readJsonl(spark: SparkSession, dir: String): DataFrame =
    spark.read.json(dir)
}
