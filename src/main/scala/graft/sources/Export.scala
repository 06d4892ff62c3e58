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

  /** RFC-4180 CSV shards — the lowest-common-denominator interchange
    * sink: quote-doubling escape (not backslash — Spark's default escape
    * breaks RFC readers), header row, explicit null sentinel so empty
    * string and NULL stay distinct. Same range-sharding contract as
    * [[jsonlShards]]. Caveat a loader must know: CSV is schemaless, so
    * the reader supplies the schema ([[readCsv]]); embedded newlines
    * require multiLine=true on read (set here) which makes gzip shards
    * the parallelism unit, same as JSONL. */
  def csvShards(df: DataFrame, orderCol: String, outDir: String,
                maxRowsPerShard: Long, compression: String = "gzip"): Int = {
    require(maxRowsPerShard > 0, "maxRowsPerShard > 0")
    val n = df.count()
    val shards = math.max(1, math.ceil(n.toDouble / maxRowsPerShard).toInt)
    df.repartitionByRange(shards, col(orderCol))
      .sortWithinPartitions(orderCol)
      .write.mode("overwrite")
      .option("compression", compression)
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .option("nullValue", "\\N")
      .csv(outDir)
    shards
  }

  /** ORC shards — the other columnar interchange format (the Hive/Trino
    * ecosystem's parquet sibling): same range-sharding contract as
    * [[jsonlShards]]. ORC carries its own schema plus per-stride min/max
    * stats, so readers prune like parquet; zlib is the format's
    * interoperable default codec. */
  def orcShards(df: DataFrame, orderCol: String, outDir: String,
                maxRowsPerShard: Long, compression: String = "zlib"): Int = {
    require(maxRowsPerShard > 0, "maxRowsPerShard > 0")
    val n = df.count()
    val shards = math.max(1, math.ceil(n.toDouble / maxRowsPerShard).toInt)
    df.repartitionByRange(shards, col(orderCol))
      .sortWithinPartitions(orderCol)
      .write.mode("overwrite")
      .option("compression", compression)
      .orc(outDir)
    shards
  }

  /** Read an ORC shard directory back (schema from the files). */
  def readOrc(spark: SparkSession, dir: String): DataFrame =
    spark.read.orc(dir)

  /** Read a CSV shard directory back with the caller's schema (CSV
    * carries none) and the same quoting/null conventions the writer
    * used. */
  def readCsv(spark: SparkSession, dir: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .option("nullValue", "\\N")
      .option("multiLine", "true")
      .csv(dir)

  /** Hive-partitioned parquet export — the columnar training-shard layout:
    * one directory per `partitionCol` value (e.g. lang=en/), each holding
    * ~`maxRowsPerShard`-row files. Readers then PRUNE partitions from the
    * path alone (`WHERE lang = 'en'` never opens other directories — the
    * 100 TB mixture-selection read path), and per-partition shard counts
    * bound file sizes the same way [[jsonlShards]] does.
    *
    * The pre-write `repartition(partitionCol, bucket)` matters at scale:
    * partitionBy alone makes EVERY input task write a file into EVERY
    * partition directory (tasks × partitions small files); clustering by
    * (partition, hash-bucket) first yields exactly one file per partition
    * per bucket. */
  def partitionedParquet(df: DataFrame, partitionCol: String, keyCol: String,
                         outDir: String, maxRowsPerShard: Long,
                         compression: String = "snappy"): Long = {
    require(maxRowsPerShard > 0, "maxRowsPerShard > 0")
    // one stats pass: largest partition (sets the bucket count) and the
    // partition count (sets the explicit shuffle width below)
    val statsRow = df.groupBy(col(partitionCol)).count()
      .agg(max(col("count")), count(lit(1))).head
    val maxPer = if (statsRow.isNullAt(0)) 0L else statsRow.getLong(0)
    val nParts = statsRow.getLong(1)
    val buckets = math.max(1, math.ceil(maxPer.toDouble / maxRowsPerShard).toInt)
    // the explicit width matters: repartition(cols) alone hashes the
    // (partition, bucket) groups into the DEFAULT shuffle-partition count,
    // so several groups can collide into one task and be written as a
    // single merged several-×-maxRowsPerShard file. One shuffle partition
    // per (partition, bucket) group keeps the bound real (hash collisions
    // can still merge two groups, so it is tight-in-expectation, exact
    // only per colliding pair — document, don't overpromise).
    val width = math.max(1L, nParts * buckets)
      .min(Int.MaxValue.toLong).toInt
    df.withColumn("__bucket", pmod(xxhash64(col(keyCol)), lit(buckets)))
      .repartition(width, col(partitionCol), col("__bucket"))
      .drop("__bucket")
      .write.mode("overwrite")
      .option("compression", compression)
      .partitionBy(partitionCol)
      .parquet(outDir)
    maxPer
  }

  /** Read a partitioned parquet export back (partition column restored
    * from the directory layout). */
  def readPartitionedParquet(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
