package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{hash60, hash60Sql}

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

  def stratifiedSampleSql(table: String, stratumCol: String, keyCol: String,
                          rates: Seq[(String, Double)], defaultRate: Double,
                          salt: String = "strat"): String = {
    val h = s"${hash60Sql(s"CAST($keyCol AS VARCHAR) || '$salt'")} % 1000000"
    val cases = rates.map { case (stratum, rate) =>
      s"WHEN $stratumCol = '$stratum' THEN ${(rate * 1000000L).toLong}"
    }.mkString(" ")
    val bound = s"(CASE $cases ELSE ${(defaultRate * 1000000L).toLong} END)"
    s"SELECT * FROM $table WHERE $h < $bound"
  }

  def splitColumnSql(keyCol: String, valFrac: Double, testFrac: Double,
                     salt: String = "split"): String = {
    val valBound = (valFrac * 1000000L).toLong
    val testBound = valBound + (testFrac * 1000000L).toLong
    val h = s"${hash60Sql(s"CAST($keyCol AS VARCHAR) || '$salt'")} % 1000000"
    s"(CASE WHEN $h < $valBound THEN 'validation' " +
      s"WHEN $h < $testBound THEN 'test' ELSE 'train' END)"
  }
}
