package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators — the reproducibility-critical
  * counterpart of `df.sample()` for training-data pipelines: a corpus
  * sample must be identical across runs, engines, partitionings, and
  * retries, so selection is a pure function of the row key (a Knuth
  * multiplicative hash), never an RNG.
  *
  * Scale: both operators are narrow filters over the scan — no shuffle,
  * no driver state; the hash predicate pushes into codegen.
  */
object Sampling {

  /** Pseudo-random bucket in [0, 100) from a key column: Knuth
    * multiplicative hash — deterministic, uniform enough for rate
    * sampling, and trivially reproducible in any SQL engine.
    */
  def hashBucket(key: Column): Column =
    pmod(key.cast("long") * 2654435761L, lit(100L))

  /** Keep ~`percent`% of rows, deterministically by key. */
  def hashSample(df: DataFrame, key: Column, percent: Int): DataFrame =
    df.filter(hashBucket(key) < percent)

  /** Stratified deterministic sample: per-stratum keep-rates (percent by
    * stratum value; missing strata default to `defaultPercent`).
    */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Int], defaultPercent: Int = 0): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultPercent)) { case (acc, (value, pct)) =>
      when(stratum === value, lit(pct)).otherwise(acc)
    }
    df.filter(hashBucket(key) < rateCol)
  }
}
