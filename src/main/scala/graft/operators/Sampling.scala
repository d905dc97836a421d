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
    * multiplicative hash with the low 16 product bits discarded before
    * the mod — deterministic, reproducible in any SQL engine, and
    * structure-resistant (a raw `key*C mod 100` residue would depend only
    * on the key's last decimal digits, so stride-100 keys would all land
    * in one bucket; dropping the low bits and modding the remaining ~46
    * mixes the full key). The key folds to 31 bits first so the multiply
    * can't overflow int64 (ANSI mode makes overflow an error, not a wrap).
    *
    * Contract: keys are expected non-negative (pmod keeps negatives
    * uniform on the Spark side, but plain SQL `%` follows the dividend's
    * sign — mirror the pmod explicitly if negative ids must replay in an
    * oracle); a NULL key never passes the filter (NULL bucket compares
    * NULL), so null-key rows are dropped even at percent=100.
    */
  def hashBucket(key: Column): Column =
    pmod(shiftright(pmod(key.cast("long"), lit(2147483648L)) * 2654435761L,
      16), lit(100L))

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
