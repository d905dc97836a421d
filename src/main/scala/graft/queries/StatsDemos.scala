package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.RelationalDemos.Demo
import graft.sources.Tables

/** Statistical aggregates over the events stream — the corpus-profiling
  * ops a training-data pipeline runs constantly (value distributions,
  * outlier bounds).
  *
  * Parity design: values quantize to exact integer cents, so Σx and Σx²
  * are exact longs regardless of partial-aggregation order; variance and
  * stddev are then single deterministic double expressions. Percentiles
  * use Spark's exact `percentile` vs DuckDB's `quantile_cont` — the same
  * linear interpolation on sorted values.
  */
object StatsDemos {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // -------------------------------------------------------------------
  // X9a: moments per event_type — n, mean, sample stddev from exact
  // integer power sums (shuffle carries 3 longs per group).
  // -------------------------------------------------------------------
  private val x9a = Demo("x9a_moments", Some("""
      WITH c AS (SELECT event_type, cast(round(value * 100) AS bigint) AS cents
                 FROM events)
      SELECT event_type,
             count(*) AS n,
             cast(sum(cents) AS double) / count(*) / 100 AS mean_value,
             CASE WHEN count(*) > 1 THEN
               sqrt((count(*) * cast(sum(cents * cents) AS double)
                     - cast(sum(cents) AS double) * cast(sum(cents) AS double))
                    / (cast(count(*) AS double) * (count(*) - 1))) / 100
             ELSE NULL END AS stddev_value
      FROM c
      GROUP BY event_type
      ORDER BY event_type ASC NULLS LAST"""),
    (s, dir) => {
      val cents = round(col("value") * 100).cast("long")
      t(s, dir, "events")
        .select(col("event_type"), cents.as("cents"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents")).as("sx"),
          sum(col("cents") * col("cents")).as("sxx"))
        .select(col("event_type"), col("n"),
          (col("sx").cast("double") / col("n") / 100).as("mean_value"),
          // n = 1 would divide by zero — ANSI mode (Spark 4 default) makes
          // that an error, not a NULL, so guard singleton groups explicitly
          when(col("n") > 1,
            sqrt((col("n") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
              / (col("n").cast("double") * (col("n") - 1))) / 100)
            .otherwise(lit(null)).as("stddev_value"))
        .orderBy(col("event_type").asc_nulls_last)
    })

  // -------------------------------------------------------------------
  // X9b: exact interpolated percentiles (p50/p90/p99) per event_type on
  // the integer cents — Spark `percentile` and DuckDB `quantile_cont`
  // share the linear-interpolation definition, and integer inputs keep
  // the interpolation arithmetic bit-identical.
  // -------------------------------------------------------------------
  private val x9b = Demo("x9b_percentiles", Some("""
      WITH c AS (SELECT event_type, cast(round(value * 100) AS bigint) AS cents
                 FROM events)
      SELECT event_type,
             quantile_cont(cents, 0.5) / 100 AS p50,
             quantile_cont(cents, 0.9) / 100 AS p90,
             quantile_cont(cents, 0.99) / 100 AS p99
      FROM c
      GROUP BY event_type
      ORDER BY event_type ASC NULLS LAST"""),
    (s, dir) => {
      val cents = round(col("value") * 100).cast("long")
      t(s, dir, "events")
        .select(col("event_type"), cents.as("cents"))
        .groupBy(col("event_type"))
        .agg(
          (expr("percentile(cents, 0.5)") / 100).as("p50"),
          (expr("percentile(cents, 0.9)") / 100).as("p90"),
          (expr("percentile(cents, 0.99)") / 100).as("p99"))
        .orderBy(col("event_type").asc_nulls_last)
    })

  // -------------------------------------------------------------------
  // X9d: HYPERLOGLOG DISTINCT ESTIMATE over lineitem.l_orderkey, next to
  // the exact count for error inspection. Every stochastic ingredient of
  // the sketch is exact-integer (31-bit murmur-style avalanche, CASE-
  // based rank, 2^23-scaled BIGINT indicator sum over 512 registers), so
  // even this APPROXIMATE operator is bit-verified against the oracle —
  // every sketch constant in the SQL below is derived from the same
  // graft.operators.Sketches definitions the Spark side folds over.
  // Scale: map-side combine reduces every partition to ≤512 register
  // rows; the exact branch is the expensive one and exists only for the
  // error column.
  // -------------------------------------------------------------------
  // every sketch constant below derives from the Sketches definitions so
  // a retune (Buckets/RankBits) can never desynchronize oracle and impl
  private val skM = graft.operators.Sketches.Buckets
  private val skBucketBits = Integer.numberOfTrailingZeros(skM)
  private val skSentinel = graft.operators.Sketches.RankBits + 1
  private val skScale = 1L << skSentinel

  private val rankCase: String = {
    val whens = graft.operators.Sketches.rankThresholds
      .map { case (r, thr) => s"WHEN (h >> $skBucketBits) >= $thr THEN $r" }
      .mkString(" ")
    s"CASE $whens ELSE $skSentinel END"
  }

  private val x9d = Demo("x9d_hll_distinct", Some(s"""
      WITH h0 AS (
        SELECT l_orderkey % ${graft.operators.Sketches.Mod31} AS h
        FROM lineitem WHERE l_orderkey IS NOT NULL),
      h1 AS (SELECT (xor(h, h >> 16) * ${graft.operators.Sketches.C1}) % ${graft.operators.Sketches.Mod31} AS h FROM h0),
      h2 AS (SELECT (xor(h, h >> 13) * ${graft.operators.Sketches.C2}) % ${graft.operators.Sketches.Mod31} AS h FROM h1),
      h3 AS (SELECT xor(h, h >> 16) AS h FROM h2),
      registers AS (
        SELECT h % $skM AS bucket, max($rankCase) AS m_rho
        FROM h3 GROUP BY 1),
      sketch AS (
        SELECT cast(sum(1::BIGINT << ($skSentinel - m_rho)) AS bigint) AS s_nonempty,
               count(*) AS buckets_used
        FROM registers),
      exact AS (SELECT count(DISTINCT l_orderkey) AS n_exact FROM lineitem)
      SELECT n_exact,
             ${graft.operators.Sketches.AlphaExpr}
               / cast(s_nonempty + ($skM - buckets_used) * $skScale AS double)
               AS n_estimate,
             buckets_used
      FROM exact CROSS JOIN sketch"""),
    (s, dir) => graft.operators.Sketches.approxDistinct(
      t(s, dir, "lineitem"), col("l_orderkey")))

  val all: Seq[Demo] = Seq(x9a, x9b, x9d)
}
