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

  val all: Seq[Demo] = Seq(x9a, x9b)
}
