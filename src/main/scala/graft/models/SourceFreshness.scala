package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt `source freshness` analog (reference lifecycle verb: dbt checks
  * each source's `loaded_at_field` against `warn_after`/`error_after`
  * thresholds; the reference project is seed-only so this surface is
  * disposition-only there — README.md:53-54 documents the lifecycle).
  *
  * Determinism: the "now" anchor is an explicit epoch-seconds parameter,
  * never the wall clock — a freshness report is reproducible only if the
  * evaluation instant is pinned. Timestamps floor to whole epoch seconds
  * before any arithmetic so the age is an exact integer regardless of
  * the source column's physical precision (micros vs nanos).
  *
  * Scale: one `max` aggregation per monitored source — a map-side
  * combinable single-row agg per table; on partitioned storage the scan
  * can prune to recent partitions first.
  */
object SourceFreshness {

  /** One monitored source: `loadedAt` is the freshness column,
    * thresholds in hours.
    */
  final case class Source(name: String, df: DataFrame, loadedAt: Column,
      warnAfterH: Long, errorAfterH: Long)

  /** Freshness report as of `asOfEpochSec`:
    * `(source_name, max_loaded_at, age_hours, status)` with status
    * pass/warn/error; a source with no rows (NULL max) reports `error`
    * with NULL age, like dbt's "could not compute freshness".
    */
  def check(sources: Seq[Source], asOfEpochSec: Long): DataFrame = {
    require(sources.nonEmpty, "no sources to check")
    sources.map { src =>
      val mxs = unix_timestamp(col("mx")) // whole seconds, floor
      // FLOOR division, not Spark's truncating `div`: DuckDB's `//` floors,
      // so a future-dated loaded_at (negative age, e.g. -30 min) must read
      // -1 on both engines, not 0. The double division is floor-exact here:
      // a non-divisible diff/3600 sits ≥ 1/3600 from any integer, far
      // beyond one ulp.
      val age = expr(
        s"floor(cast(${asOfEpochSec}L - unix_timestamp(mx) as double) / 3600d)")
      src.df.agg(max(src.loadedAt).as("mx"))
        .select(
          lit(src.name).as("source_name"),
          timestamp_seconds(mxs).as("max_loaded_at"),
          age.as("age_hours"),
          when(col("mx").isNull || age >= src.errorAfterH, lit("error"))
            .when(age >= src.warnAfterH, lit("warn"))
            .otherwise(lit("pass")).as("status"))
    }.reduce(_ unionByName _)
  }
}
