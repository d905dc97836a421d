package graft.models

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SourceFreshness status semantics: threshold boundaries and the
  * no-rows "could not compute" case (dbt reports that as an error).
  */
class SourceFreshnessSpec extends SparkSpec {

  import spark.implicits._
  import SourceFreshness.Source

  // anchor: 2024-02-01T00:00:00Z
  private val anchor = 1706745600L

  private def srcAt(name: String, epochSec: Long, warnH: Long, errH: Long) =
    Source(name, Seq(epochSec).toDF("s").select(timestamp_seconds(col("s")).as("ts")),
      col("ts"), warnH, errH)

  test("pass / warn / error by age against per-source thresholds") {
    val out = SourceFreshness.check(Seq(
        srcAt("fresh", anchor - 3600, 24, 96),        // 1h old
        srcAt("stale", anchor - 30 * 3600, 24, 96),   // 30h old
        srcAt("dead", anchor - 200 * 3600, 24, 96)),  // 200h old
      anchor).orderBy("source_name").collect()
    val byName = out.map(r => r.getString(0) ->
      (r.getLong(2), r.getString(3))).toMap
    assert(byName("fresh") == (1L, "pass"))
    assert(byName("stale") == (30L, "warn"))
    assert(byName("dead") == (200L, "error"))
  }

  test("warn/error thresholds are inclusive (age == threshold trips)") {
    val out = SourceFreshness.check(Seq(
        srcAt("at_warn", anchor - 24 * 3600, 24, 96),
        srcAt("at_err", anchor - 96 * 3600, 24, 96)),
      anchor).collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(out("at_warn") == "warn")
    assert(out("at_err") == "error")
  }

  test("empty source reports error with NULL age and NULL max_loaded_at") {
    val empty = Seq.empty[Long].toDF("s")
      .select(timestamp_seconds(col("s")).as("ts"))
    val r = SourceFreshness.check(
      Seq(Source("nodata", empty, col("ts"), 24, 96)), anchor).head()
    assert(r.getString(0) == "nodata")
    assert(r.isNullAt(1) && r.isNullAt(2))
    assert(r.getString(3) == "error")
  }
}
