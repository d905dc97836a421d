package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Retention semantics: first-signup anchoring under multiple signups,
  * pre-anchor event exclusion, and Monday week cohorts.
  */
class RetentionSpec extends SparkSpec {

  import spark.implicits._

  // 2024-01-03 (Wed) 00:00 UTC + offset days
  private def ts(day: Int, hour: Int = 0) =
    new Timestamp(1704240000000L + day * 86400000L + hour * 3600000L)

  test("first signup anchors; pre-anchor events excluded; offsets in whole weeks") {
    val events = Seq(
      // u1 signs up twice — the FIRST (Wed Jan 3) anchors; the later
      // signup is just activity
      (1L, "view", ts(-1)),     // pre-anchor: excluded
      (1L, "signup", ts(0)),
      (1L, "signup", ts(20)),
      (1L, "click", ts(6)),     // day 6 → offset 0
      (1L, "view", ts(7)),      // day 7 → offset 1
      // u2 signs up the following Tuesday (Jan 9) → next Monday cohort
      (2L, "signup", ts(6)),
      (2L, "view", ts(6, 12))   // same day → offset 0
    ).toDF("user_id", "event_type", "ts")
    val out = Retention.cohortRetention(events, "user_id", "event_type",
        "ts", "signup")
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3))).toList
    assert(out == List(
      // u1 cohort = Mon Jan 1; active at offsets 0 (signup+click),
      // 1 (view day 7), 2 (the day-20 signup)
      ("2024-01-01", 0L, 1L, 1.0),
      ("2024-01-01", 1L, 1L, 1.0),
      ("2024-01-01", 2L, 1L, 1.0),
      // u2 cohort = Mon Jan 8; active at offset 0 only
      ("2024-01-08", 0L, 1L, 1.0)))
  }
}
