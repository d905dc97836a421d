package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis — "of the users who signed up in week W,
  * how many were still active k weeks later" — the other canonical
  * event-warehouse matrix next to [[Funnel]].
  *
  * Semantics: a user's cohort is the calendar week (Monday-truncated on
  * both engines) of their FIRST `signupType` event; their activity
  * offset for any later event is whole weeks since that anchor DAY
  * (per-user anchor, integer day arithmetic — no calendar-week
  * boundary effects inside the offset). Retention is distinct active
  * users over the cohort size.
  *
  * Scale: one user-keyed anchor aggregation, one user-keyed join to
  * tag events, then a (cohort, offset)-keyed distinct count — the
  * matrix is weeks × offsets rows regardless of event volume; every
  * shuffle key is bounded.
  */
object Retention {

  /** `(cohort_week, week_offset, n_active, retention)` rows, one per
    * observed (cohort, offset) cell.
    */
  def cohortRetention(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, signupType: String): DataFrame = {
    val ev = df.select(col(userCol).as("u"), col(typeCol).as("et"),
      col(tsCol).as("t"))
    val cohorts = ev.filter(col("et") === signupType)
      .groupBy(col("u")).agg(min(col("t")).as("anchor"))
      .select(col("u"), col("anchor"),
        date_trunc("week", col("anchor")).cast("date").as("cohort_week"))
    // cohorts is one row per user already (groupBy u) — a plain count is
    // the cohort size without a second distinct-aggregation pass
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    val activity = ev.join(cohorts, Seq("u"))
      .filter(col("t") >= col("anchor"))
      .select(col("cohort_week"), col("u"),
        expr("datediff(to_date(t), to_date(anchor)) div 7").as("week_offset"))
    activity.groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("u")).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        (col("n_active").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
  }
}
