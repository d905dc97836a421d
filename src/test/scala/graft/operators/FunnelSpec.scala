package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Funnel semantics: strict ordering against the FIRST reach of the
  * prior step, the max-gap window, and the conversion denominators.
  */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  private val events = Seq(
    // u1 converts fully in order
    (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
    // u2 clicked BEFORE the first view — not a step-2 reach
    (2L, "click", ts(0)), (2L, "view", ts(10)),
    // u3 views then clicks only after a 10-hour gap
    (3L, "view", ts(0)), (3L, "click", ts(600)),
    // u4 never views: enters no step (click alone is not step 1)
    (4L, "click", ts(5))
  ).toDF("user_id", "event_type", "ts")

  test("strict order against the FIRST prior reach; unbounded window") {
    val out = Funnel.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toList
    // step1: u1,u2,u3; step2: u1 (u2 pre-view click doesn't count),
    // u3 (gap irrelevant unbounded); step3: u1
    assert(out == List((1L, 3L, 1.0), (2L, 2L, 2.0 / 3.0), (3L, 1L, 1.0 / 3.0)))
  }

  test("maxGap drops conversions outside the window") {
    val out = Funnel.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click"), maxGap = Some("1 HOUR"))
      .orderBy("step").collect().map(r => (r.getLong(0), r.getLong(2))).toList
    // u3's 10-hour-late click no longer reaches step 2
    assert(out == List((1L, 3L), (2L, 1L)))
  }

  test("empty step-1 cohort yields zero counts and NULL conversions") {
    val out = Funnel.funnel(events.filter("event_type = 'click'"),
        "user_id", "event_type", "ts", Seq("view", "click"))
      .orderBy("step").collect()
    assert(out.map(_.getLong(2)).toList == List(0L, 0L))
    assert(out.forall(_.isNullAt(3)))
  }
}
