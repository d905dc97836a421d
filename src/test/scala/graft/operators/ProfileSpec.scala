package graft.operators

import graft.SparkSpec

/** Profile semantics: NULLs excluded from both the nonnull and distinct
  * counts (SQL convention), one row per profiled column.
  */
class ProfileSpec extends SparkSpec {

  import spark.implicits._

  test("null handling and per-column counts") {
    val df = Seq(
      (Option(1), Option("a")),
      (Option.empty[Int], Option("a")),
      (Option(1), Option.empty[String]),
      (Option(2), Option("b"))
    ).toDF("x", "y")
    val out = Profile.profile(df, Seq("x", "y"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("x") == (4L, 3L, 2L))
    assert(out("y") == (4L, 3L, 2L))
  }

  test("iqr fences flag the heavy tail and pass an all-inside group untouched") {
    import org.apache.spark.sql.functions.col
    // g1: [1..9, 1000] → q1=3.25, q3=7.75, fences [-3.5, 14.5] → 1000 out
    // g2: [10,20,30,40] → fences [-5, 55] → nothing out
    val df = (((1L to 9L) :+ 1000L).map(("g1", _))
      ++ Seq(10L, 20L, 30L, 40L).map(("g2", _))).toDF("g", "cents")
    val out = Profile.iqrOutliers(df, "g", col("cents"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toList
    assert(out == List(
      ("g1", 10L, 1L, 0.01, 0.09),
      ("g2", 4L, 0L, 0.10, 0.40)))
  }
}
