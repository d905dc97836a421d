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
}
