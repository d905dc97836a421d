package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** FanoutLint fires on the reference's anti-pattern (aggregate-grain ⟕
  * detail on a non-unique key — the 39-row bug shape) and stays quiet on
  * legitimate joins (dim join; aggregate joined back on its own grain).
  */
class FanoutLintSpec extends SparkSpec {

  private lazy val s = {
    val sess = spark.newSession()
    sess.experimental.extraOptimizations = Seq(FanoutLint)
    sess
  }

  private def detail = {
    import s.implicits._
    Seq((1, "a", 10.0), (1, "b", 20.0), (2, "c", 30.0))
      .toDF("k", "name", "v")
  }

  test("fires on aggregate ⟕ detail over non-unique key (J3 shape)") {
    FanoutLint.clear()
    val agg = detail.groupBy("k").agg(sum("v").as("total"))
    val joined = agg.join(detail, Seq("k"), "left")
    joined.collect()
    assert(FanoutLint.recentFindings.exists(_.contains("fan out")),
      s"expected a finding, got: ${FanoutLint.recentFindings}")
    // and the fan-out is real: 2 agg rows -> 3 joined rows
    assert(joined.count() == 3)
  }

  test("fires through an agg⟗agg join feeding a detail join (reference buggy-model shape)") {
    FanoutLint.clear()
    val a = detail.groupBy("k").agg(sum("v").as("sv"))
    val b = detail.groupBy("k").agg(count(lit(1)).as("n"))
    a.join(b, Seq("k"), "full_outer").join(detail, Seq("k"), "left").collect()
    assert(FanoutLint.recentFindings.exists(_.contains("fan out")),
      s"expected a finding, got: ${FanoutLint.recentFindings}")
  }

  test("quiet on aggregate ⋈ aggregate at same grain (J2 shape)") {
    FanoutLint.clear()
    val a = detail.groupBy("k").agg(sum("v").as("sv"))
    val b = detail.groupBy("k").agg(count(lit(1)).as("n"))
    a.join(b, Seq("k"), "full_outer").collect()
    assert(FanoutLint.recentFindings.isEmpty,
      s"unexpected findings: ${FanoutLint.recentFindings}")
  }

  test("GraftExtensions injects the rule via withExtensions") {
    import org.apache.spark.sql.SparkSession
    FanoutLint.clear()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val d = Seq((1, "a", 10.0), (1, "b", 20.0)).toDF("k", "name", "v")
      d.groupBy("k").agg(sum("v").as("t")).join(d, Seq("k"), "left").collect()
      assert(FanoutLint.recentFindings.exists(_.contains("fan out")),
        s"extension-injected rule did not fire: ${FanoutLint.recentFindings}")
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("quiet on plain detail ⋈ detail join (no aggregate side)") {
    FanoutLint.clear()
    detail.as("l").join(detail.as("r"), col("l.k") === col("r.k")).collect()
    assert(FanoutLint.recentFindings.isEmpty,
      s"unexpected findings: ${FanoutLint.recentFindings}")
  }

  test("registered contract keys suppress operator-internal joins only") {
    graft.operators.TextDedup // force object init → contract registration
    FanoutLint.clear()
    import s.implicits._
    // the LSH verify-join shape: aggregate-grain pairs join a per-doc
    // frame on the library's NAMESPACED contract key — quiet by
    // registration (operators alias to public id_a only after the join)
    val pairs = Seq((1, 2), (1, 3)).toDF("__graft_id_a", "__graft_id_b").distinct()
    val docs = Seq((1, "x"), (2, "y"), (3, "z")).toDF("__graft_id_a", "t")
    pairs.join(docs, Seq("__graft_id_a")).collect()
    assert(FanoutLint.recentFindings.isEmpty,
      s"contract key __graft_id_a should be suppressed: ${FanoutLint.recentFindings}")
    // a USER column that coincides with the PUBLIC output name is NOT
    // exempt (r8 advice: the old public-name allowlist skipped it)
    FanoutLint.clear()
    val p2 = Seq((1, 2), (1, 3)).toDF("id_a", "id_b").distinct()
    val d2 = Seq((1, "x"), (2, "y")).toDF("id_a", "t")
    p2.join(d2, Seq("id_a")).collect()
    assert(FanoutLint.recentFindings.exists(_.contains("fan out")),
      s"user id_a join should still warn: ${FanoutLint.recentFindings}")
  }

  test("allowContractKeys rejects non-namespaced keys") {
    intercept[IllegalArgumentException] {
      FanoutLint.allowContractKeys("customer_id")
    }
  }
}
