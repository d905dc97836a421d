package graft.models

import graft.SparkSpec

/** `dbt build` (SqlDag.build) — the interleaved seed → model → tests →
  * downstream lifecycle with skip-on-failure scheduling: an
  * ERROR-severity test failure (or a build exception) skips the node's
  * DESCENDANTS while independent subgraphs keep building; WARN-severity
  * failures report and proceed. The semantics the reference README
  * drives with separate `dbt seed` / `dbt run` / `dbt test` invocations
  * (reference README.md:44-55), fused as dbt's modern one-command verb.
  */
class BuildSpec extends SparkSpec {

  import SqlDag._

  // a: root over the seed; b: mid; c: leaf of b; d: independent branch —
  // the smallest graph where "skip descendants, keep siblings" is
  // observable
  private def models = Seq(
    SqlModel("m_a", "select id, v from {{ ref('raw_vals') }}"),
    SqlModel("m_b", "select id, v from {{ ref('m_a') }}"),
    SqlModel("m_c", "select count(*) as n from {{ ref('m_b') }}"),
    SqlModel("m_d", "select max(v) as mx from {{ ref('raw_vals') }}"))

  private def seeds = {
    val s = spark
    import s.implicits._
    // id 1 is DUPLICATED: a unique test on any descendant fails with
    // exactly 1 violating key
    Map("raw_vals" -> Seq((1L, 10.0), (1L, 11.0), (2L, 20.0), (3L, 30.0))
      .toDF("id", "v"))
  }

  private def uniqueTest(node: String, cfg: GenericTests.TestConfig) =
    GenericTests.DataTest(s"unique_${node}_id",
      built => GenericTests.unique(built(node), "id"), cfg)

  test("error-severity test failure skips descendants, independent branch builds") {
    val wh = java.nio.file.Files.createTempDirectory("graft-build").toString
    val dag = new SqlDag(spark, wh)
    val r = dag.build(models, seeds,
      tests = Map("m_b" -> Seq(uniqueTest("m_b", GenericTests.TestConfig()))))
    // m_b built (its relation exists) — dbt fails the TEST, not the model
    assert(r.statusOf("m_a") === Some("success"))
    assert(r.statusOf("m_b") === Some("success"))
    val bTests = r.nodes.find(_.name == "m_b").get.tests
    assert(bTests.map(t => (t.name, t.status)) ===
      Seq(("unique_m_b_id", "error")))
    assert(bTests.head.failures === 1L) // one duplicated key
    // m_c skipped BECAUSE of m_b; m_d (independent) built
    assert(r.statusOf("m_c") === Some("skipped"))
    assert(r.nodes.find(_.name == "m_c").get.cause === Some("m_b"))
    assert(r.statusOf("m_d") === Some("success"))
    assert(r.relations.contains("m_b") && !r.relations.contains("m_c"))
    assert(!r.success)
    // execution order: a node's row precedes its descendants' rows
    val order = r.nodes.map(_.name)
    assert(order.indexOf("m_a") < order.indexOf("m_b"))
    assert(order.indexOf("m_b") < order.indexOf("m_c"))
  }

  test("warn severity (and an unmet errorIf threshold) proceed downstream") {
    val wh = java.nio.file.Files.createTempDirectory("graft-build-warn").toString
    val dag = new SqlDag(spark, wh)
    val r = dag.build(models, seeds, tests = Map(
      "m_a" -> Seq(uniqueTest("m_a",
        GenericTests.TestConfig(severity = "warn"))),
      // severity error but the threshold tolerates up to 5 bad keys —
      // TestConfig.status degrades it to warn (warnIf default != 0)
      "m_b" -> Seq(uniqueTest("m_b",
        GenericTests.TestConfig(severity = "error", errorIf = "> 5")))))
    assert(r.nodes.find(_.name == "m_a").get.tests.head.status === "warn")
    assert(r.nodes.find(_.name == "m_b").get.tests.head.status === "warn")
    assert(r.statusOf("m_c") === Some("success"))
    assert(r.relations("m_c").head().getLong(0) === 4L)
    assert(r.success) // warns never fail the run verdict
  }

  test("seed tests gate first: models over a bad seed skip, the rest build") {
    val wh = java.nio.file.Files.createTempDirectory("graft-build-seed").toString
    val dag = new SqlDag(spark, wh)
    val s = spark
    import s.implicits._
    val twoSeeds = seeds + ("clean_vals" ->
      Seq((7L, 70.0)).toDF("id", "v"))
    val ms = models :+
      SqlModel("m_clean", "select id from {{ ref('clean_vals') }}")
    val r = dag.build(ms, twoSeeds,
      tests = Map("raw_vals" ->
        Seq(uniqueTest("raw_vals", GenericTests.TestConfig()))))
    // the seed's own node row carries the failed test…
    assert(r.statusOf("raw_vals") === Some("success"))
    assert(r.nodes.find(_.name == "raw_vals").get.tests.head.status === "error")
    // …every model reading it skips (m_a directly, m_b/m_c by cascade,
    // m_d directly) with the nearest dead ancestor as cause
    assert(r.statusOf("m_a") === Some("skipped"))
    assert(r.nodes.find(_.name == "m_a").get.cause === Some("raw_vals"))
    assert(r.statusOf("m_c") === Some("skipped"))
    assert(r.nodes.find(_.name == "m_c").get.cause === Some("m_b"))
    assert(r.statusOf("m_d") === Some("skipped"))
    // the untested clean seed's branch is untouched
    assert(r.statusOf("m_clean") === Some("success"))
  }

  test("a model build exception marks it error, skips its subtree, keeps siblings; failFast aborts") {
    val wh = java.nio.file.Files.createTempDirectory("graft-build-err").toString
    val dag = new SqlDag(spark, wh)
    val broken = models.map(m =>
      if (m.name == "m_b")
        m.copy(jinjaSql = "select no_such_column from {{ ref('m_a') }}")
      else m)
    val r = dag.build(broken, seeds)
    assert(r.statusOf("m_b") === Some("error"))
    assert(r.nodes.find(_.name == "m_b").get.cause.exists(
      _.toLowerCase.contains("no_such_column")))
    assert(r.statusOf("m_c") === Some("skipped"))
    assert(r.statusOf("m_d") === Some("success"))
    assert(!r.relations.contains("m_b") && !r.relations.contains("m_c"))
    assert(!r.success)
    // --fail-fast: the same graph ABORTS on the build exception
    intercept[Exception] { dag.build(broken, seeds, failFast = true) }
  }

  test("tests keyed on unknown nodes refuse up front") {
    val wh = java.nio.file.Files.createTempDirectory("graft-build-ref").toString
    val dag = new SqlDag(spark, wh)
    val e = intercept[IllegalArgumentException] {
      dag.build(models, seeds, tests = Map("nonexistent" ->
        Seq(uniqueTest("m_a", GenericTests.TestConfig()))))
    }
    assert(e.getMessage.contains("nonexistent"))
  }

  test("all green: build ≡ run + test, store_failures audits persist") {
    val wh = java.nio.file.Files.createTempDirectory("graft-build-green").toString
    val store = java.nio.file.Files.createTempDirectory("graft-build-audit").toString
    val dag = new SqlDag(spark, wh)
    val r = dag.build(models, seeds,
      tests = Map("m_d" -> Seq(GenericTests.DataTest("d_not_null",
        built => GenericTests.notNull(built("m_d"), "mx"),
        GenericTests.TestConfig(storeFailures = true)))),
      storeDir = Some(store))
    assert(r.success)
    assert(r.nodes.map(n => n.name -> n.status).toMap ===
      Map("m_a" -> "success", "m_b" -> "success",
        "m_c" -> "success", "m_d" -> "success"))
    // relations match a plain run's
    val ran = new SqlDag(spark,
      java.nio.file.Files.createTempDirectory("graft-build-cmp").toString)
      .run(models, seeds)
    assert(r.relations("m_c").head().getLong(0) ===
      ran("m_c").head().getLong(0))
    // the audit table exists (and is empty — zero violations)
    val audited = spark.read.parquet(s"$store/d_not_null")
    assert(audited.count() === 0L)
  }
}
