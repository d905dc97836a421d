package graft.models

import graft.SparkSpec

/** dbt 1.8 unit tests: YAML parse (SchemaConfig.unitTests) and the
  * fixture-driven runner (UnitTests.run) — pass, fail-with-diff, input
  * isolation, and the two fixture-typing modes (template-cast vs
  * literal-inferred).
  */
class UnitTestsSpec extends SparkSpec {

  private val models = Seq(
    SqlDag.SqlModel("stg_loans",
      "select loan_id, amount from {{ source('raw', 'loans') }} " +
        "where amount > 0"),
    SqlDag.SqlModel("loan_rollup",
      "select grade, count(*) as n, sum(amount) as total " +
        "from {{ ref('graded') }} group by grade"))

  private val yaml = """
unit_tests:
  - name: rollup_groups_and_sums
    model: loan_rollup
    given:
      - input: ref('graded')
        rows:
          - {grade: A, amount: 10.0}
          - {grade: A, amount: 5.0}
          - {grade: B, amount: 1.0}
    expect:
      rows:
        - {grade: A, n: 2, total: 15.0}
        - {grade: B, n: 1, total: 1.0}
  - name: staging_filters_nonpositive
    model: stg_loans
    given:
      - input: source('raw', 'loans')
        rows:
          - {loan_id: 1, amount: 10.0}
          - {loan_id: 2, amount: -3.0}
    expect:
      rows:
        - {loan_id: 1, amount: 10.0}
"""

  test("unit_tests parse: names, resolved inputs (ref and source), literal rows") {
    val ts = SchemaConfig.unitTests(yaml)
    assert(ts.map(_.name) ===
      Seq("rollup_groups_and_sums", "staging_filters_nonpositive"))
    assert(ts.head.model === "loan_rollup")
    assert(ts.head.given.head._1 === "graded")
    assert(ts.head.given.head._2.head === Map("grade" -> "A", "amount" -> 10.0))
    // source('raw','loans') resolves to the registered view name the
    // compiled SQL will actually read
    assert(ts(1).given.head._1 === SqlDag.sourceViewName("raw", "loans"))
    assert(ts(1).expect === Seq(Map("loan_id" -> 1L, "amount" -> 10.0)))
    // a yaml without the block parses to empty, not an error
    assert(SchemaConfig.unitTests("models: []") === Seq.empty)
  }

  test("runner: passing tests yield empty diffs over ref AND source fixtures") {
    val results = UnitTests.runAll(spark, SchemaConfig.unitTests(yaml), models)
    assert(results === Seq(
      "rollup_groups_and_sums" -> 0L, "staging_filters_nonpositive" -> 0L))
  }

  test("runner: a failing expectation returns the tagged symmetric diff") {
    val bad = SchemaConfig.unitTests(yaml.replace(
      "- {grade: B, n: 1, total: 1.0}", "- {grade: B, n: 2, total: 9.0}"))
    val diff = UnitTests.run(spark, bad.head, models)
    val rows = diff.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
    assert(rows === Set(
      ("B", 1L, 1.0, "actual"),     // produced but not expected
      ("B", 2L, 9.0, "expected")))  // expected but not produced
  }

  test("runner isolation: missing fixtures, unread fixtures, unknown models fail fast") {
    val ts = SchemaConfig.unitTests(yaml)
    // a model input with no given fixture: refuse (dbt's isolation rule)
    assert(intercept[IllegalArgumentException] {
      UnitTests.run(spark, ts.head.copy(given = Nil), models)
    }.getMessage.contains("no `given` fixture: graded"))
    // a given input the model never reads: a typo must not no-op
    assert(intercept[IllegalArgumentException] {
      UnitTests.run(spark, ts.head.copy(given =
        ts.head.given :+ ("phantom" -> Seq(Map[String, Any]("x" -> 1L)))), models)
    }.getMessage.contains("never reads: phantom"))
    assert(intercept[IllegalArgumentException] {
      UnitTests.run(spark, ts.head.copy(model = "nope"), models)
    }.getMessage.contains("unknown model 'nope'"))
    // fixtures register under mangled names and are dropped afterwards
    assert(!spark.catalog.tableExists("graded"))
  }

  test("fixture typing: template relation casts literals and fills unlisted columns with NULL") {
    val s = spark
    import s.implicits._
    // the real relation types loaded_on as DATE; the fixture spells it
    // as a YAML string and omits note entirely
    val real = Seq((1L, "2024-01-05", "x"))
      .toDF("loan_id", "loaded_on", "note")
      .select(org.apache.spark.sql.functions.col("loan_id"),
        org.apache.spark.sql.functions.col("loaded_on").cast("date"),
        org.apache.spark.sql.functions.col("note"))
    val m = Seq(SqlDag.SqlModel("dated",
      "select loan_id, loaded_on + interval 1 day as next_day, note " +
        "from {{ ref('raw_loans') }}"))
    val t = SchemaConfig.UnitTest("dates", "dated",
      given = Seq("raw_loans" ->
        Seq(Map[String, Any]("loan_id" -> 7L, "loaded_on" -> "2024-02-28"))),
      expect = Seq(Map[String, Any]("loan_id" -> 7L,
        "next_day" -> "2024-02-29", "note" -> null)))
    assert(UnitTests.run(spark, t, m,
      inputFrames = Map("raw_loans" -> real)).count() === 0L)
    // without the template, a date-string literal stays a string and the
    // all-NULL column cannot be typed — fail fast with the remedy named
    assert(intercept[IllegalArgumentException] {
      UnitTests.run(spark, t.copy(given = Seq("raw_loans" -> Seq(
        Map[String, Any]("loan_id" -> 7L, "loaded_on" -> null)))), m)
    }.getMessage.contains("inputFrames"))
  }

  test("fixture typing: literal inference widens long+double, rejects mixed types") {
    val m = Seq(SqlDag.SqlModel("sums",
      "select sum(v) as s from {{ ref('vals') }}"))
    val widened = SchemaConfig.UnitTest("widen", "sums",
      given = Seq("vals" -> Seq(
        Map[String, Any]("v" -> 1L), Map[String, Any]("v" -> 2.5))),
      expect = Seq(Map[String, Any]("s" -> 3.5)))
    assert(UnitTests.run(spark, widened, m).count() === 0L)
    assert(intercept[IllegalArgumentException] {
      UnitTests.run(spark, widened.copy(given = Seq("vals" -> Seq(
        Map[String, Any]("v" -> 1L), Map[String, Any]("v" -> "x")))), m)
    }.getMessage.contains("mixed literal types"))
  }
}
