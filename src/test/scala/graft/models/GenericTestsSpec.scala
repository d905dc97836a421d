package graft.models

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The dbt generic-test helpers: violation detection on crafted frames,
  * and the project's test suite over the real seeds — where the integrity
  * tests all pass, and the grain checks flag exactly what they should:
  * the fan-out bug in the checked-in mart (the reference bug-analysis
  * doc's thesis), plus the reference grain test's documented
  * over-strictness on the payment-only month.
  */
class GenericTestsSpec extends SparkSpec {

  import GenericTests._

  private def df(rows: Seq[(Integer, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "v")
  }

  test("unique flags duplicated keys with counts; NULL keys exempt (dbt semantics)") {
    val d = df(Seq((1, "a"), (2, "b"), (2, "c"), (3, null)))
    val viol = unique(d, "k").collect()
    assert(viol.map(r => (r.getInt(0), r.getLong(1))).toSeq === Seq((2, 2L)))
    assert(unique(df(Seq((1, "a"), (2, "b"))), "k").isEmpty)
    // two NULL keys are not a uniqueness violation — dbt's unique filters
    // `where column is not null`; nullability is not_null's job
    assert(unique(df(Seq((null, "a"), (null, "b"), (1, "c"))), "k").isEmpty)
  }

  test("notNull flags null rows only") {
    val d = df(Seq((1, "a"), (2, null), (3, null)))
    assert(notNull(d, "v").count() === 2)
    assert(notNull(d, "k").isEmpty)
  }

  test("acceptedValues ignores NULLs (dbt semantics) and flags outsiders") {
    val d = df(Seq((1, "ok"), (2, "bad"), (3, null)))
    val viol = acceptedValues(d, "v", Seq("ok", "fine")).collect()
    assert(viol.map(_.getString(1)).toSeq === Seq("bad"))
  }

  test("relationships flags orphan foreign keys, NULLs exempt") {
    val child = df(Seq((1, "x"), (7, "y"), (null, "z")))
    val parent = df(Seq((1, "p"), (2, "p")))
    val viol = relationships(child, "k", parent, "k").collect()
    assert(viol.map(_.getInt(0)).toSeq === Seq(7))
  }

  test("project suite over the seeds: all pass except the buggy mart's grain test") {
    val seeds = fictionBankSeeds
    val wh = java.nio.file.Files.createTempDirectory("graft-test-wh").toString
    val dag = new FictionBankDag(spark, wh)
    val results = dag.test(dag.run(seeds)).toMap
    assert(results("unique_stg_loans_loan_id") === 0)
    assert(results("not_null_stg_loans_loan_id") === 0)
    assert(results("unique_stg_loan_payments_payment_id") === 0)
    assert(results("not_null_stg_loan_payments_payment_status") === 0)
    assert(results("accepted_values_payment_status") === 0)
    assert(results("relationships_stg_loans_loan_type_id") === 0)
    assert(results("relationships_payments_loan_id") === 0)
    // the reference's grain test is over-strict by design: the payment-only
    // month (NULL type) flags BOTH variants with one extra-row violation
    assert(results("grain_agg_monthly_loans") === 1)
    assert(results("grain_agg_monthly_loans_fixed") === 1)
    // the discriminating check: every origination (month, type) combo is
    // duplicated by the fan-out in the buggy mart (10 combos), none in the
    // fixed one
    assert(results("unique_agg_monthly_loans_grain") === 10)
    assert(results("unique_agg_monthly_loans_fixed_grain") === 0)
  }
}
