package graft.models

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Fiction-Bank loan-analytics pipeline: a Spark-first re-expression of
  * every model in the reference dbt project (reference: models/staging and
  * models/marts SQL files; README.md:7).
  *
  * Each reference model is one Scala function `DataFrame => DataFrame` shape;
  * `{{ ref('x') }}` edges (reference: stg_loans.sql:2, fct_loan_details.sql:2,6,
  * agg_monthly_loans.sql:2,6) become plain function arguments, so lineage is
  * the Scala call graph (see [[FictionBankDag]]).
  *
  * Scale note: all transforms are declarative DataFrame ops — Catalyst prunes
  * columns/pushes filters; the single dim join is broadcast (3-row dim); the
  * aggregations are two-phase hash aggregates. Nothing collects to the driver,
  * so the same code runs on a 1000-executor cluster.
  */
object FictionBank {

  /** stg_loans (reference: models/staging/stg_loans.sql:6-15): rename
    * passthrough + `cast(loan_start_date as date)` (stg_loans.sql:12).
    */
  def stgLoans(rawLoans: DataFrame): DataFrame =
    rawLoans.select(
      col("loan_id"),
      col("customer_id"),
      col("loan_type_id"),
      col("loan_amount"),
      col("interest_rate"),
      col("loan_start_date").cast(DateType).as("loan_start_date"),
      col("loan_term_months"),
      col("property_address"),
      col("property_value"))

  /** stg_loan_payments (reference: models/staging/stg_loan_payments.sql:6-14):
    * rename passthrough + `cast(payment_date as date)` (:9).
    */
  def stgLoanPayments(rawPayments: DataFrame): DataFrame =
    rawPayments.select(
      col("payment_id"),
      col("loan_id"),
      col("payment_date").cast(DateType).as("payment_date"),
      col("payment_amount"),
      col("principal_paid"),
      col("interest_paid"),
      col("payment_status"))

  /** DuckDB `cast(x as numeric)` defaults to DECIMAL(18,3) — parity trap,
    * SURVEY.md §7.4.2 (reference: fct_loan_details.sql:25).
    */
  private val Numeric = DecimalType(18, 3)

  /** fct_loan_details (reference: models/marts/fct_loan_details.sql):
    * loans ⟕ loan_types dim join (:34-36) + guarded LTV CASE (:23-27) +
    * annuity-payment formula (:28-33).
    *
    * The dim side is tiny (3 rows) and unique on the key, so we broadcast —
    * at 100 TB of loans this stays a map-side hash join with zero shuffle.
    */
  def fctLoanDetails(stgLoans: DataFrame, loanTypes: DataFrame): DataFrame = {
    // monthly rate r = interest_rate / 100 / 12 (fct_loan_details.sql:29)
    val r = col("interest_rate") / lit(100) / lit(12)
    val growth = pow(lit(1) + r, col("loan_term_months")) // (1+r)^n (:30-31)
    stgLoans.alias("loans")
      .join(
        broadcast(loanTypes.alias("loan_types")),
        col("loans.loan_type_id") === col("loan_types.loan_type_id"),
        "left")
      .select(
        col("loans.loan_id"),
        col("loans.customer_id"),
        col("loans.loan_type_id"),
        col("loan_types.loan_type_name"),
        col("loan_types.description").as("loan_type_description"),
        col("loans.loan_amount"),
        col("loans.interest_rate"),
        col("loans.loan_start_date"),
        col("loans.loan_term_months"),
        col("loan_types.typical_term_months"),
        col("loans.property_address"),
        col("loans.property_value"),
        // CASE WHEN property_value > 0 THEN round(ltv,2) ELSE NULL (:23-27);
        // NULL property_value falls through to the ELSE branch.
        when(col("property_value") > 0,
          round(col("loan_amount").cast(Numeric) / col("property_value").cast(Numeric) * 100, 2))
          .otherwise(lit(null))
          .as("ltv_ratio"),
        // annuity: round(P*r*(1+r)^n / ((1+r)^n - 1), 2) (:28-33)
        // parity note: for interest_rate = 0 this divides by zero, exactly
        // like the unguarded reference SQL (fct_loan_details.sql:28-33) —
        // an ANSI-mode error here, NaN/inf in DuckDB; the seeds contain no
        // 0% loans, and we reproduce the reference bug-for-bug rather than
        // guard a case it never defined
        round(col("loan_amount") * r * growth / (growth - lit(1)), 2)
          .as("estimated_monthly_payment"))
  }

  /** Shared upper CTEs of agg_monthly_loans (reference:
    * models/marts/agg_monthly_loans.sql:9-30): two hash aggregates at
    * different grains — month×type originations and month payments.
    */
  /** `{{ date_trunc('month', c) }}` cast to date — the project's one macro
    * (agg_monthly_loans.sql:11,23); single definition for every model.
    */
  private def monthStart(c: Column): Column = date_trunc("month", c).cast(DateType)

  private def monthlyParts(fctLoanDetails: DataFrame, stgLoanPayments: DataFrame)
      : (DataFrame, DataFrame) = {
    val orig = fctLoanDetails
      .groupBy(
        monthStart(col("loan_start_date")).as("month_start"),
        col("loan_type_name"))
      .agg(
        countDistinct(col("loan_id")).as("loans_originated"),
        sum(col("loan_amount")).as("total_amount_originated"),
        avg(col("loan_amount")).as("avg_loan_amount"),
        avg(col("interest_rate")).as("avg_interest_rate"))
    val pay = stgLoanPayments
      .groupBy(monthStart(col("payment_date")).as("month_start"))
      .agg(
        countDistinct(col("payment_id")).as("total_payments"),
        sum(col("payment_amount")).as("total_payment_amount"),
        sum(col("principal_paid")).as("total_principal_paid"),
        sum(col("interest_paid")).as("total_interest_paid"))
    (orig, pay)
  }

  private def combinedMetrics: Seq[Column] = Seq(
    coalesce(col("orig.loans_originated"), lit(0)).as("new_loans"),
    coalesce(col("orig.total_amount_originated"), lit(0)).as("amount_originated"),
    coalesce(col("orig.avg_loan_amount"), lit(0)).as("avg_loan_size"),
    coalesce(col("orig.avg_interest_rate"), lit(0)).as("avg_rate"),
    coalesce(col("pay.total_payments"), lit(0)).as("payments_received"),
    coalesce(col("pay.total_payment_amount"), lit(0)).as("payment_volume"),
    coalesce(col("pay.total_principal_paid"), lit(0)).as("principal_collected"),
    coalesce(col("pay.total_interest_paid"), lit(0)).as("interest_collected"))

  /** agg_monthly_loans, CHECKED-IN (BUGGY) variant — bug-for-bug parity
    * target (SURVEY §7.4.8). The left join back to loan-grain detail on the
    * non-unique `loan_type_name` (reference: agg_monthly_loans.sql:48-49)
    * fans each month×type row out by the number of loans of that type
    * (11 → 39 rows on the seeds; docs/bug-analysis.md:69-98).
    */
  def aggMonthlyLoansBuggy(fct: DataFrame, stgLoanPayments: DataFrame): DataFrame = {
    val (orig, pay) = monthlyParts(fct, stgLoanPayments)
    orig.alias("orig")
      // full outer: either side NULL-padded; payment-only month 2023-09
      // survives (agg_monthly_loans.sql:45-47)
      .join(pay.alias("pay"), col("orig.month_start") === col("pay.month_start"), "full_outer")
      // THE BUG: agg-grain ⟕ detail-grain on a non-unique key (:48-49)
      .join(fct.alias("loans"), col("orig.loan_type_name") === col("loans.loan_type_name"), "left")
      .select(Seq(
        coalesce(col("orig.month_start"), col("pay.month_start")).as("month"),
        col("orig.loan_type_name"),
        col("loans.customer_id")) ++ combinedMetrics: _*)
      .orderBy(col("month").desc, col("loan_type_name").asc)
  }

  /** agg_monthly_loans, FIXED variant (reference: docs/bug-analysis.md:161-175
    * "Option 1: Remove the join entirely"): pure month×type grain, no
    * customer_id, 11 rows on the seeds.
    */
  def aggMonthlyLoansFixed(fct: DataFrame, stgLoanPayments: DataFrame): DataFrame = {
    val (orig, pay) = monthlyParts(fct, stgLoanPayments)
    orig.alias("orig")
      .join(pay.alias("pay"), col("orig.month_start") === col("pay.month_start"), "full_outer")
      .select(Seq(
        coalesce(col("orig.month_start"), col("pay.month_start")).as("month"),
        col("orig.loan_type_name")) ++ combinedMetrics: _*)
      .orderBy(col("month").desc, col("loan_type_name").asc)
  }

  /** loan_monthly_detail (reference: docs/bug-analysis.md:178-187 "Option 2:
    * Create a separate detail model"): loan-grain monthly detail.
    */
  def loanMonthlyDetail(fct: DataFrame): DataFrame =
    fct.select(
      monthStart(col("loan_start_date")).as("month"),
      col("loan_type_name"),
      col("customer_id"),
      col("loan_id"),
      col("loan_amount"))

  /** The reference's data-quality test (reference: docs/bug-analysis.md:139-157):
    * non-empty result ⇒ the monthly mart's grain diverges from the expected
    * distinct month×type grain of fct_loan_details.
    */
  def grainTest(fct: DataFrame, aggMonthly: DataFrame): DataFrame = {
    // fully declarative (no eager count() actions at construction): two
    // 1-row aggregates cross-joined — the scalar-subquery shape of the
    // reference test (docs/bug-analysis.md:151-157), same as demo q08
    val expected = fct.select(
      monthStart(col("loan_start_date")).as("month"),
      col("loan_type_name")).distinct()
      .agg(count(lit(1)).as("expected_rows"))
    val actual = aggMonthly.select(col("month"), col("loan_type_name")).distinct()
      .agg(count(lit(1)).as("actual_rows"))
    expected.crossJoin(actual)
      .select(col("expected_rows"), col("actual_rows"),
        (col("actual_rows") - col("expected_rows")).as("extra_rows"))
      .filter(col("actual_rows") =!= col("expected_rows"))
  }
}

/** dbt-style DAG orchestration (SURVEY §2A M1, §3.2): named models with
  * `ref()` edges, topological execution, and the two materialization
  * strategies — staging as temp views (dbt_project.yml:19-20), marts as
  * parquet tables written then RE-READ (dbt_project.yml:21-22), preserving
  * dbt's cut-point semantics (SURVEY §3.2.5).
  */
class FictionBankDag(spark: SparkSession, warehouseDir: String) {
  import FictionBank._

  sealed trait Materialization
  case object View extends Materialization
  case object Table extends Materialization

  case class Model(
      name: String,
      deps: Seq[String],
      materialization: Materialization,
      build: Map[String, DataFrame] => DataFrame)

  private val models = Seq(
    Model("stg_loans", Seq("raw_loans"), View, m => stgLoans(m("raw_loans"))),
    Model("stg_loan_payments", Seq("raw_loan_payments"), View,
      m => stgLoanPayments(m("raw_loan_payments"))),
    Model("fct_loan_details", Seq("stg_loans", "loan_types"), Table,
      m => fctLoanDetails(m("stg_loans"), m("loan_types"))),
    Model("agg_monthly_loans", Seq("fct_loan_details", "stg_loan_payments"), Table,
      m => aggMonthlyLoansBuggy(m("fct_loan_details"), m("stg_loan_payments"))),
    Model("agg_monthly_loans_fixed", Seq("fct_loan_details", "stg_loan_payments"), Table,
      m => aggMonthlyLoansFixed(m("fct_loan_details"), m("stg_loan_payments"))),
    Model("loan_monthly_detail", Seq("fct_loan_details"), Table,
      m => loanMonthlyDetail(m("fct_loan_details"))))

  /** Lineage graph, dbt `ref()`-equivalent: model -> upstream names. */
  def lineage: Map[String, Set[String]] =
    models.map(m => m.name -> m.deps.toSet).toMap

  /** The project's data tests — the schema.yml the reference configures
    * but never ships (dbt_project.yml:8), expressed with the four dbt
    * generic tests ([[GenericTests]]) plus the reference's documented
    * grain test (docs/bug-analysis.md:139-157). Evaluate with [[test]].
    */
  val dataTests: Seq[GenericTests.DataTest] = {
    import GenericTests._
    Seq(
      DataTest("unique_stg_loans_loan_id",
        b => unique(b("stg_loans"), "loan_id")),
      DataTest("not_null_stg_loans_loan_id",
        b => notNull(b("stg_loans"), "loan_id")),
      DataTest("unique_stg_loan_payments_payment_id",
        b => unique(b("stg_loan_payments"), "payment_id")),
      DataTest("not_null_stg_loan_payments_payment_status",
        b => notNull(b("stg_loan_payments"), "payment_status")),
      DataTest("accepted_values_payment_status",
        b => acceptedValues(b("stg_loan_payments"), "payment_status",
          Seq("completed", "pending", "failed"))),
      DataTest("relationships_stg_loans_loan_type_id",
        b => relationships(b("stg_loans"), "loan_type_id",
          b("loan_types"), "loan_type_id")),
      DataTest("relationships_payments_loan_id",
        b => relationships(b("stg_loan_payments"), "loan_id",
          b("stg_loans"), "loan_id")),
      // the reference's grain test — over-strict by design: the payment-
      // only month (NULL type) makes it flag BOTH mart variants with
      // extra_rows = 1 (see FictionBankSpec's golden assertion). These
      // KNOWN-informational tests carry dbt's triage config — demoted to
      // `severity: warn` with `store_failures` so a build still goes
      // green while the flagged rows persist to the audit schema — the
      // exact workflow dbt users run while a bug like the checked-in
      // fan-out is being analyzed (docs/bug-analysis.md)
      DataTest("grain_agg_monthly_loans",
        b => grainTest(b("fct_loan_details"), b("agg_monthly_loans")),
        TestConfig(severity = "warn", storeFailures = true)),
      DataTest("grain_agg_monthly_loans_fixed",
        b => grainTest(b("fct_loan_details"), b("agg_monthly_loans_fixed")),
        TestConfig(severity = "warn", storeFailures = true)),
      // the DISCRIMINATING grain check, via the dbt `unique` generic test:
      // the mart's intended grain is one row per (month, type) — the
      // checked-in fan-out bug duplicates every origination combo (warn +
      // store_failures: the documented bug under triage), the fixed
      // variant none (full-severity: a failure THERE is a regression)
      DataTest("unique_agg_monthly_loans_grain",
        b => unique(b("agg_monthly_loans"), "month", "loan_type_name"),
        TestConfig(severity = "warn", storeFailures = true)),
      DataTest("unique_agg_monthly_loans_fixed_grain",
        b => unique(b("agg_monthly_loans_fixed"), "month", "loan_type_name")))
  }

  /** `dbt test`: violation count per test name over the built relations
    * (seeds included), 0 = pass. Note the warn-severity tests with
    * `store_failures` throw here for want of an audit location — use
    * [[testDetailed]] for the full config semantics.
    */
  def test(built: Map[String, DataFrame]): Seq[(String, Long)] =
    GenericTests.run(dataTests.map(_.copy(
      config = GenericTests.TestConfig())), built)

  /** `dbt test` with the full config semantics: pass/warn/error verdicts
    * and `store_failures` audit tables under `storeDir`.
    */
  def testDetailed(built: Map[String, DataFrame],
      storeDir: String): Seq[GenericTests.TestResult] =
    GenericTests.runDetailed(dataTests, built, Some(storeDir))

  /** `dbt docs generate` analog: the manifest artifact — every model node
    * with its materialization, upstream deps (`ref()` lineage) and output
    * schema as one JSON object (dbt's manifest.json, reduced to what this
    * project defines). Driver-side metadata only: schemas come from the
    * already-analyzed frames; no job runs.
    */
  def manifest(built: Map[String, DataFrame]): String = {
    // Jackson (shipped with Spark) rather than hand-rolled strings:
    // RFC-8259-complete escaping of any model/column name for free
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    models.foreach { m =>
      val node = root.putObject(m.name)
      node.put("materialization", m.materialization.toString.toLowerCase)
      val deps = node.putArray("depends_on")
      m.deps.sorted.foreach(deps.add)
      val cols = node.putObject("columns")
      built(m.name).schema.fields.foreach { f =>
        cols.put(f.name, f.dataType.simpleString)
      }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** `dbt run`: topological build of every model from the three seeds.
    * `threads` mirrors dbt's profiles.yml setting — each dependency
    * frontier's models build concurrently (the [[SqlDag.run]] contract:
    * inputs fully materialized before the wave, sibling models on
    * disjoint names, so results are identical to the sequential build;
    * the win is overlapping independent Table writes, e.g. the two mart
    * variants + loan_monthly_detail in one wave).
    */
  def run(seeds: Map[String, DataFrame],
      threads: Int = 1): Map[String, DataFrame] = {
    require(threads >= 1, s"need threads >= 1, got $threads")
    def build(m: Model, built: Map[String, DataFrame]): DataFrame = {
      val df = m.build(built)
      m.materialization match {
        case View =>
          df.createOrReplaceTempView(m.name); df
        case Table =>
          val path = s"$warehouseDir/${m.name}"
          df.write.mode("overwrite").parquet(path)
          spark.read.parquet(path) // downstream refs read the TABLE, not the plan
      }
    }
    var built: Map[String, DataFrame] = seeds
    var remaining = models
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition(_.deps.forall(built.contains))
      require(ready.nonEmpty, s"cyclic or unsatisfied deps: ${blocked.map(_.name)}")
      val frozen = built
      val wave: Seq[(String, DataFrame)] =
        if (threads == 1 || ready.size == 1)
          ready.map(m => m.name -> build(m, frozen))
        else {
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            math.min(threads, ready.size))
          try {
            import scala.jdk.CollectionConverters._
            val tasks = ready.map { m =>
              new java.util.concurrent.Callable[(String, DataFrame)] {
                override def call(): (String, DataFrame) = m.name -> build(m, frozen)
              }
            }
            pool.invokeAll(tasks.asJava).asScala.toSeq.map(_.get())
          } finally pool.shutdown()
        }
      built ++= wave
      remaining = blocked
    }
    built
  }
}
