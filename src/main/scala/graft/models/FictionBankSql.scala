package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The dbt-SQL authoring surface: the reference project's four model files
  * executed AS SQL TEXT through `spark.sql`, unchanged except for rendering
  * the two Jinja constructs dbt would substitute (`{{ ref('x') }}` and the
  * project's `{{ date_trunc(part, col) }}` macro). This answers a migrating
  * dbt user's first question — "can I keep my SQL?" — with yes: the same
  * model texts drive the same Catalyst engine as the DataFrame API
  * ([[FictionBank]]); FictionBankSqlSpec asserts both surfaces produce
  * identical rows and the reference's golden values.
  *
  * Model texts are intentionally verbatim from the reference (cited per
  * val) — executing the user's existing SQL without edits IS the feature
  * being demonstrated.
  *
  * Scale note: `spark.sql` and the DataFrame API meet in the same logical
  * plan, so everything in [[FictionBank]]'s scale notes (broadcast dim
  * join, two-phase hash aggregates, column pruning) applies unchanged to
  * the SQL surface.
  */
object FictionBankSql {

  /** reference: models/staging/stg_loans.sql:1-19 (verbatim). */
  val StgLoans: String = """
with source as (
    select * from {{ ref('raw_loans') }}
),

renamed as (
    select
        loan_id,
        customer_id,
        loan_type_id,
        loan_amount,
        interest_rate,
        cast(loan_start_date as date) as loan_start_date,
        loan_term_months,
        property_address,
        property_value
    from source
)

select * from renamed
"""

  /** reference: models/staging/stg_loan_payments.sql:1-17 (verbatim). */
  val StgLoanPayments: String = """
with source as (
    select * from {{ ref('raw_loan_payments') }}
),

renamed as (
    select
        payment_id,
        loan_id,
        cast(payment_date as date) as payment_date,
        payment_amount,
        principal_paid,
        interest_paid,
        payment_status
    from source
)

select * from renamed
"""

  /** reference: models/marts/fct_loan_details.sql:1-39 (verbatim). Note
    * Spark parses `cast(x as numeric)` as DECIMAL(10,0) where DuckDB
    * defaults to DECIMAL(18,3); after the `round(_, 2)` both yield the
    * same 2-dp LTV on the seed domain (asserted golden in the spec).
    */
  val FctLoanDetails: String = """
with loans as (
    select * from {{ ref('stg_loans') }}
),

loan_types as (
    select * from {{ ref('loan_types') }}
),

loan_details as (
    select
        loans.loan_id,
        loans.customer_id,
        loans.loan_type_id,
        loan_types.loan_type_name,
        loan_types.description as loan_type_description,
        loans.loan_amount,
        loans.interest_rate,
        loans.loan_start_date,
        loans.loan_term_months,
        loan_types.typical_term_months,
        loans.property_address,
        loans.property_value,
        case
            when loans.property_value > 0
            then round((cast(loans.loan_amount as numeric) / cast(loans.property_value as numeric)) * 100, 2)
            else null
        end as ltv_ratio,
        round(
            loans.loan_amount * (loans.interest_rate / 100 / 12) *
            power(1 + (loans.interest_rate / 100 / 12), loans.loan_term_months) /
            (power(1 + (loans.interest_rate / 100 / 12), loans.loan_term_months) - 1),
            2
        ) as estimated_monthly_payment
    from loans
    left join loan_types
        on loans.loan_type_id = loan_types.loan_type_id
)

select * from loan_details
"""

  /** reference: models/marts/agg_monthly_loans.sql:1-53 (verbatim) — the
    * CHECKED-IN buggy variant, including the fan-out left join on
    * `loan_type_name` (:48-49) and the loan-grain `customer_id` in a
    * month-grain select (:36); 39 rows on the seeds.
    */
  val AggMonthlyLoans: String = """
with loans as (
    select * from {{ ref('fct_loan_details') }}
),

payments as (
    select * from {{ ref('stg_loan_payments') }}
),

monthly_originations as (
    select
        cast({{ date_trunc('month', 'loan_start_date') }} as date) as month_start,
        loan_type_name,
        count(distinct loan_id) as loans_originated,
        sum(loan_amount) as total_amount_originated,
        avg(loan_amount) as avg_loan_amount,
        avg(interest_rate) as avg_interest_rate
    from loans
    group by 1, 2
),

monthly_payments as (
    select
        cast({{ date_trunc('month', 'payment_date') }} as date) as month_start,
        count(distinct payment_id) as total_payments,
        sum(payment_amount) as total_payment_amount,
        sum(principal_paid) as total_principal_paid,
        sum(interest_paid) as total_interest_paid
    from payments
    group by 1
),

combined as (
    select
        coalesce(orig.month_start, pay.month_start) as month,
        orig.loan_type_name,
        loans.customer_id,
        coalesce(orig.loans_originated, 0) as new_loans,
        coalesce(orig.total_amount_originated, 0) as amount_originated,
        coalesce(orig.avg_loan_amount, 0) as avg_loan_size,
        coalesce(orig.avg_interest_rate, 0) as avg_rate,
        coalesce(pay.total_payments, 0) as payments_received,
        coalesce(pay.total_payment_amount, 0) as payment_volume,
        coalesce(pay.total_principal_paid, 0) as principal_collected,
        coalesce(pay.total_interest_paid, 0) as interest_collected
    from monthly_originations orig
    full outer join monthly_payments pay
        on orig.month_start = pay.month_start
    left join loans
        on orig.loan_type_name = loans.loan_type_name
)

select * from combined
order by month desc, loan_type_name
"""

  /** Models in dependency order, as (view name, jinja-SQL text). */
  val models: Seq[(String, String)] = Seq(
    "stg_loans" -> StgLoans,
    "stg_loan_payments" -> StgLoanPayments,
    "fct_loan_details" -> FctLoanDetails,
    "agg_monthly_loans" -> AggMonthlyLoans)

  /** `{{ ref('x') }}` in either dbt quote form (single or double); shared
    * with [[SqlDag]] so dependency EXTRACTION and RENDERING can never
    * disagree on what counts as a ref.
    */
  val RefPattern: scala.util.matching.Regex =
    raw"""\{\{\s*ref\(\s*['"]([^'"]+)['"]\s*\)\s*\}\}""".r
  private val DateTruncPattern =
    raw"\{\{\s*date_trunc\('([^']+)',\s*'([^']+)'\)\s*\}\}".r

  /** Render the two Jinja constructs dbt would substitute: `ref('x')` →
    * the relation name `x` (models/seeds registered as temp views), and
    * the project's `date_trunc(part, col)` macro → the SQL function call
    * (both Spark and DuckDB spell it `date_trunc('month', col)`).
    */
  def render(jinjaSql: String): String = {
    val refs = RefPattern.replaceAllIn(jinjaSql, m => m.group(1))
    DateTruncPattern.replaceAllIn(refs,
      m => s"date_trunc('${m.group(1)}', ${m.group(2)})")
  }

  /** `dbt run` over the SQL texts: register the seeds as temp views, then
    * build each model with `spark.sql` in dependency order, registering
    * every result as a view for downstream `ref()`s. Returns model name →
    * DataFrame.
    */
  def runAll(spark: SparkSession, seeds: Map[String, DataFrame]): Map[String, DataFrame] = {
    seeds.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    models.map { case (name, text) =>
      val df = spark.sql(render(text))
      df.createOrReplaceTempView(name)
      name -> df
    }.toMap
  }
}
