package graft.models

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The generic SQL DAG runner: the reference project's four model texts
  * with dbt_project.yml materializations (staging → view, marts → table),
  * PLUS a user-authored fifth model — proving a migrating dbt user can
  * run their own SQL files, not just the ported ones.
  */
class SqlDagSpec extends SparkSpec {

  import SqlDag._

  test("reference models + a user model run topologically with dbt materializations") {
    val wh = java.nio.file.Files.createTempDirectory("graft-sqldag").toString
    val dag = new SqlDag(spark, wh)
    // deliberately out of dependency order — the runner must topo-sort;
    // the user model uses dbt's double-quoted ref form
    val models = Seq(
      SqlModel("agg_monthly_loans", FictionBankSql.AggMonthlyLoans, Table),
      SqlModel("fct_loan_details", FictionBankSql.FctLoanDetails, Table),
      SqlModel("stg_loans", FictionBankSql.StgLoans, View),
      SqlModel("stg_loan_payments", FictionBankSql.StgLoanPayments, View),
      // a user's own new model over the ported marts
      SqlModel("mortgage_ltv_rank", """
        select loan_id, ltv_ratio,
               rank() over (order by ltv_ratio desc) as ltv_rank
        from {{ ref("fct_loan_details") }}
        where loan_type_name = 'Mortgage' and ltv_ratio is not null
      """, View))
    val built = dag.run(models, fictionBankSeeds)

    assert(built("stg_loans").count() === 10)
    assert(built("agg_monthly_loans").count() === 39)
    // marts materialized as parquet and re-read (cut-point semantics)
    assert(new java.io.File(s"$wh/fct_loan_details").exists())
    assert(new java.io.File(s"$wh/agg_monthly_loans").exists())
    assert(!new java.io.File(s"$wh/stg_loans").exists())
    // the user model computed over the materialized mart
    val top = built("mortgage_ltv_rank")
      .filter(col("ltv_rank") === 1).head()
    assert(top.getAs[String]("loan_id") === "L001") // ltv 83.33 is the max
    // lineage extracted from the SQL texts themselves
    assert(dag.lineage(models)("fct_loan_details") === Set("stg_loans", "loan_types"))
    assert(dag.lineage(models)("mortgage_ltv_rank") === Set("fct_loan_details"))
  }

  test("unknown refs, cycles, duplicate names and seed shadowing fail fast") {
    val dag = new SqlDag(spark, "/tmp/unused-wh")
    val bad = intercept[IllegalArgumentException] {
      dag.run(Seq(SqlModel("m1", "select * from {{ ref('nope') }}")), fictionBankSeeds)
    }
    assert(bad.getMessage.contains("nope"))
    val cyc = intercept[IllegalArgumentException] {
      dag.run(Seq(
        SqlModel("a", "select * from {{ ref('b') }}"),
        SqlModel("b", "select * from {{ ref('a') }}")), fictionBankSeeds)
    }
    assert(cyc.getMessage.contains("cyclic"))
    val dup = intercept[IllegalArgumentException] {
      dag.run(Seq(
        SqlModel("m", "select 1 as x"),
        SqlModel("m", "select 2 as x")), fictionBankSeeds)
    }
    assert(dup.getMessage.contains("duplicate"))
    // a model named like a seed would silently shadow it for siblings,
    // making results depend on build order — dbt errors; so do we
    val shadow = intercept[IllegalArgumentException] {
      dag.run(Seq(SqlModel("loan_types", "select 1 as x")), fictionBankSeeds)
    }
    assert(shadow.getMessage.contains("shadow"))
  }
}
