package graft.models

import org.apache.spark.sql.types._

import graft.SparkSpec

/** dbt seed `+column_types` config: the dbt_project.yml cascade
  * resolution ([[SeedConfig]]) and its Spark application
  * ([[graft.sources.Tables.seedCsvTyped]]) over the replicated
  * reference seed CSVs.
  */
class SeedConfigSpec extends SparkSpec {

  private val projectYml =
    """name: fiction_bank
      |seeds:
      |  fiction_bank:
      |    +column_types:
      |      loan_type_id: string
      |    raw_loans:
      |      +column_types:
      |        loan_amount: decimal(12,2)
      |        interest_rate: double
      |""".stripMargin

  test("column_types cascades from directory level and merges seed-level overrides") {
    assert(SeedConfig.columnTypes(projectYml, "raw_loans") === Map(
      "loan_type_id" -> "string",
      "loan_amount" -> "decimal(12,2)",
      "interest_rate" -> "double"))
    // a sibling seed under the same project key gets only the cascade
    assert(SeedConfig.columnTypes(projectYml, "loan_types") ===
      Map("loan_type_id" -> "string"))
  }

  test("deeper levels override the cascade per column") {
    val yml =
      """seeds:
        |  proj:
        |    +column_types:
        |      amount: bigint
        |    raw_loans:
        |      +column_types:
        |        amount: decimal(10,2)
        |""".stripMargin
    assert(SeedConfig.columnTypes(yml, "raw_loans") ===
      Map("amount" -> "decimal(10,2)"))
  }

  test("path form: an unlisted seed in a configured subdirectory gets the subdir cascade") {
    val yml =
      """name: proj
        |seeds:
        |  +column_types:
        |    a: string
        |  proj:
        |    +column_types:
        |      b: bigint
        |    raw:
        |      +column_types:
        |        c: double
        |      raw_loans:
        |        +column_types:
        |          d: date
        |""".stripMargin
    // dbt mirrors the filesystem: seeds/raw/anything.csv inherits the
    // raw/ directory cascade even with NO key of its own
    assert(SeedConfig.columnTypes(yml, "raw/unlisted_seed") ===
      Map("a" -> "string", "b" -> "bigint", "c" -> "double"))
    // a keyed seed under the subdir merges its own level on top
    assert(SeedConfig.columnTypes(yml, "raw/raw_loans") ===
      Map("a" -> "string", "b" -> "bigint", "c" -> "double", "d" -> "date"))
    // path segments that exist nowhere stop the descent at the last
    // configured level (project root here)
    assert(SeedConfig.columnTypes(yml, "elsewhere/unlisted_seed") ===
      Map("a" -> "string", "b" -> "bigint"))
    // bare-name resolution of the SAME keyed seed is unchanged
    assert(SeedConfig.columnTypes(yml, "raw_loans") ===
      Map("a" -> "string", "b" -> "bigint", "c" -> "double", "d" -> "date"))
  }

  test("no seeds key or unconfigured seed falls back to inference (empty map)") {
    assert(SeedConfig.columnTypes("name: p\n", "raw_loans") === Map.empty)
    assert(SeedConfig.columnTypes(projectYml, "raw_loan_payments") ===
      Map("loan_type_id" -> "string"))
    assert(SeedConfig.columnTypes("seeds:\n  other:\n    x: 1\n", "absent")
      === Map.empty)
  }

  test("bare column_types spelling is accepted; non-string type fails fast") {
    val yml = "seeds:\n  raw_loans:\n    column_types:\n      a: date\n"
    assert(SeedConfig.columnTypes(yml, "raw_loans") === Map("a" -> "date"))
    val bad = "seeds:\n  raw_loans:\n    +column_types:\n      a: 3\n"
    val e = intercept[IllegalArgumentException](
      SeedConfig.columnTypes(bad, "raw_loans"))
    assert(e.getMessage.contains("SQL type string"))
  }

  test("seedCsvTyped applies overrides over inference on the real seed CSV") {
    val df = graft.sources.Tables.seedCsvTyped(spark,
      SparkSpec.resource("/seeds/raw_loans.csv"),
      SeedConfig.columnTypes(projectYml, "raw_loans"))
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("loan_type_id") === StringType)       // cascade override
    assert(types("loan_amount") === DecimalType(12, 2)) // seed-level
    assert(types("interest_rate") === DoubleType)
    // unconfigured columns keep their inferred types
    assert(types("loan_id") === StringType)
    assert(types("loan_term_months") === IntegerType)
    // values survive the casts (golden row L001)
    val l1 = df.filter(org.apache.spark.sql.functions.col("loan_id") === "L001")
      .collect().head
    assert(l1.getAs[String]("loan_type_id") === "1")
    assert(l1.getAs[java.math.BigDecimal]("loan_amount")
      .compareTo(new java.math.BigDecimal("250000.00")) === 0)
  }

  test("override naming an absent column fails fast, as does a bad DDL type") {
    val e = intercept[IllegalArgumentException](
      graft.sources.Tables.seedCsvTyped(spark,
        SparkSpec.resource("/seeds/raw_loans.csv"),
        Map("not_a_column" -> "int")))
    assert(e.getMessage.contains("not_a_column"))
    val e2 = intercept[IllegalArgumentException](
      graft.sources.Tables.seedCsvTyped(spark,
        SparkSpec.resource("/seeds/raw_loans.csv"),
        Map("loan_amount" -> "not_a_type(")))
    assert(e2.getMessage.contains("loan_amount"))
  }
}
