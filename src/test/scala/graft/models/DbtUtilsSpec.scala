package graft.models

import graft.SparkSpec

/** The dbt_utils shim package: expansion goldens (the generated SQL is
  * the contract — dbt_utils key parity depends on the exact sentinel
  * and separator) and end-to-end execution through SqlDag.
  */
class DbtUtilsSpec extends SparkSpec {

  test("shims parse and register under bare AND dbt_utils.-qualified names") {
    val names = DbtUtils.macros.map(_.name)
    val expected = Seq("generate_surrogate_key", "surrogate_key",
      "safe_divide", "hash", "date_spine")
    expected.foreach { n =>
      assert(names.contains(n), s"missing bare $n")
      assert(names.contains(s"dbt_utils.$n"), s"missing qualified $n")
    }
    assert(names.size === expected.size * 2)
  }

  test("generate_surrogate_key expands to dbt_utils' exact md5 shape; both spellings agree") {
    val bare = JinjaMacros.renderModel(
      "{{ generate_surrogate_key(['a', 'b']) }}", DbtUtils.macros)
    val qualified = JinjaMacros.renderModel(
      "{{ dbt_utils.generate_surrogate_key(['a', 'b']) }}", DbtUtils.macros)
    assert(bare === qualified)
    // the published shape: null sentinel, '-' separator, outer cast+md5
    assert(bare ===
      "md5(cast(coalesce(cast(a as string), '_dbt_utils_surrogate_key_null_')" +
        " || '-' || " +
        "coalesce(cast(b as string), '_dbt_utils_surrogate_key_null_')" +
        " as string))")
  }

  test("safe_divide yields NULL on zero; surrogate keys are stable md5 hex") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "A", 10.0, 0), (2L, null.asInstanceOf[String], 30.0, 3))
      .toDF("id", "grp", "amt", "d")
    df.createOrReplaceTempView("du_rows")
    val sql = JinjaMacros.renderModel(
      "select id, {{ dbt_utils.generate_surrogate_key(['id', 'grp']) }} as sk, " +
        "{{ safe_divide('amt', 'd') }} as ratio from du_rows order by id",
      DbtUtils.macros)
    val rows = spark.sql(sql).collect()
    // row 1: md5('1-A'); zero denominator -> NULL
    assert(rows(0).getString(1) ===
      java.security.MessageDigest.getInstance("MD5")
        .digest("1-A".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(rows(0).isNullAt(2))
    // row 2: null field -> the dbt_utils sentinel participates
    assert(rows(1).getString(1) ===
      java.security.MessageDigest.getInstance("MD5")
        .digest("2-_dbt_utils_surrogate_key_null_".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(rows(1).getDouble(2) === 10.0)
  }

  test("date_spine generates the half-open interval as date_<datepart>") {
    // dbt_utils' documented call style: the date arguments are SQL
    // EXPRESSIONS (r11 advice: the shim must not add its own quotes)
    val sql = JinjaMacros.renderModel(
      """{{ dbt_utils.date_spine('day', "cast('2024-01-01' as date)", "cast('2024-01-05' as date)") }}""",
      DbtUtils.macros)
    val out = spark.sql(sql)
    assert(out.columns.toSeq === Seq("date_day"))
    val days = out.collect().map(_.getDate(0).toString).sorted
    assert(days === Array("2024-01-01", "2024-01-02", "2024-01-03",
      "2024-01-04")) // end date excluded, dbt_utils' contract
  }

  test("date_spine also accepts quoted date-literal expressions") {
    // the other common dbt_utils spelling: start_date="'2024-01-01'"
    val sql = JinjaMacros.renderModel(
      """{{ date_spine('day', "'2024-01-01'", "'2024-01-03'") }}""",
      DbtUtils.macros)
    val days = spark.sql(sql).collect().map(_.getDate(0).toString).sorted
    assert(days === Array("2024-01-01", "2024-01-02"))
  }
}
