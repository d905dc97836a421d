package graft.models

import graft.SparkSpec
import JinjaMacros._

/** User-defined `{% macro %}` parsing and expansion — the dbt authoring
  * construct beyond the reference's own files — plus an end-to-end
  * SqlDag run proving macro-introduced refs drive dependency order.
  */
class JinjaMacrosSpec extends SparkSpec {

  private val macroSource = """
    {% macro cents_to_dollars(column_name, scale=2) %}
      round({{ column_name }} / 100.0, {{ scale }})
    {%- endmacro %}

    {% macro money(col) %}
      {{ cents_to_dollars(col, scale=4) }} as money_{{ col }}
    {% endmacro %}
  """

  test("parse: names, params, defaults, trimmed bodies") {
    val defs = parse(macroSource)
    assert(defs.map(_.name) === Seq("cents_to_dollars", "money"))
    assert(defs.head.params === Seq(("column_name", None), ("scale", Some("2"))))
    assert(defs.head.body === "round({{ column_name }} / 100.0, {{ scale }})")
  }

  test("expand: positional + default, keyword override, quoted args unquote") {
    val defs = parse(macroSource)
    assert(expand("select {{ cents_to_dollars('amt') }} from t", defs)
      === "select round(amt / 100.0, 2) from t")
    assert(expand("select {{ cents_to_dollars(amt, scale=4) }} from t", defs)
      === "select round(amt / 100.0, 4) from t")
    // nested parens and commas inside an argument stay intact
    assert(expand("select {{ cents_to_dollars(coalesce(a, b)) }} from t", defs)
      === "select round(coalesce(a, b) / 100.0, 2) from t")
  }

  test("expand: macros calling macros; non-macro jinja passes through") {
    val defs = parse(macroSource)
    assert(expand("select {{ money('amt') }} from {{ ref('x') }}", defs)
      === "select round(amt / 100.0, 4) as money_amt from {{ ref('x') }}")
  }

  test("parse/expand failure modes fail fast") {
    intercept[IllegalArgumentException] { parse("{% macro broken(a) %} no end") }
    intercept[IllegalArgumentException] {
      parse("{% macro d(a) %}x{% endmacro %}{% macro d(b) %}y{% endmacro %}")
    }
    val defs = parse(macroSource)
    intercept[IllegalArgumentException] { // missing required arg
      expand("{{ cents_to_dollars() }}", defs)
    }
    intercept[IllegalArgumentException] { // unknown keyword
      expand("{{ cents_to_dollars('a', nope=1) }}", defs)
    }
    intercept[IllegalArgumentException] { // recursion guard (growing body)
      val rec = parse("{% macro loop_(a) %}x {{ loop_(a) }}{% endmacro %}")
      expand("{{ loop_(1) }}", rec)
    }
  }

  test("SqlDag.run expands macros first; macro-introduced refs drive deps") {
    val s = spark
    import s.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-macros").toString
    val dag = new SqlDag(spark, wh)
    val macros = parse("""
      {% macro loans_base() %}select * from {{ ref('stg') }}{% endmacro %}
      {% macro dollars(c) %}round({{ c }} / 100.0, 2){% endmacro %}
    """)
    // the downstream model's ONLY dependency on stg comes from the macro
    // body — declared out of order, so topo order proves extraction saw
    // the expanded text
    val models = Seq(
      SqlDag.SqlModel("mart", "select id, {{ dollars('cents') }} as usd from ({{ loans_base() }})"),
      SqlDag.SqlModel("stg", "select id, cents from {{ ref('raw_cents') }}"))
    val seeds = Map("raw_cents" -> Seq((1, 150), (2, 999)).toDF("id", "cents"))
    val built = dag.run(models, seeds, macros = macros)
    // 100.0 parses as DECIMAL in Spark SQL, so usd is a decimal column
    val rows = built("mart").orderBy("id").collect()
      .map(r => (r.getInt(0), r.getDecimal(1).toPlainString)).toList
    assert(rows === List((1, "1.50"), (2, "9.99")))
  }
}
