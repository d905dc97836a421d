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

  // -------------------------------------------------------------------
  // Control flow: {% if %} / {% for %} (r6 verdict item #2)
  // -------------------------------------------------------------------

  test("for over a literal list; loop.last drives the separator") {
    val sql = "select {% for c in ['a', 'b', 'c'] %}sum({{ c }}) as s_{{ c }}" +
      "{% if not loop.last %}, {% endif %}{% endfor %} from t"
    assert(renderControlFlow(sql)
      === "select sum(a) as s_a, sum(b) as s_b, sum(c) as s_c from t")
  }

  test("for over range with loop.first — the dbt union-by-year idiom") {
    val sql = "{% for y in range(2021, 2024) %}" +
      "{% if not loop.first %} union all {% endif %}" +
      "select {{ y }} as y from t{{ y }}{% endfor %}"
    assert(renderControlFlow(sql) === "select 2021 as y from t2021" +
      " union all select 2022 as y from t2022" +
      " union all select 2023 as y from t2023")
  }

  test("if/elif/else over literal conditions: ==, !=, not/and/or, parens") {
    assert(renderControlFlow("{% if 'a' == 'a' and not false %}X{% else %}Y{% endif %}") === "X")
    assert(renderControlFlow("{% if 1 == 2 %}A{% elif 2 == 2 %}B{% else %}C{% endif %}") === "B")
    assert(renderControlFlow("{% if 1 == 2 %}A{% elif 3 == 2 %}B{% else %}C{% endif %}") === "C")
    assert(renderControlFlow("{% if (true or false) and 'x' != 'y' %}T{% endif %}") === "T")
    assert(renderControlFlow("{% if false %}T{% endif %}") === "")
  }

  test("nested for; loop.index; whitespace-control markers") {
    assert(renderControlFlow(
      "{% for a in ['x', 'y'] %}{% for b in range(1, 3) %}{{ a }}{{ b }} {% endfor %}{% endfor %}")
      === "x1 x2 y1 y2 ")
    assert(renderControlFlow(
      "{% for c in ['p', 'q'] %}{{ loop.index }}:{{ c }} {% endfor %}")
      === "1:p 2:q ")
    assert(renderControlFlow("a {%- if true %} b {%- endif %}") === "a b")
  }

  test("macro body control flow renders under bound params") {
    val defs = parse(
      "{% macro maybe_round(c, digits=0) %}{% if digits == 0 %}{{ c }}" +
        "{% else %}round({{ c }}, {{ digits }}){% endif %}{% endmacro %}")
    assert(expand("select {{ maybe_round('x') }}", defs) === "select x")
    assert(expand("select {{ maybe_round('x', 2) }}", defs)
      === "select round(x, 2)")
  }

  test("macro for-loop over a list-literal argument") {
    val defs = parse(
      "{% macro sum_cols(cols) %}{% for c in cols %}sum({{ c }})" +
        "{% if not loop.last %} + {% endif %}{% endfor %}{% endmacro %}")
    assert(expand("select {{ sum_cols(['a', 'b', 'c']) }} as tot", defs)
      === "select sum(a) + sum(b) + sum(c) as tot")
  }

  test("model-level loop var reaches macro-call args (control flow first)") {
    val defs = parse("{% macro dbl(c) %}{{ c }}*2{% endmacro %}")
    assert(renderModel(
      "{% for c in ['a', 'b'] %}{{ dbl(c) }} {% endfor %}", defs)
      === "a*2 b*2 ")
  }

  test("zero-arg call with whitespace binds defaults; trailing comma ok") {
    val defs = parse("{% macro pi(digits=2) %}3.14[{{ digits }}]{% endmacro %}")
    assert(expand("{{ pi( ) }}", defs) === "3.14[2]")
    assert(expand("{{ pi(4, ) }}", defs) === "3.14[4]")
  }

  test("paren defaults parse; unparseable {% macro %} fails with its name") {
    val defs = parse(
      "{% macro scaled(c, s=pow(10, 2)) %}{{ c }}/{{ s }}{% endmacro %}")
    assert(defs.head.params === Seq(("c", None), ("s", Some("pow(10, 2)"))))
    assert(expand("{{ scaled('x') }}", defs) === "x/pow(10, 2)")
    val e = intercept[IllegalArgumentException] {
      parse("{% macro broken(a, b=foo( %}x{% endmacro %}")
    }
    assert(e.getMessage.contains("broken"))
  }

  test("control flow failure modes fail fast") {
    intercept[IllegalArgumentException] { renderControlFlow("{% do audit() %}x") }
    intercept[IllegalArgumentException] {
      renderControlFlow("{% set x %}block form{% endset %}")
    }
    intercept[IllegalArgumentException] {
      renderControlFlow("{% for c in get_cols() %}x{% endfor %}")
    }
    intercept[IllegalArgumentException] { renderControlFlow("{% for c in ['a'] %}x") }
    intercept[IllegalArgumentException] {
      renderControlFlow("{% if undefined_var %}x{% endif %}")
    }
    intercept[IllegalArgumentException] { renderControlFlow("{% endif %}") }
  }

  test("SqlDag model using for + if builds end-to-end") {
    val s = spark
    import s.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-cf").toString
    val dag = new SqlDag(spark, wh)
    val models = Seq(SqlDag.SqlModel("m",
      "{% for y in range(1, 3) %}{% if not loop.first %} union all {% endif %}" +
        "select {{ y }} as grp, count(*) as n from {{ ref('src') }} " +
        "where id % 2 = {{ y }} - 1{% endfor %}"))
    val seeds = Map("src" -> (1 to 10).toDF("id"))
    val built = dag.run(models, seeds)
    val rows = built("m").orderBy("grp").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toList
    assert(rows === List((1, 5L), (2, 5L)))
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

  test("== / != compare numerically when both sides parse as numbers") {
    // Jinja: 1 == 1.0 is true; the old textual-only compare silently
    // took the wrong branch (r8 advice)
    assert(renderControlFlow("{% if 1 == 1.0 %}X{% else %}Y{% endif %}") === "X")
    assert(renderControlFlow("{% if 0 == 00 %}X{% else %}Y{% endif %}") === "X")
    assert(renderControlFlow("{% if 2 != 2.00 %}X{% else %}Y{% endif %}") === "Y")
    // mixed types stay textual: '1x' vs 1 is not a numeric comparison
    assert(renderControlFlow("{% if '1x' == 1 %}X{% else %}Y{% endif %}") === "Y")
    // strings stay textual even when quoted digits differ in form
    assert(renderControlFlow("{% if 'a' == 'a' %}X{% else %}Y{% endif %}") === "X")
  }

  test("{% set %}: literal bindings thread through the enclosing block") {
    assert(renderControlFlow("{% set x = 'v' %}{{ x }}|{{ x }}") === "v|v")
    assert(renderControlFlow("{% set n = 3 %}{% if n == 3.0 %}T{% endif %}") === "T")
    // a set inside a for body re-derives per iteration and does not escape
    assert(renderControlFlow(
      "{% set x = 'out' %}{% for i in range(1, 3) %}{% set x = i %}{{ x }}{% endfor %}{{ x }}")
      === "12out")
    // set value may reference earlier bindings and loop vars
    assert(renderControlFlow(
      "{% for c in ['a'] %}{% set y = c %}{{ y }}{% endfor %}") === "a")
    // rhs must be present
    intercept[IllegalArgumentException] { renderControlFlow("{% set x %}") }
  }

  test("var(): bindings, defaults, conditions, macro bodies, fail-fast") {
    val vars = Map("env" -> "prod", "min_n" -> "5")
    // whole-span prints the raw value; bare call in a condition quotes it
    assert(renderModel("select {{ var('env') }}", vars = vars) === "select prod")
    assert(renderModel("{% if var('env') == 'prod' %}P{% else %}D{% endif %}",
      vars = vars) === "P")
    // numeric values stay raw in expressions and compare numerically
    assert(renderModel("where n >= {{ var('min_n') }}", vars = vars)
      === "where n >= 5")
    assert(renderModel("{% if var('min_n') == 5.0 %}T{% endif %}", vars = vars)
      === "T")
    // default used when unbound; binding wins over default
    assert(renderModel("{{ var('missing', 'dflt') }}") === "dflt")
    assert(renderModel("{{ var('env', 'dev') }}", vars = vars) === "prod")
    // {% set %} may capture a var
    assert(renderModel("{% set s = var('env') %}[{{ s }}]", vars = vars)
      === "[prod]")
    // var() inside a macro body resolves at call time ({{ }}-wrapped,
    // Jinja syntax — a bare var() in plain body SQL is NOT a Jinja call)
    val defs = parse(
      "{% macro gate(c) %}{{ c }} >= {{ var('min_n') }}{% endmacro %}")
    assert(renderModel("{{ gate('n') }}", defs, vars = vars) === "n >= 5")
    // a var inside a string literal is never touched
    assert(renderModel("select 'var(x)' as s") === "select 'var(x)' as s")
    // undefined + no default fails fast with the var's name
    val e = intercept[IllegalArgumentException] {
      renderModel("{{ var('nope') }}", vars = vars)
    }
    assert(e.getMessage.contains("nope"))
    // name must be a string literal
    intercept[IllegalArgumentException] {
      renderModel("{{ var(name) }}", vars = vars)
    }
  }

  test("set escapes if-blocks (dbt if/set/else/set idiom); for stays scoped") {
    assert(renderControlFlow(
      "{% if true %}{% set x = 'a' %}{% else %}{% set x = 'b' %}{% endif %}{{ x }}")
      === "a")
    assert(renderControlFlow(
      "{% if false %}{% set x = 'a' %}{% else %}{% set x = 'b' %}{% endif %}{{ x }}")
      === "b")
    // nested: a set in an inner taken branch reaches after the outer end
    assert(renderControlFlow(
      "{% if true %}{% if true %}{% set y = 'z' %}{% endif %}{% endif %}{{ y }}")
      === "z")
    // for remains a scope (unchanged contract)
    assert(renderControlFlow(
      "{% set x = 'out' %}{% for i in range(1, 2) %}{% set x = i %}{% endfor %}{{ x }}")
      === "out")
  }

  test("== compares quoted strings as strings; numeric only when both unquoted") {
    // Jinja: '1' == '1.0' is False (string compare)
    assert(renderControlFlow("{% if '1' == '1.0' %}X{% else %}Y{% endif %}") === "Y")
    assert(renderControlFlow("{% if '1' == '1' %}X{% else %}Y{% endif %}") === "X")
    // unquoted numerics still compare numerically
    assert(renderControlFlow("{% if 1 == 1.0 %}X{% else %}Y{% endif %}") === "X")
  }

  test("var() is Jinja-span-scoped: plain SQL with var identifiers or apostrophes untouched") {
    val vars = Map("m" -> "5")
    // a UDF/column named var in plain SQL is NOT a Jinja var call
    assert(renderModel("select var(x) as v from t", vars = vars)
      === "select var(x) as v from t")
    // an unpaired apostrophe (SQL comment) cannot desync resolution
    assert(renderModel("-- don't sample\nselect {{ var('m') }}", vars = vars)
      === "-- don't sample\nselect 5")
    assert(renderModel(
      "-- it's filtered\n{% if var('m') == 5 %}A{% else %}B{% endif %}",
      vars = vars) === "-- it's filtered\nA")
    // a quoted 'var(x)' INSIDE a span stays a string literal
    assert(renderModel("{% if 'var(x)' == 'var(x)' %}T{% endif %}", vars = vars)
      === "T")
    // a string value with a quote: whole-span prints raw, inline fails fast
    assert(renderModel("{{ var('n') }}", vars = Map("n" -> "O'Brien"))
      === "O'Brien")
    intercept[IllegalArgumentException] {
      renderModel("{% if var('n') == 'x' %}T{% endif %}",
        vars = Map("n" -> "O'Brien"))
    }
  }

  test("non-literal {% set %} RHS and var() defaults fail fast; set keeps quotedness") {
    // the documented fail-fast is now real (r8 review: a call RHS
    // previously passed silently into SQL)
    intercept[IllegalArgumentException] {
      renderControlFlow("{% set cols = get_columns() %}{{ cols }}")
    }
    // quoted values containing parens are literals, not calls
    assert(renderControlFlow("{% set f = 'a(b)' %}{{ f }}") === "a(b)")
    // a nested-call var() default cannot be evaluated — fail, never leak
    intercept[IllegalArgumentException] {
      renderModel("{{ var('a', var('b')) }}", vars = Map("b" -> "x"))
    }
    // a set-bound quoted digit string compares as a STRING (Jinja:
    // '1' == '1.0' is false), while print still unquotes
    assert(renderControlFlow(
      "{% set v = '1' %}{% if v == '1.0' %}X{% else %}Y{% endif %}{{ v }}")
      === "Y1")
    assert(renderControlFlow(
      "{% set v = '1' %}{% if v == '1' %}X{% else %}Y{% endif %}") === "X")
  }

  test("var(): list-literal values drive {% for %} (the dbt vars-as-YAML-list idiom)") {
    val vars = Map("langs" -> "['en', 'de', 'zh']")
    assert(renderModel(
      "{% for l in var('langs') %}{{ l }};{% endfor %}", vars = vars)
      === "en;de;zh;")
    // list default when unbound
    assert(renderModel(
      "{% for x in var('missing', [1, 2]) %}{{ x }}{% endfor %}")
      === "12")
  }

  test("filters: whole-span | chains on var prints; fail-fast outside the set") {
    val vars = Map("s" -> "  open ", "p" -> "1-urg%", "r" -> "EU-west")
    assert(renderModel("{{ var('s') | trim | upper }}", vars = vars) === "OPEN")
    assert(renderModel("{{ var('s') | trim }}", vars = vars) === "open")
    assert(renderModel("{{ var('x', 'Mixed') | lower }}") === "mixed")
    assert(renderModel("{{ var('p') | replace('%', '') | upper }}",
      vars = vars) === "1-URG")
    assert(renderModel("{{ var('r') | replace(\"-\", \"_\") }}", vars = vars)
      === "EU_west")
    // filters apply through the var() DEFAULT path too
    assert(renderModel("{{ var('missing', '  pad  ') | trim }}") === "pad")
    // whitespace-control markers are span syntax, not filter content
    assert(renderModel("A {{- var('s') | trim -}} B", vars = vars)
      === "A open B")
    // unknown filter names the offender; arity/argument-kind errors too
    val e1 = intercept[IllegalArgumentException] {
      renderModel("{{ var('s') | titlecase }}", vars = vars)
    }
    assert(e1.getMessage.contains("titlecase"))
    intercept[IllegalArgumentException] {
      renderModel("{{ var('s') | replace('a') }}", vars = vars)
    }
    intercept[IllegalArgumentException] {
      renderModel("{{ var('s') | replace(1, 2) }}", vars = vars)
    }
    intercept[IllegalArgumentException] {
      renderModel("{{ var('s') | upper(1) }}", vars = vars)
    }
    // a filter inside a LARGER expression/tag is outside the subset —
    // the {% set %} literals-only check rejects the piped RHS
    intercept[IllegalArgumentException] {
      renderModel("{% set x = var('s') | upper %}{{ x }}", vars = vars)
    }
  }

  test("filters: whitespace before the argument list is valid Jinja (r9 advice)") {
    val vars = Map("p" -> "1-urg%")
    // `| replace ("a","b")` used to parse as a 0-arg replace and die
    // with a MISLEADING "unsupported filter" for a supported name
    assert(renderModel("{{ var('p') | replace ('%', '') | upper }}",
      vars = vars) === "1-URG")
    assert(renderModel("{{ var('p') | replace\t('%', '!') }}", vars = vars)
      === "1-urg!")
  }

  test("filters: | default fires ONLY for undefined var with no var() default") {
    // undefined + no var default: the filter supplies the value …
    assert(renderModel("{{ var('missing') | default('fb') }}") === "fb")
    // … and the rest of the chain applies to it
    assert(renderModel("{{ var('missing') | default('fb') | upper }}")
      === "FB")
    // numeric / boolean literals accepted unquoted
    assert(renderModel("{{ var('missing') | default(42) }}") === "42")
    assert(renderModel("{{ var('missing') | default(true) }}") === "true")
    // a bound var wins — default is a no-op
    assert(renderModel("{{ var('x') | default('fb') }}",
      vars = Map("x" -> "bound")) === "bound")
    // dbt precedence: a var()-level default wins over the filter —
    // `| default` NEVER fires when var() already defaulted
    assert(renderModel("{{ var('missing', 'vd') | default('fb') }}")
      === "vd")
    assert(renderModel("{{ var('missing', 'vd') | default('fb') | upper }}")
      === "VD")
    // a non-default chain on an undefined var keeps the canonical
    // fail-fast (dbt compile error), not a silent empty string
    val e = intercept[IllegalArgumentException] {
      renderModel("{{ var('missing') | upper }}")
    }
    assert(e.getMessage.contains("undefined"))
    // default NOT in leading position cannot rescue an undefined var
    intercept[IllegalArgumentException] {
      renderModel("{{ var('missing') | upper | default('fb') }}")
    }
    // arity error names the filter, not the var
    val e2 = intercept[IllegalArgumentException] {
      renderModel("{{ var('missing') | default('a', 'b') }}")
    }
    assert(e2.getMessage.contains("default"))
    // non-literal argument rejected
    intercept[IllegalArgumentException] {
      renderModel("{{ var('missing') | default(foo()) }}")
    }
  }

  test("randomized laws: var/set round-trips over arbitrary names and values") {
    val rnd = new scala.util.Random(7)
    def ident(): String =
      ("abcxyz_"(rnd.nextInt(7)).toString +
        Seq.fill(1 + rnd.nextInt(6))("abcdefgh_0123"(rnd.nextInt(13))).mkString)
    def value(): String = rnd.nextInt(3) match {
      case 0 => rnd.nextInt(10000).toString
      case 1 => Seq.fill(1 + rnd.nextInt(8))("klmnop 42"(rnd.nextInt(9))).mkString.trim match {
        case "" => "zz"; case s => s }
      case _ => (rnd.nextDouble() * 100).toString
    }
    (1 to 50).foreach { _ =>
      val (n, v) = (ident(), value())
      // law 1: a bound var prints its raw value through a whole span
      assert(renderModel(s"A {{ var('$n') }} B", vars = Map(n -> v)) === s"A $v B")
      // law 2: {% set %} of the same var prints identically
      assert(renderModel(s"{% set x = var('$n') %}A {{ x }} B",
        vars = Map(n -> v)) === s"A $v B")
      // law 3: a var always == itself in a condition (numeric or textual)
      assert(renderModel(
        s"{% if var('$n') == var('$n') %}T{% else %}F{% endif %}",
        vars = Map(n -> v)) === "T")
      // law 4: default is a no-op when the binding exists
      assert(renderModel(s"{{ var('$n', 'other') }}", vars = Map(n -> v)) === v)
      // law 5: substitution never touches text without var/set/{{ }}
      val plain = s"select $v as c from t"
      assert(renderModel(plain, vars = Map(n -> v)) === plain)
    }
  }
}
