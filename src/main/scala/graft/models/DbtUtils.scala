package graft.models

/** dbt_utils compatibility shims — the most-used macros of dbt's
  * de-facto standard package, expressed IN the repo's own Jinja subset
  * (a real `{% macro %}` file parsed by [[JinjaMacros.parse]], not
  * Scala string surgery), so a migrating project's call sites run
  * unchanged. Each macro is registered under its bare name (dbt's
  * unprefixed dispatch) AND the `dbt_utils.` package spelling.
  *
  * Coverage (semantics per the published dbt_utils implementations):
  *  - `generate_surrogate_key(fields)` / legacy `surrogate_key`:
  *    md5 over the '-'-joined, null-sentineled, string-cast fields —
  *    including dbt_utils' exact null sentinel, so keys computed here
  *    equal keys computed by dbt_utils on the same rows.
  *  - `safe_divide(numerator, denominator)`: NULL on zero denominator.
  *  - `hash(field)`: md5 of the string-cast field (legacy shim).
  *  - `date_spine(datepart, start_date, end_date)`: one row per
  *    `datepart` step in [start_date, end_date) — the half-open
  *    interval dbt_utils documents — as `date_<datepart>`. Spark
  *    expression: explode(sequence(...)), a generated relation with no
  *    input scan. `start_date`/`end_date` are SQL EXPRESSIONS, exactly
  *    as dbt_utils documents its call sites — pass
  *    `"cast('2019-01-01' as date)"` or a quoted literal `"'2019-01-01'"`
  *    (the shim wraps each argument in its own `cast(… as date)`, a
  *    no-op on an already-date expression), never a bare unquoted
  *    `2019-01-01` (r11 advice: the shim used to add its own quotes,
  *    which broke dbt_utils' documented expression-style arguments).
  *
  * Scale: every shim expands to engine SQL at COMPILE time —
  * whole-stage-codegen expressions (md5, nullif, sequence), zero UDFs,
  * zero driver work at run time.
  *
  * Out of scope (documented, fail-fast by absence): `star`/`pivot`
  * (need run-time schema introspection — use the DataFrame API, which
  * is the Spark-native spelling of those), `get_column_values`
  * (a query, not a compile-time macro).
  */
object DbtUtils {

  /** The shim macro file (parseable dbt macro syntax; one-line bodies —
    * [[JinjaMacros.parse]] trims the body either way).
    */
  val macroSource: String = """
{% macro generate_surrogate_key(fields) %}md5(cast({% for f in fields %}coalesce(cast({{ f }} as string), '_dbt_utils_surrogate_key_null_'){% if not loop.last %} || '-' || {% endif %}{% endfor %} as string)){% endmacro %}

{% macro surrogate_key(fields) %}md5(cast({% for f in fields %}coalesce(cast({{ f }} as string), '_dbt_utils_surrogate_key_null_'){% if not loop.last %} || '-' || {% endif %}{% endfor %} as string)){% endmacro %}

{% macro safe_divide(numerator, denominator) %}(({{ numerator }}) / nullif({{ denominator }}, 0)){% endmacro %}

{% macro hash(field) %}md5(cast({{ field }} as string)){% endmacro %}

{% macro date_spine(datepart, start_date, end_date) %}select explode(sequence(cast({{ start_date }} as date), cast({{ end_date }} as date) - interval 1 day, interval 1 {{ datepart }})) as date_{{ datepart }}{% endmacro %}
"""

  /** The registered shim set: bare names + `dbt_utils.`-qualified
    * aliases. Pass alongside (or concatenated with) the project's own
    * macros: `dag.run(models, seeds, macros = DbtUtils.macros ++ mine)`.
    */
  val macros: Seq[JinjaMacros.MacroDef] = {
    val base = JinjaMacros.parse(macroSource)
    base ++ base.map(m => m.copy(name = s"dbt_utils.${m.name}"))
  }
}
