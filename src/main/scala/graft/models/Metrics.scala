package graft.models

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType
import scala.jdk.CollectionConverters._

/** dbt `metrics:` nodes (dbt v1.3-era semantic layer — metric
  * definitions declared in YAML next to the models, computed with
  * `metrics.calculate(metric('name'), grain=…, dimensions=[…])`).
  * The reference project declares none (pedagogy repo), so this is
  * deep-ecosystem surface a migrating user's own project brings; the
  * YAML shape and the calculate contract follow dbt's public docs:
  *
  * {{{
  * metrics:
  *   - name: revenue
  *     label: Revenue
  *     model: ref('orders_enriched')
  *     calculation_method: sum      # count | count_distinct | sum |
  *     expression: o_totalprice     #   average | min | max
  *     timestamp: order_date
  *     time_grains: [day, month, year]
  *     dimensions: [priority]
  *     filters:
  *       - field: o_orderstatus
  *         operator: '='
  *         value: "'O'"
  * }}}
  *
  * [[calculate]] is the Spark-native evaluation: one declarative
  * `filter → groupBy(date_trunc(grain, ts), dims…) → agg` chain over
  * the metric's (already-built) model frame — Catalyst sees a plain
  * aggregate, so partial aggregation, pushdown, and AQE all apply; at
  * 100 TB the metric costs exactly what the equivalent hand-written
  * rollup costs. Validation is dbt's, fail-fast: unknown
  * calculation_method, a grain outside `time_grains`, or a requested
  * dimension outside `dimensions` must never silently compute
  * something else.
  */
object Metrics {

  private val mapper = new ObjectMapper(new YAMLFactory)

  /** One filter conjunct: rendered as `field operator value` with the
    * value text inlined verbatim (dbt's filters are raw SQL fragments —
    * the YAML quotes string literals itself, e.g. `value: "'O'"`).
    * Deliberate asymmetry: `field`/`operator` are allowlisted (typo
    * protection), but `value` is a TRUSTED fragment — a value like
    * `"1 OR x IS NOT NULL"` widens the metric exactly as it would in
    * dbt. The project YAML is code; review it as such.
    */
  final case class MetricFilter(field: String, operator: String,
      value: String)

  /** One parsed metric definition. `model` holds the resolved relation
    * name (the YAML writes `ref('x')`). */
  final case class MetricDef(name: String, label: Option[String],
      model: String, calculationMethod: String, expression: Option[String],
      timestamp: String, timeGrains: Seq[String], dimensions: Seq[String],
      filters: Seq[MetricFilter])

  /** dbt's calculation_method vocabulary (v1.3; `derived` metrics —
    * expressions over OTHER metrics — are out of scope and fail fast).
    */
  private val Methods =
    Set("count", "count_distinct", "sum", "average", "min", "max")

  /** Spark `date_trunc` accepts all of dbt's standard grains. */
  private val Grains = Set("day", "week", "month", "quarter", "year")

  private val RefInModel = """ref\(\s*['"]([A-Za-z0-9_]+)['"]\s*\)""".r
  private val IdentifierPattern = "^[A-Za-z0-9_]+$".r
  private val Operators = Set("=", "!=", "<>", "<", "<=", ">", ">=",
    "is", "is not", "like", "in")

  /** Parse the `metrics:` block of a schema.yml. A file without one
    * yields Nil. Every dbt-required field is required here
    * (`name`, `model`, `calculation_method`, `timestamp`,
    * `time_grains`; `expression` for every method except `count`),
    * vocabularies are closed, and filter operators come from a fixed
    * allowlist — a metric is an API other people query, so a typo must
    * fail at parse time, not compute garbage.
    */
  def metrics(yamlText: String): Seq[MetricDef] = {
    val root = mapper.readTree(yamlText)
    Option(root.get("metrics")).toSeq.flatMap { list =>
      require(list.isArray, "`metrics` must be a list")
      list.elements.asScala.map { m =>
        val name = reqText(m, "name", "metric")
        require(IdentifierPattern.matches(name),
          s"metric name '$name' must be [A-Za-z0-9_]+")
        val where = s"metric $name"
        val model = reqText(m, "model", where).trim match {
          case RefInModel(r) => r
          case other =>
            throw new IllegalArgumentException(
              s"$where: `model` must be ref('name'), got '$other'")
        }
        val method = reqText(m, "calculation_method", where)
        require(Methods(method), s"$where: unknown calculation_method " +
          s"'$method' (supported: ${Methods.toSeq.sorted.mkString(", ")})")
        val expression =
          Option(m.get("expression")).filter(_.isTextual).map(_.asText)
        require(method == "count" || expression.nonEmpty,
          s"$where: calculation_method '$method' needs `expression`")
        val grains = Option(m.get("time_grains")).getOrElse(
          throw new IllegalArgumentException(s"$where needs `time_grains`"))
        require(grains.isArray && grains.size > 0,
          s"$where: `time_grains` must be a non-empty list")
        val timeGrains = grains.elements.asScala.map { g =>
          require(g.isTextual && Grains(g.asText),
            s"$where: unknown time grain '$g' " +
              s"(supported: ${Grains.toSeq.sorted.mkString(", ")})")
          g.asText
        }.toSeq
        val dims = Option(m.get("dimensions")).toSeq
          .flatMap(_.elements.asScala).map { d =>
            require(d.isTextual && IdentifierPattern.matches(d.asText),
              s"$where: dimensions must be column identifiers, got '$d'")
            d.asText
          }
        val filters = Option(m.get("filters")).toSeq
          .flatMap(_.elements.asScala).map { f =>
            val field = reqText(f, "field", s"$where filter")
            require(IdentifierPattern.matches(field),
              s"$where: filter field '$field' must be a column identifier")
            val op = reqText(f, "operator", s"$where filter")
            require(Operators(op.toLowerCase),
              s"$where: unsupported filter operator '$op'")
            MetricFilter(field, op, reqText(f, "value", s"$where filter"))
          }
        MetricDef(name,
          label = Option(m.get("label")).filter(_.isTextual).map(_.asText),
          model = model, calculationMethod = method,
          expression = expression, timestamp = reqText(m, "timestamp", where),
          timeGrains = timeGrains, dimensions = dims, filters = filters)
      }.toSeq
    }
  }

  /** dbt's `metrics.calculate(metric('m'), grain, dimensions)` over the
    * metric's built model frame: filters apply as SQL conjuncts, the
    * timestamp truncates to `grain` as a DATE column named `period`,
    * requested dimensions group alongside it, and the aggregate lands
    * in a column named after the metric. `grain` must be one of the
    * metric's declared `time_grains` and every requested dimension one
    * of its declared `dimensions` — dbt refuses both at query time.
    *
    * Scale: one shuffle on (period, dims) with map-side partial
    * aggregation; filters sit below it and push into the scan.
    */
  def calculate(modelFrame: DataFrame, metric: MetricDef, grain: String,
      dimensions: Seq[String] = Nil): DataFrame = {
    require(metric.timeGrains.contains(grain),
      s"metric ${metric.name}: grain '$grain' not in declared " +
        s"time_grains ${metric.timeGrains.mkString("[", ", ", "]")}")
    val undeclared = dimensions.filterNot(metric.dimensions.contains)
    require(undeclared.isEmpty,
      s"metric ${metric.name}: undeclared dimensions " +
        undeclared.mkString(", "))
    val filtered = metric.filters.foldLeft(modelFrame) { (df, f) =>
      df.filter(s"${f.field} ${f.operator} ${f.value}")
    }
    val aggCol: Column = metric.calculationMethod match {
      case "count"          => count(lit(1))
      case "count_distinct" => countDistinct(col(metric.expression.get))
      case "sum"            => sum(col(metric.expression.get))
      case "average"        => avg(col(metric.expression.get))
      case "min"            => min(col(metric.expression.get))
      case "max"            => max(col(metric.expression.get))
    }
    val period =
      date_trunc(grain, col(metric.timestamp)).cast(DateType).as("period")
    filtered
      .groupBy(period +: dimensions.map(col): _*)
      .agg(aggCol.as(metric.name))
  }

  private def reqText(n: JsonNode, field: String, where: String): String =
    Option(n.get(field)).filter(_.isTextual).map(_.asText).getOrElse(
      throw new IllegalArgumentException(s"$where needs a string `$field`"))
}
