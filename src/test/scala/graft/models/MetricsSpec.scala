package graft.models

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** dbt metrics nodes: YAML parsing with dbt's validation, and the
  * calculate(grain, dimensions) evaluation over a model frame.
  */
class MetricsSpec extends SparkSpec {

  private val yml =
    """version: 2
      |metrics:
      |  - name: revenue
      |    label: Revenue
      |    model: ref('orders_m')
      |    calculation_method: sum
      |    expression: amount
      |    timestamp: sold_at
      |    time_grains: [day, month]
      |    dimensions: [channel]
      |    filters:
      |      - field: status
      |        operator: '='
      |        value: "'ok'"
      |  - name: n_orders
      |    model: ref('orders_m')
      |    calculation_method: count
      |    timestamp: sold_at
      |    time_grains: [month]
      |""".stripMargin

  private def frame = {
    import SparkSpec.spark.implicits._
    Seq(
      ("2024-01-03", "web", "ok", 10.0),
      ("2024-01-20", "web", "ok", 5.0),
      ("2024-01-21", "shop", "ok", 7.0),
      ("2024-01-25", "web", "void", 100.0),
      ("2024-02-02", "web", "ok", 3.0))
      .toDF("sold_at_raw", "channel", "status", "amount")
      .withColumn("sold_at", col("sold_at_raw").cast("date"))
  }

  test("metrics parse with dbt's fields; absent block yields none") {
    val ms = Metrics.metrics(yml)
    assert(ms.map(_.name) === Seq("revenue", "n_orders"))
    val rev = ms.head
    assert(rev.model === "orders_m")
    assert(rev.calculationMethod === "sum")
    assert(rev.expression === Some("amount"))
    assert(rev.timeGrains === Seq("day", "month"))
    assert(rev.dimensions === Seq("channel"))
    assert(rev.filters === Seq(Metrics.MetricFilter("status", "=", "'ok'")))
    assert(ms(1).expression === None) // count needs no expression
    assert(Metrics.metrics("version: 2\n") === Nil)
  }

  test("calculate: filter → date_trunc grain → dimensional aggregate") {
    val rev = Metrics.metrics(yml).head
    val out = Metrics.calculate(frame, rev, grain = "month",
        dimensions = Seq("channel"))
      .orderBy("period", "channel").collect()
    // the 'void' row is filtered out by the metric's own filter
    assert(out.map(r => (r.getDate(0).toString, r.getString(1),
      r.getDouble(2))).toSeq === Seq(
      ("2024-01-01", "shop", 7.0), ("2024-01-01", "web", 15.0),
      ("2024-02-01", "web", 3.0)))
    // day grain, no dimensions: one row per sold day
    val daily = Metrics.calculate(frame, rev, grain = "day")
      .orderBy("period").collect()
    assert(daily.map(_.getDate(0)).toSeq === Seq(
      Date.valueOf("2024-01-03"), Date.valueOf("2024-01-20"),
      Date.valueOf("2024-01-21"), Date.valueOf("2024-02-02")))
    // count method aggregates rows, unfiltered (n_orders declares none)
    val n = Metrics.calculate(frame, Metrics.metrics(yml)(1), "month")
      .orderBy("period").collect()
    assert(n.map(_.getLong(1)).toSeq === Seq(4L, 1L))
  }

  test("calculate refuses undeclared grains and dimensions") {
    val rev = Metrics.metrics(yml).head
    assert(intercept[IllegalArgumentException] {
      Metrics.calculate(frame, rev, grain = "year") // not in time_grains
    }.getMessage.contains("time_grains"))
    assert(intercept[IllegalArgumentException] {
      Metrics.calculate(frame, rev, "month", Seq("status"))
    }.getMessage.contains("undeclared"))
  }

  test("parsing rejects the documented misuses") {
    def bad(y: String) =
      intercept[IllegalArgumentException](Metrics.metrics(y)).getMessage
    def metric(body: String) =
      s"metrics:\n  - name: m\n$body"
    // model must be a ref()
    assert(bad(metric(
      "    model: orders\n    calculation_method: count\n    timestamp: t\n    time_grains: [day]\n"))
      .contains("ref("))
    // closed method vocabulary
    assert(bad(metric(
      "    model: ref('x')\n    calculation_method: median\n    timestamp: t\n    time_grains: [day]\n"))
      .contains("calculation_method"))
    // non-count methods need an expression
    assert(bad(metric(
      "    model: ref('x')\n    calculation_method: sum\n    timestamp: t\n    time_grains: [day]\n"))
      .contains("expression"))
    // closed grain vocabulary
    assert(bad(metric(
      "    model: ref('x')\n    calculation_method: count\n    timestamp: t\n    time_grains: [fortnight]\n"))
      .contains("time grain"))
    // filter FIELD and OPERATOR come from allowlists; the VALUE stays a
    // trusted raw SQL fragment by dbt's own contract (see MetricFilter)
    // — the allowlists bound where a fragment can appear, not what a
    // trusted value may say
    assert(bad(metric(
      "    model: ref('x')\n    calculation_method: count\n    timestamp: t\n    time_grains: [day]\n" +
        "    filters:\n      - field: a\n        operator: '; drop'\n        value: '1'\n"))
      .contains("operator"))
    // filter fields must be identifiers
    assert(bad(metric(
      "    model: ref('x')\n    calculation_method: count\n    timestamp: t\n    time_grains: [day]\n" +
        "    filters:\n      - field: 'a or 1=1'\n        operator: '='\n        value: '1'\n"))
      .contains("identifier"))
  }
}
