package graft.models

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import scala.jdk.CollectionConverters._

/** dbt `schema.yml` test configuration, parsed into [[GenericTests]]
  * (reference: dbt_project.yml:8 configures `test-paths`; dbt's standard
  * authoring surface binds generic tests declaratively in YAML next to
  * the models). With this, an all-SQL user authors models as text
  * ([[SqlDag]]) AND tests as text — no Scala anywhere:
  *
  * {{{
  * version: 2
  * models:
  *   - name: stg_loans
  *     columns:
  *       - name: loan_id
  *         tests:
  *           - unique
  *           - not_null
  *       - name: loan_type_id
  *         tests:
  *           - accepted_values:
  *               values: [1, 2, 3]
  *           - relationships:
  *               to: ref('loan_types')
  *               field: loan_type_id
  * }}}
  *
  * Supported generic tests are dbt's four built-ins, mapped 1:1 onto
  * [[GenericTests]]; test names follow dbt's `<test>_<model>_<column>`
  * convention so reports read identically. Unknown test names, missing
  * fields, and malformed YAML fail fast at parse time — a typo'd test
  * must never silently not-run.
  *
  * Scale: parsing is driver-side metadata only; each produced test is
  * one bounded Spark job (see [[GenericTests]] scale notes).
  */
object SchemaConfig {

  private val mapper = new ObjectMapper(new YAMLFactory)

  /** Parse schema.yml text into named data tests. `relationships.to`
    * accepts `ref('name')` (resolved against the built relations at run
    * time) or a bare relation name.
    */
  def tests(yamlText: String): Seq[GenericTests.DataTest] = {
    val root = mapper.readTree(yamlText)
    val models = Option(root.get("models"))
      .getOrElse(throw new IllegalArgumentException(
        "schema config has no `models` key"))
    require(models.isArray, "`models` must be a list")
    models.elements.asScala.flatMap { m =>
      val model = reqText(m, "name", "model")
      Option(m.get("columns")).toSeq.flatMap(_.elements.asScala).flatMap { c =>
        val column = reqText(c, "name", s"column of model $model")
        Option(c.get("tests")).toSeq.flatMap(_.elements.asScala).map { t =>
          toTest(model, column, t)
        }
      }
    }.toSeq
  }

  /** One test node: either a bare scalar (`- unique`) or a one-key map
    * with arguments (`- accepted_values: {values: [...]}`).
    */
  private def toTest(model: String, column: String,
      node: JsonNode): GenericTests.DataTest = {
    val (kind, args): (String, JsonNode) =
      if (node.isTextual) (node.asText, mapper.createObjectNode())
      else {
        val fields = node.properties.asScala.toSeq
        require(fields.size == 1,
          s"test entry on $model.$column must be one scalar or one single-key map, got: $node")
        (fields.head.getKey, fields.head.getValue)
      }
    def rel(built: Map[String, org.apache.spark.sql.DataFrame], name: String) =
      built.getOrElse(name, throw new IllegalArgumentException(
        s"test on $model.$column references unknown relation: $name"))
    kind match {
      case "unique" => GenericTests.DataTest(s"unique_${model}_$column",
        built => GenericTests.unique(rel(built, model), column))
      case "not_null" => GenericTests.DataTest(s"not_null_${model}_$column",
        built => GenericTests.notNull(rel(built, model), column))
      case "accepted_values" =>
        val vn = Option(args.get("values")).getOrElse(
          throw new IllegalArgumentException(
            s"accepted_values on $model.$column needs `values`"))
        require(vn.isArray, s"accepted_values.values on $model.$column must be a list")
        val values: Seq[Any] = vn.elements.asScala.map(scalar(_,
          s"accepted_values value on $model.$column")).toSeq
        GenericTests.DataTest(s"accepted_values_${model}_$column",
          built => GenericTests.acceptedValues(rel(built, model), column, values))
      case "relationships" =>
        val to = refName(reqText(args, "to", s"relationships on $model.$column"))
        val field = reqText(args, "field", s"relationships on $model.$column")
        GenericTests.DataTest(s"relationships_${model}_$column",
          built => GenericTests.relationships(rel(built, model), column,
            rel(built, to), field))
      case other => throw new IllegalArgumentException(
        s"unknown generic test `$other` on $model.$column " +
          "(supported: unique, not_null, accepted_values, relationships)")
    }
  }

  /** One dbt exposure (dbt docs: exposures — a named downstream use of
    * the DAG, declared in schema.yml, selectable as `exposure:name`).
    * `dependsOn` holds resolved relation names (the YAML writes
    * `ref('x')`).
    */
  final case class Exposure(name: String, exposureType: String,
      dependsOn: Seq[String], ownerName: Option[String],
      ownerEmail: Option[String], url: Option[String],
      maturity: Option[String], description: Option[String])

  /** dbt's closed exposure-type vocabulary. */
  private val ExposureTypes =
    Set("dashboard", "notebook", "analysis", "ml", "application")
  private val Maturities = Set("high", "medium", "low")
  private val IdentifierPattern = "^[A-Za-z0-9_]+$".r

  /** Parse the `exposures:` block of a schema.yml. A file without one
    * yields Nil (most schema.yml files carry only models). Validation
    * is dbt's: `name` (identifier), `type` (one of dbt's five), a
    * non-empty `depends_on` of `ref(...)` entries, and an `owner` with
    * at least one of `name`/`email`; `maturity`, when present, must be
    * high/medium/low. Unknown extra keys (`meta`, `tags`, …) are
    * ignored, as dbt ignores what it does not model. Every violation
    * fails fast — an exposure that silently drops a dependency would
    * select the wrong sub-DAG in `+exposure:` runs.
    */
  def exposures(yamlText: String): Seq[Exposure] = {
    val root = mapper.readTree(yamlText)
    Option(root.get("exposures")).toSeq.flatMap { list =>
      require(list.isArray, "`exposures` must be a list")
      list.elements.asScala.map { e =>
        val name = reqText(e, "name", "exposure")
        require(IdentifierPattern.matches(name),
          s"exposure name '$name' must be [A-Za-z0-9_]+")
        val tpe = reqText(e, "type", s"exposure $name")
        require(ExposureTypes(tpe),
          s"exposure $name: unknown type '$tpe' " +
            s"(dbt's: ${ExposureTypes.toSeq.sorted.mkString(", ")})")
        val depsNode = Option(e.get("depends_on")).getOrElse(
          throw new IllegalArgumentException(
            s"exposure $name needs `depends_on`"))
        require(depsNode.isArray && depsNode.size > 0,
          s"exposure $name: `depends_on` must be a non-empty list")
        val deps = depsNode.elements.asScala.map { d =>
          require(d.isTextual,
            s"exposure $name: depends_on entries must be ref(...) strings")
          refName(d.asText)
        }.toSeq
        val owner = Option(e.get("owner")).getOrElse(
          throw new IllegalArgumentException(s"exposure $name needs `owner`"))
        val oName = Option(owner.get("name")).filter(_.isTextual).map(_.asText)
        val oMail = Option(owner.get("email")).filter(_.isTextual).map(_.asText)
        require(oName.nonEmpty || oMail.nonEmpty,
          s"exposure $name: owner needs `name` or `email`")
        val maturity =
          Option(e.get("maturity")).filter(_.isTextual).map(_.asText)
        maturity.foreach(m => require(Maturities(m),
          s"exposure $name: maturity must be high/medium/low, got '$m'"))
        Exposure(name, tpe, deps, oName, oMail,
          url = Option(e.get("url")).filter(_.isTextual).map(_.asText),
          maturity = maturity,
          description =
            Option(e.get("description")).filter(_.isTextual).map(_.asText))
      }.toSeq
    }
  }

  private val RefInTo = """ref\(\s*['"]([A-Za-z0-9_]+)['"]\s*\)""".r

  /** `ref('x')` → x; a bare name passes through. */
  private def refName(to: String): String = to.trim match {
    case RefInTo(name) => name
    case bare => bare
  }

  private def reqText(n: JsonNode, field: String, where: String): String =
    Option(n.get(field)).filter(_.isTextual).map(_.asText).getOrElse(
      throw new IllegalArgumentException(s"$where needs a string `$field`"))

  /** YAML scalar → the JVM value Spark's `isin` expects. */
  private def scalar(n: JsonNode, where: String): Any =
    if (n.isInt || n.isLong) n.asLong
    else if (n.isFloatingPointNumber) n.asDouble
    else if (n.isBoolean) n.asBoolean
    else if (n.isTextual) n.asText
    else throw new IllegalArgumentException(s"$where must be a scalar, got: $n")
}
