package graft.models

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import scala.jdk.CollectionConverters._

/** dbt package loading — the `dbt deps` verb for LOCAL packages
  * (reference README.md:45 runs `dbt deps`; dbt_project.yml:13-15
  * declares `clean-targets: dbt_packages`, the install target). A
  * package is a dbt project directory: `dbt_project.yml` (its name and
  * vars), `.sql` macro files ({% macro %} files), `.sql` model files (a
  * sub-DAG). Loading brings its macros into the Jinja registry under
  * BOTH spellings dbt dispatches — the bare name and the
  * `package.macro` qualified form — and its models into the run's DAG
  * rendered with the package's own var defaults (root-project vars
  * override them, dbt's precedence).
  *
  * Zero-egress analog of the hub: dbt resolves packages.yml against
  * hub.getdbt.com / git; here the package must already be on local
  * disk (a vendored `dbt_packages/` checkout — the state `dbt deps`
  * produces), which is the part of the verb an ENGINE owns. The
  * dominant hub package's macros (dbt_utils) ship as
  * [[DbtUtils.macroSource]]; loading that same text through this
  * loader is spec-pinned equal to the hand-registered [[DbtUtils.macros]].
  *
  * Scale: driver-side file reads and string work only — nothing here
  * touches executors.
  */
object Packages {

  /** One loaded package: its declared name, parsed macros (bare +
    * qualified spellings), model sub-DAG (raw Jinja — rendered at
    * [[SqlDag.run]] time with the package's vars), and var defaults.
    */
  final case class Package(name: String,
      macros: Seq[JinjaMacros.MacroDef],
      models: Seq[SqlDag.SqlModel],
      vars: Map[String, String])

  private val mapper = new ObjectMapper(new YAMLFactory)

  private def readFile(f: java.io.File): String =
    new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)

  private def sqlFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
      .filter(f => f.isFile && f.getName.endsWith(".sql"))
      .sortBy(_.getName)

  /** Load a package directory. Fails fast on: a missing
    * `dbt_project.yml` (not a package), a missing/invalid `name`, a
    * macro defined twice WITHIN the package (two files or one — the
    * qualified spelling would silently shadow), and a model filename
    * collision. `vars` must be scalars (the Jinja subset's var model).
    */
  def load(dir: String): Package = {
    val root = new java.io.File(dir)
    require(root.isDirectory, s"package directory not found: $dir")
    val projFile = new java.io.File(root, "dbt_project.yml")
    require(projFile.isFile,
      s"$dir has no dbt_project.yml — not a dbt package")
    val proj = mapper.readTree(readFile(projFile))
    val name = Option(proj.get("name")).filter(_.isTextual).map(_.asText)
      .getOrElse(throw new IllegalArgumentException(
        s"$dir/dbt_project.yml needs a string `name`"))
    require("^[A-Za-z0-9_]+$".r.matches(name),
      s"package name '$name' must be [A-Za-z0-9_]+ (it namespaces macros)")
    val vars: Map[String, String] = Option(proj.get("vars")).map { v =>
      require(v.isObject, s"package $name: `vars` must be a map")
      v.properties.asScala.map { e =>
        val n = e.getValue
        require(n.isValueNode && !n.isNull,
          s"package $name: var '${e.getKey}' must be a scalar")
        e.getKey -> n.asText
      }.toMap
    }.getOrElse(Map.empty)
    val bare = sqlFiles(new java.io.File(root, "macros"))
      .flatMap(f => JinjaMacros.parse(readFile(f)))
    val dupMacros = bare.groupBy(_.name).collect {
      case (n, ms) if ms.size > 1 => n
    }
    require(dupMacros.isEmpty,
      s"package $name defines macros twice: ${dupMacros.mkString(", ")}")
    val modelFiles = sqlFiles(new java.io.File(root, "models"))
    val models = modelFiles.map(f =>
      SqlDag.SqlModel(f.getName.stripSuffix(".sql"), readFile(f)))
    Package(name,
      bare ++ bare.map(m => m.copy(name = s"$name.${m.name}")),
      models, vars)
  }
}
