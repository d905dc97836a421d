package graft.models

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import scala.jdk.CollectionConverters._

/** dbt `profiles.yml` — named connection targets (reference
  * `dbt_project.yml:4` declares `profile: 'fiction_bank'`; the
  * profiles file itself lives OUTSIDE the project, in `~/.dbt/`, which
  * is why the reference repo doesn't ship one). For a warehouse engine
  * a target is a connection + schema + thread count; for this Spark
  * engine the SparkSession IS the connection, so a target maps to what
  * actually varies between dev/prod here: the warehouse directory
  * models materialize into ([[SqlDag]]'s constructor argument), an
  * optional schema label, and the `threads` that [[SqlDag.run]] takes.
  *
  * Shape (the dbt layout, with Spark-meaningful keys):
  * {{{
  * fiction_bank:
  *   target: dev            # default output, --target overrides
  *   outputs:
  *     dev:
  *       path: target/dev_warehouse   # or warehouse_dir:
  *       schema: dev
  *       threads: 1
  *     prod:
  *       path: /warehouse/prod
  *       threads: 8
  * }}}
  *
  * `path` is dbt-duckdb's key for the warehouse location and
  * `warehouse_dir` the explicit spelling — either works (both present
  * and disagreeing refuses). Everything fails fast with the dbt error
  * shape: unknown profile / unknown target names list what IS
  * available; a profile without `outputs`, a `target:` naming a
  * missing output, or a non-positive `threads` are config errors.
  */
object Profiles {

  final case class Target(name: String, warehouseDir: String,
      schema: Option[String], threads: Int)

  final case class Profile(name: String, defaultTarget: String,
      outputs: Map[String, Target])

  private val mapper = new ObjectMapper(new YAMLFactory)

  /** Parse a profiles.yml text into profile-name → [[Profile]]. */
  def parse(yaml: String): Map[String, Profile] = {
    val root = mapper.readTree(yaml)
    require(root != null && root.isObject && root.properties.asScala.nonEmpty,
      "profiles.yml must be a non-empty mapping of profile names")
    root.properties.asScala.map { e =>
      val (pname, node) = (e.getKey, e.getValue)
      require(node.isObject, s"profile '$pname' must be a mapping")
      val outputsNode = Option(node.get("outputs"))
        .getOrElse(throw new IllegalArgumentException(
          s"profile '$pname' has no `outputs`"))
      require(outputsNode.isObject && outputsNode.properties.asScala.nonEmpty,
        s"profile '$pname': `outputs` must be a non-empty mapping")
      val outputs = outputsNode.properties.asScala.map { o =>
        val (tname, t) = (o.getKey, o.getValue)
        require(t.isObject, s"profile '$pname' target '$tname' must be a mapping")
        def str(k: String): Option[String] =
          Option(t.get(k)).filter(n => n.isTextual && n.asText.nonEmpty)
            .map(_.asText)
        val path = (str("path"), str("warehouse_dir")) match {
          case (Some(a), Some(b)) if a != b =>
            throw new IllegalArgumentException(
              s"profile '$pname' target '$tname': `path` ('$a') and " +
                s"`warehouse_dir` ('$b') disagree — set one")
          case (a, b) => a.orElse(b).getOrElse(
            throw new IllegalArgumentException(
              s"profile '$pname' target '$tname' needs `path` (or " +
                "`warehouse_dir`) — the directory models materialize into"))
        }
        val threads = Option(t.get("threads")).map { n =>
          require(n.canConvertToInt && n.asInt >= 1,
            s"profile '$pname' target '$tname': `threads` must be a " +
              s"positive integer, got ${n.asText}")
          n.asInt
        }.getOrElse(1)
        tname -> Target(tname, path, str("schema"), threads)
      }.toMap
      val default = Option(node.get("target")).filter(_.isTextual).map(_.asText)
        .getOrElse(throw new IllegalArgumentException(
          s"profile '$pname' has no `target` (the default output)"))
      require(outputs.contains(default),
        s"profile '$pname': default target '$default' is not in outputs " +
          s"(${outputs.keys.toSeq.sorted.mkString(", ")})")
      pname -> Profile(pname, default, outputs)
    }.toMap
  }

  /** Resolve the target a run should use — dbt's selection rule:
    * `profile:` from dbt_project.yml names the profile, `--target`
    * (when given) names the output, else the profile's own `target:`
    * default. Unknown names refuse, listing what exists.
    */
  def select(profiles: Map[String, Profile], profile: String,
      target: Option[String] = None): Target = {
    val p = profiles.getOrElse(profile,
      throw new IllegalArgumentException(
        s"profile '$profile' not found in profiles.yml (defined: " +
          s"${profiles.keys.toSeq.sorted.mkString(", ")}) — dbt_project.yml's " +
          "`profile:` must name one"))
    val tname = target.getOrElse(p.defaultTarget)
    p.outputs.getOrElse(tname,
      throw new IllegalArgumentException(
        s"target '$tname' not defined for profile '$profile' (outputs: " +
          s"${p.outputs.keys.toSeq.sorted.mkString(", ")})"))
  }
}
