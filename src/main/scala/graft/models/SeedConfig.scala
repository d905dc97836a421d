package graft.models

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import scala.jdk.CollectionConverters._

/** dbt `dbt_project.yml` seed configuration — the `column_types`
  * override (dbt docs: seed configs; the reference project's
  * dbt_project.yml carries no seed config, so this is the
  * deep-ecosystem surface a migrating user's OWN project brings).
  * In dbt, seeds load with agate type inference unless
  * `+column_types` pins a column to an explicit SQL type:
  *
  * {{{
  * seeds:
  *   fiction_bank:
  *     +column_types:          # cascades to every seed below
  *       loaded_at: timestamp
  *     raw_loans:
  *       +column_types:        # seed-level, overrides the cascade
  *         loan_amount: bigint
  *         interest_rate: decimal(5,2)
  * }}}
  *
  * dbt's config hierarchy cascades top-down — a `+column_types` at a
  * project or directory level applies to every seed beneath it, and a
  * deeper level overrides per column. [[columnTypes]] reproduces that:
  * it walks every path from `seeds:` to the named seed key, merging
  * `+column_types` maps shallow-to-deep. The bare `column_types`
  * spelling (valid in dbt_project.yml) is accepted alongside `+`.
  *
  * The Spark-side application lives in
  * [[graft.sources.Tables.seedCsvTyped]]: header CSV read with schema
  * inference (agate's role), then one `cast` per override — all
  * analysis-time, no extra pass over the data beyond the inference
  * scan (seeds are small by dbt's own definition).
  *
  * Driver-side string/YAML work only; nothing here touches data.
  */
object SeedConfig {

  private val mapper = new ObjectMapper(new YAMLFactory)

  /** The merged `column_types` map in effect for `seedName`, walking
    * the `seeds:` hierarchy (deeper levels override shallower, per
    * column). A seed NOT named anywhere in the tree still inherits the
    * project-root cascade — in dbt the hierarchy mirrors the seeds/
    * filesystem, so a seed file with no explicit key sits directly
    * under the project name (the top-level `name:`) and picks up
    * whatever `+column_types` cascades to that level. A project file
    * with no `seeds:` key, or no config reaching the seed, yields an
    * empty map — dbt's "fall back to inference". Non-string type
    * values fail fast.
    *
    * A seed living in a configured SUBDIRECTORY should be passed as its
    * path, e.g. `"raw/raw_loans"`: dbt's hierarchy mirrors the seeds/
    * filesystem, so `seeds.<project>.raw.+column_types` applies to
    * every CSV under `seeds/raw/` whether or not the file has its own
    * key — the path form walks project → each directory segment → the
    * seed key (each level that EXISTS contributes its config; absent
    * levels just stop the descent), which the bare-name form cannot do
    * for unlisted seeds (it only inherits the project-root cascade).
    */
  def columnTypes(yamlText: String, seedName: String): Map[String, String] = {
    val root = mapper.readTree(yamlText)
    Option(root.get("seeds")) match {
      case None => Map.empty
      case Some(seeds) if seedName.contains('/') =>
        // path form: seeds-level config, then the project key, then one
        // level per path segment — dbt's filesystem-mirroring cascade.
        // The project level resolves via the root `name:` key when it
        // matches a seeds child; otherwise (no `name`, or seeds keyed
        // under a package name differing from root name — r11 advice)
        // fall back to every seeds child whose subtree contains the
        // path's first segment, mirroring the bare-name form's any-path
        // merge, with the same conflicting-config guard.
        val segs = seedName.split('/').toSeq
        def cascade(project: JsonNode): Map[String, String] = {
          var acc = typesOf(project, "project")
          var node: Option[JsonNode] = Some(project)
          segs.foreach { seg =>
            node = node.flatMap(n => Option(n.get(seg)))
            node.filter(_.isObject).foreach(n => acc = acc ++ typesOf(n, seg))
          }
          acc
        }
        val base = typesOf(seeds, "seeds")
        val named = Option(root.get("name")).filter(_.isTextual).map(_.asText)
          .flatMap(n => Option(seeds.get(n))).filter(_.isObject)
        named match {
          case Some(project) => base ++ cascade(project)
          case None =>
            // candidates: the seeds node itself (path directly under
            // seeds:, no project level) plus every non-config child
            // whose subtree starts the path
            val candidates =
              Option(seeds).filter(s => Option(s.get(segs.head)).isDefined).toSeq ++
                seeds.properties.asScala.toSeq
                  .filterNot(e => isConfigKey(e.getKey))
                  .map(_.getValue)
                  .filter(c => c.isObject && Option(c.get(segs.head)).isDefined)
            val merges = candidates.map(cascade).distinct
            require(merges.size <= 1,
              s"seed '$seedName' has conflicting column_types at multiple paths")
            base ++ merges.headOption.getOrElse(Map.empty)
        }
      case Some(seeds) =>
        // collect the merge along every path ending at `seedName`;
        // dbt resolves a seed under its project/subdir keys, so the
        // seed key can sit at any depth
        def walk(node: JsonNode, inherited: Map[String, String],
            key: String): Seq[Map[String, String]] = {
          // a seed key may carry config (object), or appear with a null
          // body under a configured directory — the cascade still applies
          val own =
            if (node.isObject) inherited ++ typesOf(node, key) else inherited
          val here = if (key == seedName) Seq(own) else Nil
          val kids =
            if (!node.isObject) Nil
            else node.properties.asScala.toSeq
              .filterNot(e => isConfigKey(e.getKey))
              .flatMap(e => walk(e.getValue, own, e.getKey))
          here ++ kids
        }
        val hits = walk(seeds, Map.empty, key = "")
        // a seed name appearing twice in the tree with conflicting
        // config is a project-file bug, not a tie to break silently
        require(hits.distinct.size <= 1,
          s"seed '$seedName' has conflicting column_types at multiple paths")
        hits.headOption.getOrElse {
          // unlisted seed: inherit the project-root cascade — config
          // directly under `seeds:` plus the project-name key's own
          // (dbt: seeds/<seed>.csv resolves under seeds.<project>)
          val atSeedsLevel = typesOf(seeds, "seeds")
          val projectKey = Option(root.get("name")).filter(_.isTextual)
            .map(_.asText).flatMap(n => Option(seeds.get(n)))
          atSeedsLevel ++ projectKey.filter(_.isObject)
            .fold(Map.empty[String, String])(typesOf(_, "project"))
        }
    }
  }

  private def isConfigKey(k: String): Boolean =
    k.startsWith("+") || k == "column_types"

  /** The `+column_types` / `column_types` map directly on `node`. */
  private def typesOf(node: JsonNode, where: String): Map[String, String] = {
    val ct = Option(node.get("+column_types")).orElse(
      Option(node.get("column_types")))
    ct.fold(Map.empty[String, String]) { m =>
      require(m.isObject, s"column_types under '$where' must be a mapping")
      m.properties.asScala.map { e =>
        require(e.getValue.isTextual,
          s"column_types.${e.getKey} under '$where' must be a SQL type string")
        e.getKey -> e.getValue.asText
      }.toMap
    }
  }
}
