package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generic dbt-style SQL DAG runner: takes ARBITRARY model SQL texts (the
  * user's own files, not just the reference's four — see
  * [[FictionBankSql]] for those), extracts `{{ ref('x') }}` dependencies,
  * topologically orders, and materializes each model per its declared
  * strategy, mirroring dbt_project.yml semantics (staging → view, marts →
  * table; reference: dbt_project.yml:19-22):
  *
  *  - `View`: registered as a temp view — downstream refs compose into
  *    one Catalyst plan (dbt's view behavior), and the relation stays
  *    addressable after the run.
  *  - `Table`: written to parquet under the warehouse dir and RE-READ, so
  *    downstream refs scan the materialized table, not the live plan —
  *    dbt's cut-point semantics, and the scale behavior you want anyway
  *    (a mart computed once, consumed many times).
  *  - `Ephemeral`: dbt's third strategy (not used by the reference, whose
  *    dbt_project.yml:19-22 configures only view/table) — the model's
  *    plan is INLINED into each consumer and nothing exists in the
  *    warehouse afterward. Spark-native expression: analysis is eager
  *    (`Dataset.ofRows` asserts it), so every consumer's analyzed plan
  *    embeds the ephemeral subtree at build time exactly like dbt's CTE
  *    interpolation; the temp view that carried the name during the
  *    build is dropped before `run` returns, so the relation is not
  *    addressable — same observable contract as dbt.
  *
  * Scale: the runner itself only orchestrates — per-model work is
  * whatever the SQL plans to; nothing is collected driver-side.
  */
object SqlDag {

  sealed trait Materialization
  case object View extends Materialization
  case object Table extends Materialization
  case object Ephemeral extends Materialization

  /** One model: a name, its Jinja-SQL text, and how to materialize it.
    * Companion-level type so model lists can be built once and shared
    * across runner instances.
    */
  final case class SqlModel(name: String, jinjaSql: String,
      materialization: Materialization = View)
}

class SqlDag(spark: SparkSession, warehouseDir: String) {
  import SqlDag._

  /** `ref()` targets of one model text (both dbt quote forms; the same
    * [[FictionBankSql.RefPattern]] drives rendering, so extraction and
    * substitution cannot drift).
    */
  def refsOf(jinjaSql: String): Set[String] =
    FictionBankSql.RefPattern.findAllMatchIn(jinjaSql).map(_.group(1)).toSet

  /** Lineage graph over the given models (seeds appear as leaf deps). */
  def lineage(models: Seq[SqlModel]): Map[String, Set[String]] =
    models.map(m => m.name -> refsOf(m.jinjaSql)).toMap

  /** `dbt run`: register seeds as views, build every model in dependency
    * order via `spark.sql` on the rendered text, materialize per config.
    * Fails fast on cycles, refs that resolve to neither a seed nor a
    * model, duplicate model names, and models shadowing a seed (dbt
    * errors on duplicate relation names; silently overwriting a seed
    * view would make sibling models' results depend on build order).
    */
  def run(models: Seq[SqlModel],
      seeds: Map[String, DataFrame]): Map[String, DataFrame] = {
    val dupNames = models.groupBy(_.name).collect { case (n, ms) if ms.size > 1 => n }
    require(dupNames.isEmpty, s"duplicate model names: ${dupNames.mkString(", ")}")
    val shadowing = models.map(_.name).toSet.intersect(seeds.keySet)
    require(shadowing.isEmpty,
      s"model names shadow seeds: ${shadowing.mkString(", ")}")
    val known = seeds.keySet ++ models.map(_.name)
    models.foreach { m =>
      val missing = refsOf(m.jinjaSql).diff(known)
      require(missing.isEmpty,
        s"model ${m.name} refs unknown relations: ${missing.mkString(", ")}")
    }
    seeds.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    var built: Map[String, DataFrame] = seeds
    var remaining = models
    while (remaining.nonEmpty) {
      val (ready, blocked) =
        remaining.partition(m => refsOf(m.jinjaSql).forall(built.contains))
      require(ready.nonEmpty,
        s"cyclic or unsatisfied deps among: ${blocked.map(_.name).mkString(", ")}")
      ready.foreach { m =>
        val df = spark.sql(FictionBankSql.render(m.jinjaSql))
        val materialized = m.materialization match {
          case View | Ephemeral => df
          case Table =>
            val path = s"$warehouseDir/${m.name}"
            df.write.mode("overwrite").parquet(path)
            spark.read.parquet(path)
        }
        materialized.createOrReplaceTempView(m.name)
        built += m.name -> materialized
      }
      remaining = blocked
    }
    // ephemeral models vanish after the build: consumers captured the
    // inlined plan during (eager) analysis, so dropping the carrier view
    // cannot break them — it only removes the name from the catalog,
    // which is the dbt contract (no relation in the warehouse)
    models.filter(_.materialization == Ephemeral).foreach { m =>
      spark.catalog.dropTempView(m.name)
      built -= m.name
    }
    built
  }
}
