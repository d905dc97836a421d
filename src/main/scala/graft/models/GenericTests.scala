package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt's four built-in generic data tests as library helpers (reference:
  * README.md:53-54 `dbt test`; dbt_project.yml:8 configures `test-paths`
  * but the project ships no tests dir, so these cover the lifecycle verb
  * the reference documents). Each helper returns a MUST-BE-EMPTY
  * DataFrame of violating rows — the M3 pattern ([[FictionBank.grainTest]],
  * docs/bug-analysis.md:139-157): a test passes iff its frame is empty,
  * and on failure the frame IS the diagnostic (the offending keys/rows).
  *
  * Scale: `unique` is one hash aggregate on the tested key; `notNull` and
  * `acceptedValues` are pushdown-able scan filters; `relationships` is a
  * left-anti join whose parent side is typically a broadcast-size dim.
  * Nothing collects to the driver — at 100 TB each test is one bounded
  * Spark job whose output is only the violations.
  */
object GenericTests {

  /** `unique`: key tuples appearing more than once, with their counts.
    * dbt semantics: rows with a NULL in the tested column(s) are exempt
    * (dbt's generated SQL filters `where column is not null`; nullability
    * is `not_null`'s job) — two NULL keys are NOT a uniqueness violation.
    */
  def unique(df: DataFrame, cols: String*): DataFrame =
    df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** `not_null`: rows whose `c` is NULL. */
  def notNull(df: DataFrame, c: String): DataFrame =
    df.filter(col(c).isNull)

  /** `accepted_values`: rows whose non-NULL `c` is outside `values`
    * (dbt semantics: NULLs are not violations — pair with [[notNull]]).
    */
  def acceptedValues(df: DataFrame, c: String, values: Seq[Any]): DataFrame =
    df.filter(col(c).isNotNull && !col(c).isin(values: _*))

  /** `relationships`: child rows whose non-NULL foreign key `c` has no
    * match in `parent.parentCol` (dbt's referential-integrity test).
    */
  def relationships(df: DataFrame, c: String,
      parent: DataFrame, parentCol: String): DataFrame =
    df.filter(col(c).isNotNull)
      .join(parent.select(col(parentCol).as("__parent_key")).distinct(),
        col(c) === col("__parent_key"), "left_anti")

  /** A named test over built relations: `frame(built)` must be empty. */
  final case class DataTest(name: String,
      frame: Map[String, DataFrame] => DataFrame)

  /** `dbt test` analog: evaluate each test, returning name → violation
    * count (0 = pass). One Spark job per test; no driver-side data.
    */
  def run(tests: Seq[DataTest],
      built: Map[String, DataFrame]): Seq[(String, Long)] =
    tests.map(t => t.name -> t.frame(built).count())
}
