package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the null-rate / cardinality summary a data-quality
  * dashboard (or `dbt docs`' catalog statistics) shows per column, and
  * the first thing a training-data pipeline computes about a new corpus
  * drop.
  *
  * Scale: ONE pass over the input for ALL profiled columns — the counts
  * ride a single aggregation (Catalyst plans the multi-distinct via one
  * Expand), never a scan per column; at 100 TB, k separate per-column
  * scans would be k× the dominant I/O. The long-form reshape afterwards
  * is a per-row Generate on the single wide result row. Exact
  * `countDistinct` shuffles each column's values once; swap in
  * [[Sketches.approxDistinct]] per column when cardinalities are huge
  * and ±5% suffices.
  */
object Profile {

  /** `(col_name, n_rows, n_nonnull, n_distinct)` per profiled column —
    * all exact integers (NULLs excluded from both counts, the SQL
    * convention).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.distinct.size == cols.size,
      s"profiled columns must be non-empty and distinct: $cols")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c"))) :+ count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = explode(array(cols.map(c => struct(
      lit(c).as("col_name"),
      col(s"__nn_$c").as("n_nonnull"),
      col(s"__nd_$c").as("n_distinct"))): _*)).as("e")
    wide.select(col("__n").as("n_rows"), entries)
      .select(col("e.col_name").as("col_name"), col("n_rows"),
        col("e.n_nonnull").as("n_nonnull"),
        col("e.n_distinct").as("n_distinct"))
  }

  /** Tukey IQR outlier profile per group over an integer-cents value
    * column: `(group, n, n_outliers, kept_min, kept_max)` with bounds
    * `[Q1 − 1.5·IQR, Q3 + 1.5·IQR]` — the standard distribution-free
    * outlier fence a cleaning pipeline applies before training-data
    * statistics. Determinism: quartiles are exact interpolated
    * percentiles on integer cents (the x9b parity recipe), the fence
    * arithmetic is one pinned single-rounding float expression, and a
    * long-vs-double comparison promotes identically on both engines.
    * Scale: one percentile aggregation per group + one re-scan with the
    * ≤|groups| fence table broadcast — no per-row state.
    */
  def iqrOutliers(df: DataFrame, group: String, cents: Column): DataFrame = {
    val base = df.filter(cents.isNotNull)
      .select(col(group), cents.cast("long").as("cents"))
    val fences = base.groupBy(col(group)).agg(
        expr("percentile(cents, 0.25e0)").as("q1"),
        expr("percentile(cents, 0.75e0)").as("q3"))
      .select(col(group),
        (col("q1") - lit(1.5) * (col("q3") - col("q1"))).as("lo"),
        (col("q3") + lit(1.5) * (col("q3") - col("q1"))).as("hi"))
    val in = col("cents") >= col("lo") && col("cents") <= col("hi")
    base.join(broadcast(fences), Seq(group))
      .groupBy(col(group))
      .agg(count(lit(1)).as("n"),
        sum(when(!in, 1L).otherwise(0L)).as("n_outliers"),
        (min(when(in, col("cents"))).cast("double") / 100).as("kept_min"),
        (max(when(in, col("cents"))).cast("double") / 100).as("kept_max"))
  }
}
