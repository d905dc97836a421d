package graft.operators

import org.apache.spark.sql.DataFrame
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
}
