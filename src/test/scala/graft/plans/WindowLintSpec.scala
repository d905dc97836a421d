package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WindowLint fires on an unpartitioned window over unbounded input (the
  * one-task global sort anti-pattern) and stays quiet on the two
  * legitimate shapes the library uses: a partitioned window, and a global
  * window above a provably row-bounded cut (LIMIT / TakeOrdered /
  * aggregate-to-constant).
  */
class WindowLintSpec extends SparkSpec {

  // a FILE-backed relation: local literal data (Seq.toDF → LocalRelation)
  // is driver-bounded by construction and correctly passes the lint, so
  // the firing cases must read from a scan
  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id").as("id"), col("text"),
      (col("doc_id") % 7).as("grp"))

  test("fires on a global rank over a raw relation") {
    val w = Window.orderBy(col("id"))
    val df = docs.withColumn("r", row_number().over(w))
    val hits = WindowLint.unboundedGlobalWindows(df.queryExecution.optimizedPlan)
    assert(hits.nonEmpty, df.queryExecution.optimizedPlan.toString)
  }

  test("quiet on a partitioned window") {
    val w = Window.partitionBy(col("grp")).orderBy(col("id"))
    val df = docs.withColumn("r", row_number().over(w))
    assert(WindowLint.unboundedGlobalWindows(df.queryExecution.optimizedPlan).isEmpty)
  }

  test("quiet on a global rank above a LIMIT cut (TakeOrdered shape)") {
    val df = docs.orderBy(col("id").desc).limit(10)
      .withColumn("r", row_number().over(Window.orderBy(col("id"))))
    assert(WindowLint.unboundedGlobalWindows(df.queryExecution.optimizedPlan).isEmpty)
  }

  test("quiet on a global window above an aggregate-to-constant") {
    val totals = docs.agg(count(lit(1)).as("n"), sum("grp").as("sg"))
    val df = totals.withColumn("r", row_number().over(Window.orderBy(col("n"))))
    assert(WindowLint.unboundedGlobalWindows(df.queryExecution.optimizedPlan).isEmpty)
  }

  test("rule variant records a finding through the optimizer hook") {
    val sess = spark.newSession()
    sess.experimental.extraOptimizations = Seq(WindowLint)
    WindowLint.clear()
    val d2 = sess.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d2.withColumn("r", row_number().over(Window.orderBy(col("doc_id")))).collect()
    assert(WindowLint.recentFindings.exists(_.contains("unpartitioned window")),
      WindowLint.recentFindings.mkString("; "))
  }
}
