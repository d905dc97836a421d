package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs. One JVM-wide session (local
  * mode), UTC, shuffle partitions pinned small for tiny test data.
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.bootstrap(s)
    s
  }

  /** Absolute path of a test resource (e.g. "/seeds/raw_loans.csv"). */
  def resource(path: String): String =
    getClass.getResource(path).getPath

  /** The three Fiction-Bank seed frames, keyed by relation name — shared
    * by every spec that drives the pipeline, so schema/path changes have
    * one site.
    */
  def fictionBankSeeds(spark: SparkSession): Map[String, org.apache.spark.sql.DataFrame] = {
    import graft.sources.Tables
    Map(
      "loan_types" ->
        Tables.seedCsv(spark, resource("/seeds/loan_types.csv"), Tables.loanTypesSchema),
      "raw_loans" ->
        Tables.seedCsv(spark, resource("/seeds/raw_loans.csv"), Tables.rawLoansSchema),
      "raw_loan_payments" ->
        Tables.seedCsv(spark, resource("/seeds/raw_loan_payments.csv"), Tables.rawLoanPaymentsSchema))
  }
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.spark
  def resource(path: String): String = SparkSpec.resource(path)
  def fictionBankSeeds: Map[String, org.apache.spark.sql.DataFrame] =
    SparkSpec.fictionBankSeeds(spark)
}
