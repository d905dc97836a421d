package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: `runMain graft.Explain <query> [sfDir]` prints
  * the formatted physical plan and wall time of one SparkEntry query —
  * the iterate-on-the-plan loop (builder prompt: explain until it's the
  * plan you'd want, not the first one that passed).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.bootstrap(spark)
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    val t1 = System.nanoTime()
    val n2 = df.count()
    println(f"rows=$n2 time2=${(System.nanoTime() - t1) / 1e9}%.2fs (warm)")
    spark.stop()
  }
}
