package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE definition of the timing protocol shared by [[Bench]] (the
  * official per-round record) and [[ScaleProbe]] (the scale-sweep
  * harness) — r8 review: the two had copy-pasted blocks that had
  * already drifted (unconditional gc, missing noop-write warmup), which
  * silently breaks the "ratios are protocol-consistent" premise every
  * BENCHNOTES table rests on.
  */
object BenchProtocol {

  /** Timing action: a `noop`-format write — full evaluation of every
    * output column, zero driver collection, zero I/O. (Under `count()`
    * Catalyst's EliminateSorts/pruning would delete the work being
    * measured.)
    */
  def evaluate(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Release executor storage between timings so query N's
    * localCheckpoints never distort query N+1's clock, and nudge
    * shuffle-file cleanup (ContextCleaner deletes shuffles only when
    * their dependencies are unreachable AND a GC runs — long sweeps on
    * a big heap otherwise accumulate each query's spill until the disk
    * fills; observed ~50 GB at the r7 sf10 probe). `gcMode`:
    * "blocking" (default — pair with
    * `spark.cleaner.referenceTracking.blocking.shuffle=true` so
    * deletions complete HERE, outside every timed window), "async"
    * (the r7 behavior, kept for A/B), "off" (no gc call).
    */
  def releaseStorage(spark: SparkSession, gcMode: String = "blocking"): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    if (gcMode != "off") System.gc()
  }

  /** JIT/codegen warmup: exercise the shuffle, codegen AND noop-write
    * paths once so the first timed run does not absorb one-time JVM
    * compilation cost (with the single-run probe protocol that cost
    * would land entirely inside the measurement).
    */
  def warmup(spark: SparkSession): Unit =
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      evaluate(spark.range(100000).selectExpr("id", "id * 2 AS v"))
    } catch { case _: Throwable => }

  /** Machine-speed calibration: a fixed CPU-bound job (range sum + hash
    * agg), timed after warmup — container CPU throughput varies
    * several-fold between rounds. CPU-only: pair with [[calibIo]].
    */
  def calib(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(200000000L)
      .selectExpr("id % 97 AS k", "id")
      .groupBy("k").sum("id").collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** I/O calibration (r8): a fixed ~64 MB parquet write+read round trip
    * through the local disk and the datasource scan path — the r7 1.56x
    * regression was invisible to the CPU calib (which IMPROVED across
    * the same span); this measures the dimension that moved.
    */
  def calibIo(spark: SparkSession): Double = {
    val dir = java.nio.file.Files.createTempDirectory("graft-calib-io")
    val path = dir.resolve("t.parquet").toString
    val t0 = System.nanoTime()
    spark.range(8000000L).selectExpr("id", "id * 31 % 997 AS v")
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path).selectExpr("sum(v)").collect()
    val dt = (System.nanoTime() - t0) / 1e9
    // best-effort cleanup; an abandoned temp dir must never fail a bench
    try graft.sources.FsUtil.deleteTree(dir)
    catch { case _: Throwable => }
    dt
  }
}
