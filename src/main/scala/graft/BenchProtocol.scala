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

  /** Repo root for harness artifacts (BENCH_FULL.json, the bench lock):
    * `SPARK_GRAFT_REPO`, else the sbt-set `user.dir`, else CWD — ONE
    * definition so Bench and ScaleProbe can never resolve to different
    * lock files (round-5 advice for the record path; the lock rides
    * the same rule).
    */
  def repoRoot: String = sys.env.get("SPARK_GRAFT_REPO")
    .orElse(sys.props.get("user.dir")).getOrElse(".")

  /** Mutual-exclusion lock for timing harnesses. r9's OFFICIAL bench
    * record was invalid because the round-close Bench ran concurrently
    * with a detached ScaleProbe chain on the same 32 CPUs (and a disk
    * the chain was exhausting) — 182 s and a spurious per-query
    * failure vs 117 s on a quiet box. Two timing JVMs sharing the box
    * can only produce garbage, so exclusion is now MECHANICAL: both
    * [[Bench]] and [[ScaleProbe]] acquire an OS-level file lock
    * (`target/.graft_bench_lock` under [[repoRoot]]) before building
    * their SparkSession; the second acquirer FAILS FAST with a named
    * error instead of silently contaminating the first. An OS `flock`
    * — not a marker file — so a crashed/killed harness releases the
    * lock with its process and can never wedge the next round.
    * Returns a handle to close when timing is done; process exit also
    * releases it.
    */
  def acquireBenchLock(root: String = repoRoot): java.io.Closeable = {
    import java.nio.file.{Files, Paths, StandardOpenOption => O}
    val dir = Paths.get(root, "target")
    Files.createDirectories(dir)
    val path = dir.resolve(".graft_bench_lock")
    val ch = java.nio.channels.FileChannel.open(path, O.CREATE, O.WRITE)
    val lock =
      try ch.tryLock()
      catch { // same-JVM holder (the spec's dummy-holder case)
        case _: java.nio.channels.OverlappingFileLockException => null
      }
    if (lock == null) {
      val holder =
        try new String(Files.readAllBytes(path),
          java.nio.charset.StandardCharsets.UTF_8).trim
        catch { case _: Throwable => "" }
      ch.close()
      throw new IllegalStateException(
        s"graft bench lock $path is HELD" +
          (if (holder.nonEmpty) s" ($holder)" else "") +
          " — another timing harness (Bench or a ScaleProbe chain) is " +
          "running on this box; a concurrent run would contaminate both " +
          "records (r9 lesson). Wait for it to finish.")
    }
    ch.truncate(0)
    ch.write(java.nio.ByteBuffer.wrap(
      s"pid=${ProcessHandle.current().pid()} since=${java.time.Instant.now()}"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    ch.force(true)
    () => {
      try lock.release() catch { case _: Throwable => }
      ch.close()
    }
  }

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
