package graft
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: times every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and emits ONE JSON line, both on stdout (bare —
  * build.sbt routes forked run output through StdoutOutput so sbt does not
  * `[info]`-prefix it) and to `target/bench.json` for robust extraction.
  *
  * Timing action is a `noop`-format write, not `count()`: under a count
  * aggregate Catalyst's EliminateSorts removes global sorts and column
  * pruning deletes unused projections, so sort/projection queries would
  * report scan time only. The noop sink forces full evaluation of every
  * output column with zero driver-side collection and zero I/O.
  *
  * A query that throws is excluded from the reported total and listed in
  * `"failed"` (and the process exits nonzero) — a broken query must never
  * read as a fast run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle-file cleanup mode (SPARK_GRAFT_GC) — the r7 full sweep
    // regressed uniformly 1.56x after releaseStorage() gained a bare
    // System.gc(): the gc call itself sits OUTSIDE the timed window, but
    // ContextCleaner's shuffle-file deletion it triggers is ASYNC and its
    // I/O bled into the NEXT query's timed run. "blocking" (default)
    // keeps the gc and makes the cleaner wait for shuffle deletion to
    // finish inside releaseStorage — cleanup still happens every timing
    // (the sf10 disk-exhaustion lesson) but completes before the next
    // clock starts. "async" reproduces the r7 behavior, "off" skips the
    // gc entirely — both kept for A/B probes (BENCHNOTES r8).
    val gcMode = sys.env.getOrElse("SPARK_GRAFT_GC", "blocking")
    require(Set("blocking", "async", "off")(gcMode),
      s"SPARK_GRAFT_GC must be blocking|async|off, got '$gcMode'")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.blocking.shuffle",
        (gcMode == "blocking").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Spark's WindowExec warns "No Partition Defined" on EVERY global
    // window, including the handful of demo sites whose input is provably
    // bounded (top-K after LIMIT, aggregate-to-constant) — and those are
    // already regression-gated by the PlanSpec window-discipline sweep
    // over all demos (an unpartitioned window over UNBOUNDED input fails
    // `sbt test`). The burst drowned real warnings in the bench tail
    // (r6 verdict), so silence that one logger here; the gate, not the
    // logger, is the discipline.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    graft.sources.Tables.bootstrap(spark)

    def evaluate(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // JIT/codegen warmup so the first timed query doesn't absorb one-time
    // JVM compilation cost: exercise the datasource, shuffle, codegen and
    // noop-write paths once on the smallest fixture.
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      evaluate(SparkEntry.entry(spark))
    } catch { case _: Throwable => }

    // machine-speed calibration: a fixed CPU-bound job (range sum +
    // hash agg), timed after warmup. Reported as "calib" in the JSON so
    // per-round query times can be normalized — container throughput was
    // observed to vary several-fold between rounds, which would
    // otherwise read as query regressions/improvements that are really
    // the machine.
    val calib = {
      val t0 = System.nanoTime()
      spark.range(200000000L)
        .selectExpr("id % 97 AS k", "id")
        .groupBy("k").sum("id").collect()
      (System.nanoTime() - t0) / 1e9
    }

    // I/O calibration (r8): the CPU calib missed the r7 1.56x regression
    // entirely — r8's forensics (BENCHNOTES r8) found the shift uniform
    // across query-size buckets, absent from the CPU calib (which
    // IMPROVED 1.27 -> 1.10 across the same span), weakest in
    // compute-bound queries — i.e. the container's I/O layer, the one
    // dimension no calibration measured. This job times a fixed
    // write+read round trip (~64 MB of parquet through the local disk and
    // the datasource scan path) so future cross-round comparisons can
    // normalize the I/O dimension too.
    val calibIo = {
      val dir = Files.createTempDirectory("graft-calib-io")
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

    // queries with iterative/materializing internals (SCD2 eras, label
    // propagation, corpus-clean cuts) localCheckpoint into executor
    // storage; release everything between timings so query N's storage
    // never distorts query N+1's clock — each timing models the query
    // run on its own cluster
    def releaseStorage(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      // shuffle FILES are cleaned by ContextCleaner only when the shuffle
      // dependencies become unreachable AND a GC runs — with a large
      // driver heap a long sweep can finish queries faster than full GCs
      // happen, accumulating each query's spill on local disk until the
      // tail queries die on a full device (observed at the sf10 probe:
      // one query's object-agg sort-fallback spill is ~50 GB). A real
      // cluster has per-executor disks and per-app dirs; locally, nudge
      // the cleaner between timings. With blocking.shuffle=true (the
      // default mode above) the deletions complete HERE, not during the
      // next query's timed run.
      if (gcMode != "off") System.gc()
    }

    // steady-state timing: two runs per query, report the min — the first
    // run still pays per-query codegen compilation, which a long-running
    // cluster amortizes away
    // SPARK_GRAFT_ONLY: comma-separated name prefixes for local builder
    // iteration on a query subset (the driver never sets it → full run)
    // SPARK_GRAFT_RUNS: runs per query (default 2) — big local scale
    // probes (sf10) use 1: the min-of-2 protocol doubles hours-long
    // sweeps, and a ratio is protocol-consistent as long as BOTH scale
    // points use the same run count (the driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    val nRuns = {
      val raw = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2")
      val n = raw.toIntOption.getOrElse(sys.error(
        s"SPARK_GRAFT_RUNS must be a positive integer, got '$raw'"))
      require(n >= 1, s"SPARK_GRAFT_RUNS must be >= 1, got $n")
      n
    }
    val results: Map[String, Option[Double]] =
      SparkEntry.queries
        .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
        .map { case (name, fn) =>
        val times = (1 to nRuns).flatMap { _ =>
          val t0 = System.nanoTime()
          try {
            evaluate(fn(spark, sfDir))
            val dt = (System.nanoTime() - t0) / 1e9
            releaseStorage()
            Some(dt)
          }
          catch { case _: Throwable => releaseStorage(); None }
        }
        // per-query progress on stderr: long sweeps were a black box
        // until the final JSON (stdout stays reserved for that line)
        System.err.println(
          s"[bench] $name ${times.map(t => f"$t%.2f").mkString("/")}s" +
            (if (times.size < nRuns) " FAILED" else ""))
        // all runs must succeed, else the query is a failure, not a time
        name -> (if (times.size == nRuns) Some(times.min) else None)
      }
    val ok = results.collect { case (k, Some(v)) => k -> v }
    val failed = results.collect { case (k, None) => k }.toSeq.sorted
    val qs = ok.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (ok.nonEmpty) ok.values.sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","calib":$calib,"calib_io":$calibIo,"queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    Files.createDirectories(Paths.get("target"))
    Files.write(Paths.get("target/bench.json"),
      (json + "\n").getBytes(StandardCharsets.UTF_8))
    // Also write the full record (per-query timings + failed list) to a
    // TRACKED path: the driver's BENCH_r{N}.json captures only the stdout
    // tail, so without this the per-query numbers and the names of failed
    // queries exist solely in the untracked target/ dir (round-4 advice).
    // Committed once per round alongside BENCHNOTES.md. Resolved against
    // the repo root (SPARK_GRAFT_REPO, else the sbt-set user.dir, else
    // CWD) so an out-of-repo-root caller doesn't scatter the record
    // (round-5 advice).
    val repoRoot = sys.env.get("SPARK_GRAFT_REPO")
      .orElse(sys.props.get("user.dir")).getOrElse(".")
    Files.write(Paths.get(repoRoot, "BENCH_FULL.json"),
      (json + "\n").getBytes(StandardCharsets.UTF_8))
    // The full line above carries every per-query timing (~4 KB) and has
    // twice fallen out of the driver's stdout tail-capture window, leaving
    // the official bench record unparsed. Emit it to the file only, and end
    // stdout with a COMPACT summary line (<200 bytes) so a tail of any
    // reasonable size contains a complete, parseable JSON object.
    val summary =
      s"""{"metric":"total","value":$total,"unit":"sec","calib":$calib,"calib_io":$calibIo,"n":${ok.size},"n_failed":${failed.size},"sf":"$sfDir"}"""
    println(summary)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
