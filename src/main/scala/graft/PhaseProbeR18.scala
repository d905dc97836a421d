package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextDedup
import graft.sources.Tables

/** r18 dev probe (NEVER part of the official bench): per-phase
  * wall-clock of the x59 crawl-loop demo — guide §1, measure before
  * changing: the bench reports x59 as one ~5 s number, but the query is
  * five sequential actions (store write, batch-index cut, probe-1 +
  * checkpoint, append, probe-2 + final sort) and the optimization
  * target is whichever of them actually owns the seconds. Mirrors the
  * DedupDemos.x59 body exactly (same predicates, cap, checkpoint
  * placement); prints one JSON line per rep.
  *
  * A second mode, `edges <outDir> [sfDir]`, writes the formatted plans
  * of the x2f cluster-EDGES frame in both its r17 shape (pairs ∪
  * pairs.swapped — the pairs subtree planned twice) and its r18 shape
  * (one explode over the pairs frame) to `<outDir>/x2f_edges_
  * {before,after}.txt` — the eager-checkpoint job the declared query's
  * final (checkpoint-backed) plan cannot show. Both shapes are built
  * from the public API in THIS tree, so the diff is reproducible from
  * one checkout.
  *
  * A third mode, `sets <outFile> [sfDir]`, writes the formatted plan of
  * `minhashLshPairs(materializeCandidates = Some(eagerCut))` — the one
  * public frame whose FINAL plan contains the exact-verify shingle-set
  * subtree under a materialization strategy, i.e. where r18's
  * verifyCandidatePairs sets-cut is visible (the declared queries that
  * take the cut — x62/x63 — only run it inside eager checkpoint jobs,
  * so their final plans cannot show it). Run in the r17 worktree and
  * the r18 tree for the before/after pair.
  *
  * Usage: runMain graft.PhaseProbeR18 [sfDir] [reps]
  *        runMain graft.PhaseProbeR18 edges <outDir> [sfDir]
  *        runMain graft.PhaseProbeR18 sets <outFile> [sfDir]
  */
object PhaseProbeR18 {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("edges")) return edgesPlans(args)
    if (args.headOption.contains("sets")) return setsPlan(args)
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.bootstrap(spark)
    BenchProtocol.warmup(spark)
    def phase[T](name: String, sb: StringBuilder)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      sb.append(f""""$name":${(System.nanoTime() - t0) / 1e9}%.3f,""")
      r
    }
    (1 to reps).foreach { rep =>
      val sb = new StringBuilder("{")
      val d = Tables.table(spark, sfDir, "documents")
      val base = d.filter(col("doc_id") % 5 <= 2)
      val b1 = d.filter(col("doc_id") % 5 === 3)
      val b2 = d.filter(col("doc_id") % 5 === 4)
      spark.sql("DROP TABLE IF EXISTS x59_band_store")
      val scratch = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_demo_x59_store")
      graft.sources.FsUtil.deleteTree(scratch)
      spark.catalog.refreshByPath(scratch.toString)
      phase("store_write", sb) {
        TextDedup.lshStoreWrite(base, "doc_id", "text", "x59_band_store",
          path = Some(scratch.toString))
      }
      val b1Idx = phase("b1_index_cut", sb) {
        TextDedup.eagerCut(TextDedup.lshIndex(b1, "doc_id", "text"))
      }
      val p1 = phase("probe1_checkpoint", sb) {
        TextDedup.probeLshStore(b1, spark.table("x59_band_store"), base,
          "doc_id", "text", threshold = 0.5, maxBucket = Some(2),
          prebuiltBatchIndex = Some(b1Idx)).localCheckpoint(true)
      }
      phase("append", sb) {
        TextDedup.lshStoreAppend(b1, "doc_id", "text", "x59_band_store",
          prebuiltIndex = Some(b1Idx))
      }
      phase("probe2_plus_final", sb) {
        val p2 = TextDedup.probeLshStore(b2, spark.table("x59_band_store"),
          base.unionByName(b1), "doc_id", "text", threshold = 0.5,
          maxBucket = Some(2))
        p1.select(lit(1).as("batch"), col("new_id"), col("old_id"),
            col("jaccard"))
          .unionByName(p2.select(lit(2).as("batch"), col("new_id"),
            col("old_id"), col("jaccard")))
          .orderBy(col("batch").asc_nulls_last, col("new_id").asc_nulls_last,
            col("old_id").asc_nulls_last)
          .write.format("noop").mode("overwrite").save()
      }
      sb.append(s""""rep":$rep}""")
      println(sb.toString)
      BenchProtocol.releaseStorage(spark, "blocking")
    }
    spark.stop()
  }

  private def setsPlan(args: Array[String]): Unit = {
    val outFile = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.bootstrap(spark)
    val verified = TextDedup.minhashLshPairs(
      Tables.table(spark, sfDir, "documents"), "doc_id", "text", 0.5,
      materializeCandidates = Some(TextDedup.eagerCut))
    val p = java.nio.file.Paths.get(outFile)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      verified.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(s"[sets] wrote $outFile")
    spark.stop()
  }

  private def edgesPlans(args: Array[String]): Unit = {
    val outDir = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.bootstrap(spark)
    val pairs = TextDedup.minhashLshPairs(
      Tables.table(spark, sfDir, "documents"), "doc_id", "text", 0.5)
    val before = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
    val after = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
      .distinct()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    Seq("x2f_edges_before" -> before, "x2f_edges_after" -> after).foreach {
      case (name, df) =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$name.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        System.err.println(s"[edges] wrote $outDir/$name.txt")
    }
    spark.stop()
  }
}
