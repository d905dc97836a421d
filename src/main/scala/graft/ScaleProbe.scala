package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe variants that the demo registry cannot express: a
  * `SparkEntry.queries` entry is pinned to a FIXED oracle (so its
  * parameters cannot depend on input size), but several operators'
  * 100 TB story is precisely that a parameter scales with the data —
  * SemDeDup's cell count, LSH band caps. This main runs those
  * scale-parameterized faces for the BENCHNOTES evidence tables.
  *
  * Usage: runMain graft.ScaleProbe <op> <sfDir>
  * Prints one JSON line {"op":…,"n":…,"param":…,"sec":…}.
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val (op, sfDir) = (args(0), args(1))
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
    val (n, param, result) = op match {
      case "semdedup_scaled" =>
        // the x31 demo pins kCells=4 for its unrolled oracle, so at 10x
        // vectors each cell is 10x bigger and the in-cell pairwise
        // verify grows quadratically (measured 11.2x at the sf1 full
        // sweep). The production face holds CELL SIZE constant instead:
        // kCells = n / targetCellSize. This probe measures that face.
        val emb = graft.sources.Tables.table(spark, sfDir, "embeddings")
        val n = emb.count()
        val k = math.max(4, (n / 500).toInt)
        (n, k.toLong, () => graft.operators.VectorSearch
          .semDeDup(emb, "vec_id", "embedding", kCells = k, iters = 2,
            minCosine = 0.35).groupBy().count())
      case "minhash_capped" =>
        // x2b's production face at open-web scale: the stop-bucket cap
        // (minhashLshPairs maxBucket) bounds the worst band bucket at
        // C(cap, 2) candidate pairs — the uncapped demo's candidates
        // grew 45x at 10x docs (random band collisions are O(n²·p))
        val docs = graft.sources.Tables.table(spark, sfDir, "documents")
        val n = docs.count()
        val cap = 64
        (n, cap.toLong, () => graft.operators.TextDedup
          .minhashLshPairs(docs, "doc_id", "text", 0.5,
            maxBucket = Some(cap)).groupBy().count())
      case other => sys.error(s"unknown probe op '$other'")
    }
    val df: DataFrame = result()
    df.collect() // warm: codegen + first-run costs, matching Bench min-of-2
    val t0 = System.nanoTime()
    df.collect()
    val sec = (System.nanoTime() - t0) / 1e9
    // stdout stays one machine-readable line, like Bench
    println(s"""{"op":"$op","n":$n,"param":$param,"sec":$sec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
