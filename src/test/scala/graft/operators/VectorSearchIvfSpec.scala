package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** IVF coarse-quantizer properties not covered by the x3c oracle demo:
  * training determinism, exact centroid state, and recall against the
  * brute-force baseline.
  */
class VectorSearchIvfSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = Tables.table(spark, sfDir, "embeddings")

  test("ivfTrain is deterministic and centroids carry exact member sums") {
    val a = VectorSearch.ivfTrain(emb, "vec_id", "embedding", k = 4, iters = 2)
    val b = VectorSearch.ivfTrain(emb, "vec_id", "embedding", k = 4, iters = 2)
    assert(a.map(_.cid) === b.map(_.cid))
    a.zip(b).foreach { case (x, y) =>
      assert(x.cnt === y.cnt)
      assert(x.sums.toSeq === y.sums.toSeq)
    }
    // every vector is assigned somewhere: cluster counts sum to the corpus
    assert(a.map(_.cnt).sum === emb.count())
    // exact state: total per-dim sums over clusters == corpus-wide sums
    val q = VectorSearch.quantize(emb, "vec_id", "embedding")
    val corpusDim0 = q.select(sum(element_at(col("qv"), 1))).head().getLong(0)
    assert(a.map(_.sums(0)).sum === corpusDim0)
  }

  test("ivfSearch recall vs brute force is substantial at nProbe=2 of 4 cells") {
    val probes = emb.filter(col("vec_id") < 5)
    val exact = VectorSearch.topKCosine(emb, probes, "vec_id", "embedding", 10)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = VectorSearch.ivfSearch(emb, probes, "vec_id", "embedding",
        k = 10, kCells = 4, iters = 2, nProbe = 2)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.size === exact.size) // 5 probes × 10 — cells are large enough
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("semDeDup drops in-cluster near-dups with min-id witness; zero-norm never dropped") {
    import spark.implicits._
    // one cell (kCells=1) isolates the prune semantics from clustering
    val df = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // keeper (lowest id)
      (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),   // cos(1,0) ≈ 0.9939 → dup of 0
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal → kept
      (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),   // zero norm → NULL cosine, kept
      (4L, Seq(1.0f, 0.0f, 0.0f, 0.0f))    // exact dup: witnesses 0 AND 1; min wins
    ).toDF("vec_id", "embedding")
    val out = VectorSearch.semDeDup(df, "vec_id", "embedding",
        kCells = 1, iters = 1, minCosine = 0.9)
      .orderBy("vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out === Array(
      (0L, 1, -1L), (1L, 0, 0L), (2L, 1, -1L), (3L, 1, -1L), (4L, 0, 0L)))
  }

  test("semDeDup is total (one row per vector), deterministic, witnesses are lower ids") {
    val out = VectorSearch.semDeDup(emb, "vec_id", "embedding",
      kCells = 4, iters = 2, minCosine = 0.35)
    assert(out.count() === emb.count())
    val dropped = out.filter(col("kept") === 0)
    assert(dropped.filter(col("dup_of") >= col("vec_id")).count() === 0)
    val again = VectorSearch.semDeDup(emb, "vec_id", "embedding",
      kCells = 4, iters = 2, minCosine = 0.35)
    assert(out.orderBy("vec_id").collect().toSeq ===
      again.orderBy("vec_id").collect().toSeq)
  }

  test("semDeDupAuto sizes cells from the corpus and equals explicit kCells") {
    val n = emb.count()
    val auto = VectorSearch.semDeDupAuto(emb, "vec_id", "embedding",
      iters = 2, minCosine = 0.35, targetCellSize = 500)
    val explicit = VectorSearch.semDeDup(emb, "vec_id", "embedding",
      kCells = math.max(4L, n / 500).toInt, iters = 2, minCosine = 0.35)
    assert(auto.orderBy("vec_id").collect().toSeq ===
      explicit.orderBy("vec_id").collect().toSeq)
    intercept[IllegalArgumentException] {
      VectorSearch.semDeDupAuto(emb, "vec_id", "embedding", 2, 0.35,
        targetCellSize = 0)
    }
  }

  test("hardNegatives: nearest other-label vector wins; own label never mined") {
    val s = spark
    import s.implicits._
    def v(x: Float, y: Float) =
      Array.tabulate(64)(i => if (i == 0) x else if (i == 1) y else 0.0f)
    // query 1 (label 0) points at +x; vector 2 (label 0) is IDENTICAL
    // (cosine 1 but same label — must not be mined); 3 (label 1) is close
    // (cos ≈ 0.995), 4 (label 1) orthogonal, 5 (label 2) opposite
    val df = Seq(
      (1L, v(1f, 0f), 0), (2L, v(1f, 0f), 0), (3L, v(1f, 0.1f), 1),
      (4L, v(0f, 1f), 1), (5L, v(-1f, 0f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = VectorSearch.hardNegatives(
        df, df.filter(col("vec_id") === 1), "vec_id", "embedding", "label", k = 2)
      .orderBy(col("cosine").desc).collect()
      .map(r => (r.getLong(1), r.getInt(2))).toList
    // top-2 negatives: 3 (closest other-label), then 4; never 2 (same label)
    assert(out === List((3L, 1), (4L, 1)), out.toString)
  }

  test("signedRandomProjection: hand-computed values, shape, determinism") {
    val s = spark
    import s.implicits._
    // one-hot inputs isolate single signs: proj(e_d)[j] = 10000·sign(h(j,d))
    val oneHot = (1 to 3).map { d =>
      (d.toLong, Array.tabulate(64)(i => if (i == d - 1) 1.0f else 0.0f))
    }
    val out = VectorSearch
      .signedRandomProjection(oneHot.toDF("vec_id", "embedding"),
        "vec_id", "embedding", outDims = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out.size === 3 * 4) // one row per (vec, out-dim)
    def sign(j: Int, d: Int): Long =
      if (((j.toLong * 64 + d - 1) * 2654435761L) % 2147483648L
        >= 1073741824L) 1L
      else -1L
    for (d <- 1 to 3; j <- 0 until 4)
      assert(out((d.toLong, j)) === 10000L * sign(j, d),
        s"one-hot d=$d out-dim j=$j")
    // both ±1 signs occur (the hyperplanes are not degenerate)
    assert(out.values.toSet === Set(10000L, -10000L))
    // REGRESSION (low-bit parity bug): the sign of dimension d must
    // DEPEND on the output dim j — under the broken mod-2 formulation
    // every out-dim shared one sign vector and the projection was rank-1
    val signVectors = (0 until 4).map(j => (1 to 3).map(d => sign(j, d)))
    assert(signVectors.distinct.size > 1,
      s"sign vectors identical across output dims: $signVectors")
    // …and correspondingly the one-hot projections must differ across j
    // for at least one input dim
    assert((1 to 3).exists(d =>
      (0 until 4).map(j => out((d.toLong, j))).distinct.size > 1), out.toString)
    // JL in practice: projected dots correlate with original dots on the
    // harness embeddings — identical vectors project identically, and a
    // rerun is bit-identical (pure function of (j, d))
    val emb = Tables.table(spark, sfDir, "embeddings").limit(50)
    val p1 = VectorSearch
      .signedRandomProjection(emb, "vec_id", "embedding", outDims = 16)
      .orderBy("vec_id", "dim").collect().toSeq
    val p2 = VectorSearch
      .signedRandomProjection(emb, "vec_id", "embedding", outDims = 16)
      .orderBy("vec_id", "dim").collect().toSeq
    assert(p1 === p2)
    assert(p1.size === 50 * 16)
  }
}
