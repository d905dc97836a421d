package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** HLL distinct-estimate properties: accuracy inside the sketch bound on
  * a known-cardinality input, determinism across repartitionings (the
  * register sum is exact-integer, so partial-agg order can't move it),
  * and null-key handling.
  */
class SketchesSpec extends SparkSpec {

  import spark.implicits._

  test("estimate within sketch error on 20k distinct dense keys") {
    val df = (1L to 20000L).toDF("k")
    val row = Sketches.approxDistinct(df, col("k")).head()
    assert(row.getLong(0) === 20000L)
    val est = row.getDouble(1)
    // m=512 → σ ≈ 4.6%; 3σ bound with margin
    assert(math.abs(est / 20000.0 - 1.0) < 0.15, s"estimate $est")
  }

  test("duplicate and null keys: estimate tracks DISTINCT non-null keys") {
    val df = ((1L to 5000L) ++ (1L to 5000L)).toDF("k")
      .unionByName(Seq.empty[Option[Long]].toDF("k"))
      .unionByName(Seq[Option[Long]](None, None).toDF("k"))
    val row = Sketches.approxDistinct(df, col("k")).head()
    assert(row.getLong(0) === 5000L)
    assert(math.abs(row.getDouble(1) / 5000.0 - 1.0) < 0.15)
  }

  test("identical sketch regardless of partitioning (exact-integer registers)") {
    val base = (1L to 8000L).toDF("k")
    val a = Sketches.approxDistinct(base.repartition(1), col("k")).head()
    val b = Sketches.approxDistinct(base.repartition(13), col("k")).head()
    assert(a.getDouble(1) === b.getDouble(1))
    assert(a.getLong(2) === b.getLong(2))
  }

  test("cm sketch never underestimates; absent keys report zero exact count") {
    // key k appears (k % 7 + 1) times; probes cover present AND absent keys
    val df = (1L to 100L).flatMap(k => Seq.fill((k % 7).toInt + 1)(k)).toDF("k")
    val probes = ((1L to 30L) ++ (900L to 905L)).toDF("probe_key")
    val out = Sketches.cmFrequency(df, col("k"), probes, "probe_key")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 36)
    out.foreach { case (p, exact, cm) =>
      assert(cm >= exact, s"probe $p: cm $cm < exact $exact")
    }
    out.filter(_._1 >= 900L).foreach { case (p, exact, _) =>
      assert(exact === 0L, s"absent probe $p has exact $exact")
    }
    // 100 keys × 4 rows over 4096 counters — the min across 4 independent
    // rows is exact here (deterministic hashes: a regression, not flake)
    out.foreach { case (p, exact, cm) =>
      assert(cm === exact, s"probe $p: collision inflated $exact to $cm")
    }
  }

  test("cm sketch identical under repartitioning (integer counters)") {
    val base = (1L to 500L).flatMap(k => Seq.fill(3)(k)).toDF("k")
    val probes = (1L to 10L).toDF("probe_key")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.cmFrequency(df, col("k"), probes, "probe_key")
        .orderBy("probe_key").collect().toSeq
    assert(run(base.repartition(1)) === run(base.repartition(13)))
  }

  test("histogram quantile estimate lands within two bin widths of exact") {
    val df = (1L to 10000L).map(c => ("g", c)).toDF("g", "cents")
    val out = Sketches.histQuantiles(df, "g", col("cents"),
        Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
      .collect()
    assert(out.length === 3)
    val binWidth = 10000.0 / Sketches.HistBins / 100.0
    out.foreach { r =>
      val (est, exact) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(est - exact) <= 2 * binWidth,
        s"${r.getString(1)}: est $est vs exact $exact")
    }
  }

  test("cm sketch accepts keys across the full int64 domain (no ANSI overflow)") {
    val df = Seq(Long.MaxValue, Long.MaxValue - 1, Long.MinValue + 1, 5L).toDF("k")
    val probes = Seq(Long.MaxValue, 5L).toDF("probe_key")
    val out = Sketches.cmFrequency(df, col("k"), probes, "probe_key")
      .orderBy("probe_key").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).forall {
      case (exact, cm) => cm >= exact && exact == 1L
    })
  }

  test("histQuantiles parses sub-millesimal quantiles (plain-string literal)") {
    val df = (1L to 10000L).map(c => ("g", c)).toDF("g", "cents")
    val r = Sketches.histQuantiles(df, "g", col("cents"), Seq("p001" -> 0.0001))
      .head()
    assert(r.getDouble(4) > 0) // exact percentile evaluated, no ParseException
  }

  test("histogram quantiles identical under repartitioning (integer bin counts)") {
    val df = (1L to 5000L).map(c => ("g", c * 3 % 977)).toDF("g", "cents")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.histQuantiles(d, "g", col("cents"), Seq("p50" -> 0.5))
        .collect().toSeq
    assert(run(df.repartition(1)) === run(df.repartition(13)))
  }

  test("mix31L mirrors the column mix31 bit-for-bit across the key domain") {
    val keys = Seq(0L, 1L, 5L, 12345L, (1L << 29) + 7, (1L << 31) - 1,
      1L << 31, (1L << 33) + 11, Long.MaxValue, -1L, -12345L, Long.MinValue + 1)
    val got = keys.toDF("k").select(Sketches.mix31(col("k")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === keys.map(Sketches.mix31L))
  }

  test("heavyHitters: MG sketch prunes a wide key universe, verified output exact") {
    val s = spark
    import s.implicits._
    // 100-key universe, k=10 counters: two genuine heavy keys (30% and
    // 20% share) among 98 light ones — the sketch must keep both as
    // candidates (guarantee: share > 1/(k+1) survives) and the exact
    // verification must emit exactly the keys with share > 1/k
    val rows = Seq.fill(300)("hot") ++ Seq.fill(200)("warm") ++
      (1 to 500).map(i => s"cold${i % 98}")
    val df = rows.toDF("w")
    val out = Sketches.heavyHitters(df, col("w"), k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("hot" -> 300L, "warm" -> 200L), out.toString)
    // partition-layout independence of the VERIFIED output (the sketch's
    // internal candidate set may differ; the verdict must not)
    val out2 = Sketches.heavyHitters(df.repartition(7), col("w"), k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out2 === out)
  }
}
