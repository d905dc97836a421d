package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** mixToTarget (X27) — the data-mixing resampler. hashBucket itself is
  * oracle-pinned via x10a/x10b; these cases pin the rate computation
  * (exact integer ppm), the binding-domain selection, and the drop
  * semantics for unlisted/NULL domains.
  */
class SamplingSpec extends SparkSpec {

  private def mixInput = {
    val s = spark
    import s.implicits._
    // a×4, b×2, c×3 (unlisted), one NULL-domain row
    Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (5L, "b"), (6L, "b"),
      (7L, "c"), (8L, "c"), (9L, "c")).toDF("id", "dom")
      .union(Seq((10L, Option.empty[String])).toDF("id", "dom"))
  }

  test("mixToTarget: exact ppm rates, binding kept whole, unlisted/NULL dropped") {
    val s = spark
    import s.implicits._
    val out = Sampling.mixToTarget(mixInput, col("id"), "dom",
      Map("a" -> 1, "b" -> 1)).cache()
    // binding = b (count/weight 2 < 4): rate(b) = 1e6, rate(a) = 1e6·2/4
    val rates = out.select($"dom", $"rate_ppm").distinct()
      .as[(String, Long)].collect().toMap
    assert(rates.get("b").contains(1000000L), rates.toString)
    assert(rates.get("a").forall(_ == 500000L), rates.toString)
    // the binding domain survives in full
    assert(out.filter($"dom" === "b").select("id").as[Long].collect().toSet
      == Set(5L, 6L))
    // unlisted + NULL domains are gone entirely
    assert(out.filter($"dom".isNull || $"dom" === "c").count() == 0)
    // kept `a` rows are exactly the hash filter at the computed rate
    val keptA = out.filter($"dom" === "a").select("id").as[Long].collect().toSet
    val manualA = mixInput.filter($"dom" === "a")
      .filter(Sampling.hashBucketPpm(col("id")) < 500000L)
      .select("id").as[Long].collect().toSet
    assert(keptA == manualA)
    out.unpersist()
  }

  test("mixToTarget: rates depend only on weight RATIOS, and reruns are identical") {
    val s = spark
    import s.implicits._
    def ids(w: Map[String, Int]): Seq[(Long, String)] =
      Sampling.mixToTarget(mixInput, col("id"), "dom", w)
        .select($"id", $"dom").as[(Long, String)].collect().toSeq.sorted
    val base = ids(Map("a" -> 1, "b" -> 1))
    assert(ids(Map("a" -> 7, "b" -> 7)) == base) // scale-invariant
    assert(ids(Map("a" -> 1, "b" -> 1)) == base) // deterministic
  }

  test("mixToTarget: already-on-target input is kept in full") {
    val s = spark
    import s.implicits._
    // a×4 with weight 2, b×2 with weight 1 — proportions already 2:1,
    // every domain is binding (equal count/weight), all rows kept
    val out = Sampling.mixToTarget(mixInput, col("id"), "dom",
      Map("a" -> 2, "b" -> 1))
    assert(out.select("id").as[Long].collect().toSet
      == Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("mixToTarget: positive weights required") {
    intercept[IllegalArgumentException] {
      Sampling.mixToTarget(mixInput, col("id"), "dom", Map("a" -> 0))
    }
    intercept[IllegalArgumentException] {
      Sampling.mixToTarget(mixInput, col("id"), "dom", Map.empty)
    }
  }

  test("shuffleShard: a reproducible permutation — ids preserved, reruns identical") {
    val s = spark
    import s.implicits._
    val ids = (0L until 1000L).toDF("id")
    def order(salt: Long): Seq[Long] =
      Sampling.shuffleShard(ids, col("id"), numShards = 8, salt = salt)
        .orderBy($"shuffle_key".asc, $"id".asc)
        .select("id").as[Long].collect().toSeq
    val o0 = order(0L)
    assert(o0.sorted == (0L until 1000L)) // permutation: nothing lost or duplicated
    assert(o0 != (0L until 1000L))        // and it actually shuffles
    assert(order(0L) == o0)               // deterministic
    assert(order(1L) != o0)               // each salt an independent epoch order
  }

  test("shuffleShard: shards cover [0, n) and stay balanced for uniform keys") {
    val s = spark
    import s.implicits._
    val ids = (0L until 1000L).toDF("id")
    val byShard = Sampling.shuffleShard(ids, col("id"), numShards = 8)
      .groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(byShard.keySet == (0L until 8L).toSet)
    // 125 expected per shard; generous 3σ-ish bounds
    byShard.values.foreach(n => assert(n > 60 && n < 190, byShard.toString))
    intercept[IllegalArgumentException] {
      Sampling.shuffleShard(ids, col("id"), numShards = 0)
    }
  }

  test("qualityResample: flagged rows at keepPct, tail at tailPct, NULL flag = tail") {
    val s = spark
    import s.implicits._
    val df = (0L until 1000L).map(i =>
      (i, if (i % 3 == 0) Some(i % 2 == 0) else if (i % 3 == 1) Some(false) else None))
      .toDF("id", "good")
    val kept = Sampling.qualityResample(df, col("id"), col("good"),
      keepPct = 100, tailPct = 0).select("id").as[Long].collect().toSet
    // keepPct=100/tailPct=0 keeps EXACTLY the true-flagged rows
    assert(kept == (0L until 1000L).filter(i => i % 3 == 0 && i % 2 == 0).toSet)
    // a 100/10 split retains a strict, deterministic subset of the tail
    val mixed = Sampling.qualityResample(df, col("id"), col("good"), 100, 10)
      .select("id").as[Long].collect().toSet
    val tailKept = mixed -- kept
    val tailAll = (0L until 1000L).toSet -- (0L until 1000L)
      .filter(i => i % 3 == 0 && i % 2 == 0).toSet
    assert(tailKept.nonEmpty && tailKept.size < tailAll.size / 5)
    assert(Sampling.qualityResample(df, col("id"), col("good"), 100, 10)
      .select("id").as[Long].collect().toSet == mixed) // deterministic
    intercept[IllegalArgumentException] {
      Sampling.qualityResample(df, col("id"), col("good"), 101, 0)
    }
  }

  test("capPerDomain: caps each domain, shuffled keeper, deterministic") {
    val s = spark
    import s.implicits._
    // domain a: 100 rows (over cap), b: 3 rows (under cap)
    val df = ((0L until 100L).map(i => (i, "a")) ++
      (100L until 103L).map(i => (i, "b"))).toDF("id", "dom")
    val out = Sampling.capPerDomain(df, col("id"), "dom", maxPerDomain = 5)
      .select("id", "dom", "domain_rank").collect()
    val byDom = out.groupBy(_.getString(1))
    assert(byDom("a").length === 5 && byDom("b").length === 3)
    // ranks are 1..k within each domain
    assert(byDom("a").map(_.getInt(2)).sorted.toSeq === Seq(1, 2, 3, 4, 5))
    // the keeper set is a shuffle, not the lowest-id prefix
    val aIds = byDom("a").map(_.getLong(0)).sorted.toSeq
    assert(aIds !== (0L until 5L).toSeq, aIds.toString)
    // deterministic
    val again = Sampling.capPerDomain(df, col("id"), "dom", maxPerDomain = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === out.map(_.getLong(0)).toSet)
    // a different salt keeps a different subset of the over-cap domain
    val salted = Sampling.capPerDomain(df, col("id"), "dom", 5, salt = 9L)
      .filter(col("dom") === "a").select("id").collect()
      .map(_.getLong(0)).toSet
    assert(salted !== byDom("a").map(_.getLong(0)).toSet)
    intercept[IllegalArgumentException] {
      Sampling.capPerDomain(df, col("id"), "dom", 0)
    }
  }

  test("mixtureEpochs: exact integer plan; scarce domain repeats, dominant stays at 1") {
    val s = spark
    import s.implicits._
    // en: 2 docs × 4 tokens = 8; de: 1 doc × 2 tokens = 2 → total 10
    // (fr unlisted → excluded from totals and output)
    val df = Seq(
      (1L, "en", "a b c d"), (2L, "en", "e f g h"),
      (3L, "de", "x y"), (4L, "fr", "q r s t")).toDF("id", "lang", "text")
    val out = Sampling.mixtureEpochs(df, "lang", "text",
        targetPpm = Map("en" -> 500000L, "de" -> 500000L))
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toList
    assert(out === List(
      // de: actual 200000 ppm, target 500000 → ceil(2.5) = 3 epochs
      ("de", 1L, 2L, 200000L, 500000L, 3L),
      // en: actual 800000 ppm ≥ target → 1 epoch (never drops below one pass)
      ("en", 2L, 8L, 800000L, 500000L, 1L)))
    intercept[IllegalArgumentException] {
      Sampling.mixtureEpochs(df, "lang", "text", Map.empty)
    }
  }

  test("assignSplit: total, roughly proportional, stable under corpus growth") {
    val s = spark
    import s.implicits._
    val plan = Seq(("train", 800000L), ("val", 100000L), ("test", 100000L))
    val small = (1L to 500L).toDF("id")
    val big = (1L to 2000L).toDF("id")
    val assignSmall = Sampling.assignSplit(small, col("id"), plan)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val assignBig = Sampling.assignSplit(big, col("id"), plan)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // total: every row lands in a declared split
    assert(assignBig.values.toSet === Set("train", "val", "test"))
    // growth stability: the 500-row corpus's assignments are unchanged
    // inside the 2000-row corpus (randomSplit cannot promise this)
    assert(assignSmall.forall { case (id, sp) => assignBig(id) == sp })
    // rough proportions at n=2000 (hash is uniform; allow wide slack)
    val byl = assignBig.values.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(byl("train") > 1400 && byl("val") < 400 && byl("test") < 400, byl.toString)
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(small, col("id"), Seq(("a", 1L), ("b", 2L)))
    }
  }

  test("mixtureEpochs: sub-ppm domain does not divide by zero and stays in the plan") {
    val s = spark
    import s.implicits._
    // 'big' has 2,000,000 tokens; 'tiny' has 1 → tiny's share floors to
    // 0 ppm. The guarded divisor must keep tiny in the plan (epochs =
    // target_ppm under the 1-ppm clamp), not error (ANSI) or NULL out.
    val df = Seq(
      (1L, "big", Seq.fill(2000000)("w").mkString(" ")),
      (2L, "tiny", "x")).toDF("id", "lang", "text")
    val out = Sampling.mixtureEpochs(df, "lang", "text",
        targetPpm = Map("big" -> 900000L, "tiny" -> 100000L))
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(5))).toMap
    assert(out("tiny")._1 === 0L) // actual_ppm stays informative
    assert(out("tiny")._2 === 100000L) // epochs = target under the clamp
    assert(out("big")._2 === 1L)
  }

  test("materializeEpochs: rows replicate per the plan with 1-based epoch tags") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "en", "a b c d"), (2L, "en", "e f g h"),
      (3L, "de", "x y"), (4L, "fr", "q r s t")).toDF("id", "lang", "text")
    val out = Sampling.materializeEpochs(df, "lang", "text",
        targetPpm = Map("en" -> 500000L, "de" -> 500000L))
      .select("id", "epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // de (id 3) gets epochs 1..3; en docs 1 epoch; fr unlisted → absent
    assert(out === Set((1L, 1L), (2L, 1L), (3L, 1L), (3L, 2L), (3L, 3L)))
  }

  test("materializeEpochs: a plan above maxEpochs fails loudly, not a silent million-fold fan-out") {
    val s = spark
    import s.implicits._
    // 'tiny' floors to 0 actual_ppm → clamped epochs = target_ppm =
    // 100,000 — far past the default 1000 cap
    val df = Seq(
      (1L, "big", Seq.fill(2000000)("w").mkString(" ")),
      (2L, "tiny", "x")).toDF("id", "lang", "text")
    val e = intercept[Exception] {
      Sampling.materializeEpochs(df, "lang", "text",
        targetPpm = Map("big" -> 900000L, "tiny" -> 100000L)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("maxEpochs")), e.toString)
    // and the same plan materializes when the caller raises the cap
    val n = Sampling.materializeEpochs(df, "lang", "text",
      targetPpm = Map("big" -> 900000L, "tiny" -> 100000L),
      maxEpochs = 100000L).count()
    assert(n === 100001L) // big once + tiny 100k times
  }

  test("assignSplit: NULL key gets a NULL split, never the last declared split") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(1L), Some(2L), None).map(Tuple1(_)).toDF("id")
    val out = Sampling.assignSplit(df, col("id"),
        Seq(("train", 900000L), ("val", 50000L), ("test", 50000L)))
      .collect().map(r => (Option(r.get(0)), Option(r.getString(1))))
    val nullRow = out.find(_._1.isEmpty).get
    assert(nullRow._2.isEmpty, out.mkString(", "))
    assert(out.filter(_._1.nonEmpty).forall(_._2.nonEmpty))
  }

  test("temperatureShares: alpha=1 natural, alpha<1 upweights scarce, NULL domains drop") {
    val s = spark
    import s.implicits._
    // 80/20 split plus a NULL domain row that must not count
    val df = ((1 to 80).map(i => (i.toLong, "big")) ++
      (81 to 100).map(i => (i.toLong, "small")) :+ (101L, null))
      .toDF("id", "dom")
    def shares(a: Double) = Sampling.temperatureShares(df, "dom", a)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nat = shares(1.0)
    assert(nat("big")._1 === 80L && nat("small")._1 === 20L)
    // natural: 800000 / 200000 ppm exactly (integer arithmetic)
    assert(nat("big")._2 === 800000L && nat("small")._2 === 200000L)
    val t05 = shares(0.5)
    // sqrt compresses the ratio: small's share rises above its natural 20%
    assert(t05("small")._2 > 200000L && t05("big")._2 < 800000L)
    // shares sum to ~1e6 (floor-division slack < #domains)
    assert(math.abs(t05.values.map(_._2).sum - 1000000L) < 3)
    // alpha=0.25 compresses further
    assert(shares(0.25)("small")._2 > t05("small")._2)
  }
}
