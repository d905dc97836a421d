package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Algebraic laws from SURVEY.md §5.3.3, checked over randomized small
  * relations (seeded generator — deterministic runs):
  *  - the fan-out law of the reference's bug (docs/bug-analysis.md:73-79):
  *    |agg ⟕ detail on key| = Σ per-key detail multiplicities
  *  - full-outer row count = |L| + |R| − |matched keys|
  *  - keep-first dedup (X1) is idempotent
  *  - coalesce(x, 0) preserves non-nulls and zero-fills nulls
  */
class PropertySpec extends SparkSpec {

  private val trials = 10

  private def detailDf(rows: Seq[(Int, Int)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "v")
  }

  test("fan-out law: joined rows = sum of per-key detail multiplicities") {
    val rnd = new Random(42)
    (1 to trials).foreach { _ =>
      val rows = Seq.fill(1 + rnd.nextInt(30))((rnd.nextInt(6), rnd.nextInt(200) - 100))
      val detail = detailDf(rows)
      val agg = detail.groupBy("k").agg(sum("v").as("total"))
      val joined = agg.join(detail, Seq("k"), "left")
      val expected = rows.groupBy(_._1).values.map(_.size.toLong).sum
      assert(joined.count() == expected, s"rows=$rows")
    }
  }

  test("full outer row count = |L| + |R| - |matched|") {
    val s = spark
    import s.implicits._
    val rnd = new Random(43)
    (1 to trials).foreach { _ =>
      val lk = Seq.fill(1 + rnd.nextInt(10))(rnd.nextInt(11)).distinct
      val rk = Seq.fill(1 + rnd.nextInt(10))(rnd.nextInt(11)).distinct
      val fo = lk.toDF("k").withColumn("lv", lit(1))
        .join(rk.toDF("k").withColumn("rv", lit(2)), Seq("k"), "full_outer")
      val matched = lk.toSet.intersect(rk.toSet).size
      assert(fo.count() == lk.size + rk.size - matched, s"lk=$lk rk=$rk")
    }
  }

  test("keep-first dedup is idempotent") {
    val rnd = new Random(44)
    def dedup(d: DataFrame): DataFrame = d
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("k").orderBy("v")))
      .filter(col("rn") === 1).drop("rn")
    (1 to trials).foreach { _ =>
      val rows = Seq.fill(1 + rnd.nextInt(30))((rnd.nextInt(6), rnd.nextInt(200) - 100))
      val once = dedup(detailDf(rows))
      val twice = dedup(once)
      assert(once.orderBy("k", "v").collect().toSeq ==
        twice.orderBy("k", "v").collect().toSeq, s"rows=$rows")
    }
  }

  test("coalesce(x, 0) preserves non-nulls and zero-fills nulls") {
    val s = spark
    import s.implicits._
    val rnd = new Random(45)
    (1 to trials).foreach { _ =>
      val xs = Seq.fill(20)(if (rnd.nextBoolean()) Some(rnd.nextInt(200) - 100) else None)
      val got = xs.toDF("x").select(coalesce(col("x"), lit(0)).as("c"))
        .collect().map(_.getInt(0)).toList
      assert(got == xs.map(_.getOrElse(0)), s"xs=$xs")
    }
  }

  test("segmentDedup conservation: kept text is per-doc token budget, nothing invented") {
    val s = spark
    import s.implicits._
    val rnd = new Random(45)
    val vocab = Vector("a", "b", "c", "d")
    (1 to trials).foreach { _ =>
      val docs = (1L to (2 + rnd.nextInt(6))).map(id =>
        (id, Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")))
      val out = graft.operators.TextDedup
        .segmentDedup(docs.toDF("doc_id", "text"), "doc_id", "text", width = 3)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      val firstSeen = scala.collection.mutable.Set.empty[String]
      docs.foreach { case (id, text) =>
        val segs = text.split(" ").grouped(3).map(_.mkString(" ")).toSeq
        // reference semantics: keep segments not seen earlier in doc-id,
        // then seg-idx order (exactly the operator's total order)
        val kept = segs.filter(g => firstSeen.add(g))
        val (nSegs, nKept, cleaned) = out(id)
        assert(nSegs == segs.size && nKept == kept.size &&
          cleaned == kept.mkString(" "), s"doc=$id docs=$docs")
      }
    }
  }

  test("winnowing selection: fingerprints ⊆ gram hashes; deeper windows select fewer") {
    val s = spark
    import s.implicits._
    val rnd = new Random(46)
    val vocab = Vector("p", "q", "r", "s", "t", "u")
    (1 to trials).foreach { _ =>
      val docs = (1L to 3L).map(id =>
        (id, Seq.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")))
      val df = docs.toDF("doc_id", "text")
      def fps(w: Int) = graft.operators.TextDedup
        .winnowFingerprints(df, "doc_id", "text", k = 2, w = w)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val gramHashes = graft.operators.TextDedup
        .winnowFingerprints(df, "doc_id", "text", k = 2, w = 1) // w=1 = all grams
      val all = gramHashes.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val w2 = fps(2); val w4 = fps(4)
      assert(w2.subsetOf(all) && w4.subsetOf(w2.union(all)), s"docs=$docs")
      assert(w4.size <= w2.size && w2.size <= all.size, s"docs=$docs")
    }
  }

  test("mixtureEpochs: epochs >= 1 always, == 1 when organic share meets the target") {
    val s = spark
    import s.implicits._
    val rnd = new Random(47)
    (1 to trials).foreach { _ =>
      val langs = Seq("aa", "bb", "cc")
      val docs = (1 to 20).map { i =>
        val l = langs(rnd.nextInt(3))
        (i.toLong, l, Seq.fill(1 + rnd.nextInt(8))("w").mkString(" "))
      }
      val target = Map("aa" -> 334000L, "bb" -> 333000L, "cc" -> 333000L)
      val out = graft.operators.Sampling
        .mixtureEpochs(docs.toDF("id", "lang", "text"), "lang", "text", target)
        .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4),
          r.getLong(5)))
      out.foreach { case (l, actual, tgt, epochs) =>
        assert(epochs >= 1L, s"$l: $epochs")
        if (actual >= tgt) assert(epochs == 1L, s"$l actual=$actual tgt=$tgt")
        else assert(epochs == (tgt + actual - 1) / actual, s"$l")
      }
    }
  }
}
