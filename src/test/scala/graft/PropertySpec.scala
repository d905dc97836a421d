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
}
