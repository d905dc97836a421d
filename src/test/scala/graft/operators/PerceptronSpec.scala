package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Exact-integer perceptron training (X53): hand-traced updates, tie
  * handling, NULL hygiene, and partition-order invariance.
  */
class PerceptronSpec extends SparkSpec {

  test("train: hand-traced rounds converge on a separable single feature") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 0), (3L, 1)).toDF("x", "y")
    // w=(0,0): both score 0 -> pred 0 -> row2 missed: w=(1,3)
    // round2: row1 scores 4 -> pred 1 wrong: w=(0,2); row2 right
    // round3: row1 scores 2 -> wrong again: w=(-1,1)
    // round4: row1 scores 0 -> pred 0 right (strict >0); row2 scores 2 ->
    // right -> no update; converged
    assert(Perceptron.train(df, Seq("x"), "y", iters = 4) === Seq(-1L, 1L))
    val scored = Perceptron.score(df, Seq("x"), Seq(-1L, 1L))
      .select(col("x"), col("score"), col("pred"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(scored === Set((1L, 0L, 0), (3L, 2L, 1)))
  }

  test("train is exact: weights identical under any partitioning") {
    val s = spark
    import s.implicits._
    val rows = (1 to 200).map(i => (i.toLong, (i % 7).toLong, if (i % 3 == 0) 1 else 0))
    val df = rows.toDF("x1", "x2", "y")
    val a = Perceptron.train(df.repartition(1), Seq("x1", "x2"), "y", 5)
    val b = Perceptron.train(df.repartition(17, col("y")), Seq("x1", "x2"), "y", 5)
    assert(a === b)
  }

  test("NULL features and labels are dropped, never summed") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(1L), Some(0)), (Some(3L), Some(1)),
      (None, Some(1)), (Some(100L), None)).toDF("x", "y")
    assert(Perceptron.train(df, Seq("x"), "y", 4) === Seq(-1L, 1L))
    // scoring a NULL feature: NULL score, pred 0 (cannot-score != pass)
    val r = Perceptron.score(df, Seq("x"), Seq(-1L, 1L))
      .filter(col("x").isNull).head()
    assert(r.isNullAt(r.fieldIndex("score")) && r.getInt(r.fieldIndex("pred")) === 0)
  }

  test("degenerate inputs fail fast; all-one-class corpus learns that class") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      Perceptron.train(Seq((1L, 1)).toDF("x", "y"), Nil, "y", 1)
    }
    intercept[IllegalArgumentException] {
      Perceptron.score(Seq((1L, 1)).toDF("x", "y"), Seq("x"), Seq(1L))
    }
    // all-positive labels: first round pushes weights positive, then stable
    val allPos = Seq((2L, 1), (5L, 1)).toDF("x", "y")
    val w = Perceptron.train(allPos, Seq("x"), "y", 3)
    val preds = Perceptron.score(allPos, Seq("x"), w)
      .select(col("pred")).collect().map(_.getInt(0)).toSet
    assert(preds === Set(1))
  }
}
