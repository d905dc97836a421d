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
}
