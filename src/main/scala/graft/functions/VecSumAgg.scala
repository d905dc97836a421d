package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise sum of int64 vectors (SURVEY.md §2B X7 custom-aggregate
  * surface) — the centroid-update aggregate of the IVF coarse quantizer
  * ([[graft.operators.VectorSearch.ivfTrain]]). Buffer = one running sum
  * vector; update/merge = element-wise add — associative and commutative,
  * so Spark runs it map-side and the shuffle carries ONE dim-length array
  * per (cluster × partition) instead of one row per (vector × dimension)
  * (the posexplode formulation's 64× row blowup).
  *
  * Dimension is taken from the first vector seen; the empty buffer is the
  * zero sentinel. Exact integer arithmetic: quantized components are
  * ≤ 10⁴ in magnitude, so the per-dim SUM stays exact up to ~9e14
  * members; the tighter bound is downstream — the assignment dot against
  * these sums caps a cell at [[graft.operators.VectorSearch.MaxCellMembers]]
  * (~1.4e9), which ivfTrain enforces.
  */
object VecSumAgg extends Aggregator[Seq[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], x: Seq[Long]): Array[Long] =
    if (buf.isEmpty) x.toArray
    else {
      require(x.length == buf.length,
        s"VecSumAgg: ragged input — vector of dim ${x.length} in a group of dim ${buf.length}")
      var i = 0
      while (i < buf.length) { buf(i) += x(i); i += 1 }
      buf
    }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"VecSumAgg: ragged input — merging buffers of dim ${a.length} and ${b.length}")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
