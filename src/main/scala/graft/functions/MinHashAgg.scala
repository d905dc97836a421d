package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass MinHash signature aggregator (SURVEY.md §2B X7): buffer =
  * the 128-slot signature, update = elementwise min of the permuted hash,
  * merge = elementwise min — associative and commutative, so Spark runs it
  * map-side (partial aggregation) and the shuffle carries one 128-long
  * array per document regardless of document size, exactly like the
  * 128-column `min(...)` formulation in [[Hashing.minhashSigAggs]] but as
  * ONE aggregate expression over ONE buffer.
  *
  * Permutation constants match [[Hashing.minhashPerm]] bit-for-bit, so
  * both formulations produce identical signatures (asserted in
  * MinHashAggSpec).
  */
object MinHashAgg extends Aggregator[Long, Array[Long], Array[Long]] {

  private val K = Hashing.MinhashK
  private val as: Array[Long] = Array.tabulate(K)(Hashing.permA)
  private val bs: Array[Long] = Array.tabulate(K)(Hashing.permB)

  override def zero: Array[Long] = Array.fill(K)(Long.MaxValue)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var s = 0
    while (s < K) {
      val v = (as(s) * x + bs(s)) % Hashing.P
      if (v < buf(s)) buf(s) = v
      s += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var s = 0
    while (s < K) {
      if (b2(s) < b1(s)) b1(s) = b2(s)
      s += 1
    }
    b1
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
