package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary (SURVEY.md §2B X7): a k-counter
  * frequency sketch whose buffer NEVER exceeds `k` entries regardless of
  * input size — update increments a tracked key, inserts while there is
  * room, and otherwise decrements every counter (dropping zeros); merge
  * (Agarwal et al. 2012, "Mergeable Summaries") sums the two summaries
  * and, if over capacity, subtracts the (k+1)-th largest count from all
  * and drops the non-positive remainder.
  *
  * Guarantee: any item with true frequency > n/(k+1) SURVIVES in the
  * final summary (its counter can be decremented at most n/(k+1) times).
  * The candidate SET itself is partition-order-dependent — consumers
  * must exact-verify candidates ([[graft.operators.Sketches]] does),
  * after which the result is deterministic and oracle-checkable.
  *
  * Scale: associative-enough merge runs map-side (partial aggregation);
  * the shuffle carries one ≤k-entry map per partition, never the key
  * universe — the point of the sketch vs a full groupBy at 100 TB.
  */
final class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"need k >= 1 counters, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        b.flatMap { case (key, c) =>
          if (c > 1) Some(key -> (c - 1)) else None
        }
    }

  override def merge(b1: Map[String, Long],
      b2: Map[String, Long]): Map[String, Long] = {
    val sum = b2.foldLeft(b1) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count, drop what hits zero
      val cut = sum.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      sum.flatMap { case (key, c) =>
        if (c > cut) Some(key -> (c - cut)) else None
      }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
