package graft.operators

import graft.SparkSpec

/** rrfFuse semantics: consensus outranks one-leg enthusiasm, absent
  * legs contribute zero (not NULL), n-leg folds, validation fails fast.
  */
class RetrievalSpec extends SparkSpec {

  private def leg(pairs: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    pairs.toSeq.toDF("id", "rank")
  }

  test("consensus beats a single leg's top rank; ties break on id") {
    // doc 1 is #1 lexically but absent from the vector leg; doc 2 is #2
    // in BOTH legs — 2/(60+2) > 1/(60+1), so consensus wins
    val lex = leg(1L -> 1L, 2L -> 2L, 3L -> 3L)
    val vec = leg(2L -> 2L, 4L -> 1L, 3L -> 3L)
    val out = Retrieval.rrfFuse(Seq(lex, vec), "id", "rank", kRrf = 60,
        topK = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.head._2 === 2L) // both-legs rank-2 doc fuses highest
    assert(out.map(_._2).toSeq === Seq(2L, 3L, 1L, 4L))
    // doc 1 (lex only, rank 1) vs doc 4 (vec only, rank 1): same score,
    // id tiebreak
    val s1 = out.find(_._2 == 1L).get._3
    val s4 = out.find(_._2 == 4L).get._3
    assert(s1 === s4 && s1 === 1.0 / 61)
    assert(out.find(_._2 == 2L).get._3 === 2.0 / 62)
  }

  test("per-leg ranks carried through; absent leg is NULL in output, 0 in score") {
    val out = Retrieval.rrfFuse(Seq(leg(1L -> 1L), leg(2L -> 1L)),
      "id", "rank", topK = 2).collect()
    val r1 = out.find(_.getLong(1) == 1L).get
    assert(r1.getLong(3) === 1L && r1.isNullAt(4))
    assert(r1.getDouble(2) === 1.0 / 61)
  }

  test("three legs fold in declared order") {
    val out = Retrieval.rrfFuse(
      Seq(leg(7L -> 1L), leg(7L -> 2L), leg(7L -> 3L)),
      "id", "rank", topK = 1).collect().head
    assert(out.getDouble(2) === 1.0 / 61 + 1.0 / 62 + 1.0 / 63)
  }

  test("validation fails fast") {
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(leg(1L -> 1L)), "id", "rank")
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(leg(1L -> 1L), leg(1L -> 1L)), "id", "rank",
        kRrf = 0)
    }
  }
}
