package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Smoke coverage for every registered demonstrator: each query builds,
  * runs at sf0.001, and returns a sane result. Exact value parity is the
  * driver's DuckDB oracle (tools/check_oracle.py locally); this spec
  * catches plan-breaking regressions inside `sbt test`.
  */
class DemoSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // queries whose correct result CAN be empty at tiny scale
  private val mayBeEmpty = Set("q08_grain_test", "x2b_minhash_lsh",
    "x2c_ngram_jaccard", "x2e_embed_neardup", "q07_having",
    "x4f_phash_neardup")

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or documented omission") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without oracleSql (driver downgrades to rows-only): $noOracle")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }
}
