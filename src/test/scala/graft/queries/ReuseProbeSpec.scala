package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Pin that the capped-Jaccard posting-list aggregate is shuffled once:
  * the two consumers (capped sizes, pair buckets) share the exchange via
  * ReusedExchange in the executed (AQE-final) plan.
  */
class ReuseProbeSpec extends SparkSpec {
  test("x2c2: posting-list exchange reused between sizes and buckets") {
    val df = SparkEntry.queries("x2c2_ngram_jaccard_capped")(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"), p.take(3000))
  }
}
