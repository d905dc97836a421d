package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Library-only paths of the dedup API not covered by the oracle demos:
  * the stop-shingle document-frequency cap and generic exactDedup usage.
  */
class TextDedupSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("ngram cap: high cap == uncapped; low cap only removes pairs") {
    val docs = Tables.table(spark, sfDir, "documents")
    val uncapped = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", 0.05)
      .collect().map(_.mkString("|")).toSet
    val highCap = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", 0.05,
      maxDocFreq = Some(1000000))
      .collect().map(_.mkString("|")).toSet
    assert(highCap == uncapped)
    val lowCapPairs = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", 0.05,
      maxDocFreq = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncappedPairs = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lowCapPairs.subsetOf(uncappedPairs))
  }

  test("exactDedup keeps exactly one row per key, the tiebreak-first one") {
    val s = spark
    import s.implicits._
    val df = Seq((1, "b"), (1, "a"), (2, "z"), (2, "y"), (3, "m"))
      .toDF("k", "v")
    val out = TextDedup.exactDedup(df, Seq("k"), col("v"))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getString(1))).toList
    assert(out == List((1, "a"), (2, "y"), (3, "m")))
  }
}
