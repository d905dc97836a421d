package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Aggregator-based minhash signature equals the 128-column min-agg
  * formulation on real corpus data, and the codegen'd kernels equal their
  * interpreted definitions.
  */
class MinHashAggSpec extends SparkSpec {

  test("MinHashAgg == 128-column min aggregation") {
    val s = spark
    Hashing.registerAll(s)
    val docs = graft.sources.Tables.table(s, "/root/testdata/sf0.001", "documents")
    val hashes = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), call_function("char_poly_hash", col("tok")).as("x"))
    val viaAgg = hashes.groupBy("doc_id")
      .agg(udaf(MinHashAgg).apply(col("x")).as("sig"))
    val viaCols = hashes.groupBy("doc_id")
      .agg(Hashing.minhashSigAggs.head, Hashing.minhashSigAggs.tail: _*)
      .select(col("doc_id"),
        array((0 until Hashing.MinhashK).map(i => col(s"m$i")): _*).as("sig"))
    val a = viaAgg.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getSeq[Long](1).toList)).toList
    val b = viaCols.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getSeq[Long](1).toList)).toList
    assert(a == b)
  }

  test("char_poly_hash matches the HOF formulation") {
    val s = spark
    Hashing.registerAll(s)
    val docs = graft.sources.Tables.table(s, "/root/testdata/sf0.001", "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val mism = docs.select(
      call_function("char_poly_hash", col("tok")).as("fast"),
      Hashing.charPolyHash(col("tok")).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(mism == 0)
  }

  test("dot_long matches the zip_with/aggregate formulation") {
    val s = spark
    Hashing.registerAll(s)
    val q = graft.sources.Tables.table(s, "/root/testdata/sf0.001", "embeddings")
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 10000).cast("long")).as("qv"))
    val mism = q.select(
      call_function("dot_long", col("qv"), col("qv")).as("fast"),
      aggregate(zip_with(col("qv"), col("qv"), (a, b) => a * b),
        lit(0L), (acc, v) => acc + v).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(mism == 0)
  }
}
