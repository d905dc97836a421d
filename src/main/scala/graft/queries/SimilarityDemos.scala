package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.DotProductLong
import graft.queries.RelationalDemos.Demo
import graft.sources.Tables

/** Approximate-nearest-neighbor similarity search over the `embeddings`
  * table (SURVEY.md §2B X3).
  *
  * Parity design mirrors DedupDemos: embeddings quantize to int64
  * (floor(x*10^4)) so dot products / norms are exact integers and the final
  * cosine is one deterministic IEEE expression; the LSH variant's random
  * hyperplanes come from a fixed integer formula, so the approximation
  * itself is reproducible in the DuckDB oracle.
  *
  * Scale design: the query side (a handful of vectors) broadcasts; the
  * corpus side streams. Brute force = one full scan per query batch (the
  * exact baseline); the hyperplane-bucket variant prunes the corpus scan to
  * matching buckets (~1/256 here), the shape IVF/LSH indexes take at 100 TB.
  */
object SimilarityDemos {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** int64-quantized embedding + exact squared norm (norm = dot(qv, qv)
    * via the codegen'd [[graft.functions.DotProductLong]]).
    */
  private def quantized(s: SparkSession, dir: String): DataFrame = {
    DotProductLong.register(s)
    t(s, dir, "embeddings").select(
      col("vec_id"),
      transform(col("embedding"), x => floor(x.cast("double") * 10000).cast("long")).as("qv"))
      .select(col("vec_id"), col("qv"), dotOf(col("qv"), col("qv")).as("nq"))
  }

  private val oracleQuantCtes = """
      WITH q AS (
        SELECT vec_id,
               list_transform(embedding, x ->
                 cast(floor(cast(x AS double) * 10000) AS bigint)) AS qv
        FROM embeddings),
      n AS (
        SELECT vec_id, qv,
               cast(list_sum(list_transform(qv, v -> v * v)) AS bigint) AS nq
        FROM q)"""

  private def cosineOf(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  private def dotOf(a: Column, b: Column): Column =
    call_function("dot_long", a, b)

  // -------------------------------------------------------------------
  // X3a: brute-force cosine top-k — the exact baseline. Query vectors
  // (vec_id < 5) broadcast against the corpus; rank per query with a
  // window; ties broken by vec_id for determinism.
  // -------------------------------------------------------------------
  private val x3a = Demo("x3a_topk_cosine", Some(s"""
      $oracleQuantCtes
      SELECT qr.vec_id AS query_id, c.vec_id AS vec_id,
             cast(cast(list_sum(list_transform(generate_series(1, 64),
                    i -> qr.qv[i] * c.qv[i])) AS bigint) AS double)
               / (sqrt(cast(qr.nq AS double)) * sqrt(cast(c.nq AS double))) AS cosine
      FROM (SELECT * FROM n WHERE vec_id < 5) qr
      JOIN n c ON c.vec_id != qr.vec_id
      QUALIFY row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, c.vec_id) <= 10
      ORDER BY query_id ASC NULLS LAST, cosine DESC NULLS LAST,
               vec_id ASC NULLS LAST"""),
    (s, dir) => {
      val n = quantized(s, dir)
      val queries = n.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("nq").as("q_nq"))
      val scored = broadcast(queries)
        .join(n, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          cosineOf(dotOf(col("q_qv"), col("qv")), col("q_nq"), col("nq")).as("cosine"))
      scored
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cosine").desc, col("vec_id"))))
        .filter(col("rn") <= 10)
        .select(col("query_id"), col("vec_id"), col("cosine"))
        .orderBy(col("query_id").asc_nulls_last, col("cosine").desc_nulls_last,
          col("vec_id").asc_nulls_last)
    })

  // -------------------------------------------------------------------
  // X3b: hyperplane-LSH bucketed ANN — the scale path. 8 fixed pseudo-random
  // hyperplanes (integer formula, no RNG) → 256 sign buckets; candidates =
  // corpus vectors in the query's bucket; exact rerank within the bucket.
  // Deterministic approximation → reproduced verbatim by the oracle.
  // -------------------------------------------------------------------
  /** sign-bucket of a quantized vector under 8 fixed integer hyperplanes:
    * fold over planes i: acc*2 + (dot(qv, h_i) >= 0). h_i[d] =
    * ((i*64+d)*2654435761) mod 2^31 - 2^30. The planes are constants, so
    * they materialize as array literals and each sign test is one
    * codegen'd dot_long against the row's qv.
    */
  private val planes: IndexedSeq[Column] = (0 until 8).map { i =>
    typedLit((1 to 64).map(d =>
      ((i * 64L + d - 1) * 2654435761L) % 2147483648L - 1073741824L))
  }

  private def bucketOf(qv: Column): Column =
    (0 until 8).map(i =>
      when(dotOf(qv, planes(i)) >= 0, lit(1L << (7 - i))).otherwise(lit(0L)))
      .reduce(_ + _)

  private val oracleBucket = """
        list_reduce(
          list_prepend(cast(0 AS bigint),
            list_transform(generate_series(0, 7), i ->
              CASE WHEN cast(list_sum(list_transform(generate_series(1, 64), d ->
                     qv[d] * ((cast(i*64 + d - 1 AS bigint) * 2654435761) % 2147483648
                              - 1073741824))) AS bigint) >= 0
                   THEN cast(1 AS bigint) ELSE cast(0 AS bigint) END)),
          (acc, b) -> acc * 2 + b)"""

  private val x3b = Demo("x3b_lsh_bucket_ann", Some(s"""
      $oracleQuantCtes,
      bk AS (
        SELECT vec_id, qv, nq, $oracleBucket AS bucket
        FROM n)
      SELECT qr.vec_id AS query_id, c.vec_id AS vec_id,
             cast(cast(list_sum(list_transform(generate_series(1, 64),
                    i -> qr.qv[i] * c.qv[i])) AS bigint) AS double)
               / (sqrt(cast(qr.nq AS double)) * sqrt(cast(c.nq AS double))) AS cosine
      FROM (SELECT * FROM bk WHERE vec_id < 5) qr
      JOIN bk c ON c.bucket = qr.bucket AND c.vec_id != qr.vec_id
      QUALIFY row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, c.vec_id) <= 10
      ORDER BY query_id ASC NULLS LAST, cosine DESC NULLS LAST,
               vec_id ASC NULLS LAST"""),
    (s, dir) => {
      val bk = quantized(s, dir).withColumn("bucket", bucketOf(col("qv")))
      val queries = bk.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
          col("nq").as("q_nq"), col("bucket").as("q_bucket"))
      broadcast(queries)
        .join(bk, col("bucket") === col("q_bucket") && col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          cosineOf(dotOf(col("q_qv"), col("qv")), col("q_nq"), col("nq")).as("cosine"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cosine").desc, col("vec_id"))))
        .filter(col("rn") <= 10)
        .select(col("query_id"), col("vec_id"), col("cosine"))
        .orderBy(col("query_id").asc_nulls_last, col("cosine").desc_nulls_last,
          col("vec_id").asc_nulls_last)
    })

  val all: Seq[Demo] = Seq(x3a, x3b)
}
