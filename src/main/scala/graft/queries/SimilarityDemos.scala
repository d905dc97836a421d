package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.VectorSearch
import graft.queries.RelationalDemos.Demo
import graft.sources.Tables

/** ANN similarity-search demonstrators (SURVEY.md §2B X3) over the
  * harness `embeddings` table. Operators live in
  * [[graft.operators.VectorSearch]]; each demo binds the harness schema
  * (query batch = vec_id < 5) and pins output order for the oracle.
  */
object SimilarityDemos {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")

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

  private val x3a = Demo("x3a_topk_cosine", Some(s"""
      $oracleQuantCtes
      SELECT qr.vec_id AS query_id, c.vec_id AS vec_id,
             CASE WHEN qr.nq > 0 AND c.nq > 0 THEN
               cast(cast(list_sum(list_transform(generate_series(1, 64),
                      i -> qr.qv[i] * c.qv[i])) AS bigint) AS double)
                 / (sqrt(cast(qr.nq AS double)) * sqrt(cast(c.nq AS double)))
             END AS cosine
      FROM (SELECT * FROM n WHERE vec_id < 5) qr
      JOIN n c ON c.vec_id != qr.vec_id
      QUALIFY row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, c.vec_id) <= 10
      ORDER BY query_id ASC NULLS LAST, cosine DESC NULLS LAST,
               vec_id ASC NULLS LAST"""),
    (s, dir) => VectorSearch.topKCosine(
        emb(s, dir), emb(s, dir).filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 10)
      .orderBy(col("query_id").asc_nulls_last, col("cosine").desc_nulls_last,
        col("vec_id").asc_nulls_last))

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
             CASE WHEN qr.nq > 0 AND c.nq > 0 THEN
               cast(cast(list_sum(list_transform(generate_series(1, 64),
                      i -> qr.qv[i] * c.qv[i])) AS bigint) AS double)
                 / (sqrt(cast(qr.nq AS double)) * sqrt(cast(c.nq AS double)))
             END AS cosine
      FROM (SELECT * FROM bk WHERE vec_id < 5) qr
      JOIN bk c ON c.bucket = qr.bucket AND c.vec_id != qr.vec_id
      QUALIFY row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, c.vec_id) <= 10
      ORDER BY query_id ASC NULLS LAST, cosine DESC NULLS LAST,
               vec_id ASC NULLS LAST"""),
    (s, dir) => VectorSearch.bucketedAnn(
        emb(s, dir), emb(s, dir).filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 10)
      .orderBy(col("query_id").asc_nulls_last, col("cosine").desc_nulls_last,
        col("vec_id").asc_nulls_last))

  val all: Seq[Demo] = Seq(x3a, x3b)
}
