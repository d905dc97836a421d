package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Sampling
import graft.queries.RelationalDemos.Demo
import graft.sources.Tables

/** Deterministic-sampling demonstrators over `documents`
  * ([[graft.operators.Sampling]]): reproducible corpus subsampling —
  * selection is a pure function of doc_id, so the oracle reproduces the
  * exact sample.
  */
object SamplingDemos {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  private val x10a = Demo("x10a_hash_sample", Some("""
      SELECT doc_id, lang, source
      FROM documents
      WHERE (((doc_id % 2147483648) * 2654435761) >> 16) % 100 < 20
      ORDER BY doc_id ASC NULLS LAST"""),
    (s, dir) => Sampling.hashSample(docs(s, dir), col("doc_id"), percent = 20)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id").asc_nulls_last))

  private val stratRates = Map("en" -> 10, "de" -> 50, "fr" -> 50, "es" -> 50)

  /** SQL CASE generated from the same map the Spark side uses. */
  private def stratCase: String =
    "CASE lang " +
      stratRates.toSeq.sortBy(_._1).map { case (l, p) => s"WHEN '$l' THEN $p" }
        .mkString(" ") + " ELSE 0 END"

  private val x10b = Demo("x10b_stratified_sample", Some(s"""
      SELECT doc_id, lang
      FROM documents
      WHERE (((doc_id % 2147483648) * 2654435761) >> 16) % 100 < $stratCase
      ORDER BY doc_id ASC NULLS LAST"""),
    (s, dir) => Sampling.stratifiedSample(docs(s, dir), col("doc_id"), col("lang"),
        rates = stratRates)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id").asc_nulls_last))

  val all: Seq[Demo] = Seq(x10a, x10b)
}
