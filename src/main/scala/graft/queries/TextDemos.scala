package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.queries.RelationalDemos.Demo
import graft.sources.Tables

/** Text-analysis demonstrators (SURVEY.md §2B X5) over the harness
  * `documents` table. Operators live in
  * [[graft.operators.TextAnalysis]]; demos bind the harness schema and
  * pin output order for the oracle hash-compare.
  */
object TextDemos {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  private val x5a = Demo("x5a_token_count", Some("""
      SELECT doc_id,
             len(string_split(text, ' ')) AS ws_tokens,
             length(replace(regexp_replace(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 'x', 'g'), ' ', '')) AS bpeish_tokens
      FROM documents
      ORDER BY doc_id ASC NULLS LAST"""),
    (s, dir) => TextAnalysis.tokenCounts(docs(s, dir), "text")
      .select(col("doc_id"), col("ws_tokens"), col("bpeish_tokens"))
      .orderBy(col("doc_id").asc_nulls_last))

  private val x5b = Demo("x5b_quality_score", Some("""
      WITH m AS (
        SELECT doc_id,
               length(text) AS n_chars_m,
               len(string_split(text, ' ')) AS n_tokens,
               length(text) - length(regexp_replace(text, '[.,;:!?''"()]', '', 'g')) AS n_punct,
               len(list_filter(string_split(lower(text), ' '),
                 w -> list_contains(['the','a','an','and','or','of','to','in','is','it'], w))) AS n_stop
        FROM documents)
      SELECT doc_id, n_chars_m, n_tokens,
             CASE WHEN n_chars_m > 0
                  THEN cast(n_punct AS double) / n_chars_m END AS punct_ratio,
             cast(n_stop AS double) / n_tokens AS stopword_ratio,
             cast(n_chars_m - n_tokens + 1 AS double) / n_tokens AS mean_word_len,
             CASE WHEN n_tokens >= 5 AND n_stop > 0
                       AND coalesce(CASE WHEN n_chars_m > 0
                             THEN cast(n_punct AS double) / n_chars_m END, 1.0) < 0.2
                  THEN 1 ELSE 0 END AS keep
      FROM m
      ORDER BY doc_id ASC NULLS LAST"""),
    (s, dir) => TextAnalysis.qualityMetrics(docs(s, dir), "text")
      .select(col("doc_id"), col("n_chars_m"), col("n_tokens"),
        col("punct_ratio"), col("stopword_ratio"), col("mean_word_len"),
        col("keep"))
      .orderBy(col("doc_id").asc_nulls_last))

  private val x5c = Demo("x5c_lang_id", Some("""
      WITH m AS (
        SELECT doc_id, lang,
               lower(text) AS lt,
               length(text) AS n
        FROM documents),
      sc AS (
        SELECT doc_id, lang,
               CASE WHEN n > 0 THEN cast(length(lt) - length(regexp_replace(lt, '[äöüß]', '', 'g')) AS double) / n ELSE 0 END AS de_rate,
               CASE WHEN n > 0 THEN cast(length(lt) - length(regexp_replace(lt, '[éèêàçù]', '', 'g')) AS double) / n ELSE 0 END AS fr_rate,
               CASE WHEN n > 0 THEN cast(length(lt) - length(regexp_replace(lt, '[áíóúñ¿¡]', '', 'g')) AS double) / n ELSE 0 END AS es_rate,
               cast(len(list_filter(string_split(lt, ' '),
                 w -> list_contains(['the','and','of','is','you'], w))) AS double)
                 / len(string_split(lt, ' ')) AS en_rate
        FROM m)
      SELECT doc_id, lang,
             CASE WHEN de_rate >= fr_rate AND de_rate >= es_rate AND de_rate > 0 THEN 'de'
                  WHEN fr_rate >= es_rate AND fr_rate > 0 THEN 'fr'
                  WHEN es_rate > 0 THEN 'es'
                  WHEN en_rate > 0 THEN 'en'
                  ELSE 'und' END AS lang_guess
      FROM sc
      ORDER BY doc_id ASC NULLS LAST"""),
    (s, dir) => TextAnalysis.langGuess(docs(s, dir), "text")
      .select(col("doc_id"), col("lang"), col("lang_guess"))
      .orderBy(col("doc_id").asc_nulls_last))

  private val x5d = Demo("x5d_word_topk", Some("""
      SELECT w AS word, count(*) AS freq
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
      WHERE w != ''
      GROUP BY 1
      ORDER BY freq DESC NULLS LAST, word ASC NULLS LAST
      LIMIT 50"""),
    (s, dir) => TextAnalysis.wordTopK(docs(s, dir), "text", 50))

  val all: Seq[Demo] = Seq(x5a, x5b, x5c, x5d)
}
