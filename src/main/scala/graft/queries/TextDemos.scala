package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.RelationalDemos.Demo
import graft.sources.Tables

/** Text-analysis operators for LLM-data pipelines (SURVEY.md §2B X5) over
  * the `documents` table: token counting (whitespace + BPE-ish regex),
  * quality scoring (length / punctuation / stopword ratios), n-gram
  * heuristic language-ID, and corpus word-frequency top-k.
  *
  * Parity design: only integer counts and single-division doubles cross
  * the engine boundary (no accumulated float state), and every regex is
  * written to mean the same thing to Spark's java.util.regex and DuckDB's
  * RE2. Scale design: every operator is a narrow projection or a
  * map-side-combinable aggregation — nothing collects to the driver, and
  * the only shuffles are on bounded keys (word, lang) or bounded output
  * (top-k).
  */
object TextDemos {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private val toks: Column = split(col("text"), " ")

  // -------------------------------------------------------------------
  // X5a: token counting — whitespace tokens plus a BPE-ish subword count:
  // runs of letters, runs of digits, or single other non-space chars
  // (the classic GPT-2-style pre-tokenizer shape, minus unicode classes).
  // Narrow projection → whole-stage codegen over the scan.
  // -------------------------------------------------------------------
  private val x5a = Demo("x5a_token_count", Some("""
      SELECT doc_id,
             len(string_split(text, ' ')) AS ws_tokens,
             length(replace(regexp_replace(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 'x', 'g'), ' ', '')) AS bpeish_tokens
      FROM documents
      ORDER BY doc_id ASC NULLS LAST"""),
    (s, dir) => {
      // each regex match collapses to one 'x'; counting the non-space chars
      // of the collapsed string = number of matches = subword token count
      val collapsed = regexp_replace(col("text"), "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]", "x")
      t(s, dir, "documents").select(
        col("doc_id"),
        size(toks).as("ws_tokens"),
        length(regexp_replace(collapsed, " ", "")).as("bpeish_tokens"))
        .orderBy(col("doc_id").asc_nulls_last)
    })

  // -------------------------------------------------------------------
  // X5b: quality scoring — length, punctuation ratio, stopword ratio,
  // mean word length, and a composite keep/drop flag (the C4-style
  // heuristic family). Integer counts + one final division each.
  // -------------------------------------------------------------------
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
             cast(n_punct AS double) / n_chars_m AS punct_ratio,
             cast(n_stop AS double) / n_tokens AS stopword_ratio,
             cast(n_chars_m - n_tokens + 1 AS double) / n_tokens AS mean_word_len,
             CASE WHEN n_tokens >= 5 AND n_stop > 0
                       AND cast(n_punct AS double) / n_chars_m < 0.2
                  THEN 1 ELSE 0 END AS keep
      FROM m
      ORDER BY doc_id ASC NULLS LAST"""),
    (s, dir) => {
      val stop = array(Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
        .map(lit): _*)
      val base = t(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).as("n_chars_m"),
        size(toks).as("n_tokens"),
        (length(col("text"))
          - length(regexp_replace(col("text"), """[.,;:!?'"()]""", ""))).as("n_punct"),
        size(filter(split(lower(col("text")), " "),
          w => array_contains(stop, w))).as("n_stop"))
      base.select(
        col("doc_id"), col("n_chars_m"), col("n_tokens"),
        (col("n_punct").cast("double") / col("n_chars_m")).as("punct_ratio"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stopword_ratio"),
        // chars minus (n_tokens-1) separators, averaged over tokens
        ((col("n_chars_m") - col("n_tokens") + 1).cast("double") / col("n_tokens"))
          .as("mean_word_len"),
        when(col("n_tokens") >= 5 && col("n_stop") > 0
          && col("n_punct").cast("double") / col("n_chars_m") < 0.2, 1)
          .otherwise(0).as("keep"))
        .orderBy(col("doc_id").asc_nulls_last)
    })

  // -------------------------------------------------------------------
  // X5c: language-ID — character-profile heuristic scoring: per doc,
  // the rate of language-marker n-grams/characters decides the guess;
  // compared against the table's labeled `lang` for an accuracy readout.
  // All integer counts; one division per rate → deterministic doubles.
  // -------------------------------------------------------------------
  private def countMatches(c: Column, pattern: String): Column =
    (length(c) - length(regexp_replace(c, pattern, ""))) // 1-char patterns only

  private val x5c = Demo("x5c_lang_id", Some("""
      WITH m AS (
        SELECT doc_id, lang,
               lower(text) AS lt,
               length(text) AS n
        FROM documents),
      sc AS (
        SELECT doc_id, lang,
               cast(length(lt) - length(regexp_replace(lt, '[äöüß]', '', 'g')) AS double) / n AS de_rate,
               cast(length(lt) - length(regexp_replace(lt, '[éèêàçù]', '', 'g')) AS double) / n AS fr_rate,
               cast(length(lt) - length(regexp_replace(lt, '[áíóúñ¿¡]', '', 'g')) AS double) / n AS es_rate,
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
    (s, dir) => {
      val lt = lower(col("text"))
      val enWords = array(Seq("the", "and", "of", "is", "you").map(lit): _*)
      val sc = t(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        (countMatches(lt, "[äöüß]").cast("double") / length(col("text"))).as("de_rate"),
        (countMatches(lt, "[éèêàçù]").cast("double") / length(col("text"))).as("fr_rate"),
        (countMatches(lt, "[áíóúñ¿¡]").cast("double") / length(col("text"))).as("es_rate"),
        (size(filter(split(lt, " "), w => array_contains(enWords, w))).cast("double")
          / size(split(lt, " "))).as("en_rate"))
      sc.select(
        col("doc_id"), col("lang"),
        when(col("de_rate") >= col("fr_rate") && col("de_rate") >= col("es_rate")
          && col("de_rate") > 0, "de")
          .when(col("fr_rate") >= col("es_rate") && col("fr_rate") > 0, "fr")
          .when(col("es_rate") > 0, "es")
          .when(col("en_rate") > 0, "en")
          .otherwise("und").as("lang_guess"))
        .orderBy(col("doc_id").asc_nulls_last)
    })

  // -------------------------------------------------------------------
  // X5d: corpus word frequency top-k — explode + two-phase hash agg
  // (map-side combine on the word key) + global top-k. The canonical
  // "does your shuffle survive 100 TB" shape: shuffle carries one row per
  // distinct word per partition, never one row per token.
  // -------------------------------------------------------------------
  private val x5d = Demo("x5d_word_topk", Some("""
      SELECT w AS word, count(*) AS freq
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
      WHERE w != ''
      GROUP BY 1
      ORDER BY freq DESC NULLS LAST, word ASC NULLS LAST
      LIMIT 50"""),
    (s, dir) => t(s, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc_nulls_last, col("word").asc_nulls_last)
      .limit(50))

  val all: Seq[Demo] = Seq(x5a, x5b, x5c, x5d)
}
