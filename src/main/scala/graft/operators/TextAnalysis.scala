package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators (SURVEY.md §2B X5) — library API behind the
  * x5 demos. Append-style transforms: each adds derived columns so they
  * compose into a cleaning pipeline
  * (`docs → tokenCounts → qualityMetrics → langGuess → filter('keep)`).
  *
  * All metrics are integer counts plus single-division doubles — no
  * accumulated float state — and every stage is a narrow projection
  * (whole-stage codegen over the scan) except wordTopK's bounded-key
  * aggregation.
  */
object TextAnalysis {

  /** Whitespace token count + BPE-ish subword count (runs of letters,
    * runs of digits, single other non-space chars — the GPT-2-style
    * pre-tokenizer shape): each regex match collapses to one char, so
    * counting the collapsed string's non-space chars counts matches.
    */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val collapsed = regexp_replace(col(textCol), "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]", "x")
    df.withColumn("ws_tokens", size(split(col(textCol), " ")))
      .withColumn("bpeish_tokens", length(regexp_replace(collapsed, " ", "")))
  }

  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** C4-style quality heuristics: length, punctuation ratio, stopword
    * ratio, mean word length, and a composite keep flag.
    */
  def qualityMetrics(df: DataFrame, textCol: String,
      stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    val stop = array(stopwords.map(lit): _*)
    val base = df
      .withColumn("n_chars_m", length(col(textCol)))
      .withColumn("n_tokens", size(split(col(textCol), " ")))
      .withColumn("n_punct", length(col(textCol))
        - length(regexp_replace(col(textCol), """[.,;:!?'"()]""", "")))
      .withColumn("n_stop", size(filter(split(lower(col(textCol)), " "),
        w => array_contains(stop, w))))
    base
      .withColumn("punct_ratio", col("n_punct").cast("double") / col("n_chars_m"))
      .withColumn("stopword_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("mean_word_len",
        (col("n_chars_m") - col("n_tokens") + 1).cast("double") / col("n_tokens"))
      .withColumn("keep",
        when(col("n_tokens") >= 5 && col("n_stop") > 0
          && col("n_punct").cast("double") / col("n_chars_m") < 0.2, 1)
          .otherwise(0))
  }

  private def charRate(lt: Column, n: Column, pattern: String): Column =
    (length(lt) - length(regexp_replace(lt, pattern, ""))).cast("double") / n

  /** Character-profile language-ID heuristic: marker-character rates per
    * candidate language decide `lang_guess` ('de'/'fr'/'es'/'en'/'und').
    */
  def langGuess(df: DataFrame, textCol: String): DataFrame = {
    val lt = lower(col(textCol))
    val n = length(col(textCol))
    val enWords = array(Seq("the", "and", "of", "is", "you").map(lit): _*)
    df.withColumn("de_rate", charRate(lt, n, "[äöüß]"))
      .withColumn("fr_rate", charRate(lt, n, "[éèêàçù]"))
      .withColumn("es_rate", charRate(lt, n, "[áíóúñ¿¡]"))
      .withColumn("en_rate",
        size(filter(split(lt, " "), w => array_contains(enWords, w))).cast("double")
          / size(split(lt, " ")))
      .withColumn("lang_guess",
        when(col("de_rate") >= col("fr_rate") && col("de_rate") >= col("es_rate")
          && col("de_rate") > 0, "de")
          .when(col("fr_rate") >= col("es_rate") && col("fr_rate") > 0, "fr")
          .when(col("es_rate") > 0, "es")
          .when(col("en_rate") > 0, "en")
          .otherwise("und"))
      .drop("de_rate", "fr_rate", "es_rate", "en_rate")
  }

  /** Corpus word frequency top-k: explode → two-phase hash agg on the
    * word key (shuffle carries one row per distinct word per partition,
    * never one per token) → bounded top-k.
    */
  def wordTopK(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(split(lower(col(textCol)), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc_nulls_last, col("word").asc_nulls_last)
      .limit(k)
}
