package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C8-C11: text analysis over the `documents` table.
  *
  * Everything is built from codegen'd `functions._` (no UDFs), so the
  * whole block stays inside WholeStageCodegen and scales as a single
  * projection over the corpus — the shape you want for a 100 TB text
  * sweep (embarrassingly parallel, no shuffle).
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword-boundary token count: runs of letters, digits,
    * or single punctuation marks (the regex mirrors the GPT-2 style
    * pre-tokenizer's coarse classes, ASCII-range).
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"))

  /** Quality features: the standard cheap filters used to score web
    * text for LLM corpora (length, word stats, stopword density).
    */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  def qualityFeatures(docs: DataFrame): DataFrame = {
    val w = tokens(col("text"))
    val nWords = size(w)
    val stopArr = array(stopwords.map(lit): _*)
    val nStop = size(filter(w, t => array_contains(stopArr, t)))
    val sumWordLen = aggregate(transform(w, t => length(t)), lit(0), (a, x) => a + x)
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars_calc"),
      nWords.as("n_words"),
      nStop.as("n_stopwords"),
      (nStop.cast("double") / nWords).as("stopword_ratio"),
      (sumWordLen.cast("double") / nWords).as("mean_word_len"))
  }

  /** Language-ID: stopword-profile scoring. Each language has a tiny
    * marker lexicon; the prediction is the argmax count with
    * deterministic tie-break (score desc, then language code asc),
    * falling back to 'und' when nothing matches. (The classic n-gram
    * profile method reduced to its word-level form.)
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "de" -> Seq("der", "und", "die", "ist", "das"),
    "es" -> Seq("el", "los", "es", "una", "y"),
    "fr" -> Seq("le", "les", "est", "une", "et"))

  def langId(docs: DataFrame): DataFrame = {
    val w = tokens(col("text"))
    val scored = langMarkers.map { case (lang, markers) =>
      val arr = array(markers.map(lit): _*)
      struct(size(filter(w, t => array_contains(arr, t))).as("score"),
        lit(lang).as("lang"))
    }
    // array_max on struct(score, lang) orders by score then lang; to
    // get "highest score, tie-break smallest lang code" flip the lang
    // ordering by sorting on (score, reversed-lang) is not expressible
    // directly — instead sort desc by score with lang asc via sort_array
    // on (negated score, lang).
    val neg = langMarkers.map { case (lang, markers) =>
      val arr = array(markers.map(lit): _*)
      struct((-size(filter(w, t => array_contains(arr, t)))).as("nscore"),
        lit(lang).as("lang"))
    }
    val best = sort_array(array(neg: _*)).getItem(0)
    docs.select(
      col("doc_id"), col("lang").as("lang_labeled"),
      when(best.getField("nscore") === 0, "und")
        .otherwise(best.getField("lang")).as("lang_pred"))
  }

  /** C10 query surface: both token counts per doc. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(tokens(col("text"))).as("n_ws_tokens"),
      regexTokenCount(col("text")).as("n_regex_tokens"))
}
