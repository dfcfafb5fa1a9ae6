package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §2.3
  * rows 37-40): token counting, quality scoring, marker-based
  * language ID, and document fingerprinting (md5 + winnowing).
  * Everything is pure column expressions — narrow, codegen, zero
  * shuffle at any scale.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def wsTokens(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token estimate: word-piece regex tokens (letter runs,
    * digit runs, single punctuation) — a cheap proxy for subword
    * tokenizers.
    */
  def regexTokens(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** ~4 chars/token heuristic estimate. */
  def charEstimateTokens(text: Column): Column =
    ceil(length(text).cast("double") / 4).cast("long")

  /** Quality signals: length, punctuation ratio, stopword ratio, mean
    * word length, alpha-char ratio.
    */
  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  val Stopwords: Seq[String] = Seq("the", "a", "an", "of", "to", "in", "and", "is", "it", "for")

  def stopwordRatio(text: Column): Column = {
    val words = split(trim(lower(text)), "\\s+")
    size(filter(words, w => w.isin(Stopwords: _*))).cast("double") /
      greatest(size(words), lit(1)).cast("double")
  }

  def meanWordLen(text: Column): Column = {
    val words = split(trim(text), "\\s+")
    aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double") /
      greatest(size(words), lit(1)).cast("double")
  }

  def alphaRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]"), lit(0))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Marker-stopword language ID: score = fraction of words that are
    * language markers; argmax wins, ties broken by language code order.
    * An n-gram-free heuristic that stays a pure expression; the marker
    * lists are the model.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "it"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "y"),
    "fr" -> Seq("le", "la", "les", "est", "un", "une", "et", "dans"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "men5"),
  )

  def langScores(text: Column): Seq[(String, Column)] = {
    val words = split(trim(lower(text)), "\\s+")
    val n = greatest(size(words), lit(1)).cast("double")
    LangMarkers.map { case (lang, markers) =>
      lang -> (size(filter(words, w => w.isin(markers: _*))).cast("double") / n)
    }
  }

  /** (language, score) with the highest marker score; first language in
    * code order wins ties.
    */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val lang = scores.reverse.foldLeft(lit(scores.last._1)) { case (acc, (l, s)) =>
      when(s === best, lit(l)).otherwise(acc)
    }
    struct(lang.as("lang"), best.as("score"))
  }

  /** Winnowing fingerprint count (Schleimer et al., MOSS): md5 each
    * char k-gram, take the window minimum over `w` consecutive
    * k-grams (lexicographic on the hex — stable across engines), count
    * distinct selected fingerprints. Pure nested array expressions.
    */
  def winnowCount(text: Column, k: Int = 5, w: Int = 4): Column = {
    val nGrams = greatest(length(text) - (k - 1), lit(0))
    val grams = transform(sequence(lit(1), nGrams),
      i => md5(text.substr(i, lit(k))))
    // at least one window; slice clamps at the array end for short texts
    val nWindows = greatest(nGrams - (w - 1), lit(1))
    val selected = transform(sequence(lit(0), nWindows - 1),
      i => array_min(slice(grams, i + 1, lit(w))))
    when(nGrams <= 0, lit(0)).otherwise(size(array_distinct(selected)))
  }
}
