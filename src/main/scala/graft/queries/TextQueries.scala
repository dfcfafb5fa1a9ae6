package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.operators.TextAnalysis

/** Text-analysis coverage (SURVEY §2.3 rows 37-40) over documents. */
object TextQueries {

  // ---------------------------------------------------------------- §2.3/37
  val textTokens: Q = Q(
    "text_tokens",
    (s, dir) => Tables.documents(s, dir).select(
      col("doc_id"),
      TextAnalysis.wsTokens(col("text")).as("ws_tokens"),
      TextAnalysis.regexTokens(col("text")).as("regex_tokens"),
      TextAnalysis.charEstimateTokens(col("text")).as("est_tokens"),
    ),
    Some("""
      SELECT doc_id,
             len(regexp_extract_all(trim(text), '\S+')) AS ws_tokens,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
               AS regex_tokens,
             ceil(length(text) / 4.0)::BIGINT AS est_tokens
      FROM documents
    """),
  )

  // ---------------------------------------------------------------- §2.3/38
  val textQuality: Q = Q(
    "text_quality",
    (s, dir) => Tables.documents(s, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      round(TextAnalysis.punctRatio(col("text")), 6).as("punct_ratio"),
      round(TextAnalysis.stopwordRatio(col("text")), 6).as("stopword_ratio"),
      round(TextAnalysis.meanWordLen(col("text")), 6).as("mean_word_len"),
      round(TextAnalysis.alphaRatio(col("text")), 6).as("alpha_ratio"),
    ),
    Some(s"""
      WITH w AS (
        SELECT doc_id, text, regexp_extract_all(trim(text), '\\S+') AS words
        FROM documents)
      SELECT doc_id,
             length(text) AS n_chars,
             round(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE /
                   greatest(length(text), 1), 6) AS punct_ratio,
             round(len(list_filter(list_transform(words, x -> lower(x)),
                   x -> list_contains(${TextAnalysis.Stopwords.map(w => s"'$w'").mkString("[", ",", "]")}, x)))::DOUBLE /
                   greatest(len(words), 1), 6) AS stopword_ratio,
             round(list_sum(list_transform(words, x -> length(x)))::DOUBLE /
                   greatest(len(words), 1), 6) AS mean_word_len,
             round(len(regexp_extract_all(text, '[A-Za-z]'))::DOUBLE /
                   greatest(length(text), 1), 6) AS alpha_ratio
      FROM w
    """),
  )

  // ---------------------------------------------------------------- §2.3/39
  val textLangid: Q = Q(
    "text_langid",
    (s, dir) => {
      val lid = TextAnalysis.langId(col("text"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        lid.getField("lang").as("lang_pred"),
        round(lid.getField("score"), 6).as("score"),
      )
    },
    Some {
      val scoreSql = TextAnalysis.LangMarkers.map { case (lang, markers) =>
        s"len(list_filter(words, x -> list_contains(${markers.map(m => s"'$m'").mkString("[", ",", "]")}, x)))::DOUBLE / greatest(len(words), 1) AS s_$lang"
      }.mkString(",\n               ")
      val langs = TextAnalysis.LangMarkers.map(_._1)
      val best = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
      // first language in code order wins ties, same as the Spark fold
      val pick = langs.reverse.foldLeft(s"'${langs.last}'") { (acc, l) =>
        s"CASE WHEN s_$l = $best THEN '$l' ELSE $acc END"
      }
      s"""
      WITH w AS (
        SELECT doc_id,
               list_transform(regexp_extract_all(trim(text), '\\S+'), x -> lower(x))
                 AS words
        FROM documents),
      sc AS (
        SELECT doc_id,
               $scoreSql
        FROM w)
      SELECT doc_id, $pick AS lang_pred, round($best, 6) AS score FROM sc
      """
    },
  )

  // ---------------------------------------------------------------- §2.3/40
  val textFingerprint: Q = Q(
    "text_fingerprint",
    (s, dir) => Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      // winnowing is the per-row hot spot; spread beyond the single
      // row-group input partition
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(
        col("doc_id"),
        md5(col("text")).as("fp"),
        TextAnalysis.winnowCount(col("text"), k = 5, w = 4).as("n_winnow"),
      ),
    Some("""
      WITH g AS (
        SELECT doc_id, text,
               CASE WHEN length(text) < 5 THEN []::VARCHAR[]
                    ELSE list_transform(range(1, length(text) - 3),
                         i -> md5(text[i:i+4])) END AS grams
        FROM documents)
      SELECT doc_id, md5(text) AS fp,
             CASE WHEN len(grams) = 0 THEN 0
                  ELSE len(list_distinct(list_transform(
                         range(0, greatest(len(grams) - 3, 1)),
                         i -> list_min(grams[i+1:i+4])))) END AS n_winnow
      FROM g
    """),
  )

  val all: Seq[Q] = Seq(textTokens, textQuality, textLangid, textFingerprint)
}
