package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-style document scoring for training-data pipelines:
  * TF-IDF term weighting and BM25 query relevance — the standard
  * quality/relevance signals a corpus-curation pass computes before
  * sampling or filtering at 100 TB.
  *
  * Tokenization is the `text_vocab` convention (lower, single-space
  * split, drop empties) so vocabulary sizes line up across the text
  * family.
  *
  * Scale shape: one explode → (doc, term) groupBy with map-side
  * combine; the document-frequency table is VOCABULARY-sized and
  * joins back broadcast, so nothing re-shuffles the corpus. N and
  * avgdl are fit-boundary scalars (one tiny aggregate job — the
  * range-join min/max pattern). Per-term BM25 contributions quantize
  * to integer micro-units before the per-doc sum (ExactAgg
  * convention), so the distributed sum is order-free and the DuckDB
  * oracle replays it bit-exactly.
  */
object Retrieval {

  /** (doc, term, tf) pairs under the text_vocab tokenization. */
  def termFreq(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(split(lower(col(textCol)), " ", -1)).as("term"))
      .where(col("term") =!= "")
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))

  /** Top-k terms per document by smooth-idf TF-IDF (sklearn
    * `TfidfVectorizer(smooth_idf=True, norm=None)` weighting:
    * idf = ln((1+N)/(1+df)) + 1, score = tf·idf), ties broken by term.
    * No per-doc normalization → no double summation anywhere: every
    * score is a product of engine-identical inputs.
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    require(k >= 1, s"tfidfTopK needs k >= 1, got $k")
    val n = docs.count() // fit-boundary scalar
    val tf = termFreq(docs, idCol, textCol)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "term")
      .withColumn("tfidf",
        col("tf") * (log(lit(n + 1.0) / (col("df") + lit(1))) + lit(1.0)))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** BM25 (Lucene form: idf = ln(1 + (N − df + 0.5)/(df + 0.5)),
    * tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))) of every document
    * against a FIXED query term set. N and avgdl are computed over
    * non-empty documents. Per-term contributions quantize to micro
    * units before the per-doc exact integer sum, so the score is
    * independent of partial-aggregation order. Emits only matching
    * docs: (doc, n_matched, score).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           query: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25 needs at least one query term")
    val tf = termFreq(docs, idCol, textCol).localCheckpoint(eager = false)
    val dl = tf.groupBy(col(idCol)).agg(sum("tf").as("dl"))
    val stats = dl.agg(sum("dl"), count(lit(1))).head()
    val (sumDl, nDocs) = (stats.getLong(0), stats.getLong(1))
    val avgdl = sumDl.toDouble / nDocs
    val df = tf.where(col("term").isin(query: _*))
      .groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    tf.where(col("term").isin(query: _*))
      .join(broadcast(df.withColumn("idf", idf)), "term")
      .join(dl, idCol)
      .withColumn("term_score",
        col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))
      // micro-quantize BEFORE the sum: order-free exact integer add
      .withColumn("micro", round(col("term_score") * lit(1e6), 0).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matched"),
        (sum(col("micro")) / lit(1e6)).as("score"))
  }
}
