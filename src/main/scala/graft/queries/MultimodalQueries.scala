package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.operators.Multimodal

/** Multimodal plumbing coverage (SURVEY §2.3 row 41). The decode
  * kernel is a deterministic stub (no codecs in the container), so the
  * oracle covers the SQL-expressible part: byte length and metadata;
  * checksum/feature parity is asserted in MultimodalSpec.
  */
object MultimodalQueries {

  val multimodalMeta: Q = Q(
    "multimodal_meta",
    (s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, dir))
      val feats = Multimodal.decodeFeatures(media, batchSize = 64)
      feats.toDF().select(
        col("media_id"), col("kind"), col("n_bytes"),
        round(col("feat_mean"), 6).as("feat_mean"))
    },
    Some("""
      SELECT doc_id AS media_id,
             ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
             strlen(text) AS n_bytes,
             round(list_sum(list_transform(range(1, strlen(text) + 1),
                   i -> ord(text[i:i])))::DOUBLE / strlen(text), 6) AS feat_mean
      FROM documents
    """),
  )

  val all: Seq[Q] = Seq(multimodalMeta)
}
