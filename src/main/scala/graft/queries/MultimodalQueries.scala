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

  /** Resize planning for image records: aspect-preserving output dims
    * as pure column arithmetic (floor semantics — identical across
    * engines).
    */
  val multimodalResize: Q = Q(
    "multimodal_resize",
    (s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, dir))
      Multimodal.resizeDims(media.toDF(), targetW = 224, targetH = 224)
    },
    Some("""
      WITH media AS (
        SELECT doc_id AS media_id,
               (doc_id % 640 + 1)::INT AS width,
               (doc_id % 480 + 1)::INT AS height
        FROM documents WHERE doc_id % 3 = 0),
      sc AS (
        SELECT media_id, width, height,
               least(224.0 / width, 224.0 / height) AS scale
        FROM media)
      SELECT media_id, width, height,
             greatest(floor(width * scale), 1)::INT AS out_w,
             greatest(floor(height * scale), 1)::INT AS out_h
      FROM sc
    """),
  )

  /** Frame sampling for video records: row-per-frame explode with an
    * md5 fingerprint over (bytes, frame index) — the oracle replays it
    * because the media bytes are the UTF-8 document text.
    */
  val multimodalFrames: Q = Q(
    "multimodal_frames",
    (s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, dir))
      Multimodal.frameSample(media.toDF(), bytesPerFrame = 100, maxFrames = 10)
    },
    Some("""
      WITH media AS (
        SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 2),
      f AS (
        SELECT media_id, text,
               least(floor(strlen(text) / 100), 10)::INT AS nf
        FROM media),
      idx AS (
        SELECT media_id, text, unnest(range(nf)) AS frame_idx
        FROM f WHERE nf > 0)
      SELECT media_id, frame_idx,
             md5(text || ':' || frame_idx::VARCHAR) AS frame_fp
      FROM idx
    """),
  )

  /** ViT patch-grid planning: resize plan → ceil-padded patch grid →
    * vision token count (+1 CLS). Pure column arithmetic over the
    * image records.
    */
  val multimodalPatches: Q = Q(
    "multimodal_patches",
    (s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, dir))
      Multimodal.patchPlan(media.toDF(), targetW = 224, targetH = 224, patch = 16)
    },
    Some("""
      WITH media AS (
        SELECT doc_id AS media_id,
               (doc_id % 640 + 1)::INT AS width,
               (doc_id % 480 + 1)::INT AS height
        FROM documents WHERE doc_id % 3 = 0),
      sc AS (
        SELECT media_id, width, height,
               least(224.0 / width, 224.0 / height) AS scale
        FROM media),
      rd AS (
        SELECT media_id,
               greatest(floor(width * scale), 1)::INT AS out_w,
               greatest(floor(height * scale), 1)::INT AS out_h
        FROM sc),
      pg AS (
        SELECT media_id, out_w, out_h,
               ceil(out_w::DOUBLE / 16)::INT AS px,
               ceil(out_h::DOUBLE / 16)::INT AS py
        FROM rd)
      SELECT media_id, out_w, out_h, px, py, (px * py + 1)::INT AS vision_tokens
      FROM pg
    """),
  )

  /** Audio window slicing: row-per-window explode (25ms window / 10ms
    * hop at 16kHz, 2-byte samples — scaled to 100/40 samples here so
    * the synthetic short-text "audio" actually yields windows) with
    * sample-offset + millisecond
    * arithmetic and an md5 fingerprint of the window's byte slice —
    * replayable by the oracle because the media bytes are the ASCII
    * document text.
    */
  val multimodalAudio: Q = Q(
    "multimodal_audio",
    (s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, dir))
      Multimodal.audioWindows(media.toDF(), sampleBytes = 2,
        winSamples = 100, hopSamples = 40, maxWindows = 20)
    },
    Some("""
      WITH media AS (
        SELECT doc_id AS media_id, text, 16000 AS sample_rate
        FROM documents WHERE doc_id % 3 = 1),
      s AS (
        SELECT media_id, text, sample_rate,
               strlen(text) // 2 AS n_samples
        FROM media),
      w AS (
        SELECT media_id, text, sample_rate,
               least(CASE WHEN n_samples >= 100
                          THEN (n_samples - 100) // 40 + 1 ELSE 0 END,
                     20)::INT AS n_win
        FROM s),
      idx AS (
        SELECT media_id, text, sample_rate,
               unnest(range(n_win))::INT AS win_idx
        FROM w WHERE n_win > 0)
      SELECT media_id, win_idx,
             (win_idx * 40)::BIGINT AS start_sample,
             (win_idx::BIGINT * 40 * 1000 // sample_rate) AS start_ms,
             md5(substring(text, win_idx * 80 + 1, 200)) AS win_fp
      FROM idx
    """),
  )

  /** Content-checksum dedup over the media records — the baseline
    * image/audio dedup every multimodal corpus pipeline runs first
    * (LAION-style exact-bytes dedup, upstream of any perceptual
    * hash): md5 over the OPAQUE binary column, hash-groupBy with
    * map-side combine, keeper = lowest media id. The synthetic media
    * bytes are the document text encoded UTF-8, so DuckDB replays the
    * checksum with md5(text) — the plumbing (binary column in, hash
    * dedup out) is exactly the 100 TB shape.
    */
  val multimodalDedup: Q = Q(
    "multimodal_dedup",
    (s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, dir)).toDF()
      media.groupBy(md5(col("bytes")).as("content_hash"))
        .agg(count(lit(1)).as("n_copies"), min(col("media_id")).as("keeper"))
    },
    Some("""
      SELECT md5(text) AS content_hash, count(*) AS n_copies,
             min(doc_id) AS keeper
      FROM documents GROUP BY 1
    """),
  )

  val all: Seq[Q] = Seq(multimodalMeta, multimodalResize, multimodalFrames,
    multimodalPatches, multimodalAudio, multimodalDedup)
}
