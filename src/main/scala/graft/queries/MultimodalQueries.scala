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

  /** Windowed features over TRULY-DECODED audio — the real-codec rung
    * above [[multimodalAudio]]'s byte-slice stub (the audio analog of
    * r13's image-decode rung): each "audio" doc synthesizes a REAL
    * RIFF/WAVE PCM16 file whose samples are a closed-form function of
    * (media_id, k) — s_k = ((media_id·131 + k·7919) mod 65536) − 32768
    * — the engine decodes it through `javax.sound.sampled` (the
    * actual JDK codec, not a byte parser), then computes sliding-
    * window RMS (exact int64 sum-of-squares) and zero-crossing counts
    * over the DECODED samples. The oracle replays the features from
    * the closed form directly, so any decoder deviation (wrong
    * endianness, off-by-one frame, header misparse) breaks the hash —
    * the decode itself is what the row verifies. `where(decoded)`
    * makes a silent stub fallback a row-count mismatch, not a pass.
    * Scale: encode+decode+window is one narrow mapPartitions batch —
    * no shuffle; the 100 TB path is identical with bytes read from
    * binaryFile/parquet instead of synthesized.
    */
  val multimodalAudioDecode: Q = Q(
    "multimodal_audio_decode",
    (s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal.MediaRecord
      val media = Tables.documents(s, dir)
        .where(col("doc_id") % 3 === 1).select(col("doc_id")).as[Long]
        .map { id =>
          val n = (160 + id % 256).toInt
          val samples = Array.tabulate(n)(k =>
            (((id * 131 + k.toLong * 7919) % 65536) - 32768).toShort)
          MediaRecord(id, "audio",
            Multimodal.encodeWavPcm16(16000, samples), 0, 0, 16000)
        }
      Multimodal.audioFeatures(media, winSamples = 100, hopSamples = 40,
        maxWindows = 20)
        .toDF().where(col("decoded"))
        .select(col("media_id"), col("win_idx"), col("start_sample"),
          col("start_ms"), round(col("rms"), 6).as("rms"), col("zero_cross"))
    },
    Some("""
      WITH media AS (
        SELECT doc_id AS media_id, (160 + doc_id % 256)::BIGINT AS n_samples
        FROM documents WHERE doc_id % 3 = 1),
      w AS (
        SELECT media_id, n_samples,
               least(CASE WHEN n_samples >= 100
                          THEN (n_samples - 100) // 40 + 1 ELSE 0 END,
                     20)::INT AS n_win
        FROM media),
      idx AS (
        SELECT media_id, unnest(range(n_win))::INT AS win_idx
        FROM w WHERE n_win > 0),
      samp AS (
        SELECT media_id, win_idx, unnest(range(100))::BIGINT AS i
        FROM idx),
      sv AS (
        SELECT media_id, win_idx, i,
               ((media_id * 131 + (win_idx * 40 + i) * 7919) % 65536) - 32768 AS s,
               ((media_id * 131 + (win_idx * 40 + i - 1) * 7919) % 65536) - 32768 AS sp
        FROM samp)
      SELECT media_id, win_idx,
             (win_idx * 40)::BIGINT AS start_sample,
             (win_idx::BIGINT * 40 * 1000 // 16000) AS start_ms,
             round(sqrt(sum(s * s)::DOUBLE / 100), 6) AS rms,
             sum(CASE WHEN i > 0 AND ((s >= 0) != (sp >= 0))
                      THEN 1 ELSE 0 END)::INT AS zero_cross
      FROM sv GROUP BY 1, 2
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

  /** Perceptual-hash (aHash) near-duplicate detection over media
    * records — the PERCEPTUAL tier above [[multimodalDedup]]'s exact
    * checksum (a re-encoded/resized image keeps its aHash; its md5
    * changes). The decode step is the repo's deterministic stub (no
    * codecs in the container): the 8×8 grayscale grid is derived
    * per-pixel from the content checksum (`h16(md5(checksum:i)) %
    * 256`), so the Spark-side plumbing — per-pixel explode, one
    * partition-key window for the luminance total, bit-pack into two
    * 32-bit halves, banded candidate join — is real and replayable
    * while the kernel stays swappable for a real decoder. A fixture
    * twin (every 17th record, pixel 63 shifted by 128 — a pixel whose
    * bit lies OUTSIDE the 16 banding bits, so the band join can find
    * it) plants true near-dups; identical-byte corpus duplicates surface at Hamming 0.
    * Scale: candidates come ONLY from the 16-bit band equi-join (the
    * SimHash/LSH discipline — never n² pairs); the 64-row explode is
    * bounded; window + groupBy share one hash(media_id) Exchange.
    */
  val multimodalPhash: Q = Q(
    "multimodal_phash",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, dir)).toDF()
      val px = media
        .select(col("media_id"), md5(col("bytes")).as("ch"))
        .select(col("media_id"),
          explode(sequence(lit(0), lit(63))).as("i"), col("ch"))
        .select(col("media_id"), col("i"),
          (conv(substring(md5(concat(col("ch"), lit(":"), col("i").cast("string"))), 1, 4),
            16, 10).cast("long") % 256).as("p"))
      val twins = px.where(col("media_id") % 17 === 0)
        .select((col("media_id") + 1000000).as("media_id"), col("i"),
          when(col("i") === 63, (col("p") + 128) % 256).otherwise(col("p")).as("p"))
      val w = Window.partitionBy(col("media_id"))
      val hashes = px.unionByName(twins)
        .withColumn("tot", sum(col("p")).over(w))
        .select(col("media_id"), col("i"),
          (col("p") * 64 > col("tot")).cast("long").as("b"))
        .groupBy(col("media_id"))
        .agg(
          sum(expr("CASE WHEN i < 32 THEN b * shiftleft(cast(1 as bigint), 31 - i) ELSE 0 END"))
            .as("h_hi"),
          sum(expr("CASE WHEN i >= 32 THEN b * shiftleft(cast(1 as bigint), 63 - i) ELSE 0 END"))
            .as("h_lo"))
      hashes.as("x").join(hashes.as("y"),
          expr("x.h_hi div 65536") === expr("y.h_hi div 65536") &&
            col("x.media_id") < col("y.media_id"))
        .select(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"),
          (expr("bit_count(x.h_hi ^ y.h_hi)") + expr("bit_count(x.h_lo ^ y.h_lo)"))
            .cast("long").as("hamming"))
        .where(col("hamming") <= 10)
    },
    Some(s"""
      WITH px0 AS (
        SELECT doc_id AS media_id, i.i AS i,
               ${OracleExact.h16Sql("md5(md5(text) || ':' || i.i::VARCHAR)")} % 256 AS p
        FROM documents, range(64) i(i)),
      pall AS (
        SELECT media_id, i, p FROM px0
        UNION ALL
        SELECT media_id + 1000000, i,
               CASE WHEN i = 63 THEN (p + 128) % 256 ELSE p END
        FROM px0 WHERE media_id % 17 = 0),
      bits AS (
        SELECT media_id, i,
               (p * 64 > sum(p) OVER (PARTITION BY media_id))::BIGINT AS b
        FROM pall),
      hashes AS (
        SELECT media_id,
               sum(CASE WHEN i < 32 THEN b * (1::BIGINT << (31 - i)) ELSE 0 END)::BIGINT AS h_hi,
               sum(CASE WHEN i >= 32 THEN b * (1::BIGINT << (63 - i)) ELSE 0 END)::BIGINT AS h_lo
        FROM bits GROUP BY 1)
      SELECT x.media_id AS id_a, y.media_id AS id_b,
             (bit_count(xor(x.h_hi, y.h_hi)) + bit_count(xor(x.h_lo, y.h_lo)))::BIGINT AS hamming
      FROM hashes x JOIN hashes y
        ON x.h_hi // 65536 = y.h_hi // 65536 AND x.media_id < y.media_id
      WHERE (bit_count(xor(x.h_hi, y.h_hi)) + bit_count(xor(x.h_lo, y.h_lo))) <= 10
    """),
  )

  /** Inference batch planning — the shape-bucketing pass a multimodal
    * serving/captioning pipeline runs before `mapInPandas` model
    * calls: batches of 32 images grouped by SORTED resize dims (like
    * with like), per-batch pad-to-max waste in exact pixels — the
    * number that decides whether shape-bucketing pays (random batching
    * wastes the max-dims rectangle on every small image). The total
    * order is built TWO-LEVEL (a single global row_number window is a
    * one-partition bottleneck at scale): global rank = per-out_h rank
    * (a window PARTITIONED by out_h — parallel; out_h is bounded by
    * the resize target) + the out_h group's start offset (a
    * dims-bounded prefix table joined back broadcast — the skyline
    * prefix pattern). The text twin is `text_pack`/`text_pack_ffd`;
    * same economics, 2-D.
    */
  val multimodalBatchPlan: Q = Q(
    "multimodal_batch_plan",
    (s, dir) => {
      val rd = Multimodal.resizeDims(
        Multimodal.mediaFromDocuments(s, Tables.documents(s, dir)).toDF(),
        targetW = 224, targetH = 224)
        .select(col("media_id"), col("out_w"), col("out_h"))
      // dims-bounded group offsets (out_h <= target): prefix counts
      // from the tiny rollup, joined back broadcast
      val counts = rd.groupBy(col("out_h")).agg(count(lit(1)).as("c"))
        .orderBy(col("out_h")).collect().map(r => (r.getInt(0), r.getLong(1)))
      var acc = 0L
      val offsets = counts.map { case (h, c) => val o = acc; acc += c; (h, o) }.toSeq
      import s.implicits._
      val off = broadcast(offsets.toDF("o_h", "offset"))
      rd.join(off, col("out_h") === col("o_h"))
        .withColumn("batch_id",
          expr("(offset + row_number() over (partition by out_h order by out_w, media_id) - 1) div 32"))
        .groupBy(col("batch_id"))
        .agg(count(lit(1)).as("n"),
          max(col("out_w")).as("max_w"), max(col("out_h")).as("max_h"),
          sum(col("out_w").cast("long") * col("out_h")).as("px"))
        .select(col("batch_id"), col("n"), col("max_w"), col("max_h"),
          (col("n") * col("max_w").cast("long") * col("max_h") - col("px"))
            .as("waste_px"))
    },
    Some("""
      WITH media AS (
        SELECT doc_id AS media_id,
               (doc_id % 640 + 1)::INT AS width,
               (doc_id % 480 + 1)::INT AS height
        FROM documents WHERE doc_id % 3 = 0),
      sc AS (SELECT media_id, width, height,
               least(224.0 / width, 224.0 / height) AS scale FROM media),
      rd AS (SELECT media_id,
               greatest(floor(width * scale), 1)::INT AS out_w,
               greatest(floor(height * scale), 1)::INT AS out_h
             FROM sc),
      bt AS (SELECT media_id, out_w, out_h,
               ((row_number() OVER (ORDER BY out_h, out_w, media_id)) - 1) // 32 AS batch_id
             FROM rd)
      SELECT batch_id, count(*)::BIGINT AS n,
             max(out_w)::INT AS max_w, max(out_h)::INT AS max_h,
             (count(*) * max(out_w)::BIGINT * max(out_h) - sum(out_w::BIGINT * out_h))::BIGINT AS waste_px
      FROM bt GROUP BY 1
    """),
  )

  /** CLIP-style contrastive pair construction: each media record
    * pairs with its own caption (label 1) plus three hash-drawn
    * negative captions (label 0, md5(media:j) mod corpus — no RNG,
    * replayable; self-collisions filtered). The inner join back to
    * documents keeps only real caption ids and attaches the caption
    * length the batch packer needs. One narrow build + one key join —
    * the image-text training-pair assembly step for a contrastive
    * pretraining corpus.
    */
  val multimodalClipPairs: Q = Q(
    "multimodal_clip_pairs",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val nDocs = docs.count()
      val media = Multimodal.mediaFromDocuments(s, docs).toDF()
        .select(col("media_id"))
      val pos = media.select(col("media_id"), col("media_id").as("doc_id"),
        lit(1L).as("label"))
      val neg = media
        .select(col("media_id"), explode(sequence(lit(1), lit(3))).as("j"))
        .select(col("media_id"),
          (conv(substring(md5(concat(col("media_id").cast("string"), lit(":"),
            col("j").cast("string"))), 1, 4), 16, 10).cast("long") % nDocs)
            .as("doc_id"),
          lit(0L).as("label"))
        .where(col("doc_id") =!= col("media_id"))
      pos.unionAll(neg)
        .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
        .select(col("media_id"), col("doc_id"), col("label"), col("n_chars"))
    },
    Some(s"""
      WITH m AS (SELECT doc_id AS media_id FROM documents),
      nd AS (SELECT count(*)::BIGINT AS n FROM documents),
      pos AS (SELECT media_id, media_id AS doc_id, 1::BIGINT AS label FROM m),
      neg AS (SELECT media_id,
                ${OracleExact.h16Sql("md5(media_id::VARCHAR || ':' || j::VARCHAR)")} % (SELECT n FROM nd) AS doc_id,
                0::BIGINT AS label
              FROM m, generate_series(1, 3) t(j)),
      pairs AS (SELECT * FROM pos
                UNION ALL
                SELECT * FROM neg WHERE doc_id <> media_id)
      SELECT p.media_id, p.doc_id, p.label, d.n_chars
      FROM pairs p JOIN documents d ON p.doc_id = d.doc_id
    """),
  )

  /** Aspect-ratio bucketing ([[Multimodal.aspectBucketReport]]) — the
    * SDXL/diffusion batch-assembly stage: each image lands in the
    * fixed aspect bucket minimizing |ln(ar) − ln(bucket)| (ties to the
    * smaller bucket), reported as bounded per-bucket occupancy. The
    * ln constants and the unrolled argmin CASE are the SAME text in
    * both engines.
    */
  val multimodalAspectBucket: Q = Q(
    "multimodal_aspect_bucket",
    (s, dir) => graft.operators.Multimodal.aspectBucketReport(
      graft.operators.Multimodal.mediaFromDocuments(
        s, Tables.documents(s, dir)).toDF()),
    Some {
      val M = graft.operators.Multimodal
      val castD = (x: String) => s"$x::DOUBLE"
      val scores = M.AspectBuckets.indices
        .map(k => s"${M.aspectScoreSql(k, castD)} AS s$k").mkString(", ")
      s"""
      WITH media AS (
        SELECT doc_id AS media_id,
               (doc_id % 640 + 1)::INT AS width,
               (doc_id % 480 + 1)::INT AS height
        FROM documents WHERE doc_id % 3 = 0),
      s AS (SELECT media_id, width, height, $scores FROM media),
      b AS (SELECT *, ${M.aspectBucketSql} AS bucket,
              width::DOUBLE / height::DOUBLE AS ar
            FROM s)
      SELECT bucket, count(*) AS n,
             round(min(ar), 6) AS min_ar, round(max(ar), 6) AS max_ar
      FROM b GROUP BY 1
    """
    },
  )

  val all: Seq[Q] = Seq(multimodalMeta, multimodalResize, multimodalFrames,
    multimodalPatches, multimodalAudio, multimodalAudioDecode,
    multimodalDedup, multimodalPhash,
    multimodalBatchPlan, multimodalClipPairs, multimodalAspectBucket)
}
