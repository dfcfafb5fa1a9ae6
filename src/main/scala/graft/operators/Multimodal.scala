package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.3 row 41): media ride along
  * as opaque `binary` columns with typed metadata; decode /
  * feature-extract runs batched per partition.
  *
  * The decode kernel dispatches on content: blobs whose magic bytes
  * name a JDK-decodable image format (PNG/BMP/GIF/JPEG) decode FOR
  * REAL through `javax.imageio.ImageIO` (no extra dependency) into
  * true dims, mean luminance, and a 64-bit average-hash; opaque bytes
  * (video/audio/unknown codecs not in this container) fall back to
  * the deterministic stub so tests and oracles can assert the
  * plumbing end to end. Everything Spark-side is real either way:
  * schema, typed Dataset, partition-batched execution (the
  * `mapPartitions` shape a vectorized/Arrow UDF would use).
  */
object Multimodal {

  /** A media blob + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
  )

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,        // stands in for the decoded-content digest
      feat_mean: Double,     // stands in for a pooled feature vector
      batch_size: Int,       // size of the partition batch it rode in
  )

  /** Deterministic stand-in for a real decoder: in production this is
    * the codec call (e.g. JPEG decode -> HxWx3 tensor); here it digests
    * the bytes so results are stable and assertable.
    */
  def stubDecode(bytes: Array[Byte]): (Long, Double) = {
    var crc = 0L
    var i = 0
    while (i < bytes.length) { crc = crc * 31 + (bytes(i) & 0xff); i += 1 }
    val mean = if (bytes.isEmpty) 0.0
               else bytes.iterator.map(b => (b & 0xff).toDouble).sum / bytes.length
    (crc, mean)
  }

  // ------------------------------------------------------ real image codec

  /** Luminance plane of a really-decoded image (row-major ints 0-255). */
  final case class DecodedImage(width: Int, height: Int, gray: Array[Int])

  /** Magic-byte sniff: attempt the real decoder ONLY on blobs that
    * claim a JDK-supported image container, so opaque media never pay
    * an ImageIO reader scan on the hot path.
    */
  def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 8 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 'B' && b(1) == 'M') ||
      ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F'))

  /** REAL decode via the JDK's ImageIO (PNG/BMP/GIF/JPEG — public,
    * zero added dependency): bytes -> luminance plane (BT.601 integer
    * weights, deterministic across platforms). None when the bytes
    * don't decode — the caller falls back to the stub path.
    */
  def decodeImage(bytes: Array[Byte]): Option[DecodedImage] =
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        val gray = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            gray(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
            x += 1
          }
          y += 1
        }
        DecodedImage(w, h, gray)
      }
    } catch { case _: Exception => None }

  /** Box-average resize of a luminance plane (the real pixel kernel
    * behind [[resizeDims]]'s engine-side plan): output cell (i,j)
    * averages its exact source block [floor boundaries), pure integer
    * accumulation — deterministic, no floating intermediate.
    */
  def grayResize(img: DecodedImage, outW: Int, outH: Int): DecodedImage = {
    val out = new Array[Int](outW * outH)
    var j = 0
    while (j < outH) {
      val y0 = j * img.height / outH
      val y1 = math.max((j + 1) * img.height / outH, y0 + 1)
      var i = 0
      while (i < outW) {
        val x0 = i * img.width / outW
        val x1 = math.max((i + 1) * img.width / outW, x0 + 1)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += img.gray(y * img.width + x); x += 1 }
          y += 1
        }
        out(j * outW + i) = (sum / ((y1 - y0).toLong * (x1 - x0))).toInt
        i += 1
      }
      j += 1
    }
    DecodedImage(outW, outH, out)
  }

  /** 64-bit average-hash over the REAL pixels: box-resize to 8x8,
    * bit k = cell k brighter than the 64-cell mean (the same
    * bit = pixel*64 > total structure `multimodal_phash` replays on
    * synthetic pixels). Content-addressed: the same pixels encoded as
    * PNG vs BMP hash identically, which no byte-level fingerprint can
    * do — the property that makes cross-encode image dedup work.
    */
  def aHash64(img: DecodedImage): Long = {
    val g = grayResize(img, 8, 8).gray
    var total = 0L
    var k = 0
    while (k < 64) { total += g(k); k += 1 }
    var hash = 0L
    k = 0
    while (k < 64) {
      if (g(k) * 64L > total) hash |= (1L << (63 - k))
      k += 1
    }
    hash
  }

  /** Per-image features with REAL/STUB dispatch recorded. */
  final case class ImageFeatures(
      media_id: Long,
      decoded: Boolean,      // true = real ImageIO decode ran
      real_w: Int,           // decoded dims (metadata dims on stub path)
      real_h: Int,
      ahash: Long,           // real average-hash, or the stub checksum
      mean_lum: Double,      // real mean luminance, or the stub byte mean
      batch_size: Int,
  )

  /** Batched per-partition REAL image decode — the same mapPartitions
    * batch shape as [[decodeFeatures]], dispatching per record:
    * decodable bytes yield true dims + average-hash + mean luminance;
    * everything else takes the deterministic stub (metadata dims, byte
    * checksum/mean), so one pipeline serves mixed real/opaque corpora.
    */
  def imageFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val dec = if (looksLikeImage(r.bytes)) decodeImage(r.bytes) else None
          dec match {
            case Some(img) =>
              val meanLum = if (img.gray.isEmpty) 0.0
                else img.gray.foldLeft(0L)(_ + _).toDouble / img.gray.length
              ImageFeatures(r.media_id, decoded = true, img.width, img.height,
                aHash64(img), meanLum, batch.size)
            case None =>
              val (crc, mean) = stubDecode(r.bytes)
              ImageFeatures(r.media_id, decoded = false, r.width, r.height,
                crc, mean, batch.size)
          }
        }
      }
    }
  }

  // ------------------------------------------------------ real audio codec

  /** Really-decoded PCM audio: channel-0 samples as signed ints. */
  final case class DecodedAudio(sampleRate: Int, channels: Int, samples: Array[Int])

  /** Magic-byte sniff for RIFF/WAVE containers — same hot-path
    * discipline as [[looksLikeImage]]: only blobs that claim the
    * container pay a real codec attempt.
    */
  def looksLikeWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Canonical 44-byte-header RIFF/WAVE PCM16 mono encoder (the
    * public container layout, e.g. RFC 2361 / the original IBM-
    * Microsoft WAVE spec) — the fixture half of the codec: bytes it
    * emits are real WAV files any decoder reads, so the
    * encode→[[decodeWav]] round trip proves the DECODER against known
    * samples.
    */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** REAL decode via the JDK's `javax.sound.sampled` (public, zero
    * added dependency, headless-safe — the audio analog of
    * [[decodeImage]]'s ImageIO rung): WAV bytes -> true sample rate +
    * channel-0 PCM samples as signed ints. Accepts 16-bit signed PCM
    * (either endianness, any channel count); anything else — or bytes
    * that aren't a parseable WAV at all — returns None and the caller
    * falls back to the deterministic stub path.
    */
  def decodeWav(bytes: Array[Byte]): Option[DecodedAudio] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        val ok = f.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          f.getSampleSizeInBits == 16 && f.getChannels >= 1
        if (!ok) None
        else {
          val raw = ais.readAllBytes()
          val frame = f.getChannels * 2
          val n = raw.length / frame
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            val off = i * frame // channel 0 leads each frame
            out(i) =
              if (f.isBigEndian) (raw(off).toInt << 8) | (raw(off + 1) & 0xff)
              else (raw(off + 1).toInt << 8) | (raw(off) & 0xff)
            i += 1
          }
          Some(DecodedAudio(f.getSampleRate.toInt, f.getChannels, out))
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Per-window audio features with REAL/STUB dispatch recorded —
    * the audio twin of [[imageFeatures]]. */
  final case class AudioWindowFeatures(
      media_id: Long,
      decoded: Boolean,      // true = real javax.sound.sampled decode ran
      win_idx: Int,
      start_sample: Long,
      start_ms: Long,        // integer ms from the DECODED rate (metadata rate on stub)
      rms: Double,           // real: sqrt(mean(sample²)); stub: unsigned-byte mean of the slice
      zero_cross: Int,       // real: sign-change count; stub: −1 (no samples exist)
  )

  /** Batched per-partition windowed audio features — the same
    * mapPartitions batch shape as [[imageFeatures]], dispatching per
    * record: WAV bytes decode FOR REAL (sliding winSamples/hopSamples
    * windows over the true PCM — RMS energy on exact int64
    * sum-of-squares, zero-crossing count); everything else takes the
    * deterministic stub (the [[audioWindows]] byte-slice geometry at
    * 2 bytes/sample with the metadata rate), so one pipeline serves
    * mixed real/opaque corpora. Narrow — no shuffle. Only COMPLETE
    * windows emit; capped at maxWindows per record.
    */
  def audioFeatures(ds: Dataset[MediaRecord], winSamples: Int = 400,
                    hopSamples: Int = 160, maxWindows: Int = 20,
                    batchSize: Int = 64): Dataset[AudioWindowFeatures] = {
    import ds.sparkSession.implicits._
    def nWindows(nSamples: Long): Int =
      math.min(if (nSamples >= winSamples) (nSamples - winSamples) / hopSamples + 1
               else 0L, maxWindows.toLong).toInt
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          val dec = if (looksLikeWav(r.bytes)) decodeWav(r.bytes) else None
          dec match {
            case Some(a) =>
              (0 until nWindows(a.samples.length.toLong)).map { w =>
                val st = w * hopSamples
                var ss = 0L
                var zc = 0
                var i = 0
                while (i < winSamples) {
                  val s = a.samples(st + i)
                  ss += s.toLong * s
                  if (i > 0 && (s >= 0) != (a.samples(st + i - 1) >= 0)) zc += 1
                  i += 1
                }
                AudioWindowFeatures(r.media_id, decoded = true, w, st.toLong,
                  st.toLong * 1000 / a.sampleRate,
                  math.sqrt(ss.toDouble / winSamples), zc)
              }
            case None =>
              val sampleBytes = 2
              val rate = math.max(r.sample_rate, 1)
              (0 until nWindows(r.bytes.length.toLong / sampleBytes)).map { w =>
                val st = w * hopSamples
                val off = st * sampleBytes
                val len = winSamples * sampleBytes
                var sum = 0L
                var i = off
                while (i < off + len) { sum += (r.bytes(i) & 0xff); i += 1 }
                AudioWindowFeatures(r.media_id, decoded = false, w, st.toLong,
                  st.toLong * 1000 / rate, sum.toDouble / len, -1)
              }
          }
        }
      }
    }
  }

  /** Batched per-partition decode: drains the partition in
    * `batchSize`-record chunks (the batch shape an Arrow-based decode
    * UDF would see), runs the kernel per record, emits features.
    * Narrow — no shuffle; partition count = upstream file splits.
    */
  def decodeFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val (crc, mean) = stubDecode(r.bytes)
          MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, crc, mean, batch.size)
        }
      }
    }
  }

  /** Aspect-preserving resize planning for image records: the real
    * pixel work happens in the decode kernel; the PLAN (scale factor,
    * output dims) is pure column arithmetic — this is the half a
    * resize pipeline keeps in the engine, so partition pruning and
    * predicate pushdown still see plain columns. floor (not round)
    * keeps the arithmetic identical across engines.
    */
  def resizeDims(media: DataFrame, targetW: Int, targetH: Int): DataFrame =
    media.where(col("kind") === "image")
      .select(col("media_id"), col("width"), col("height"),
        least(lit(targetW.toDouble) / col("width"),
          lit(targetH.toDouble) / col("height")).as("scale"))
      .select(col("media_id"), col("width"), col("height"),
        greatest(floor(col("width") * col("scale")), lit(1)).cast("int").as("out_w"),
        greatest(floor(col("height") * col("scale")), lit(1)).cast("int").as("out_h"))

  /** SDXL-style ASPECT-RATIO buckets — diffusion-training batch
    * assembly groups images into fixed aspect buckets so batch crops
    * stay minimal. The ln(bucket) constants interpolate as Scala
    * double literals into BOTH engines' expression text (the Gumbel
    * convention) and the argmin unrolls to a fixed first-match CASE
    * (ties to the smaller bucket index) — pure column arithmetic,
    * shuffle-free until the bounded per-bucket rollup.
    */
  val AspectBuckets: Seq[Double] = Seq(0.5, 0.75, 1.0, 4.0 / 3.0, 2.0)

  /** |ln(w/h) − ln(bucket_k)| as engine-shared text. */
  def aspectScoreSql(k: Int, castD: String => String): String =
    s"abs(ln(${castD("width")} / ${castD("height")}) - " +
      s"(${math.log(AspectBuckets(k))}))"

  /** First-match argmin over the s0..s{n−1} score columns. */
  def aspectBucketSql: String = {
    val n = AspectBuckets.length
    val cases = (0 until n - 1).map { k =>
      val conds = ((k + 1) until n).map(j => s"s$k <= s$j").mkString(" AND ")
      s"WHEN $conds THEN $k"
    }.mkString(" ")
    s"CASE $cases ELSE ${n - 1} END"
  }

  /** Per-bucket occupancy report (bucket, n, min/max aspect ratio). */
  def aspectBucketReport(media: DataFrame): DataFrame = {
    val castD = (s: String) => s"cast($s as double)"
    var cur = media.where(col("kind") === "image")
      .select(col("media_id"), col("width"), col("height"))
    for (k <- AspectBuckets.indices)
      cur = cur.withColumn(s"s$k", expr(aspectScoreSql(k, castD)))
    cur
      .withColumn("bucket", expr(aspectBucketSql))
      .withColumn("ar", expr(s"${castD("width")} / ${castD("height")}"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("ar")), 6).as("min_ar"),
        round(max(col("ar")), 6).as("max_ar"))
  }

  /** ViT-style patch-grid planning on top of [[resizeDims]]: pad the
    * resized dims UP to the patch size multiple (ceil), emit the patch
    * grid and token count (+1 CLS token). Pure column arithmetic —
    * the planning stage a vision-tower ingest runs per image, with the
    * decode itself behind the honest stub.
    */
  def patchPlan(media: DataFrame, targetW: Int, targetH: Int,
                patch: Int = 16): DataFrame =
    resizeDims(media, targetW, targetH)
      .select(col("media_id"), col("out_w"), col("out_h"),
        ceil(col("out_w").cast("double") / patch).cast("int").as("px"),
        ceil(col("out_h").cast("double") / patch).cast("int").as("py"))
      .select(col("media_id"), col("out_w"), col("out_h"), col("px"), col("py"),
        (col("px") * col("py") + 1).as("vision_tokens"))

  /** Frame sampling for video records: one output row per sampled
    * frame — the row-expansion shape of a real frame extractor — with a
    * deterministic md5 frame fingerprint over (bytes, frame index) in
    * place of the decoded frame. Pure explode + column expressions: no
    * UDF, no shuffle, and an external engine can replay the
    * fingerprints exactly.
    */
  def frameSample(media: DataFrame, bytesPerFrame: Int = 100,
                  maxFrames: Int = 10): DataFrame =
    media.where(col("kind") === "video")
      .select(col("media_id"), col("bytes"),
        least(floor(length(col("bytes")) / bytesPerFrame), lit(maxFrames))
          .cast("int").as("n_frames"))
      .where(col("n_frames") > 0)
      .select(col("media_id"), col("bytes"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        md5(concat(col("bytes"),
          encode(concat(lit(":"), col("frame_idx").cast("string")), "UTF-8")))
          .as("frame_fp"))

  /** Audio window slicing for audio records: one output row per
    * analysis window (winSamples long, hopSamples apart — the
    * 25ms/10ms frame shape an ASR/feature front-end uses), with
    * sample-offset and millisecond arithmetic as pure columns and an
    * md5 fingerprint of the window's actual BYTE SLICE in place of
    * the decoded PCM (the honest-stub convention). Only COMPLETE
    * windows emit: n_win = (n_samples - winSamples) div hop + 1.
    * Explode + column expressions — no UDF, no shuffle; an external
    * engine replays the fingerprints from the same bytes.
    */
  def audioWindows(media: DataFrame, sampleBytes: Int = 2,
                   winSamples: Int = 400, hopSamples: Int = 160,
                   maxWindows: Int = 20): DataFrame =
    media.where(col("kind") === "audio" && col("sample_rate") > 0)
      .select(col("media_id"), col("bytes"), col("sample_rate"),
        expr(s"length(bytes) div $sampleBytes").as("n_samples"))
      .select(col("media_id"), col("bytes"), col("sample_rate"),
        least(
          when(col("n_samples") >= winSamples,
            expr(s"(n_samples - $winSamples) div $hopSamples") + 1)
            .otherwise(lit(0L)),
          lit(maxWindows.toLong)).cast("int").as("n_win"))
      .where(col("n_win") > 0)
      .select(col("media_id"), col("bytes"), col("sample_rate"),
        explode(sequence(lit(0), col("n_win") - 1)).as("win_idx"))
      .select(col("media_id"), col("win_idx"),
        (col("win_idx") * hopSamples).cast("long").as("start_sample"),
        expr(s"cast(win_idx as bigint) * $hopSamples * 1000 div sample_rate")
          .as("start_ms"),
        md5(expr(s"substring(bytes, win_idx * ${hopSamples * sampleBytes} + 1, " +
          s"${winSamples * sampleBytes})")).as("win_fp"))

  /** Synthesize a media table from documents: text bytes stand in for
    * the blob; metadata derived deterministically. Real pipelines read
    * (path, bytes) from `spark.read.format("binaryFile")` or parquet
    * with a binary column — the downstream plumbing is identical.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      (col("doc_id") % 640 + 1).cast("int").as("width"),
      (col("doc_id") % 480 + 1).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, 16000).otherwise(0).as("sample_rate"),
    ).as[MediaRecord]
  }
}
