package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media records carry binary + typed metadata") {
    val media = Multimodal.mediaFromDocuments(spark,
      Tables.documents(spark, sf)).collect()
    assert(media.nonEmpty)
    media.foreach { m =>
      assert(Seq("image", "audio", "video").contains(m.kind))
      assert(m.bytes.nonEmpty)
      assert(m.width >= 1 && m.height >= 1)
      if (m.kind == "audio") assert(m.sample_rate == 16000)
    }
  }

  test("decodeFeatures is deterministic, batched, and matches the stub kernel") {
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sf))
    val feats = Multimodal.decodeFeatures(media, batchSize = 16).collect()
    assert(feats.length == media.count())
    feats.foreach(f => assert(f.batch_size >= 1 && f.batch_size <= 16))
    val byId = media.collect().map(m => m.media_id -> m).toMap
    feats.take(5).foreach { f =>
      val (crc, mean) = Multimodal.stubDecode(byId(f.media_id).bytes)
      assert(f.checksum == crc && math.abs(f.feat_mean - mean) < 1e-12)
      assert(f.n_bytes == byId(f.media_id).bytes.length)
    }
  }
  test("resize plan and frame sampling are deterministic and bounded") {
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sf)).toDF()
    val rs = Multimodal.resizeDims(media, 224, 224).collect()
    assert(rs.nonEmpty)
    assert(rs.forall(r => r.getInt(3) <= 224 && r.getInt(4) <= 224 &&
      r.getInt(3) >= 1 && r.getInt(4) >= 1))
    val fr = Multimodal.frameSample(media, 100, 10)
    val counts = fr.groupBy("media_id").count().collect()
    assert(counts.nonEmpty && counts.forall(_.getLong(1) <= 10))
    // identical input -> identical fingerprints (pure expressions)
    val a = fr.collect().map(_.toSeq).toSet
    val b = Multimodal.frameSample(media, 100, 10).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("audio windows: complete windows only, correct offsets, sliced fingerprints") {
    import org.apache.spark.sql.functions._
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sf)).toDF()
    val win = Multimodal.audioWindows(media, sampleBytes = 2,
      winSamples = 100, hopSamples = 40, maxWindows = 20)
    val rows = win.collect()
    assert(rows.nonEmpty)
    // offsets follow the hop grid; ms arithmetic is integer (40/16000 s = 2.5ms)
    rows.foreach { r =>
      val idx = r.getInt(1)
      assert(r.getLong(2) == idx * 40L)
      assert(r.getLong(3) == idx * 40L * 1000 / 16000)
    }
    // every window's fingerprint equals md5 of the exact byte slice
    val byId = media.where(col("kind") === "audio").collect()
      .map(m => m.getAs[Long]("media_id") -> m.getAs[Array[Byte]]("bytes")).toMap
    rows.take(10).foreach { r =>
      val bytes = byId(r.getLong(0))
      val off = r.getInt(1) * 80
      assert(off + 200 <= bytes.length) // complete windows only
      val slice = bytes.slice(off, off + 200)
      val md = java.security.MessageDigest.getInstance("MD5").digest(slice)
        .map("%02x".format(_)).mkString
      assert(r.getString(4) == md)
    }
  }
}
