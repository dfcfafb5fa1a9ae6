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
}
