package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.operators.Multimodal
import graft.operators.Multimodal.{DecodedImage, MediaRecord}

/** The REAL image decode kernel (JDK ImageIO behind the stub
  * interface): true dims over planted-wrong metadata, encode-invariant
  * average-hash, box-resize arithmetic, and the stub-vs-real dispatch
  * inside the batched mapPartitions plumbing.
  */
class MultimodalCodecSpec extends SparkSpec {

  /** Deterministic test image: gray(x, y) = (7x + 13y) mod 256. */
  private def makeImage(w: Int, h: Int, perturb: Option[(Int, Int)] = None): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v0 = (7 * x + 13 * y) % 256
      val v = perturb match {
        case Some((px, py)) if px == x && py == y => (v0 + 128) % 256
        case _ => v0
      }
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encode(img: BufferedImage, format: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, bos), s"JDK cannot write $format")
    bos.toByteArray
  }

  test("decodeImage reads real PNG and BMP bytes into true dims and luminance") {
    for (fmt <- Seq("png", "bmp")) {
      val bytes = encode(makeImage(40, 25), fmt)
      assert(Multimodal.looksLikeImage(bytes), fmt)
      val img = Multimodal.decodeImage(bytes).get
      assert(img.width == 40 && img.height == 25)
      // gray-on-gray pixels: luminance == the planted channel value
      assert(img.gray(0) == 0)
      assert(img.gray(25 * 40 - 1) == (7 * 39 + 13 * 24) % 256)
    }
  }

  test("opaque bytes never decode and never reach ImageIO") {
    val text = "just some document text, definitely not pixels".getBytes("UTF-8")
    assert(!Multimodal.looksLikeImage(text))
    assert(Multimodal.decodeImage(text).isEmpty)
    // a blob that fakes the PNG magic but is garbage inside: the
    // decoder returns None instead of throwing
    val fake = Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3, 4, 5, 6)
    assert(Multimodal.looksLikeImage(fake))
    assert(Multimodal.decodeImage(fake).isEmpty)
  }

  test("aHash is content-addressed: PNG and BMP encodes of the same pixels hash equal") {
    val img = makeImage(64, 64)
    val png = Multimodal.decodeImage(encode(img, "png")).get
    val bmp = Multimodal.decodeImage(encode(img, "bmp")).get
    assert(png.gray.toSeq == bmp.gray.toSeq) // lossless both ways
    assert(Multimodal.aHash64(png) == Multimodal.aHash64(bmp))
    // the byte streams themselves differ — no byte fingerprint finds this pair
    assert(!java.util.Arrays.equals(encode(img, "png"), encode(img, "bmp")))
  }

  test("aHash near-dup: one perturbed pixel stays within Hamming 10, different content is far") {
    val base = Multimodal.decodeImage(encode(makeImage(64, 64), "png")).get
    val nearDup = Multimodal.decodeImage(
      encode(makeImage(64, 64, perturb = Some((10, 10))), "png")).get
    val h1 = Multimodal.aHash64(base)
    val h2 = Multimodal.aHash64(nearDup)
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 10)
    // structurally different image (transposed gradient direction)
    val other = DecodedImage(64, 64,
      Array.tabulate(64 * 64)(k => (251 * (k % 64) * (k / 64) + 17) % 256))
    assert(java.lang.Long.bitCount(h1 ^ Multimodal.aHash64(other)) > 10)
  }

  test("grayResize box-averages exact source blocks") {
    // 4x2 -> 2x1: each output cell averages a 2x2 block
    val img = DecodedImage(4, 2, Array(10, 20, 30, 40, 50, 60, 70, 80))
    val out = Multimodal.grayResize(img, 2, 1)
    assert(out.gray.toSeq == Seq((10 + 20 + 50 + 60) / 4, (30 + 40 + 70 + 80) / 4))
    // identity resize is a no-op
    assert(Multimodal.grayResize(img, 4, 2).gray.toSeq == img.gray.toSeq)
    // upscale (1x1 blocks with floor boundaries) stays in range
    val up = Multimodal.grayResize(img, 8, 4)
    assert(up.gray.forall(v => v >= 10 && v <= 80))
  }

  test("imageFeatures dispatches real vs stub per record inside one batched pass") {
    import spark.implicits._
    val pngBytes = encode(makeImage(33, 17), "png")
    val textBytes = "opaque stand-in bytes".getBytes("UTF-8")
    // planted metadata dims are WRONG for the real image (640x480):
    // only a true decode can produce 33x17
    val ds = Seq(
      MediaRecord(1L, "image", pngBytes, 640, 480, 0),
      MediaRecord(2L, "image", textBytes, 640, 480, 0),
      MediaRecord(3L, "video", textBytes, 0, 0, 0),
    ).toDS()
    val out = Multimodal.imageFeatures(ds, batchSize = 2).collect()
      .map(f => f.media_id -> f).toMap
    assert(out(1L).decoded && out(1L).real_w == 33 && out(1L).real_h == 17)
    assert(out(1L).ahash == Multimodal.aHash64(Multimodal.decodeImage(pngBytes).get))
    // stub path: metadata dims pass through, checksum/mean match stubDecode
    for (id <- Seq(2L, 3L)) {
      val f = out(id)
      val (crc, mean) = Multimodal.stubDecode(textBytes)
      assert(!f.decoded && f.ahash == crc && math.abs(f.mean_lum - mean) < 1e-12)
    }
    assert(out(2L).real_w == 640 && out(3L).real_w == 0)
    assert(out.values.forall(f => f.batch_size >= 1 && f.batch_size <= 2))
  }

  test("existing oracled multimodal rows stay on the stub path (text-byte corpus)") {
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sf))
    val feats = Multimodal.imageFeatures(media, batchSize = 32).collect()
    assert(feats.nonEmpty && feats.forall(!_.decoded))
  }
}
