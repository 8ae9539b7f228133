package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{DecodedImage, JdkImageCodec, StubImageCodec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real-image-codec coverage (SURVEY §multimodal; reference downloads and
  * dedups real images — EntityImporterBase.cs:301-432): the JDK codec
  * must round-trip losslessly over PNG, reject garbage without killing
  * the partition, and the nearest-neighbor resize must be the exact
  * integer sampling the q239 oracle restates. */
class ImageCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def gradient(w: Int, h: Int): DecodedImage = {
    val px = Array.tabulate(w * h) { k =>
      val x = k % w; val y = k / w
      ((x * 17 % 256) << 16) | ((y * 29 % 256) << 8) | ((x + y) % 256)
    }
    DecodedImage(w, h, px)
  }

  test("PNG encode→decode round-trips pixels bit-exactly (lossless)") {
    val img = gradient(23, 11) // non-square, non-power-of-two
    val back = JdkImageCodec.decode(JdkImageCodec.encode(img)).get
    assert(back.width == 23 && back.height == 11)
    assert(back.rgb.toSeq == img.rgb.toSeq)
  }

  test("JDK codec reads formats beyond its own writer (BMP)") {
    val img = gradient(8, 8)
    val bi = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    bi.setRGB(0, 0, 8, 8, img.rgb, 0, 8)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "bmp", bos))
    val back = JdkImageCodec.decode(bos.toByteArray).get
    assert(back.rgb.toSeq == img.rgb.toSeq)
  }

  test("undecodable payloads skip, never throw: garbage, empty, null, truncated PNG") {
    assert(JdkImageCodec.decode("not an image".getBytes).isEmpty)
    assert(JdkImageCodec.decode(Array.emptyByteArray).isEmpty)
    assert(JdkImageCodec.decode(null).isEmpty)
    val png = JdkImageCodec.encode(gradient(16, 16))
    assert(JdkImageCodec.decode(png.take(20)).isEmpty,
      "truncated PNG (valid magic, corrupt body) must decode to None")
  }

  test("resizeNearest: exact integer sampling — target (x,y) copies source " +
      "(x*w/w2, y*h/h2)") {
    val img = gradient(16, 16)
    val half = Multimodal.resizeNearest(img, 8, 8)
    for (y <- 0 until 8; x <- 0 until 8)
      assert(half.rgb(y * 8 + x) == img.rgb(2 * y * 16 + 2 * x))
    // non-integral ratio: 16 -> 5 samples x*16/5 = {0,3,6,9,12}
    val five = Multimodal.resizeNearest(img, 5, 5)
    for (y <- 0 until 5; x <- 0 until 5)
      assert(five.rgb(y * 5 + x) == img.rgb((y * 16 / 5) * 16 + x * 16 / 5))
  }

  test("stub codec keeps the pipeline alive without an image library") {
    val d = StubImageCodec.decode(Array[Byte](0, 127, -1)).get
    assert(d.width == 3 && d.height == 1)
    assert(d.rgb.toSeq == Seq(0x000000, 0x7F7F7F, 0xFFFFFF))
    assert(StubImageCodec.decode(Array.emptyByteArray).isEmpty)
  }

  test("renderPng pixels match the q238 oracle formula after a real decode") {
    import spark.implicits._
    val media = Multimodal.renderPng(Seq(42L, 250L).toDF("doc_id"), "doc_id")
    val rows = media.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    for ((id, bytes) <- rows) {
      val img = JdkImageCodec.decode(bytes).get
      assert(img.width == 16 && img.height == 16)
      for (y <- 0 until 16; x <- 0 until 16) {
        val p = img.rgb(y * 16 + x)
        assert(((p >> 16) & 0xFF) == (id + 7 * x + 13 * y) % 256)
        assert(((p >> 8) & 0xFF) == (2 * id + 5 * x + 3 * y) % 256)
        assert((p & 0xFF) == (3 * id + 11 * x + y) % 256)
      }
    }
  }

  test("imageAHash: mean-threshold bit pack matches a direct computation; " +
      "constant image hashes to zero") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val grad = JdkImageCodec.encode(gradient(16, 16))
    val flat = JdkImageCodec.encode(DecodedImage(16, 16, Array.fill(256)(0x808080)))
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("payload", BinaryType)))
    val media = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, grad), org.apache.spark.sql.Row(2L, flat)),
      schema)
    val out = Multimodal.imageAHash(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // constant image: every gray == mean, strict threshold sets no bit
    assert(out(2L) == (0L, 0L))
    // gradient: recompute the reference hash by hand
    val img = gradient(16, 16)
    val gray = (0 until 64).map { k =>
      val x = k % 8; val y = k / 8
      val p = img.rgb(2 * y * 16 + 2 * x)
      (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3
    }
    val mean = gray.map(_.toLong).sum / 64
    var h0 = 0L; var h1 = 0L
    for (k <- 0 until 64 if gray(k) > mean)
      if (k < 32) h0 |= 1L << k else h1 |= 1L << (k - 32)
    assert(out(1L) == (h0, h1))
  }

  test("imagePixelStats skips null ids, null payloads and corrupt images") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = true),
      StructField("payload", BinaryType, nullable = true)))
    val good = JdkImageCodec.encode(gradient(4, 4))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, good),
      org.apache.spark.sql.Row(2L, "garbage".getBytes),
      org.apache.spark.sql.Row(3L, null),
      org.apache.spark.sql.Row(null, good))
    val media = spark.createDataFrame(rows, schema)
    val out = Multimodal.imagePixelStats(media).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    assert(out.head.getInt(1) == 4 && out.head.getInt(2) == 4)
  }
}
