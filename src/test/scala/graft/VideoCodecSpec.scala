package graft

import graft.multimodal.Multimodal
import graft.multimodal.GraftGifCodec
import graft.multimodal.Multimodal.{DecodedVideo, GifVideoCodec}
import org.scalatest.funsuite.AnyFunSuite

/** Real-video-codec coverage (the q264–q266 seam; reference media
  * pipeline — EntityImporterBase.cs:301-432): the JDK animated-GIF codec
  * must round-trip grayscale frames bit-exactly (gray ramp palette),
  * carry the per-frame delay metadata through the container, reject
  * garbage without killing the partition, and the keyframe sampling must
  * be the exact integer selection the q266 oracle restates. */
class VideoCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def clip(id: Long, nf: Int, w: Int = 16, h: Int = 16,
      delayCs: Int = 10): DecodedVideo =
    DecodedVideo(w, h, delayCs, Array.tabulate(nf) { t =>
      Array.tabulate(w * h) { k =>
        val x = k % w; val y = k / w
        java.lang.Math.floorMod(
          id + 7L * x + 13L * y + 29L * t + 97L * (t / 3), 256L).toInt
      }
    })

  test("GIF encode→decode round-trips every frame bit-exactly and " +
      "preserves order, dimensions and the delay metadata") {
    for (id <- Seq(0L, 7L, 123L); nf <- Seq(1, 3, 6)) {
      val v = clip(id, nf)
      val back = GifVideoCodec.decode(GifVideoCodec.encode(v)).get
      assert(back.width == 16 && back.height == 16)
      assert(back.delayCs == 10, "GraphicControlExtension delay lost")
      assert(back.frames.length == nf)
      for (t <- 0 until nf)
        assert(back.frames(t).toSeq == v.frames(t).toSeq,
          s"frame $t of id=$id not bit-exact")
    }
  }

  test("GraftGifCodec cross-validates against the JDK codec: decode " +
      "frame-for-frame both directions, including the delay metadata") {
    // the hand-rolled codec carries the pipeline's throughput; the JDK
    // implementation anchors format correctness — each must decode the
    // other's output bit-exactly (the RiffWavCodec discipline)
    for (id <- Seq(0L, 7L, 123L); nf <- Seq(1, 4, 6)) {
      val v = clip(id, nf, delayCs = 7)
      val viaJdk = GifVideoCodec.decode(GraftGifCodec.encode(v)).get
      assert(viaJdk.frames.map(_.toSeq).toSeq == v.frames.map(_.toSeq).toSeq)
      assert(viaJdk.width == 16 && viaJdk.height == 16 && viaJdk.delayCs == 7)
      val viaGraft = GraftGifCodec.decode(GifVideoCodec.encode(v)).get
      assert(viaGraft.frames.map(_.toSeq).toSeq == v.frames.map(_.toSeq).toSeq)
      assert(viaGraft.width == 16 && viaGraft.height == 16
        && viaGraft.delayCs == 7)
    }
  }

  test("LZW survives code-width growth and a dictionary reset: a " +
      "128x128 high-entropy frame round-trips through both codecs") {
    // ~16k pseudorandom pixels force >4096 string-table entries, so the
    // encoder emits a mid-stream CLEAR and rebuilds — the decoder (and
    // the JDK's) must follow through every 9→12-bit width bump
    val noisy = DecodedVideo(128, 128, 10, Array(Array.tabulate(128 * 128)(
      k => ((k * 2654435761L >>> 13) & 0xFF).toInt)))
    val own = GraftGifCodec.decode(GraftGifCodec.encode(noisy)).get
    assert(own.frames.head.toSeq == noisy.frames.head.toSeq)
    val jdk = GifVideoCodec.decode(GraftGifCodec.encode(noisy)).get
    assert(jdk.frames.head.toSeq == noisy.frames.head.toSeq,
      "JDK reader disagreed with the hand-rolled LZW stream")
    val back = GraftGifCodec.decode(GifVideoCodec.encode(noisy)).get
    assert(back.frames.head.toSeq == noisy.frames.head.toSeq,
      "hand-rolled reader disagreed with the JDK LZW stream")
  }

  test("GraftGifCodec rejects undecodable payloads: garbage, empty, " +
      "null, truncated, frameless") {
    assert(GraftGifCodec.decode("not a gif".getBytes).isEmpty)
    assert(GraftGifCodec.decode(Array.emptyByteArray).isEmpty)
    assert(GraftGifCodec.decode(null).isEmpty)
    val gif = GraftGifCodec.encode(clip(1L, 4))
    for (cut <- Seq(10, 40, gif.length / 2, gif.length - 1))
      assert(GraftGifCodec.decode(gif.take(cut)).isEmpty,
        s"GIF truncated at $cut must decode to None")
    assert(GraftGifCodec.decode(
      GraftGifCodec.encode(DecodedVideo(4, 4, 10, Array.empty))).isEmpty)
  }

  test("non-square and ragged frame counts survive the round trip") {
    val v = clip(42L, 5, w = 9, h = 4, delayCs = 25)
    val back = GifVideoCodec.decode(GifVideoCodec.encode(v)).get
    assert(back.width == 9 && back.height == 4 && back.delayCs == 25)
    assert(back.frames.map(_.toSeq).toSeq == v.frames.map(_.toSeq).toSeq)
  }

  test("undecodable payloads skip: garbage, empty, null, truncated") {
    assert(GifVideoCodec.decode("not a gif".getBytes).isEmpty)
    assert(GifVideoCodec.decode(Array.emptyByteArray).isEmpty)
    assert(GifVideoCodec.decode(null).isEmpty)
    val gif = GifVideoCodec.encode(clip(1L, 4))
    assert(GifVideoCodec.decode(gif.take(40)).isEmpty,
      "truncated GIF must decode to None")
    // a frameless container (header only, no image descriptors) decodes
    // to nothing — skipped like the zero-sample WAV clip
    assert(GifVideoCodec.decode(
      GifVideoCodec.encode(DecodedVideo(4, 4, 10, Array.empty))).isEmpty)
  }

  test("sampleVideoFrames keeps exactly every n-th frame and multiplies " +
      "the delay (the effective frame rate survives in metadata)") {
    import spark.implicits._
    val media = Multimodal.renderGif(Seq(5L).toDF("doc_id"), "doc_id")
    val sampled = Multimodal.sampleVideoFrames(media, 2).collect().head
    val v = GifVideoCodec.decode(sampled.getAs[Array[Byte]](1)).get
    val orig = clip(5L, 3 + (5 % 4)) // renderGif's frame-count formula
    assert(v.delayCs == 20)
    assert(v.frames.length == (orig.frames.length + 1) / 2)
    for (j <- v.frames.indices)
      assert(v.frames(j).toSeq == orig.frames(2 * j).toSeq,
        s"sampled frame $j is not original frame ${2 * j}")
  }

  test("videoFrameStats and videoSceneCuts agree with a direct fold " +
      "over the known frames; corrupt and null rows are skipped") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = true),
      StructField("payload", BinaryType, nullable = true)))
    val good = GifVideoCodec.encode(clip(9L, 4))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(9L, good),
      org.apache.spark.sql.Row(2L, "garbage".getBytes),
      org.apache.spark.sql.Row(3L, null),
      org.apache.spark.sql.Row(null, good))
    val media = spark.createDataFrame(rows, schema)
    val st = Multimodal.videoFrameStats(media).collect()
    assert(st.map(_.getLong(0)).toSeq == Seq(9L))
    val frames = clip(9L, 4).frames.map(_.map(_.toLong))
    assert(st.head.getInt(1) == 4 && st.head.getInt(4) == 10)
    assert(st.head.getLong(5) == frames.map(_.sum).sum)
    assert(st.head.getLong(6) ==
      frames.zipWithIndex.map { case (f, t) => (t + 1) * f.sum }.sum)
    val sc = Multimodal.videoSceneCuts(media, threshold = 20000L).collect()
    assert(sc.map(_.getLong(0)).toSeq == Seq(9L))
    val diffs = frames.sliding(2).map { p =>
      p(0).zip(p(1)).map { case (a, b) => math.abs(b - a) }.sum }.toSeq
    assert(sc.head.getLong(1) == 3L)
    assert(sc.head.getLong(2) == diffs.count(_ >= 20000L).toLong)
    assert(sc.head.getLong(3) == diffs.sum && sc.head.getLong(4) == diffs.max)
  }
}
