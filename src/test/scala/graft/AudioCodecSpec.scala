package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{DecodedAudio, JdkWavCodec, RiffWavCodec}
import org.scalatest.funsuite.AnyFunSuite

/** Real-audio-codec coverage (the q258/q259 seam; reference media
  * pipeline — EntityImporterBase.cs:301-432): the JDK WAV codec must
  * round-trip 16-bit PCM losslessly, reject garbage without killing the
  * partition, and the decimation must be the exact integer sampling the
  * q259 oracle restates. */
class AudioCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def chirp(n: Int, rate: Int = 8000, channels: Int = 1): DecodedAudio =
    DecodedAudio(rate, channels,
      Array.tabulate(n)(i => ((i * 773 + 31) % 65536 - 32768).toShort))

  test("WAV encode→decode round-trips samples bit-exactly (lossless PCM)") {
    val a = chirp(441) // odd length
    val back = JdkWavCodec.decode(JdkWavCodec.encode(a)).get
    assert(back.sampleRate == 8000 && back.channels == 1)
    assert(back.samples.toSeq == a.samples.toSeq)
  }

  test("stereo WAV round-trips interleaved frames bit-exactly") {
    val a = chirp(400, rate = 44100, channels = 2) // 200 frames x 2ch
    val back = JdkWavCodec.decode(JdkWavCodec.encode(a)).get
    assert(back.sampleRate == 44100 && back.channels == 2)
    assert(back.samples.toSeq == a.samples.toSeq)
  }

  test("RiffWavCodec cross-validates against the JDK codec: decode " +
      "sample-for-sample both directions, mono and stereo") {
    // the hand-rolled codec carries the pipeline's throughput; the JDK
    // implementation anchors format correctness — each must decode the
    // other's output bit-exactly
    for (a <- Seq(chirp(441), chirp(400, rate = 44100, channels = 2))) {
      val viaJdk = JdkWavCodec.decode(RiffWavCodec.encode(a)).get
      assert(viaJdk.samples.toSeq == a.samples.toSeq)
      assert(viaJdk.sampleRate == a.sampleRate && viaJdk.channels == a.channels)
      val viaRiff = RiffWavCodec.decode(JdkWavCodec.encode(a)).get
      assert(viaRiff.samples.toSeq == a.samples.toSeq)
      assert(viaRiff.sampleRate == a.sampleRate && viaRiff.channels == a.channels)
    }
  }

  test("RiffWavCodec rejects undecodable payloads like the JDK codec: " +
      "garbage, empty, null, truncated, non-PCM format tag") {
    assert(RiffWavCodec.decode("not a wav file at all".getBytes).isEmpty)
    assert(RiffWavCodec.decode(Array.emptyByteArray).isEmpty)
    assert(RiffWavCodec.decode(null).isEmpty)
    val wav = RiffWavCodec.encode(chirp(256))
    assert(RiffWavCodec.decode(wav.take(30)).isEmpty,
      "truncated WAV must decode to None")
    val oversizedData = wav.clone()
    oversizedData(40) = -1; oversizedData(41) = -1 // data size > buffer
    assert(RiffWavCodec.decode(oversizedData).isEmpty,
      "data chunk overrunning the buffer must decode to None")
    val nonPcm = wav.clone()
    nonPcm(20) = 3 // format tag: IEEE float
    assert(RiffWavCodec.decode(nonPcm).isEmpty,
      "non-PCM format tag must decode to None")
  }

  test("undecodable payloads skip, never throw: garbage, empty, null, truncated WAV") {
    assert(JdkWavCodec.decode("not a wav file at all".getBytes).isEmpty)
    assert(JdkWavCodec.decode(Array.emptyByteArray).isEmpty)
    assert(JdkWavCodec.decode(null).isEmpty)
    val wav = JdkWavCodec.encode(chirp(256))
    assert(JdkWavCodec.decode(wav.take(16)).isEmpty,
      "truncated WAV (valid RIFF magic, corrupt body) must decode to None")
  }

  test("renderWav samples match the q258 oracle formula after a real decode") {
    import spark.implicits._
    val media = Multimodal.renderWav(Seq(42L, 250L).toDF("doc_id"), "doc_id")
    val rows = media.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    for ((id, bytes) <- rows) {
      val a = JdkWavCodec.decode(bytes).get
      assert(a.sampleRate == 8000 && a.channels == 1)
      assert(a.samples.length == 300 + (id % 100).toInt)
      for (i <- a.samples.indices)
        assert(a.samples(i) == (131 * id + 17 * i) % 65536 - 32768)
    }
  }

  test("decimateAudio keeps exactly every n-th sample and divides the rate") {
    import spark.implicits._
    val media = Multimodal.renderWav(Seq(7L).toDF("doc_id"), "doc_id")
    val out = Multimodal.decimateAudio(media, 3).collect()
    val a = JdkWavCodec.decode(out.head.getAs[Array[Byte]](1)).get
    assert(a.sampleRate == 2666 && a.channels == 1)
    val n = 300 + 7 % 100
    assert(a.samples.length == (n + 2) / 3)
    for (j <- a.samples.indices)
      assert(a.samples(j) == (131 * 7 + 17 * (3 * j)) % 65536 - 32768)
  }

  test("audioFrameEnergy: exact per-frame sums, partial last frame, " +
      "silence threshold on the short tail") {
    import spark.implicits._
    val media = Multimodal.renderWav(Seq(7L).toDF("doc_id"), "doc_id")
    val out = Multimodal.audioFrameEnergy(media, frameSamples = 64,
      silenceThreshold = 1000000000L).collect().head
    val n = 300 + 7 % 100 // 307 samples → 5 frames, last one 51 samples
    val samples = (0 until n).map(i => (131L * 7 + 17L * i) % 65536 - 32768)
    val frames = samples.grouped(64).map(f => f.map(v => v * v).sum).toSeq
    assert(out.getLong(1) == frames.size.toLong)
    assert(out.getLong(2) == frames.sum)
    assert(out.getLong(3) == frames.max)
    assert(out.getLong(4) == frames.count(_ < 1000000000L).toLong)
  }

  test("audioSampleStats skips null ids, null payloads and corrupt audio") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = true),
      StructField("payload", BinaryType, nullable = true)))
    val good = JdkWavCodec.encode(chirp(32))
    // a VALID zero-sample clip (RIFF allows an empty data chunk) must be
    // skipped too: min/max of an empty clip has no value, and the fold
    // sentinels (±Long.MaxValue) must never leak into the output frame
    val empty = RiffWavCodec.encode(DecodedAudio(8000, 1, new Array[Short](0)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, good),
      org.apache.spark.sql.Row(2L, "garbage".getBytes),
      org.apache.spark.sql.Row(3L, null),
      org.apache.spark.sql.Row(5L, empty),
      org.apache.spark.sql.Row(null, good))
    val media = spark.createDataFrame(rows, schema)
    val out = Multimodal.audioSampleStats(media).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    assert(out.head.getLong(3) == 32L) // n_samples
    // stats agree with a direct fold over the known samples
    val s = chirp(32).samples.map(_.toLong)
    assert(out.head.getLong(4) == s.sum)
    assert(out.head.getLong(5) == s.min && out.head.getLong(6) == s.max)
    assert(out.head.getLong(7) ==
      s.zipWithIndex.map { case (v, i) => ((i % 7) + 1) * v }.sum)
  }
}
