package graft

import graft.multimodal.Multimodal
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing + Structured Streaming smoke tests. */
class MultimodalStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("attachBinary produces payload bytes + metadata matching the text") {
    val df = Seq((1L, "hello"), (2L, "")).toDF("id", "txt")
    val media = Multimodal.attachBinary(df, "id", "txt")
    assert(media.schema("payload").dataType.typeName == "binary")
    val r = media.filter(col("media_id") === 1).head()
    assert(r.getAs[Array[Byte]]("payload").toSeq == "hello".getBytes("UTF-8").toSeq)
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[Long]("n_bytes") == 5L)
    assert(meta.getAs[String]("digest") == "5d41402abc4b2a76b9719d911017c592")
  }

  test("streaming audio decode equals the batch run exactly — the real " +
      "codec chain is a stateless mapPartitions, so media files curate " +
      "incrementally at the ingest edge") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("graft-audio-stream")
      .toString
    Multimodal.renderWav(Tables.documents(spark, TestSpark.sfDir), "doc_id")
      .write.mode("overwrite").parquet(tmp)
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    val q = Multimodal.audioSampleStats(
        spark.readStream.schema(schema).parquet(tmp))
      .writeStream.outputMode("append").format("memory")
      .queryName("audio_decode_stream").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("audio_decode_stream")
      .orderBy(col("media_id")).collect().toSeq
    val batch = Multimodal.audioSampleStats(spark.read.parquet(tmp))
      .orderBy(col("media_id")).collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming video decode equals the batch run exactly — the GIF " +
      "container chain is a stateless mapPartitions like the audio path, " +
      "so clips curate incrementally at the ingest edge") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("graft-video-stream")
      .toString
    Multimodal.renderGif(Tables.documents(spark, TestSpark.sfDir), "doc_id")
      .write.mode("overwrite").parquet(tmp)
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    val q = Multimodal.videoFrameStats(
        spark.readStream.schema(schema).parquet(tmp))
      .writeStream.outputMode("append").format("memory")
      .queryName("video_decode_stream").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("video_decode_stream")
      .orderBy(col("media_id")).collect().toSeq
    val batch = Multimodal.videoFrameStats(spark.read.parquet(tmp))
      .orderBy(col("media_id")).collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("extractFeatures: fixed-dim deterministic features via mapPartitions") {
    val df = Seq((1L, "abc"), (2L, "abc"), (3L, "xyz")).toDF("id", "txt")
    val feats = Multimodal.extractFeatures(Multimodal.attachBinary(df, "id", "txt"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L).size == Multimodal.FeatureDim)
    assert(feats(1L) == feats(2L))
    assert(feats(1L) != feats(3L))
  }

  test("fakeDecode is the documented histogram projection") {
    val f = Multimodal.fakeDecode("ab".getBytes("UTF-8"))
    assert(math.abs(f(0) - 97 / 255.0f) < 1e-6)
    assert(math.abs(f(1) - 98 / 255.0f) < 1e-6)
    assert(f.drop(2).forall(_ == 0.0f))
  }

  test("stateful streaming sessionization matches the batch lag-window count") {
    import graft.streaming.EventStreams.{SessionEvent, sessionizeStream}
    val tmp = java.nio.file.Files.createTempDirectory("graft-sess").toString
    Tables.events(spark, TestSpark.sfDir)
      .select(col("user_id"), col("ts")).write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP").parquet(tmp)
      .as[SessionEvent]
    val q = sessionizeStream(stream).writeStream
      .outputMode("append").format("memory").queryName("sess_smoke").start()
    q.processAllAvailable()
    q.stop()
    // closed sessions emitted so far + one open session per user in state
    // == the batch session count
    val closed = spark.table("sess_smoke")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.streaming.EventQueries.sessionize(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    batch.foreach { case (user, nSessions) =>
      assert(closed.getOrElse(user, 0L) + 1 == nSessions,
        s"user $user: closed=${closed.getOrElse(user, 0L)} batch=$nSessions")
    }
  }

  test("streaming KLL quantile sketch equals the batch rollup exactly " +
      "in the exact regime — percentile dashboards maintain sketches " +
      "incrementally instead of rescanning the stream's history") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-kll-stream")
      .toString
    val cents = expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
    Tables.events(spark, TestSpark.sfDir)
      .select(col("event_type"), cents.as("v"))
      .write.mode("overwrite").parquet(tmp)
    val q = spark.readStream.schema("event_type STRING, v LONG").parquet(tmp)
      .groupBy(col("event_type"))
      .agg(expr("kll_sketch_agg_bigint(v, 65535)").as("sk"))
      .select(col("event_type"),
        expr("kll_sketch_get_n_bigint(sk)").as("n"),
        expr("kll_sketch_get_quantile_bigint(sk, 0.5)").as("p50"),
        expr("kll_sketch_get_quantile_bigint(sk, 0.9)").as("p90"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("kll_stream").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("kll_stream")
      .orderBy(col("event_type")).collect().toSeq
    val batch = spark.read.parquet(tmp)
      .groupBy(col("event_type"))
      .agg(expr("kll_sketch_agg_bigint(v, 65535)").as("sk"))
      .select(col("event_type"),
        expr("kll_sketch_get_n_bigint(sk)").as("n"),
        expr("kll_sketch_get_quantile_bigint(sk, 0.5)").as("p50"),
        expr("kll_sketch_get_quantile_bigint(sk, 0.9)").as("p90"))
      .orderBy(col("event_type")).collect().toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"stream=$streamed\nbatch=$batch")
  }

  test("windowed streaming counts match the batch aggregation") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    Tables.events(spark, TestSpark.sfDir)
      .write.mode("overwrite").parquet(tmp)
    val streamed = EventStreams.runToMemory(spark, tmp, "stream_smoke")
    val batch = Tables.events(spark, TestSpark.sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    assert(streamed.count() == batch.count())
    val s = streamed.agg(sum("cnt")).head().getLong(0)
    val b = batch.agg(sum("cnt")).head().getLong(0)
    assert(s == b)
  }

  test("frame sampling: exact boundaries, stride, and empty payloads") {
    import graft.multimodal.Multimodal
    val media = Seq(
      (1L, ("a" * 700)), // 3 frames of 256 -> sampled 0, 2
      (2L, "short"),     // 1 frame
      (3L, "")           // no frames
    ).toDF("doc_id", "text")
    val frames = Multimodal.frameSample(
        Multimodal.attachBinary(media, "doc_id", "text"),
        frameBytes = 256, everyNth = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).length))
    assert(frames.toSet == Set((1L, 0, 256), (1L, 2, 188), (2L, 0, 5)))
  }

  test("resize stub truncates to the byte budget and keeps sizes") {
    import graft.multimodal.Multimodal
    val media = Seq((1L, "a" * 500), (2L, "tiny")).toDF("doc_id", "text")
    val out = Multimodal.resizeStub(
        Multimodal.attachBinary(media, "doc_id", "text"), maxBytes = 100)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).length,
        r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1L, 100, 500L, 100L), (2L, 4, 4L, 4L)))
  }
}
