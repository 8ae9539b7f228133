package graft

import graft.streaming.DocStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming curation == batch curation, row for row: the text gates are
  * stateless projections, so the identical expression tree must produce
  * identical verdicts under Structured Streaming and batch. */
class DocStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming curation gates equal the batch run exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-docs").toString
    Tables.documents(spark, TestSpark.sfDir)
      .write.mode("overwrite").parquet(tmp)
    val streamed = DocStreams
      .runCurationToMemory(spark, tmp, "curation_stream_smoke")
      .orderBy(col("doc_id")).collect().toSeq
    val batch = DocStreams
      .curationGates(Tables.documents(spark, TestSpark.sfDir))
      .orderBy(col("doc_id")).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming Gopher rule battery equals the batch run exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-gopher").toString
    Tables.documents(spark, TestSpark.sfDir)
      .write.mode("overwrite").parquet(tmp)
    val q = graft.text.TextQueries
      .gopherVerdictsOf(DocStreams.readDocStream(spark, tmp))
      .writeStream.outputMode("append").format("memory")
      .queryName("gopher_stream").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("gopher_stream")
      .orderBy(col("doc_id")).collect().toSeq
    val batch = graft.text.TextQueries
      .gopherVerdictsOf(Tables.documents(spark, TestSpark.sfDir))
      .orderBy(col("doc_id")).collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming readability signals equal the batch run exactly") {
    // q208's per-doc FK signal extraction is a stateless projection —
    // it must run unchanged under Structured Streaming
    val tmp = java.nio.file.Files.createTempDirectory("graft-read").toString
    Tables.documents(spark, TestSpark.sfDir)
      .write.mode("overwrite").parquet(tmp)
    val q = graft.text.TextQueries
      .readabilitySignalsOf(DocStreams.readDocStream(spark, tmp))
      .writeStream.outputMode("append").format("memory")
      .queryName("readability_stream").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("readability_stream")
      .orderBy(col("doc_id")).collect().toSeq
    val batch = graft.text.TextQueries
      .readabilitySignalsOf(Tables.documents(spark, TestSpark.sfDir))
      .orderBy(col("doc_id")).collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming winnow fingerprint extraction equals the batch run exactly") {
    // the q174 sketch stage is a stateless Generate — it must run
    // unchanged under Structured Streaming (incremental fingerprinting
    // for a continuously-arriving corpus)
    def fps(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      explode(graft.functions.WinnowExpr.winnowOf(
        graft.text.TextFunctions.normalize(col("text")), 16, 6)).as("f"))
      .select(col("doc_id"), col("f.pos").as("pos"), col("f.h").as("h"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-winnow").toString
    Tables.documents(spark, TestSpark.sfDir)
      .write.mode("overwrite").parquet(tmp)
    val q = fps(DocStreams.readDocStream(spark, tmp))
      .writeStream.outputMode("append").format("memory")
      .queryName("winnow_stream").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("winnow_stream")
      .orderBy(col("doc_id"), col("pos")).collect().toSeq
    val batch = fps(Tables.documents(spark, TestSpark.sfDir))
      .orderBy(col("doc_id"), col("pos")).collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("incremental arrival: a second file batch appends without reprocessing") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-docs-inc").toString
    val docs = Tables.documents(spark, TestSpark.sfDir)
    docs.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$tmp/batch1")
    // one sink, two availability points — the cron/crawl-drop pattern
    val q = DocStreams.curationGates(DocStreams.readDocStream(spark, s"$tmp/batch*"))
      .writeStream.outputMode("append").format("memory")
      .queryName("curation_inc").start()
    q.processAllAvailable()
    val afterFirst = spark.table("curation_inc").count()
    docs.filter(col("doc_id") % 2 === 1)
      .write.mode("overwrite").parquet(s"$tmp/batch2")
    q.processAllAvailable()
    q.stop()
    val total = spark.table("curation_inc").count()
    assert(afterFirst > 0 && total == docs.count(),
      s"afterFirst=$afterFirst total=$total expected=${docs.count()}")
  }

  test("streaming LSH candidates equal the batch q36 candidate set") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-lsh-stream").toString
    Tables.documents(spark, TestSpark.sfDir)
      .write.mode("overwrite").parquet(tmp)
    val streamed = DocStreams
      .runLshCandidatesToMemory(spark, tmp, "lsh_stream_smoke")
      .select("id1", "id2", "est_jaccard").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.text.TextQueries
      .minhashCandidatesPortable(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming LSH: cross-batch near-dup pair found without reprocessing") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-lsh-inc").toString
    import spark.implicits._
    val twinA = "the quick brown fox jumps over the lazy sleeping dog tonight"
    val twinB = "the quick brown fox jumps over the lazy sleeping dog today"
    Seq((1L, twinA, "en", "src0", 60L),
        (2L, "an entirely different first-batch document about spark shuffles",
          "en", "src0", 63L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/b1")
    val q = DocStreams
      .lshCandidateStream(DocStreams.minhashBuckets(
        DocStreams.readDocStream(spark, s"$tmp/b*")))
      .writeStream.outputMode("append").format("memory")
      .queryName("lsh_inc").start()
    q.processAllAvailable()
    assert(spark.table("lsh_inc").count() == 0) // nothing similar yet
    Seq((3L, twinB, "en", "src0", 58L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/b2")
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("lsh_inc").select("id1", "id2").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L))) // the doc-1 twin, found on arrival of doc 3
  }

  test("streaming LSH: bucket state caps at maxPerBucket, pairing still emits") {
    import spark.implicits._
    val text = "identical identical identical identical identical identical"
    // 5 byte-identical docs through a cap of 2: state stores the first two
    // arrivals per bucket; every later arrival pairs against the stored
    // two only → 2 + 2 + 2 = 6 pairs... but each doc pairs against BOTH
    // stored docs: docs 3,4,5 × stored {1,2} = 6 pairs + the (1,2) pair
    val df = (1L to 5L).map(i => (i, text, "en", "src0", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-lsh-cap").toString
    df.write.mode("overwrite").parquet(tmp)
    val got = DocStreams
      .lshCandidateStream(DocStreams.minhashBuckets(
        DocStreams.readDocStream(spark, tmp)), maxPerBucket = 2)
      .writeStream.outputMode("append").format("memory")
      .queryName("lsh_cap")
    val q = got.start()
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("lsh_cap").select("id1", "id2").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L),
      (1L, 5L), (2L, 5L)))
  }

  test("streaming incremental LSH dedup equals the batch q249 operator " +
      "on the re-ingest fixture (stream-static delta ⋈ index)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ilsh").toString
    val docs = Tables.documents(spark, TestSpark.sfDir)
    // the q249 delta (doc_id % 10 = 0) arrives as a stream with event time
    docs.filter(col("doc_id") % 10 === 0)
      .withColumn("ts", lit("2026-01-01 10:00:00").cast("timestamp"))
      .write.mode("overwrite").parquet(tmp)
    val baseIndex = DocStreams.minhashBuckets(docs).toDF()
    import org.apache.spark.sql.types._
    val schema = StructType(DocStreams.docSchema.fields :+
      StructField("ts", TimestampType))
    val q = DocStreams.incrementalLshStream(
        spark.readStream.schema(schema).parquet(tmp), baseIndex,
        "ts", "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("ilsh_stream").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ilsh_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.text.TextQueries
      .incrementalLshDedup(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"stream-batch diff: only-stream=${streamed -- batch} " +
        s"only-batch=${batch -- streamed}")
  }

  test("streaming incremental LSH: watermark EVICTS pair-dedup state — " +
      "state stays delta-bounded across timed crawl drops") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ilsh-wm").toString
    import spark.implicits._
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tB = "one two three four five six seven eight nine ten eleven"
    def drop(n: Int, rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("doc_id", "text", "ts_s")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"),
          col("ts_s").cast("timestamp").as("ts"))
        .write.mode("overwrite").parquet(s"$tmp/d$n")
    // base corpus: two twin pairs (1≈2, 3≈4) — identical text collides
    // in every band with est_jaccard 1.0
    val base = Seq((1L, tA), (2L, tA), (3L, tB), (4L, tB),
        (5L, "completely unrelated singleton document text here"))
      .toDF("doc_id", "text")
    val baseIndex = DocStreams.minhashBucketsWith(base, Nil)
    drop(1, Seq((2L, tA, "2026-01-01 10:00:00")))
    val q = DocStreams.incrementalLshStream(
        spark.readStream.schema(org.apache.spark.sql.types.StructType(
          DocStreams.docSchema.fields :+ org.apache.spark.sql.types
            .StructField("ts", org.apache.spark.sql.types.TimestampType)))
          .parquet(s"$tmp/d*"), baseIndex, "ts", "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("ilsh_wm").start()
    q.processAllAvailable()
    // second crawl drop 2h later: watermark passes drop 1's event time
    drop(2, Seq((4L, tB, "2026-01-01 12:00:00")))
    q.processAllAvailable()
    // third drop, no new pairs — advances the watermark once more so
    // eviction of drop 2's key is also observable
    drop(3, Seq((5L, "completely unrelated singleton document text here",
      "2026-01-01 14:00:00")))
    q.processAllAvailable()
    val stateRows = Option(q.lastProgress)
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
    q.stop()
    val pairs = spark.table("ilsh_wm").select("id1", "id2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)),
      s"unexpected candidate pairs: $pairs")
    // 2 distinct pairs passed through the dedup over the run; bounded
    // state means the watermark evicted at least the first — the store
    // never holds the full pair history
    assert(stateRows >= 0 && stateRows < 2,
      s"watermark did not evict pair-dedup state: numRowsTotal=$stateRows")
  }

  test("streaming dedup-within-watermark drops re-ingested copies; equals " +
      "batch dropDuplicates on the bounded fixture") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dedup-wm").toString
    import spark.implicits._
    import org.apache.spark.sql.types._
    // 6 arrivals of 4 distinct contents — doc 1 re-crawled twice, doc 2 once
    val rows = Seq(
      (1L, "alpha content", "2026-01-01 10:00:00"),
      (2L, "beta content", "2026-01-01 10:05:00"),
      (3L, "alpha content", "2026-01-01 10:10:00"), // dup of 1
      (4L, "gamma content", "2026-01-01 10:20:00"),
      (5L, "beta content", "2026-01-01 10:25:00"),  // dup of 2
      (6L, "alpha content", "2026-01-01 10:30:00")) // dup of 1
      .toDF("doc_id", "text", "ts_s")
      .select(col("doc_id"), col("text"),
        col("ts_s").cast("timestamp").as("ts"),
        md5(col("text")).as("content_key"))
    rows.write.mode("overwrite").parquet(tmp)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("ts", TimestampType),
      StructField("content_key", StringType)))
    val q = DocStreams.dedupWithinWatermark(
        spark.readStream.schema(schema).parquet(tmp),
        "ts", "1 hour", Seq("content_key"))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_wm").start()
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("dedup_wm").select("content_key")
      .collect().map(_.getString(0)).toSet
    val batch = rows.dropDuplicates("content_key")
      .select("content_key").collect().map(_.getString(0)).toSet
    assert(kept == batch && kept.size == 3,
      s"stream kept $kept, batch kept $batch")
  }
}
