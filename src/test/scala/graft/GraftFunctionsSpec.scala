package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL registration of custom expressions + streaming dedup. */
class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft_minhash callable from SQL and equal to the Scala API") {
    GraftFunctions.register(spark)
    Seq((1L, "the quick brown fox jumps"), (2L, "totally different words here"))
      .toDF("id", "text").createOrReplaceTempView("gf_docs")
    val viaSql = spark.sql(
      "SELECT id, graft_minhash(split(lower(text), ' '), 16, 3) AS sig FROM gf_docs")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaApi = spark.table("gf_docs")
      .select(col("id"), graft.text.Dedup.minhashSignature(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaApi)
    assert(viaSql(1L).size == 16)
  }

  test("graft_simhash / graft_langid callable from SQL, equal to the Scala API") {
    GraftFunctions.register(spark)
    Seq((1L, "the quick brown fox"), (2L, "der hund und die katze"), (3L, ""))
      .toDF("id", "text").createOrReplaceTempView("gf_docs2")
    val viaSql = spark.sql(
      """SELECT id,
        |  graft_simhash(split(lower(text), ' ')) AS sh,
        |  graft_langid(split(lower(text), ' ')) AS lang
        |FROM gf_docs2""".stripMargin)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val viaApi = spark.table("gf_docs2")
      .select(col("id"),
        graft.functions.SimHashExpr.simhashOfTokens(
          split(lower(col("text")), " "), 32).as("sh"),
        graft.functions.LangIdExpr.langIdOfTokens(
          split(lower(col("text")), " "), graft.text.TextFunctions.LangMarkers).as("lang"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(viaSql.keySet == viaApi.keySet)
    viaSql.foreach { case (k, v) => assert(v == viaApi(k)) }
    assert(viaSql(2L)._2 == "de")
    assert(viaSql(1L)._2 == "en")
  }

  test("arity/argument errors are reported") {
    GraftFunctions.register(spark)
    val e = intercept[Exception](
      spark.sql("SELECT graft_minhash(array('a'), 'x')").collect())
    assert(e.getMessage.contains("integer literal") ||
      e.getMessage.contains("graft_minhash"))
  }

  test("type mismatches fail at analysis, not with an executor ClassCastException") {
    GraftFunctions.register(spark)
    // scalar (non-array) argument to the token-array functions
    for (q <- Seq("SELECT graft_simhash('abc')", "SELECT graft_langid(42)",
        "SELECT graft_minhash('abc')")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(q).collect())
      assert(e.getMessage.toLowerCase.contains("type"), s"$q => ${e.getMessage}")
    }
    // vector kernels reject non-fractional arrays at analysis time too
    import org.apache.spark.sql.functions._
    val df = spark.range(1).select(array(lit("a")).as("s"), array(lit(1L)).as("l"))
    val cce1 = intercept[org.apache.spark.sql.AnalysisException](
      df.select(graft.functions.VectorExpr.dot(col("s"), col("s"))).collect())
    assert(cce1.getMessage.toLowerCase.contains("type"))
    val cce2 = intercept[org.apache.spark.sql.AnalysisException](
      df.select(graft.functions.SigExpr.srpSignature(col("s"), 8)).collect())
    assert(cce2.getMessage.toLowerCase.contains("type"))
    val cce3 = intercept[org.apache.spark.sql.AnalysisException](
      df.select(graft.functions.SigExpr.agreement(col("s"), col("s"))).collect())
    assert(cce3.getMessage.toLowerCase.contains("type"))
    // TopKStructs requires a struct child
    val cce4 = intercept[org.apache.spark.sql.AnalysisException](
      spark.range(3).groupBy().agg(
        graft.functions.TopKAgg.topK(col("id"), 2)).collect())
    assert(cce4.getMessage.toLowerCase.contains("struct"))
  }

  test("stream-stream interval join matches the batch time-bounded join") {
    import graft.streaming.EventStreams
    val tmpA = java.nio.file.Files.createTempDirectory("graft-ij-a").toString
    val tmpB = java.nio.file.Files.createTempDirectory("graft-ij-b").toString
    val ev = Tables.events(spark, TestSpark.sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"), col("ts"))
    clicks.write.mode("overwrite").parquet(tmpA)
    errors.write.mode("overwrite").parquet(tmpB)
    val sa = spark.readStream.schema("event_id LONG, user_id LONG, ts TIMESTAMP").parquet(tmpA)
    val sb = spark.readStream.schema("err_id LONG, user_id LONG, ts TIMESTAMP").parquet(tmpB)
    val q = graft.streaming.EventStreams.intervalJoin(sa, sb, "user_id")
      .select(col("l.event_id"), col("r.err_id"))
      .writeStream.outputMode("append").format("memory")
      .queryName("ij_smoke").start()
    q.processAllAvailable()
    q.stop()
    val batch = clicks.as("l").join(errors.as("r"),
      expr("l.user_id = r.user_id AND " +
        "r.ts BETWEEN l.ts - INTERVAL 30 minutes AND l.ts"))
    assert(spark.table("ij_smoke").count() == batch.count())
    assert(batch.count() > 0)
  }

  test("streaming interval-overlap join matches the batch bucketed operator") {
    import graft.streaming.EventStreams
    val tmpA = java.nio.file.Files.createTempDirectory("graft-ov-a").toString
    val tmpB = java.nio.file.Files.createTempDirectory("graft-ov-b").toString
    val ev = Tables.events(spark, TestSpark.sfDir)
    // the q273 shape: 10-minute error windows × 15-minute signup windows
    val errs = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("err_start"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("err_end"))
    val sigs = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("sig_id"), col("ts").as("sig_start"),
        (col("ts") + expr("INTERVAL 15 MINUTES")).as("sig_end"))
    errs.write.mode("overwrite").parquet(tmpA)
    sigs.write.mode("overwrite").parquet(tmpB)
    val sa = spark.readStream
      .schema("err_id LONG, err_start TIMESTAMP, err_end TIMESTAMP").parquet(tmpA)
    val sb = spark.readStream
      .schema("sig_id LONG, sig_start TIMESTAMP, sig_end TIMESTAMP").parquet(tmpB)
    val q = EventStreams.intervalOverlapStream(
        sa, "err_start", "err_end", sb, "sig_start", "sig_end",
        bucketMs = 600000L,
        maxAWidth = "10 minutes", maxBWidth = "15 minutes")
      .select(col("err_id"), col("sig_id"))
      .writeStream.outputMode("append").format("memory")
      .queryName("ov_stream").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ov_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val batch = graft.operators.RangeJoin.intervalOverlap(
        errs, col("err_start"), col("err_end"),
        sigs, col("sig_start"), col("sig_end"), bucketMs = 600000L)
      .select(col("err_id"), col("sig_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(streamed.length == streamed.toSet.size) // structural dedup held
    assert(streamed.toSet == batch.toSet)
    assert(batch.nonEmpty)
  }

  test("streaming windowed top-k matches the batch heap-aggregate result") {
    import graft.streaming.EventStreams
    val tmp = java.nio.file.Files.createTempDirectory("graft-topk-stream").toString
    val events = Tables.events(spark, TestSpark.sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    events.write.mode("overwrite").parquet(tmp)
    // complete mode: a finite file drop never advances the watermark past
    // the trailing window, so append would withhold it; complete emits
    // the full snapshot for the batch-equality check
    val q = EventStreams.windowedTopK(
        EventStreams.readEventStream(spark, tmp), k = 3, window = "6 hours")
      .writeStream.outputMode("complete").format("memory")
      .queryName("topk_smoke").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("topk_smoke")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val batch = EventStreams.windowedTopK(events, k = 3, window = "6 hours")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(streamed.toSet == batch.toSet)
    assert(streamed.nonEmpty)
  }

  test("streaming funnel stage counts match the batch funnel") {
    import graft.streaming.{EventQueries, EventStreams}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val events = Tables.events(spark, TestSpark.sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-funnel-stream").toString
    events.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema("user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING")
      .parquet(tmp).as[EventStreams.FunnelEvent]
    val q = EventStreams.funnelStream(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_smoke").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("funnel_smoke")
      .groupBy(col("stage")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = EventQueries.funnelOf(events).collect().head
    assert(streamed.getOrElse("view", 0L) == b.getLong(0))
    assert(streamed.getOrElse("click", 0L) == b.getLong(1))
    assert(streamed.getOrElse("purchase", 0L) == b.getLong(2))
    assert(streamed.getOrElse("view", 0L) > 0)
  }

  test("streaming as-of enrichment matches the batch backward as-of join") {
    import graft.streaming.EventStreams
    import graft.operators.AsOfJoin
    val events = Tables.events(spark, TestSpark.sfDir)
    // left = clicks, right = views of the same user: "what did this user
    // last look at when they clicked" — the classic as-of enrichment
    val left = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    val right = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value"))
    val tagged = right.select(lit(0).as("kind"), col("user_id").as("key"),
        col("ts"), col("value").as("v"))
      .unionByName(left.select(lit(1).as("kind"), col("user_id").as("key"),
        col("ts"), col("value").as("v")))
      .filter(col("key").isNotNull && col("ts").isNotNull && col("v").isNotNull)
    val tmp = java.nio.file.Files.createTempDirectory("graft-asof-stream").toString
    tagged.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema("kind INT, key LONG, ts TIMESTAMP, v DOUBLE").parquet(tmp)
      .as[EventStreams.AsOfEvent]
    val q = EventStreams.asofStream(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("asof_smoke").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("asof_smoke")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2),
        Option(r.getTimestamp(3)), Option(r.get(4)).map(_.toString.toDouble)))
    val lf = left.filter(col("user_id").isNotNull && col("ts").isNotNull &&
      col("value").isNotNull)
    val rf = right.filter(col("user_id").isNotNull && col("ts").isNotNull &&
      col("value").isNotNull)
    val batch = AsOfJoin.asOf(lf, rf, "user_id", "ts", "ts", Seq("value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2),
        Option(r.getTimestamp(3)), Option(r.get(4)).map(_.toString.toDouble)))
    assert(streamed.toSet == batch.toSet)
    assert(streamed.exists(_._4.isDefined), "no enriched rows — vacuous test")
    assert(streamed.nonEmpty)
  }

  test("streaming as-of: a late left never reads a right from its future") {
    import graft.streaming.EventStreams
    // two micro-batches via maxFilesPerTrigger=1: batch 1 stores a right
    // at ts=100; batch 2 delivers a LATE left at ts=50 (must NOT match —
    // backward semantics need right_ts <= left_ts) and a left at ts=150
    // (must match the stored right)
    val dir = java.nio.file.Files.createTempDirectory("graft-asof-late").toString
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    // key 1: only a right at 10:00 — the 09:00 late left has NOTHING
    // at-or-before it and must stay null. key 2: rights at 08:00 AND
    // 10:00 — the bounded history lets the 09:00 late left bind to the
    // 08:00 right exactly like the batch form (single-value state used
    // to null it).
    Seq((0, 1L, t("2024-01-01 10:00:00"), 1.0),
        (0, 2L, t("2024-01-01 08:00:00"), 2.0),
        (0, 2L, t("2024-01-01 10:00:00"), 3.0))
      .toDF("kind", "key", "ts", "v").coalesce(1)
      .write.mode("append").parquet(dir)
    Thread.sleep(1100) // distinct file mtimes → deterministic batch order
    Seq((1, 1L, t("2024-01-01 09:00:00"), 7.0),
        (1, 1L, t("2024-01-01 11:00:00"), 8.0),
        (1, 2L, t("2024-01-01 09:00:00"), 9.0))
      .toDF("kind", "key", "ts", "v").coalesce(1)
      .write.mode("append").parquet(dir)
    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1)
      .schema("kind INT, key LONG, ts TIMESTAMP, v DOUBLE").parquet(dir)
      .as[EventStreams.AsOfEvent]
    val q = EventStreams.asofStream(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("asof_late").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("asof_late")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString) ->
        Option(r.get(4)).map(_.toString.toDouble)).toMap
    assert(got((1L, "2024-01-01 09:00:00.0")).isEmpty,
      "late left must not be enriched by a future right")
    assert(got((1L, "2024-01-01 11:00:00.0")).contains(1.0))
    assert(got((2L, "2024-01-01 09:00:00.0")).contains(2.0),
      "late left must enrich from an OLDER right still in the history")
  }

  test("streaming dedup drops in-horizon duplicates") {
    import graft.streaming.EventStreams
    val tmp = java.nio.file.Files.createTempDirectory("graft-dedup-stream").toString
    val events = Tables.events(spark, TestSpark.sfDir)
      .select(col("event_id"), col("ts"), col("event_type"))
    events.union(events).write.mode("overwrite").parquet(tmp) // plant duplicates
    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, event_type STRING").parquet(tmp)
    val q = EventStreams.dedupStream(stream, Seq("event_id"), delay = "10 years")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_smoke").start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup_smoke").count() == events.count())
  }
}
