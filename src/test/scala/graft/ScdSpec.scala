package graft

import java.sql.Timestamp
import graft.etl.Scd
import org.scalatest.funsuite.AnyFunSuite

/** SCD type-2 semantics (q154): consecutive-duplicate collapse,
  * re-occurrence reopening, NULL-run collapse, tie ordering, half-open
  * interval chaining, and the one-Exchange plan claim. */
class ScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(us: Long) = new Timestamp(us / 1000) {
    setNanos(((us % 1000000) * 1000).toInt)
  }

  private def log(rows: (Long, String, Long, Long)*) =
    rows.map { case (k, a, t, id) => (k, a, ts(t), id) }
      .toDF("user_id", "event_type", "ts", "event_id")

  test("collapse, reopen, intervals and is_current") {
    val out = Scd.type2(
      log((1L, "A", 1000000L, 1), (1L, "A", 2000000L, 2),
        (1L, "B", 3000000L, 3), (1L, "A", 4000000L, 4),
        (2L, "X", 1000000L, 5)),
      "user_id", "event_type", "ts", "event_id")
      .orderBy("user_id", "version")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getInt(5)))
    assert(out.toSeq == Seq(
      (1L, 1, "A", 1000000L, 3000000L, 0), // duplicate A at t2 collapsed
      (1L, 2, "B", 3000000L, 4000000L, 0),
      (1L, 3, "A", 4000000L, -1L, 1),      // A reopens as a NEW version
      (2L, 1, "X", 1000000L, -1L, 1)))
  }

  test("NULL attribute runs collapse instead of dropping") {
    val df = Seq(
      (1L, Option.empty[String], ts(1000000L), 1L),
      (1L, Option.empty[String], ts(2000000L), 2L),
      (1L, Option("A"), ts(3000000L), 3L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Scd.type2(df, "user_id", "event_type", "ts", "event_id")
      .orderBy("version").collect()
    assert(out.length == 2)
    assert(out(0).isNullAt(2) && out(0).getLong(3) == 1000000L)
    assert(out(1).getString(2) == "A" && out(1).getInt(5) == 1)
  }

  test("equal timestamps order by the tie column") {
    val out = Scd.type2(
      log((1L, "B", 1000000L, 2), (1L, "A", 1000000L, 1)),
      "user_id", "event_type", "ts", "event_id")
      .orderBy("version").collect().map(_.getString(2))
    assert(out.toSeq == Seq("A", "B")) // event_id 1 first despite same ts
  }

  test("streaming SCD2 closed versions == batch non-current versions") {
    import org.apache.spark.sql.functions.col
    import graft.streaming.EventStreams
    val tmp = java.nio.file.Files.createTempDirectory("graft-scd").toString
    Tables.events(spark, TestSpark.sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema("user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING")
      .parquet(tmp)
      .as[EventStreams.ChangeEvent](org.apache.spark.sql.Encoders
        .product[EventStreams.ChangeEvent])
    val q = EventStreams.scdStream(stream).writeStream
      .outputMode("append").format("memory").queryName("scd_stream").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("scd_stream")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    val batch = Scd.type2(Tables.events(spark, TestSpark.sfDir),
        "user_id", "event_type", "ts", "event_id")
      .filter(col("is_current") === 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming SCD2 closes versions across micro-batches incrementally") {
    import graft.streaming.EventStreams
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-scd-inc").toString
    Seq((1L, 1L, ts(1000000L), "A"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/b1")
    val stream = spark.readStream
      .schema("user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING")
      .parquet(s"$tmp/b*")
      .as[EventStreams.ChangeEvent](org.apache.spark.sql.Encoders
        .product[EventStreams.ChangeEvent])
    val q = EventStreams.scdStream(stream).writeStream
      .outputMode("append").format("memory").queryName("scd_inc").start()
    q.processAllAvailable()
    assert(spark.table("scd_inc").count() == 0) // version 1 still open
    Seq((1L, 2L, ts(5000000L), "B"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/b2")
    q.processAllAvailable(); q.stop()
    val out = spark.table("scd_inc").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    // the arrival of B closed version 1 (A) at B's timestamp
    assert(out.toSeq == Seq((1L, 1, "A", 1000000L, 5000000L)))
  }

  test("both window passes ride ONE key shuffle") {
    val plan = Scd.type2(Tables.events(spark, TestSpark.sfDir),
        "user_id", "event_type", "ts", "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
