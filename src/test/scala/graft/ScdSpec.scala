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

  test("both window passes ride ONE key shuffle") {
    val plan = Scd.type2(Tables.events(spark, TestSpark.sfDir),
        "user_id", "event_type", "ts", "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
