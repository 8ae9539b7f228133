package graft

import graft.streaming.EventQueries
import org.scalatest.funsuite.AnyFunSuite

/** Funnel semantics on hand-built timelines: a step only counts when the
  * PREVIOUS step happened strictly before it and within the 6-hour step
  * window — ordering violations and stale prior steps do not convert. */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def run(rows: Seq[(Long, Long, java.sql.Timestamp, String)]) = {
    val df = rows.toDF("user_id", "event_id", "ts", "event_type")
    val r = EventQueries.funnelOf(df).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("full in-window sequence converts at every stage") {
    assert(run(Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 2L, ts("2024-01-01 11:00:00"), "click"),
      (1L, 3L, ts("2024-01-01 12:00:00"), "purchase"))) == ((1L, 1L, 1L)))
  }

  test("click BEFORE the first view does not convert (strict ordering)") {
    assert(run(Seq(
      (1L, 1L, ts("2024-01-01 09:00:00"), "click"),
      (1L, 2L, ts("2024-01-01 10:00:00"), "view"))) == ((1L, 0L, 0L)))
  }

  test("a view older than the 6h step window does not qualify the click") {
    assert(run(Seq(
      (1L, 1L, ts("2024-01-01 01:00:00"), "view"),
      (1L, 2L, ts("2024-01-01 08:00:01"), "click"))) == ((1L, 0L, 0L)))
  }

  test("purchase needs a QUALIFIED click, not any click") {
    // click present but itself unqualified (no prior view) → purchase must not count
    assert(run(Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, 2L, ts("2024-01-01 11:00:00"), "purchase"),
      (1L, 3L, ts("2024-01-01 12:00:00"), "view"))) == ((1L, 0L, 0L)))
  }

  test("stages count users independently across users") {
    assert(run(Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 2L, ts("2024-01-01 11:00:00"), "click"),
      (2L, 3L, ts("2024-01-01 10:00:00"), "view"))) == ((2L, 1L, 0L)))
  }

  test("exactly-on-boundary prior step still qualifies (inclusive window)") {
    assert(run(Seq(
      (1L, 1L, ts("2024-01-01 02:00:00"), "view"),
      (1L, 2L, ts("2024-01-01 08:00:00"), "click"))) == ((1L, 1L, 0L)))
  }
}
