package graft

import graft.streaming.EventQueries
import org.scalatest.funsuite.AnyFunSuite

/** Retention-cohort semantics on hand-built timelines: cohort = the
  * user's first ISO week, a user counts once per active week, and every
  * cohort's offset-0 cell equals the cohort size by construction. */
class RetentionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def run(rows: Seq[(Long, java.sql.Timestamp)]) =
    EventQueries.retentionCohortsOf(rows.toDF("user_id", "ts"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSeq

  test("two cohorts, partial week-1 retention") {
    // u1,u2 start week of Mon 2024-01-01; only u2 returns the next week;
    // u3 starts the next week (its own cohort)
    val got = run(Seq(
      (1L, ts("2024-01-02 10:00:00")),
      (2L, ts("2024-01-03 09:00:00")),
      (2L, ts("2024-01-10 09:00:00")),
      (3L, ts("2024-01-11 12:00:00"))))
    assert(got == Seq(
      ("2024-01-01", 0, 2L, 2L, 100.0),
      ("2024-01-01", 1, 1L, 2L, 50.0),
      ("2024-01-08", 0, 1L, 1L, 100.0)))
  }

  test("multiple events in one week count the user once") {
    val got = run(Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-05 10:00:00")),
      (1L, ts("2024-01-07 23:00:00"))))
    assert(got == Seq(("2024-01-01", 0, 1L, 1L, 100.0)))
  }

  test("offset-0 cell always equals the cohort size") {
    val got = EventQueries.retentionCohorts(spark, TestSpark.sfDir).collect()
    val zero = got.filter(_.getInt(1) == 0)
    assert(zero.nonEmpty)
    zero.foreach(r => assert(r.getLong(2) == r.getLong(3)))
    // and no cell can exceed its cohort
    got.foreach(r => assert(r.getLong(2) <= r.getLong(3)))
  }
}
