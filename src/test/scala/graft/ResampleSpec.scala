package graft

import graft.operators.Resample
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Resample (operators.Resample.dailyCarryForward): grid construction and
  * carry-forward fill over hand-built series, including the edges the
  * events-table oracle (q112) cannot isolate. */
class ResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("grid spans floor(min)..max per key; values carry forward") {
    val obs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-03 09:00:00"), 30.0),
      (2L, ts("2024-01-02 00:00:00"), 99.0)
    ).toDF("k", "t", "v")
    val got = Resample.dailyCarryForward(obs, "k", "t", Seq("v"))
      .select(col("k"), date_format(col("grid_ts"), "yyyy-MM-dd").as("d"),
        col("asof_v"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.toString.toDouble))).toSet
    assert(got == Set(
      // key 1: grid 01-01 00:00 (before first obs → null), 01-02, 01-03
      (1L, "2024-01-01", None),
      (1L, "2024-01-02", Some(10.0)),
      (1L, "2024-01-03", Some(10.0)), // 03 00:00 precedes the 09:00 obs
      // key 2: single observation AT midnight → one grid point, matched
      (2L, "2024-01-02", Some(99.0))))
  }

  test("null keys and null timestamps are excluded from the grid") {
    val obs = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), 1.0),
      (None, Some(ts("2024-01-01 10:00:00")), 2.0),
      (Some(3L), None, 3.0)
    ).toDF("k", "t", "v")
    val got = Resample.dailyCarryForward(obs, "k", "t", Seq("v"))
    assert(got.select(col("k")).distinct().collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("empty observations produce an empty (not failing) grid") {
    val obs = Seq.empty[(Long, Timestamp, Double)].toDF("k", "t", "v")
    assert(Resample.dailyCarryForward(obs, "k", "t", Seq("v")).count() == 0L)
  }
}
