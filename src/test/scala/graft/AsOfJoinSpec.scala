package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** As-of join semantics: most recent right row with rightTs <= leftTs per
  * key; ties attach; no prior right row → null. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("attaches latest prior value, ties included, null before any right row") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (2L, 100L, ts("2024-01-01 12:00:00")),
      (3L, 100L, ts("2024-01-01 09:00:00")),  // before any right row
      (4L, 200L, ts("2024-01-01 11:00:00"))   // tie with right at 11:00
    ).toDF("id", "k", "t")
    val right = Seq(
      (100L, ts("2024-01-01 09:30:00"), 1.0),
      (100L, ts("2024-01-01 11:30:00"), 2.0),
      (200L, ts("2024-01-01 11:00:00"), 9.0)
    ).toDF("k", "rt", "v")
    val got = AsOfJoin.asOf(left, right, "k", "t", "rt", valueCols = Seq("v"))
      .select(col("id"), col("asof_rt"), col("asof_v"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)).map(_.toString), Option(r.get(2)))).toMap
    assert(got(1L) == (Some("2024-01-01 09:30:00.0"), Some(1.0))) // latest <= 10:00
    assert(got(2L) == (Some("2024-01-01 11:30:00.0"), Some(2.0))) // latest <= 12:00
    assert(got(3L) == (None, None))                               // nothing prior
    assert(got(4L) == (Some("2024-01-01 11:00:00.0"), Some(9.0))) // tie matches
  }

  test("keys never cross partitions") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq((2L, ts("2024-01-01 09:00:00"), 5.0)).toDF("k", "rt", "v")
    val got = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("v")).head()
    assert(got.isNullAt(got.fieldIndex("asof_v"))) // different key → no match
  }
}
