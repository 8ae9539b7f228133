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

  private def left4 = Seq(
    (1L, 100L, ts("2024-01-01 10:00:00")),
    (2L, 100L, ts("2024-01-01 12:00:00")),
    (3L, 100L, ts("2024-01-01 09:00:00")),
    (4L, 200L, ts("2024-01-01 11:00:00"))
  ).toDF("id", "k", "t")
  private def right3 = Seq(
    (100L, ts("2024-01-01 09:30:00"), 1.0),
    (100L, ts("2024-01-01 11:30:00"), 2.0),
    (200L, ts("2024-01-01 11:00:00"), 9.0)
  ).toDF("k", "rt", "v")

  private def runDir(direction: String, tolMs: Option[Long] = None) =
    AsOfJoin.asOf(left4, right3, "k", "t", "rt", Seq("v"), direction, tolMs)
      .select(col("id"), col("asof_v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

  test("forward: earliest right with rt >= t, ties included") {
    val got = runDir("forward")
    assert(got(1L) == Some(2.0)) // next at 11:30
    assert(got(2L) == None)      // nothing after 12:00
    assert(got(3L) == Some(1.0)) // next at 09:30
    assert(got(4L) == Some(9.0)) // tie matches forward too
  }

  test("nearest: closer of the two directions, tie prefers backward") {
    val got = runDir("nearest")
    assert(got(1L) == Some(1.0)) // 30min back vs 90min forward
    assert(got(2L) == Some(2.0)) // only backward exists
    assert(got(3L) == Some(1.0)) // only forward exists
    assert(got(4L) == Some(9.0)) // exact tie (gap 0 both ways) → backward value
  }

  test("tolerance nulls out matches farther than the bound") {
    val gotB = runDir("backward", Some(45L * 60 * 1000)) // 45 min
    assert(gotB(1L) == Some(1.0)) // 30 min back: within
    assert(gotB(2L) == Some(2.0)) // 30 min back: within
    assert(gotB(3L) == None)
    val gotTight = runDir("nearest", Some(10L * 60 * 1000)) // 10 min
    assert(gotTight(1L) == None)  // 30 min both ways: out of tolerance
    assert(gotTight(4L) == Some(9.0)) // gap 0
  }

  test("a genuinely NULL right value stays NULL (no back-fill from an older row)") {
    val left = Seq((1L, 100L, ts("2024-01-01 10:30:00"))).toDF("id", "k", "t")
    val right = Seq(
      (100L, ts("2024-01-01 09:00:00"), Some(5.0)),
      (100L, ts("2024-01-01 10:00:00"), None) // the matched row; v is NULL
    ).toDF("k", "rt", "v")
    val got = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("v"),
      "backward", toleranceMs = Some(45L * 60 * 1000)).head()
    assert(got.getTimestamp(got.fieldIndex("asof_rt")).toString
      == "2024-01-01 10:00:00.0") // matched the 10:00 row (in tolerance)...
    assert(got.isNullAt(got.fieldIndex("asof_v"))) // ...whose value IS null
  }

  test("duplicate right timestamps resolve deterministically (struct order)") {
    val left = Seq((1L, 100L, ts("2024-01-01 11:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (100L, ts("2024-01-01 10:00:00"), 1.0),
      (100L, ts("2024-01-01 10:00:00"), 2.0)).toDF("k", "rt", "v")
    val vs = (1 to 3).map { _ =>
      val r = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("v")).head()
      r.getDouble(r.fieldIndex("asof_v"))
    }
    assert(vs.distinct.size == 1)
    assert(vs.head == 2.0) // largest struct under (rt, v) order wins
  }

  test("keys never cross partitions") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq((2L, ts("2024-01-01 09:00:00"), 5.0)).toDF("k", "rt", "v")
    val got = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("v")).head()
    assert(got.isNullAt(got.fieldIndex("asof_v"))) // different key → no match
  }
}
