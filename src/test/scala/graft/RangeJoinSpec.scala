package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed range join equals the naive inequality join, across bucket
  * widths (intervals spanning one, several, and partial buckets) and
  * inclusive boundaries. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val points = Seq(
    (1L, ts("2024-01-01 10:00:00")),
    (2L, ts("2024-01-01 10:05:00")),
    (3L, ts("2024-01-01 10:10:00")), // exactly on an interval end
    (4L, ts("2024-01-01 11:59:59")),
    (5L, ts("2024-01-02 00:00:00")))

  private val intervals = Seq(
    (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")), // inclusive both ends
    (101L, ts("2024-01-01 09:30:00"), ts("2024-01-01 12:30:00")), // spans many buckets
    (102L, ts("2024-01-01 23:59:00"), ts("2024-01-02 00:01:00")), // crosses midnight
    (103L, ts("2024-03-01 00:00:00"), ts("2024-03-01 01:00:00"))) // matches nothing

  test("bucketed equals naive for several bucket widths") {
    val l = points.toDF("pid", "pts")
    val r = intervals.toDF("iid", "istart", "iend")
    val naive = l.join(r, col("pts") >= col("istart") && col("pts") <= col("iend"))
      .select(col("pid"), col("iid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(naive.nonEmpty)
    for (bucketMs <- Seq(1000L, 60000L, 600000L, 3600000L, 86400000L)) {
      val bucketed = RangeJoin.pointInInterval(
          l, col("pts"), r, col("istart"), col("iend"), bucketMs)
        .select(col("pid"), col("iid"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(bucketed == naive, s"bucketMs=$bucketMs")
    }
  }

  test("no duplicate pairs even when an interval covers many buckets") {
    val l = points.toDF("pid", "pts")
    val r = intervals.toDF("iid", "istart", "iend")
    val rows = RangeJoin.pointInInterval(
        l, col("pts"), r, col("istart"), col("iend"), bucketMs = 1000L)
      .select(col("pid"), col("iid")).collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(rows.length == rows.toSet.size)
  }

  test("reversed and null-bounded intervals match nothing instead of throwing") {
    val l = points.toDF("pid", "pts")
    val dirty = Seq(
      (200L, Some(ts("2024-01-01 12:00:00")), Some(ts("2024-01-01 09:00:00"))), // reversed
      (201L, None, Some(ts("2024-01-01 12:00:00"))), // null start
      (202L, Some(ts("2024-01-01 10:00:00")), None), // null end
      (203L, Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 10:10:00")))) // clean
      .toDF("iid", "istart", "iend")
    val naive = l.join(dirty,
        col("pts") >= col("istart") && col("pts") <= col("iend"))
      .select(col("pid"), col("iid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val bucketed = RangeJoin.pointInInterval(
        l, col("pts"), dirty, col("istart"), col("iend"), bucketMs = 60000L)
      .select(col("pid"), col("iid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(bucketed == naive)
    assert(bucketed.forall(_._2 == 203L)) // only the clean interval matches
  }

  private val aIntervals = Seq(
    (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
    (2L, ts("2024-01-01 10:10:00"), ts("2024-01-01 10:20:00")), // touches 1 at a point
    (3L, ts("2024-01-01 09:00:00"), ts("2024-01-01 12:00:00")), // long, covers several
    (4L, ts("2024-01-05 00:00:00"), ts("2024-01-05 00:01:00"))) // overlaps nothing in b

  private val bIntervals = Seq(
    (10L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:15:00")), // overlaps 1,2,3
    (11L, ts("2024-01-01 10:10:00"), ts("2024-01-01 10:10:00")), // degenerate point
    (12L, ts("2024-01-01 08:00:00"), ts("2024-01-01 09:00:00")), // touches 3's start
    (13L, ts("2024-02-01 00:00:00"), ts("2024-02-01 01:00:00"))) // overlaps nothing

  test("interval overlap equals the naive inequality join across bucket widths") {
    val a = aIntervals.toDF("aid", "as", "ae")
    val b = bIntervals.toDF("bid", "bs", "be")
    val naive = a.join(b, col("as") <= col("be") && col("bs") <= col("ae"))
      .select(col("aid"), col("bid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(naive.nonEmpty && naive.contains((1L, 11L)) && naive.contains((3L, 12L)))
    for (bucketMs <- Seq(1000L, 60000L, 600000L, 3600000L, 86400000L)) {
      val rows = RangeJoin.intervalOverlap(
          a, col("as"), col("ae"), b, col("bs"), col("be"), bucketMs)
        .select(col("aid"), col("bid"))
        .collect().map(x => (x.getLong(0), x.getLong(1)))
      assert(rows.length == rows.toSet.size, s"duplicate pairs at bucketMs=$bucketMs")
      assert(rows.toSet == naive, s"bucketMs=$bucketMs")
    }
  }

  test("interval overlap: malformed intervals match nothing; wide intervals take a coarse tier") {
    // reversed a-interval WOULD satisfy the raw inequality predicate
    // against a containing b-interval — the operator's well-formedness
    // contract must exclude it on either side
    val a = Seq(
      (1L, Some(ts("2024-01-01 10:05:00")), Some(ts("2024-01-01 10:00:00"))), // reversed
      (2L, None, Some(ts("2024-01-01 10:00:00"))), // null start
      (3L, Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 10:10:00"))), // clean
      (4L, Some(ts("2020-01-01 00:00:00")), Some(ts("9999-12-31 00:00:00")))) // wide sentinel
      .toDF("aid", "as", "ae")
    val b = Seq(
      (10L, Some(ts("2024-01-01 09:00:00")), Some(ts("2024-01-01 11:00:00"))), // clean
      (11L, Some(ts("2024-01-01 11:00:00")), Some(ts("2024-01-01 10:00:00"))), // reversed
      (12L, Some(ts("2019-01-01 00:00:00")), Some(ts("9999-12-31 00:00:00")))) // wide sentinel
      .toDF("bid", "bs", "be")
    val rows = RangeJoin.intervalOverlap(
        a, col("as"), col("ae"), b, col("bs"), col("be"),
        bucketMs = 3600000L) // sentinels span ~70M hourly buckets: must not explode
      .select(col("aid"), col("bid"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(rows.length == rows.toSet.size)
    // clean×clean, clean×wide, wide×clean, wide×wide — and nothing malformed
    assert(rows.toSet == Set((3L, 10L), (3L, 12L), (4L, 10L), (4L, 12L)))
  }

  test("open-ended sentinel interval (SCD-2) joins via a coarse tier, not explosion") {
    val l = points.toDF("pid", "pts")
    // end = 9999-12-31: ~70M hourly buckets; must NOT be exploded finely
    val scd2 = Seq(
      (300L, ts("2024-01-01 00:00:00"), ts("9999-12-31 00:00:00")),
      (301L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")))
      .toDF("iid", "istart", "iend")
    val naive = l.join(scd2,
        col("pts") >= col("istart") && col("pts") <= col("iend"))
      .select(col("pid"), col("iid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val bucketed = RangeJoin.pointInInterval(
        l, col("pts"), scd2, col("istart"), col("iend"), bucketMs = 3600000L)
      .select(col("pid"), col("iid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(bucketed == naive)
    assert(naive.count(_._2 == 300L) == points.size) // sentinel matches all
  }

  test("declared-width fast path: equal to the probed path on compliant " +
      "rows, over-wide rows match nothing (the streaming contract), and " +
      "the plan has no probe aggregate") {
    val l = points.toDF("pid", "pts")
    // max interval width 3h: intervals 100/102/103 comply; 101 (3h) is
    // exactly at the bound (inclusive); a 4h violator is filtered
    val r = (intervals :+
        (104L, ts("2024-01-01 08:00:00"), ts("2024-01-01 12:00:00")))
      .toDF("iid", "istart", "iend")
    val declared = RangeJoin.pointInInterval(
        l, col("pts"), r, col("istart"), col("iend"),
        bucketMs = 3600000L, maxIntervalWidthMs = Some(3L * 3600000L))
    // no second scan: the static path plans NO aggregate (probed plans one)
    assert(!declared.queryExecution.executedPlan.toString.contains("collect_set"),
      declared.queryExecution.executedPlan.toString)
    val got = declared.select(col("pid"), col("iid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val naiveCompliant = l.join(r,
        col("pts") >= col("istart") && col("pts") <= col("iend") &&
          unix_millis(col("iend")) - unix_millis(col("istart")) <= 3L * 3600000L)
      .select(col("pid"), col("iid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == naiveCompliant)
    assert(!got.exists(_._2 == 104L)) // the violator matched nothing
    assert(got.exists(_._2 == 101L)) // at-the-bound row still matches

    // interval overlap: declared widths == probed result on compliant rows
    val aa = intervals.toDF("aid", "as", "ae")
    val bb = intervals.map { case (i, s, e) => (i + 1000, s, e) }
      .toDF("bid", "bs", "be")
    val fast = RangeJoin.intervalOverlap(
        aa, col("as"), col("ae"), bb, col("bs"), col("be"),
        bucketMs = 600000L,
        maxAWidthMs = Some(3L * 3600000L), maxBWidthMs = Some(3L * 3600000L))
      .select(col("aid"), col("bid"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val probed = RangeJoin.intervalOverlap(
        aa, col("as"), col("ae"), bb, col("bs"), col("be"),
        bucketMs = 600000L)
      .select(col("aid"), col("bid"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(fast.length == fast.toSet.size) // structural dedup held
    assert(fast.toSet == probed.toSet) // all fixtures comply → identical
    assert(fast.nonEmpty)
  }

  test("no nested-loop or cartesian appears for ANY interval width (PlanAudit-clean)") {
    val l = points.toDF("pid", "pts")
    val mixed = Seq(
      (300L, ts("2024-01-01 00:00:00"), ts("9999-12-31 00:00:00")), // sentinel
      (301L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")))
      .toDF("iid", "istart", "iend")
    val p2i = RangeJoin.pointInInterval(
      l, col("pts"), mixed, col("istart"), col("iend"), bucketMs = 3600000L)
    assert(graft.plans.PlanAudit.findings(p2i).isEmpty,
      graft.plans.PlanAudit.findings(p2i).toString)
    val a = mixed.toDF("aid", "as", "ae")
    val ovl = RangeJoin.intervalOverlap(
      a, col("as"), col("ae"),
      mixed, col("istart"), col("iend"), bucketMs = 3600000L)
    assert(graft.plans.PlanAudit.findings(ovl).isEmpty,
      graft.plans.PlanAudit.findings(ovl).toString)
  }
}
