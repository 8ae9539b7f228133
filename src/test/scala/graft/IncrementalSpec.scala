package graft

import graft.etl.Incremental
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental snapshot+delta aggregation (etl.Incremental): the
  * high-water-mark slices partition the history exactly, and any fold
  * grouping produces the identical snapshot to a full recompute. */
class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val events = Tables.events(spark, TestSpark.sfDir)
    .filter(col("ts").isNotNull)

  test("hwm slices partition the history exactly (no loss, no double-count)") {
    // final mark = the exact history high-water mark (getTime truncates
    // the micros component, so a millis-derived bound drops the max row)
    val (first, end) = Incremental.timeBounds(events, "ts").get
    val (lo, hi) = (first.getTime, end.getTime)
    val marks = (1 until 3).map(i =>
      new java.sql.Timestamp(lo + (hi - lo) * i / 3)) :+ end
    var hwm: Option[java.sql.Timestamp] = None
    var total = 0L
    marks.foreach { m =>
      total += Incremental.deltaSlice(events, "ts", hwm, m).count()
      hwm = Some(m)
    }
    assert(total == events.count())
  }

  test("daily folds == weekly folds == full recompute, value-identical") {
    def fold(slices: Int): Seq[(String, Long, java.math.BigDecimal)] = {
      val (first, end) = Incremental.timeBounds(events, "ts").get
      val lo = first.getTime
      val marks = (1 until slices).map(i =>
        new java.sql.Timestamp(lo + (end.getTime - lo) * i / slices)) :+ end
      var snap: Option[org.apache.spark.sql.DataFrame] = None
      var hwm: Option[java.sql.Timestamp] = None
      marks.foreach { m =>
        val agg = Incremental.aggregateDelta(
          Incremental.deltaSlice(events, "ts", hwm, m), Seq("event_type"), "value")
        snap = Some(snap.fold(agg)(p => Incremental.merge(p, agg, Seq("event_type"))))
        hwm = Some(m)
      }
      snap.get.orderBy("event_type").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSeq
    }
    val full = fold(1)
    assert(fold(5) == full)
    assert(fold(13) == full)
    assert(full.nonEmpty)
  }
}
