package graft

import org.scalatest.funsuite.AnyFunSuite

/** RFM segmentation (q191): the distributed quartile-cut scoring must
  * equal a driver-side recomputation of the same cut rule, and tied
  * metric values must always share a score (the reason cuts are used
  * instead of NTILE). */
class RfmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cuts(vs: Seq[Long]): (Long, Long, Long) = {
    val n = vs.size.toLong
    val hist = vs.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val cum = hist.scanLeft((0L, 0L)) { case ((_, c), (v, k)) => (v, c + k) }
      .drop(1)
    def cut(mul: Long, target: Long): Long =
      cum.collectFirst { case (v, c) if c * mul >= target => v }.get
    (cut(4, n), cut(2, n), cut(4, 3 * n))
  }

  private def score(x: Long, c: (Long, Long, Long)): Int =
    1 + (if (x > c._1) 1 else 0) + (if (x > c._2) 1 else 0) +
      (if (x > c._3) 1 else 0)

  test("q191 == driver recomputation at sf0.001") {
    val rows = Tables.orders(spark, TestSpark.sfDir)
      .select("o_custkey", "o_orderdate", "o_totalprice").collect()
    // o_orderdate surfaces as TimestampNTZ (LocalDateTime) or Timestamp
    // depending on the parquet writer; normalize to a UTC LocalDate
    def utcDay(v: Any): java.time.LocalDate = v match {
      case t: java.sql.Timestamp =>
        t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate
      case d: java.time.LocalDateTime => d.toLocalDate
    }
    implicit val dayOrd: Ordering[java.time.LocalDate] =
      Ordering.by(_.toEpochDay)
    val refDay = rows.map(r => utcDay(r.get(1))).max
    val perCust = rows.groupBy(_.getLong(0)).map { case (ck, rs) =>
      val last = rs.map(r => utcDay(r.get(1))).max
      val rec: Long = java.time.temporal.ChronoUnit.DAYS.between(last, refDay)
      val freq = rs.size.toLong
      val cents = rs.map(r => BigDecimal(r.getDouble(2))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum * 100
      (ck, rec, freq, cents.toLongExact, cents / 100)
    }.toSeq
    val rc = cuts(perCust.map(_._2))
    val fc = cuts(perCust.map(_._3))
    val mc = cuts(perCust.map(_._4))
    val scored = perCust.map { case (ck, rec, freq, cents, mon) =>
      val r = 5 - score(rec, rc)
      val f = score(freq, fc)
      val m = score(cents, mc)
      val seg =
        if (r >= 4 && f >= 4 && m >= 4) "champion"
        else if (r >= 3 && f >= 3) "loyal"
        else if (r >= 4 && f <= 2) "new"
        else if (r <= 2 && f >= 3) "at_risk"
        else "regular"
      ((seg, r, f, m), mon)
    }
    val exp = scored.groupBy(_._1).map { case ((seg, r, f, m), xs) =>
      val n = xs.size.toLong
      val avg = BigDecimal((xs.map(_._2).sum.toDouble / n))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (seg, r, f, m, n, avg)
    }.toSeq.sortBy(t => (t._1, t._2, t._3, t._4))
    val got = reports.Reports.rfmSegments(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == exp)
  }

  test("tied metric values always share a quartile score") {
    val scored = reports.Reports.rfmSegments(spark, TestSpark.sfDir)
    // indirect check on the cut rule itself: a synthetic frame where one
    // value holds 60% of mass must put every tied row in one bucket
    val vs = Seq.fill(60)(10L) ++ (1L to 40L)
    val c = cuts(vs)
    val ss = vs.map(score(_, c))
    assert(vs.zip(ss).groupBy(_._1).values.forall(_.map(_._2).distinct.size == 1))
    assert(scored.count() > 0)
  }
}
