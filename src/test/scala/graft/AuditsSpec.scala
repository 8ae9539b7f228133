package graft

import org.scalatest.funsuite.AnyFunSuite

/** q204 sales cube and q211 Benford audit: the distributed results must
  * equal driver-side recomputations from first principles on sf0.001. */
class AuditsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def centsOf(d: Double): Long =
    new java.math.BigDecimal(d).setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  test("q204 cube == union of the four hand-computed grouping sets") {
    val rows = Tables.orders(spark, TestSpark.sfDir)
      .join(Tables.customer(spark, TestSpark.sfDir),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .select("c_mktsegment", "o_orderstatus", "o_totalprice")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    def slice(key: ((String, String, Double)) => (String, String), gSeg: Int,
        gStat: Int) =
      rows.groupBy(key).map { case ((seg, stat), rs) =>
        (seg, stat, gSeg, gStat, rs.size.toLong,
          rs.map(r => centsOf(r._3)).sum / 100.0)
      }
    val exp = (slice(r => (r._1, r._2), 0, 0) ++
      slice(r => (r._1, "ALL"), 0, 1) ++
      slice(r => ("ALL", r._2), 1, 0) ++
      slice(_ => ("ALL", "ALL"), 1, 1)).toSeq
      .sortBy { case (seg, stat, gs, gt, _, _) => (gs, gt, seg, stat) }
    val got = reports.Audits.salesCube(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getInt(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == exp)
  }

  test("q211 Benford: counts match a driver recount and the expected-share " +
      "constants are the floor-quantized log10 values") {
    val totals = Tables.orders(spark, TestSpark.sfDir)
      .select("o_totalprice").collect().map(_.getDouble(0))
    val byDigit = totals.map(t => centsOf(t).toString.head.asDigit)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = totals.length.toLong
    val expBp = (1 to 9).map(d =>
      d -> math.floor(math.log10(1.0 + 1.0 / d) * 10000).toLong).toMap
    val got = reports.Audits.benfordAudit(spark, TestSpark.sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
    got.foreach { case (digit, cnt, obsBp, eBp, devBp) =>
      assert(cnt == byDigit(digit), s"digit $digit count")
      assert(obsBp == cnt * 10000 / n, s"digit $digit obs_bp")
      assert(eBp == expBp(digit), s"digit $digit exp_bp literal drifted " +
        s"from floor(log10(1+1/d)*1e4)")
      assert(devBp == obsBp - eBp)
    }
    assert(got.map(_._2).sum == n, "every order carries exactly one digit")
  }
}
