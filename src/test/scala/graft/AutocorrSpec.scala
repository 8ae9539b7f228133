package graft

import org.scalatest.funsuite.AnyFunSuite

/** Daily-series autocorrelation (q193): the join-based Pearson must
  * equal a driver recomputation over exact integer moments. */
class AutocorrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q193 == driver Pearson at sf0.001") {
    val days = Tables.events(spark, TestSpark.sfDir)
      .select("ts").collect()
      .map(_.getTimestamp(0).toInstant
        .atZone(java.time.ZoneOffset.UTC).toLocalDate)
    val daily = days.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def acf(lag: Int): (Long, Double) = {
      val ps = daily.keys.toSeq
        .flatMap(d => daily.get(d.minusDays(lag)).map(y => (daily(d), y)))
      val n = ps.size.toLong
      val sx = ps.map(_._1).sum; val sy = ps.map(_._2).sum
      val sxy = ps.map(p => p._1 * p._2).sum
      val sxx = ps.map(p => p._1 * p._1).sum
      val syy = ps.map(p => p._2 * p._2).sum
      val r = (n * sxy - sx * sy).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
      (n, BigDecimal(r).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val exp = Seq(1, 7).map(l => { val (n, r) = acf(l); (l, n, r) })
    val got = streaming.EventQueries.dailyAutocorr(spark, TestSpark.sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == exp)
  }
}
