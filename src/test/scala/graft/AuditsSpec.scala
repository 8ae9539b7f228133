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

  test("q205 snapshot drift == driver split recomputation") {
    val evs = Tables.events(spark, TestSpark.sfDir)
      .select("ts", "event_type", "value").collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate,
        r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val ord = Ordering.fromLessThan[java.time.LocalDate](_ isBefore _)
    val d0 = evs.map(_._1).min(ord); val d1 = evs.map(_._1).max(ord)
    val mid = d0.plusDays(java.time.temporal.ChronoUnit.DAYS.between(d0, d1) / 2)
    def cents(v: Double): Long = math.floor(v * 100 + 0.5).toLong
    val exp = evs.groupBy(_._2).toSeq.sortBy(_._1).map { case (t, rs) =>
      val (a, b) = rs.partition(r => !r._1.isAfter(mid))
      val meanA = a.flatMap(_._3).map(cents).sum / a.count(_._3.isDefined)
      val meanB = b.flatMap(_._3).map(cents).sum / b.count(_._3.isDefined)
      (t, a.size.toLong, b.size.toLong,
        a.count(_._3.isEmpty).toLong * 10000 / a.size,
        b.count(_._3.isEmpty).toLong * 10000 / b.size,
        meanA, meanB, meanB - meanA,
        if (math.abs(meanB - meanA) > 500) 1 else 0)
    }
    val got = reports.Audits.snapshotDrift(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getInt(8)))
    assert(got.toSeq == exp)
  }

  test("q210 winsorized stats == driver percentile clip; clipping never " +
      "moves the mean outside the cut bounds") {
    val vals = Tables.events(spark, TestSpark.sfDir)
      .select("event_type", "value").collect()
      .filter(!_.isNullAt(1)).map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val exp = vals.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = sorted.length.toLong
      def cut(k: Int): Long = {
        // smallest vc with cum*100 >= tot*k over the value histogram
        val hist = sorted.groupBy(identity).view.mapValues(_.length.toLong)
          .toSeq.sortBy(_._1)
        var cum = 0L
        hist.collectFirst {
          case (vc, c) if { cum += c; cum * 100 >= n * k } => vc
        }.get
      }
      val (p5, p95) = (cut(5), cut(95))
      val win = sorted.map(v => math.max(math.min(v, p95), p5))
      (t, n, p5, p95, sorted.sum / n, win.sum / n, win.sum / n - sorted.sum / n)
    }
    val got = reports.Audits.winsorizedStats(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == exp)
    got.foreach { case (t, _, p5, p95, _, winMean, _) =>
      assert(winMean >= p5 && winMean <= p95, s"$t winsorized mean outside cuts")
    }
  }

  test("q213 skew audit == driver frequency profile; salt factor is " +
      "ceil(freq/mean)") {
    val freqs = Tables.lineitem(spark, TestSpark.sfDir)
      .groupBy("l_partkey").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nKeys = freqs.length.toLong
    val total = freqs.map(_._2).sum
    val exp = freqs.sortBy { case (k, f) => (-f, k) }.take(10)
      .zipWithIndex.map { case ((k, f), i) =>
        (k, f, f * 10000 / total, f * nKeys * 10000 / total,
          (f * nKeys + total - 1) / total, i + 1)
      }
    val got = reports.Audits.skewAudit(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getInt(5)))
    assert(got.toSeq == exp.toSeq)
    got.foreach { case (_, f, _, _, salt, _) =>
      assert(salt >= 1 && salt <= f, "salt factor out of range")
    }
  }

  test("q214 seasonality == driver trailing-window recomputation") {
    val months = Tables.orders(spark, TestSpark.sfDir)
      .select(org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.col("o_orderdate"), "yyyy-MM").as("m"),
        org.apache.spark.sql.functions.col("o_totalprice"))
      .collect().map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val hist = months.groupBy(_._1).view
      .mapValues(rs => (rs.map(_._2).sum, rs.size.toLong))
      .toSeq.sortBy(_._1)
    val exp = hist.zipWithIndex.map { case ((m, (revC, n)), i) =>
      val win = hist.slice(math.max(0, i - 11), i + 1)
      val winN = win.size.toLong
      val winSum = win.map(_._2._1).sum
      (m, n, revC.toDouble / 100, winN, revC * winN * 10000 / winSum)
    }
    val got = reports.Audits.seasonalityIndex(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp)
  }

  test("q215 contingency == driver recomputation; deviations sum to ~0 " +
      "per row margin") {
    val rows = Tables.orders(spark, TestSpark.sfDir)
      .join(Tables.customer(spark, TestSpark.sfDir),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .select("c_mktsegment", "o_orderstatus").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cell = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rTot = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cTot = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val total = rows.length.toLong
    val exp = cell.toSeq.sortBy(_._1).map { case ((seg, stat), n) =>
      val e = rTot(seg) * cTot(stat) / total
      val dev = n - e
      (seg, stat, n, e, dev, math.signum(dev) * (math.abs(dev) * 10000 / e))
    }
    val got = reports.Audits.contingencyAudit(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == exp)
  }

  test("q217 SLA percentiles == driver histogram walk; p50<=p95<=p99") {
    val ords = Tables.orders(spark, TestSpark.sfDir)
      .select(org.apache.spark.sql.functions.col("o_orderkey"),
        org.apache.spark.sql.functions.col("o_orderdate").cast("date").as("od"),
        org.apache.spark.sql.functions.col("o_orderpriority"))
      .collect().map(r => r.getLong(0) -> (r.getDate(1).toLocalDate, r.getString(2)))
      .toMap
    val lats = Tables.lineitem(spark, TestSpark.sfDir)
      .select(org.apache.spark.sql.functions.col("l_orderkey"),
        org.apache.spark.sql.functions.col("l_shipdate").cast("date").as("sd"))
      .collect().flatMap { r =>
        ords.get(r.getLong(0)).map { case (od, pr) =>
          (pr, java.time.temporal.ChronoUnit.DAYS.between(od,
            r.getDate(1).toLocalDate))
        }
      }
    def walk(sorted: Seq[Long], k: Int): Long = {
      val n = sorted.length.toLong
      var cum = 0L
      sorted.groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
        .collectFirst { case (d, c) if { cum += c; cum * 100 >= n * k } => d }.get
    }
    val exp = lats.groupBy(_._1).toSeq.sortBy(_._1).map { case (pr, rs) =>
      val s = rs.map(_._2).sorted
      (pr, s.length.toLong, walk(s, 50), walk(s, 95), walk(s, 99))
    }
    val got = reports.Audits.slaPercentiles(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp)
    got.foreach { case (pr, _, p50, p95, p99) =>
      assert(p50 <= p95 && p95 <= p99, s"$pr percentiles not monotone")
    }
  }

  test("q219 Gini/Lorenz == driver recomputation on dollar-quantized " +
      "spend; Lorenz curve is monotone, ends at 10000") {
    val spends = Tables.orders(spark, TestSpark.sfDir)
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
      .groupBy(_._1).values.map(_.map(_._2).sum / 100).toSeq.sorted
    val n = spends.length.toLong
    val t = spends.sum
    val sRank = spends.zipWithIndex.map { case (v, i) => v * (i + 1L) }.sum
    val gini = (2 * sRank - (n + 1) * t) * 10000 / (n * t)
    // walk VALUE RUNS (histogram rows), not individuals — a decile
    // boundary inside a run of equal values resolves to the run's end,
    // exactly as the distributed histogram walk does
    val runs = spends.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val pts = runs.scanLeft((0L, 0L)) { case ((cn, cv), (v, c)) =>
      (cn + c, cv + v * c) }.tail
    val expLorenz = (1 to 10).map { k =>
      (k, pts.find(_._1 * 10 >= n * k).get._2 * 10000 / t)
    }
    val got = reports.Audits.revenueConcentration(spark, TestSpark.sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(r => (r._1, r._2)).toSeq == expLorenz)
    got.foreach { case (_, _, nC, g) => assert(nC == n && g == gini) }
    val shares = got.map(_._2)
    assert(shares.toSeq == shares.sorted.toSeq, "Lorenz not monotone")
    assert(shares.last == 10000L, "Lorenz must end at 100%")
  }

  test("q206 pseudonymization: collision-free on this key space and " +
      "referentially consistent (pseudonym join == key join)") {
    val rows = etl.Pseudonymize.pseudonymizeAudit(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val orderCounts = Tables.orders(spark, TestSpark.sfDir)
      .join(Tables.customer(spark, TestSpark.sfDir),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .groupBy("c_mktsegment")
      .count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    rows.foreach { case (seg, nCust, nPseudo, nLinked) =>
      assert(nCust == nPseudo, s"$seg: pseudonym collision")
      assert(nLinked == orderCounts.getOrElse(seg, 0L),
        s"$seg: pseudonym join lost or duplicated orders")
    }
  }

  test("q271 MAD detector: injected spike fires, mad=0 degenerates to any-deviation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // type A: 9 regular days cycling 10/11/12 events (med 11, mad 1) +
    // one 60-event spike day; type B: perfectly constant (mad = 0)
    // except one off-by-two day
    val rows =
      (for (d <- 1 to 9; i <- 0 until (10 + (d - 1) % 3))
        yield ("A", f"2024-02-$d%02d")) ++
      (for (i <- 0 until 60) yield ("A", "2024-02-10")) ++
      (for (d <- 1 to 9; i <- 0 until 5) yield ("B", f"2024-02-$d%02d")) ++
      (for (i <- 0 until 7) yield ("B", "2024-02-10"))
    val events = rows.toDF("event_type", "day")
      .select(col("event_type"), to_timestamp(col("day")).as("ts"))
    val got = graft.reports.Audits.madAnomalyOf(events)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(4), r.getLong(5), r.getInt(7)))).toMap
    // A: counts {10,10,10,11,11,11,12,12,12,60} -> med 11; devs sorted
    // {0,0,0,1,1,1,1,1,1,49} -> mad 1; spike dev 49 passes 1000*49>=4448
    val aSpike = got(("A", "2024-02-10"))
    assert(aSpike._3 === 1, s"spike must flag: $aSpike")
    assert(got(("A", "2024-02-01"))._3 === 0)
    // B: mad = 0 (median dev 0), so ANY deviation flags
    val bOff = got(("B", "2024-02-10"))
    assert(bOff._2 === 0L && bOff._3 === 1, s"mad=0 any-dev must flag: $bOff")
    assert(got(("B", "2024-02-01"))._3 === 0)
  }
}
