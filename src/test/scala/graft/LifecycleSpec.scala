package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle analytics (q202/q203/q212): distributed results must equal
  * driver-side recomputations from first principles on sf0.001. */
class LifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** (user, sorted in-session event seq) via the 30-min gap rule —
    * shared by the Markov and concurrency replays. */
  private def driverSessions(): Seq[Seq[(Long, java.sql.Timestamp, String)]] = {
    val evs = Tables.events(spark, TestSpark.sfDir)
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
    evs.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._3.getTime, r._2))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer[(Long, java.sql.Timestamp, String)]())
      var prev: Option[Long] = None
      sorted.foreach { case (_, eid, ts, et) =>
        if (prev.exists(p => ts.getTime - p > 1800000L))
          sessions += scala.collection.mutable.ArrayBuffer()
        sessions.last += ((eid, ts, et))
        prev = Some(ts.getTime)
      }
      sessions.map(_.toSeq)
    }.toSeq
  }

  test("q202 life table == driver recomputation") {
    // o_orderdate is TimestampNTZ in some data drops — collect as DATE
    val byCust = Tables.orders(spark, TestSpark.sfDir)
      .select(org.apache.spark.sql.functions.col("o_custkey"),
        org.apache.spark.sql.functions.col("o_orderdate").cast("date").as("d"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate)).groupBy(_._1)
    val dayOrd = Ordering.fromLessThan[java.time.LocalDate](_ isBefore _)
    val lifetimes = byCust.values.map { os =>
      val days = os.map(_._2)
      java.time.temporal.ChronoUnit.DAYS.between(days.min(dayOrd),
        days.max(dayOrd)) / 30
    }.toSeq
    val hist = lifetimes.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val exp = hist.zipWithIndex.map { case ((k, ended), i) =>
      val atRisk = hist.drop(i).map(_._2).sum
      (k.toInt, ended, atRisk, ended * 10000 / atRisk)
    }
    val got = streaming.Lifecycle.churnLifeTable(spark, TestSpark.sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp)
  }

  test("q203 Markov transitions == driver replay; probabilities are exact " +
      "integer basis points") {
    val trans = driverSessions().flatMap(sess =>
      sess.map(_._3).sliding(2).collect { case Seq(a, b) => (a, b) })
    val cnt = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowTot = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val colTot = trans.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tot = trans.size.toLong
    val exp = cnt.toSeq.map { case ((a, b), c) =>
      val p = c * 10000 / rowTot(a); val base = colTot(b) * 10000 / tot
      (a, b, c, p, base, p - base)
    }.sortBy { case (a, b, c, _, _, _) => (-c, a, b) }.take(25)
      .zipWithIndex.map { case ((a, b, c, p, bs, d), i) => (a, b, c, p, bs, d, i + 1) }
    val got = streaming.Lifecycle.markovTransitions(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6)))
    assert(got.toSeq == exp)
  }

  test("q218 A/B report == driver recomputation; z2 matches the " +
      "two-proportion formula on exact counts") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val users = Tables.events(spark, TestSpark.sfDir)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (u, rs) =>
        (u, if (rs.exists(_._2 == "purchase")) 1L else 0L,
          if ("02468ace".contains(md5hex(u.toString).last)) 1 else 0)
      }.toSeq
    val (aArm, bArm) = users.partition(_._3 == 1)
    val (na, ca) = (aArm.size.toLong, aArm.map(_._2).sum)
    val (nb, cb) = (bArm.size.toLong, bArm.map(_._2).sum)
    val d = (ca * nb - cb * na).toDouble
    val c = ca + cb; val nn = na + nb
    val z2 = if (c == 0 || c == nn) 0.0
    else BigDecimal(d * d * nn.toDouble /
      (na.toDouble * nb.toDouble * c.toDouble * (nn - c).toDouble))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = streaming.Lifecycle.abTestReport(spark, TestSpark.sfDir)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((na, ca, nb, cb)))
    assert(r.getLong(4) == ca * 10000 / na)
    assert(r.getLong(5) == cb * 10000 / nb)
    assert(r.getLong(6) == ca * 10000 / na - cb * 10000 / nb)
    assert(math.abs(r.getDouble(7) - z2) < 1e-9)
    assert(r.getInt(8) == (if (z2 > 3.8416) 1 else 0))
  }

  test("q223 conversion latency == driver replay of first-signup/" +
      "first-purchase gaps") {
    val evs = Tables.events(spark, TestSpark.sfDir)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    val perUser = evs.groupBy(_._1).values.flatMap { rs =>
      val sMin = rs.filter(_._2 == "signup").map(_._3).minOption
      val pMin = rs.filter(_._2 == "purchase").map(_._3).minOption
      sMin.map(s => (pMin.filter(_ >= s).map(p => (p - s) / 3600000L)))
    }.toSeq
    val nSignup = perUser.size.toLong
    val lats = perUser.flatten
    val nConv = lats.size.toLong
    def walk(k: Int): Long = {
      val hist = lats.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      var cum = 0L
      hist.collectFirst {
        case (h, c) if { cum += c; cum * 100 >= nConv * k } => h
      }.get
    }
    val r = streaming.Lifecycle.conversionLatency(spark, TestSpark.sfDir)
      .collect().head
    assert(r.getLong(0) == nSignup)
    assert(r.getLong(1) == nConv)
    assert(r.getLong(2) == nConv * 10000 / nSignup)
    assert(r.getLong(3) == walk(50))
    assert(r.getLong(4) == walk(90))
  }

  test("q225 stickiness == driver DAU/MAU; ratio bounded by (1/days, 1)") {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
      .withZone(java.time.ZoneOffset.UTC)
    val ud = Tables.events(spark, TestSpark.sfDir)
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0),
        fmt.format(java.time.Instant.ofEpochMilli(r.getTimestamp(1).getTime))))
      .distinct
    val exp = ud.groupBy(_._2.take(7)).toSeq.sortBy(_._1).map { case (m, rs) =>
      val dauByDay = rs.groupBy(_._2).view.mapValues(_.size.toLong)
      val nDays = dauByDay.size.toLong
      val sumDau = dauByDay.values.sum
      val mau = rs.map(_._1).distinct.size.toLong
      (m, nDays, sumDau, mau, sumDau * 10000 / (nDays * mau))
    }
    val got = streaming.Lifecycle.stickiness(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp)
    got.foreach { case (m, nDays, _, _, st) =>
      assert(st >= 10000 / nDays && st <= 10000, s"$m stickiness out of bounds")
    }
  }

  test("q229 windowed funnel == driver replay; stage counts are " +
      "monotone non-increasing") {
    val evs = Tables.events(spark, TestSpark.sfDir)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime * 1000))
    val h24 = 24L * 3600 * 1000000; val d7 = 7L * 24 * 3600 * 1000000
    var (s1, s2, s3) = (0L, 0L, 0L)
    evs.groupBy(_._1).values.foreach { rs =>
      val vMin = rs.filter(_._2 == "view").map(_._3).minOption
      val cMin = vMin.flatMap(v => rs.filter(r => r._2 == "click" &&
        r._3 >= v && r._3 <= v + h24).map(_._3).minOption)
      val pMin = cMin.flatMap(c => rs.filter(r => r._2 == "purchase" &&
        r._3 >= c && r._3 <= c + d7).map(_._3).minOption)
      if (vMin.isDefined) s1 += 1
      if (cMin.isDefined) s2 += 1
      if (pMin.isDefined) s3 += 1
    }
    val r = streaming.Lifecycle.windowedFunnel(spark, TestSpark.sfDir)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((s1, s2, s3)))
    assert(s1 >= s2 && s2 >= s3, "funnel stages must narrow")
    assert(r.getLong(3) == s2 * 10000 / s1)
  }

  test("q230 snapshot diff: statuses partition the union of both " +
      "as-of views; transitions only on 'changed'") {
    val rows = streaming.Lifecycle.snapshotDiff(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (status, transition, n) =>
      assert(n > 0)
      if (status == "changed") assert(transition.contains("->"))
      else assert(transition == "-", s"$status carries a transition")
    }
    // every user alive at t1 is alive at t2 in this SCD (no deletes):
    // 'removed' cannot occur
    assert(!rows.exists(_._1 == "removed"))
  }

  test("q232 cohort LTV == driver cumulative replay; curve is monotone " +
      "per cohort") {
    val evs = Tables.events(spark, TestSpark.sfDir)
      .select("user_id", "event_type", "value", "ts").collect()
      .map { r =>
        val t = r.getTimestamp(3).toLocalDateTime
        (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) 0.0 else r.getDouble(2),
          t.getYear * 12L + t.getMonthValue - 1)
      }
    val cohort = evs.groupBy(_._1).view.mapValues(_.map(_._4).min).toMap
    val sizes = cohort.values.groupBy(identity).view.mapValues(_.size.toLong)
    val grid = evs.filter(_._2 == "purchase")
      .map(e => ((cohort(e._1), e._4 - cohort(e._1)),
        math.floor(e._3 * 100 + 0.5).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case ((c, a), _) => (c, a) }
    val exp = grid.groupBy(_._1._1).toSeq.flatMap { case (c, rs) =>
      var cum = 0L
      rs.sortBy(_._1._2).map { case ((_, a), rev) =>
        cum += rev
        (c, a, sizes(c), cum / 100.0, cum / sizes(c))
      }
    }.sortBy(r => (r._1, r._2))
    val got = streaming.Lifecycle.cohortLtv(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(got.toSeq == exp)
    got.groupBy(_._1).values.foreach { rs =>
      val cums = rs.sortBy(_._2).map(_._4).toSeq
      assert(cums == cums.sorted, "LTV curve must be monotone")
    }
  }

  test("q233 activity streaks == driver islands-and-gaps replay") {
    val ud = Tables.events(spark, TestSpark.sfDir)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("ts").cast("date").as("d"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate)).distinct
    val streaks = ud.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val days = rs.map(_._2).sortBy(_.toEpochDay)
      val runs = scala.collection.mutable.ArrayBuffer[(java.time.LocalDate, Long)]()
      days.foreach { d =>
        if (runs.nonEmpty &&
          runs.last._1.plusDays(runs.last._2).isEqual(d))
          runs(runs.size - 1) = (runs.last._1, runs.last._2 + 1)
        else runs += ((d, 1L))
      }
      runs.map { case (start, len) => (u, start.toString, len) }
    }
    val exp = streaks.sortBy { case (u, s, l) => (-l, u, s) }.take(15)
      .zipWithIndex.map { case ((u, s, l), i) => (u, s, l, i + 1) }
    val got = streaming.Lifecycle.activityStreaks(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3)))
    assert(got.toSeq == exp)
  }

  test("q235 rolling median == driver trailing-7-day histogram merge; " +
      "exact p50 definition holds") {
    val evs = Tables.events(spark, TestSpark.sfDir)
      .select(org.apache.spark.sql.functions.col("ts").cast("date").as("d"),
        org.apache.spark.sql.functions.col("value"))
      .collect().filter(!_.isNullAt(1))
      .map(r => (r.getDate(0).toLocalDate,
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val days = evs.map(_._1).distinct
    val exp = days.sortBy(_.toEpochDay).map { d =>
      val win = evs.filter { case (ed, _) =>
        !ed.isAfter(d) && !ed.isBefore(d.minusDays(6)) }.map(_._2).sorted
      val n = win.length.toLong
      // smallest vc with cum*2 >= tot over the merged histogram
      var cum = 0L
      val p50 = win.groupBy(identity).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1).collectFirst {
          case (vc, c) if { cum += c; cum * 2 >= n } => vc
        }.get
      (d.toString, n, p50)
    }
    val got = streaming.Lifecycle.rollingMedian(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == exp.toSeq)
  }

  test("q237 dashboard fields equal their component queries' own outputs") {
    val dash = streaming.Lifecycle.eventDashboard(spark, TestSpark.sfDir)
      .collect().head
    val funnel = streaming.Lifecycle.windowedFunnel(spark, TestSpark.sfDir)
      .collect().head
    val conv = streaming.Lifecycle.conversionLatency(spark, TestSpark.sfDir)
      .collect().head
    val stick = streaming.Lifecycle.stickiness(spark, TestSpark.sfDir)
      .orderBy(org.apache.spark.sql.functions.col("month").desc)
      .collect().head
    val trend = reports.Audits.dailyTrend(spark, TestSpark.sfDir)
      .collect().head
    val ab = streaming.Lifecycle.abTestReport(spark, TestSpark.sfDir)
      .collect().head
    assert(dash.getLong(0) == funnel.getLong(3))
    assert(dash.getLong(1) == funnel.getLong(4))
    assert(dash.getLong(2) == conv.getLong(2))
    assert(dash.getLong(3) == conv.getLong(3))
    assert(dash.getLong(4) == stick.getLong(4))
    assert(dash.getLong(5) == trend.getLong(2))
    assert(dash.getLong(6) == ab.getLong(6))
    assert(dash.getInt(7) == ab.getInt(8))
  }

  test("q212 peak concurrency == driver minute-coverage sweep") {
    val minutes = driverSessions().flatMap { sess =>
      val ms = sess.map(_._2.getTime / 60000L)
      (ms.min to ms.max)
    }
    val conc = minutes.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fmtDay = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
      .withZone(java.time.ZoneOffset.UTC)
    val fmtMin = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm")
      .withZone(java.time.ZoneOffset.UTC)
    val exp = conc.toSeq
      .map { case (m, c) =>
        (fmtDay.format(java.time.Instant.ofEpochMilli(m * 60000L)), m, c) }
      .groupBy(_._1).view.mapValues(_.minBy { case (_, m, c) => (-c, m) })
      .values.toSeq.sortBy(_._1)
      .map { case (day, m, c) =>
        (day, c, fmtMin.format(java.time.Instant.ofEpochMilli(m * 60000L))) }
    val got = streaming.Lifecycle.sessionConcurrency(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == exp)
  }

  test("HAND-COMPUTED fixture row (verdict r18 task 5): the q237 dashboard " +
      "composition on a 9-event synthetic corpus matches literals derived " +
      "by hand, not by either engine") {
    // Four users, Jan 2025, every composed metric small enough to work
    // out on paper — the q294-lastError defense: an engine+oracle pair
    // that restates the same wrong derivation still fails this.
    //   user 2 (md5 arm 1): view 01-01 00:00, signup 00:30, click 01:00,
    //                        purchase 01-02 00:00
    //   user 4 (arm 1):     view+signup 01-01 00:00, click 01-03 (>24h)
    //   user 1 (arm 0):     view 01-02
    //   user 3 (arm 0):     purchase 01-03
    // funnel: n_view=3, click-within-24h only user 2, purchase-in-7d only
    //   user 2 -> 10000 div 3 = 3333 bp; 10000 bp
    // latency: signups {2, 4}; user 2 converts 23.5h -> floor 23h;
    //   conv_bp = 5000; p50 = 23
    // stickiness: dau Jan01 {2,4}, Jan02 {2,1}, Jan03 {4,3} = 2+2+2,
    //   mau = 4 -> 6*10000 div (3*4) = 5000
    // trend: daily y = (5, 2, 2) at x = (0,1,2) -> slope numer
    //   3*6 - 3*9 = -9, denom 3*5 - 9 = 6 -> -1500000 micro/day
    // ab: arms {2,4} vs {1,3}, one converter each -> rates 5000/5000,
    //   diff 0, z² = 0 -> not significant
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q237_fix")
      .toFile.getAbsolutePath
    def t(sql: String) = java.sql.Timestamp.valueOf(sql)
    Seq(
      (1L, t("2025-01-01 00:00:00"), 2L, "view", 1.0, "{}"),
      (2L, t("2025-01-01 00:30:00"), 2L, "signup", 1.0, "{}"),
      (3L, t("2025-01-01 01:00:00"), 2L, "click", 1.0, "{}"),
      (4L, t("2025-01-02 00:00:00"), 2L, "purchase", 1.0, "{}"),
      (5L, t("2025-01-01 00:00:00"), 4L, "view", 1.0, "{}"),
      (6L, t("2025-01-01 00:00:00"), 4L, "signup", 1.0, "{}"),
      (7L, t("2025-01-03 00:00:00"), 4L, "click", 1.0, "{}"),
      (8L, t("2025-01-02 00:00:00"), 1L, "view", 1.0, "{}"),
      (9L, t("2025-01-03 00:00:00"), 3L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = streaming.Lifecycle.eventDashboard(spark, dir).head()
    assert(row.getAs[Long]("view_to_click_bp") == 3333L)
    assert(row.getAs[Long]("click_to_purchase_bp") == 10000L)
    assert(row.getAs[Long]("signup_purchase_bp") == 5000L)
    assert(row.getAs[Long]("p50_hours") == 23L)
    assert(row.getAs[Long]("stickiness_bp") == 5000L)
    assert(row.getAs[Long]("slope_micro_per_day") == -1500000L)
    assert(row.getAs[Long]("ab_diff_bp") == 0L)
    assert(row.getAs[Int]("significant") == 0)
  }

  test("HAND-COMPUTED fixture: q299 registrations dashboard on a 10-signup " +
      "synthetic corpus, pinning the reference's day-7 discontinuity " +
      "(a signup exactly 7 days ago is in NEITHER the last-7 pane NOR " +
      "its week-before comparison window)") {
    // Anchor event (non-signup) fixes now = 2025-06-30 12:00, so
    // now_date = 2025-06-30, boy = 2025-01-01, start = boy (>=28d in).
    //   u1 signup 06-30 10:00  diff 0   today(h10), last7(b6), last28(b3), year(b5)
    //   u2 signup 06-29 08:00  diff 1   yday(h8),   last7(b5), last28(b3), year(b5)
    //   u7 signup 06-28 23:00  diff 2   b1;         last7(b4), last28(b3), year(b5)
    //   u3 signup 06-23 09:00  diff 7   THE GAP: last28(b2) + year only
    //   u4 signup 06-22 09:00  diff 8   b2;         last28(b2), year(b5)
    //   u5 signup 06-16 09:00  diff 14  b2 (>= now-14d inclusive); last28(b1), year
    //   u6 signup 06-15 09:00  diff 15  NOT b2;     last28(b1), year(b5)
    //   u8 signup 03-05        diff 117 year(b2, March); b3 ([boy-56d, now_date-28d])
    //   u9 signup 2024-05-01   b4 only ([boy-1y, now-1y]); excluded from panes
    //   u999 signup 06-30 11:00 NOT in the customer dim -> dropped by the
    //        roles semi-join everywhere
    // Hand tallies: p0 total 1 vs b0(=yday total 1) -> 0%; p1 1 vs b1=1
    // -> 0%; p2 3 vs b2={u4,u5}=2 -> 50%; p3 {u1,u2,u7,u3,u4,u5,u6}=7 vs
    // b3={u8}=1 -> 600%; p4 8 vs b4={u9}=1 -> 700%.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q299_fix")
      .toFile.getAbsolutePath
    def t(sql: String) = java.sql.Timestamp.valueOf(sql)
    Seq(
      (100L, t("2025-06-30 12:00:00"), 1L, "view", 1.0, "{}"),
      (1L, t("2025-06-30 10:00:00"), 1L, "signup", 1.0, "{}"),
      (2L, t("2025-06-29 08:00:00"), 2L, "signup", 1.0, "{}"),
      (7L, t("2025-06-28 23:00:00"), 7L, "signup", 1.0, "{}"),
      (3L, t("2025-06-23 09:00:00"), 3L, "signup", 1.0, "{}"),
      (4L, t("2025-06-22 09:00:00"), 4L, "signup", 1.0, "{}"),
      (5L, t("2025-06-16 09:00:00"), 5L, "signup", 1.0, "{}"),
      (6L, t("2025-06-15 09:00:00"), 6L, "signup", 1.0, "{}"),
      (8L, t("2025-03-05 09:00:00"), 8L, "signup", 1.0, "{}"),
      (9L, t("2024-05-01 09:00:00"), 9L, "signup", 1.0, "{}"),
      (999L, t("2025-06-30 11:00:00"), 999L, "signup", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    (1L to 9L).toDF("c_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val rows = reports.Reports.registrationsDashboard(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), Option(r.getAs[Integer]("delta_pct")).map(_.toInt)))
      .toMap
    val expected = Map(
      ("p0_today", 10) -> (1L, None), ("p0_today", -1) -> (1L, Some(0)),
      ("p1_yesterday", 8) -> (1L, None), ("p1_yesterday", -1) -> (1L, Some(0)),
      ("p2_last7", 4) -> (1L, None), ("p2_last7", 5) -> (1L, None),
      ("p2_last7", 6) -> (1L, None), ("p2_last7", -1) -> (3L, Some(50)),
      ("p3_last28", 1) -> (2L, None), ("p3_last28", 2) -> (2L, None),
      ("p3_last28", 3) -> (3L, None), ("p3_last28", -1) -> (7L, Some(600)),
      ("p4_year", 2) -> (1L, None), ("p4_year", 5) -> (7L, None),
      ("p4_year", -1) -> (8L, Some(700)))
    assert(rows == expected)
  }
}
