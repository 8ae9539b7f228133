package graft

import org.scalatest.funsuite.AnyFunSuite

/** Conversion attribution (q199) and CUSUM changepoint (q200): driver
  * recomputations of the session credit rules and the integer CUSUM. */
class AttributionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q199 == driver session-credit recomputation at sf0.001") {
    val evs = Tables.events(spark, TestSpark.sfDir)
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
        r.getString(3)))
    val credits = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ordered = es.sortBy(e => (e._3, e._2))
      // 30-minute-gap sessionization
      var sid = 0L
      var prev = Long.MinValue
      val withSid = ordered.map { e =>
        if (prev != Long.MinValue && e._3 - prev > 1800000L) sid += 1
        prev = e._3
        (sid, e._4)
      }
      withSid.groupBy(_._1).values.flatMap { sess =>
        val types = sess.map(_._2)
        types.zipWithIndex.collect { case ("purchase", i) =>
          val first = if (i == 0) "direct" else types.head
          val last = if (i == 0) "direct" else types(i - 1)
          (first, last)
        }
      }
    }
    val expFirst = credits.groupBy(_._1).view.mapValues(_.size.toLong)
      .toSeq.map { case (c, n) => ("first_touch", c, n) }
    val expLast = credits.groupBy(_._2).view.mapValues(_.size.toLong)
      .toSeq.map { case (c, n) => ("last_touch", c, n) }
    val exp = (expFirst ++ expLast).sortBy(t => (t._1, t._2))
    val got = streaming.EventQueries.conversionAttribution(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == exp)
    // both models credit the same conversion total
    val byModel = got.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    assert(byModel("first_touch") == byModel("last_touch"))
  }

  test("q200 == driver integer CUSUM at sf0.001") {
    val days = Tables.events(spark, TestSpark.sfDir)
      .select("ts").collect()
      .map(_.getTimestamp(0).toInstant
        .atZone(java.time.ZoneOffset.UTC).toLocalDate)
    val daily = days.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1.toEpochDay)
    val dd = daily.size.toLong
    val tt = daily.map(_._2).sum
    var acc = 0L
    val cusum = daily.map { case (d, c) =>
      acc += c * dd - tt
      (d.toString, acc)
    }
    val exp = cusum.sortBy { case (d, cs) => (-math.abs(cs), d) }.take(5)
      .zipWithIndex.map { case ((d, cs), i) => (d, cs, i + 1) }
    val got = streaming.EventQueries.cusumChangepoint(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == exp)
  }
}
