package graft

import graft.streaming.EventQueries
import graft.text.TextQueries
import org.scalatest.funsuite.AnyFunSuite

/** Session path trigrams (q186) on hand-built timelines — sequences must
  * not cross the 30-minute session boundary — and PMI collocations (q185)
  * against a full driver recomputation. */
class SessionPathSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def run(rows: Seq[(Long, Long, java.sql.Timestamp, String)]) =
    EventQueries.sessionPathsOf(
        rows.toDF("user_id", "event_id", "ts", "event_type"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("a trigram inside one session counts") {
    assert(run(Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 2L, ts("2024-01-01 10:05:00"), "click"),
      (1L, 3L, ts("2024-01-01 10:10:00"), "buy"))) ==
      Seq(("view", "click", "buy", 1L)))
  }

  test("a 30-minute gap splits the sequence — no cross-session trigram") {
    assert(run(Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 2L, ts("2024-01-01 10:05:00"), "click"),
      (1L, 3L, ts("2024-01-01 11:00:00"), "buy"))).isEmpty)
  }

  test("sequences never span users") {
    assert(run(Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 2L, ts("2024-01-01 10:05:00"), "click"),
      (2L, 3L, ts("2024-01-01 10:10:00"), "buy"))).isEmpty)
  }

  test("overlapping trigrams in a long session each count") {
    assert(run(Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 2L, ts("2024-01-01 10:01:00"), "b"),
      (1L, 3L, ts("2024-01-01 10:02:00"), "a"),
      (1L, 4L, ts("2024-01-01 10:03:00"), "b"))) ==
      Seq(("a", "b", "a", 1L), ("b", "a", "b", 1L)))
  }

  test("PMI collocations == driver recomputation") {
    val texts = Tables.documents(spark, TestSpark.sfDir)
      .select("text").collect().map(_.getString(0))
    val docToks = texts.map(_.toLowerCase.trim.split("\\s+").filter(_.nonEmpty))
    val uni = docToks.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val nu = uni.values.sum
    val bi = docToks.filter(_.length >= 2)
      .flatMap(t => t.zip(t.tail))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 5)
    val nb = bi.values.sum
    val exp = bi.toSeq.map { case ((a, b), c) =>
      val ratio = (c.toDouble * nu * nu) / (uni(a).toDouble * uni(b) * nb)
      (a, b, c, ratio)
    }.sortBy { case (a, b, _, r) => (-r, a, b) }.take(30)
      .zipWithIndex.map { case ((a, b, c, r), i) =>
        (a, b, c,
          BigDecimal(math.log(r)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
            .toDouble, i + 1)
      }
    val got = TextQueries.pmiCollocations(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getInt(4)))
    assert(got.toSeq == exp)
  }
}
