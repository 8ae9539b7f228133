package graft

import org.scalatest.funsuite.AnyFunSuite

/** Corpus distribution stats (q196/q198): driver recomputation of the
  * chi-square drift statistic and the nested vocabulary-growth curve. */
class CorpusStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def toks(t: String): Seq[String] = {
    val n = t.toLowerCase.replaceAll("\\s+", " ").trim
    if (n.isEmpty) Seq.empty else n.split(" ").toSeq
  }

  private def md5bucket(s: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    Integer.parseInt(d.take(2).map("%02x".format(_)).mkString, 16)
  }

  private lazy val docs = Tables.documents(spark, TestSpark.sfDir)
    .select("doc_id", "source", "text").collect()
    .map(r => (r.getLong(0), r.getString(1),
      toks(if (r.isNullAt(2)) "" else r.getString(2))))

  test("q196 chi2 drift == driver recomputation at sf0.001") {
    val st = docs.flatMap { case (_, src, ts) => ts.map(src -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap // (src,tok)->o
    val ct = st.groupBy(_._1._2).view
      .mapValues(_.values.sum).toMap.filter(_._2 >= 5)
    val ns = st.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nn = st.values.sum
    val cv = ct.values.sum
    def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val exp = ns.keys.toSeq.sorted.map { src =>
      // NB: st.collect on the MAP would rebuild a Map keyed by the first
      // tuple element, silently collapsing equal term_micro values (the
      // GraphSpec support-map footgun) — materialize to a Seq first
      val obs = st.toSeq.collect {
        case ((s2, t), o) if s2 == src && ct.contains(t) =>
          val e = ns(src).toDouble * ct(t) / nn
          (micro((o - e) * (o - e) / e), micro(e))
      }
      val chi2 = obs.map(_._1).sum +
        micro(ns(src).toDouble * cv / nn) - obs.map(_._2).sum
      (src, obs.size.toLong, chi2)
    }
    val got = text.CorpusStats.chi2SourceDrift(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == exp)
  }

  test("q198 vocab growth == driver recomputation, curve is monotone") {
    def tier(id: Long): Int = {
      val b = md5bucket(id.toString)
      if (b < 6554) 10 else if (b < 16384) 25
      else if (b < 32768) 50 else 100
    }
    val tiers = Seq(10, 25, 50, 100)
    val perDoc = docs.map { case (id, _, ts) => (tier(id), ts) }
    val firstTier = perDoc.flatMap { case (t, ts) => ts.map(_ -> t) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val exp = tiers.map { t =>
      val sub = perDoc.filter(_._1 <= t)
      (t, sub.size.toLong, sub.map(_._2.size.toLong).sum,
        firstTier.count(_._2 <= t).toLong)
    }
    val got = text.CorpusStats.vocabGrowth(spark, TestSpark.sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == exp)
    // Heaps: types grow sub-linearly vs token mass across tiers
    val g = got.toSeq
    assert(g.map(_._2).sorted == g.map(_._2)) // monotone docs
    assert(g.map(_._4).sorted == g.map(_._4)) // monotone types
  }

  test("q231 source diversity == driver HHI; index bounded by " +
      "(10000/n_sources, 10000)") {
    def words(t: String): Long = {
      val n = t.toLowerCase.replaceAll("\\s+", " ").trim
      if (n.isEmpty) 0L else n.split(" ").length.toLong
    }
    val bySrc = Tables.documents(spark, TestSpark.sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) "" else r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(r => words(r._2)).sum).toMap
    val t = bySrc.values.sum
    val shares = bySrc.values.map(_ * 10000 / t)
    val hhi = shares.map(s => s * s).sum / 10000
    val r = text.CorpusStats.sourceDiversity(spark, TestSpark.sfDir)
      .collect().head
    assert(r.getLong(0) == bySrc.size.toLong)
    assert(r.getLong(1) == t)
    assert(r.getLong(2) == shares.max)
    assert(r.getLong(3) == hhi)
    assert(r.getLong(4) == 100000000L / hhi)
    // HHI of n equal sources is 10000/n; concentration only raises it
    assert(hhi >= 10000 / bySrc.size && hhi <= 10000)
  }
}
