package graft

import org.scalatest.funsuite.AnyFunSuite

/** q220 held-out LM eval, q221 incremental components, q222 calibration
  * curve: driver replays and structural equivalences on sf0.001. */
class HoldoutEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def splitOf(id: Long): String = {
    val bucket = Integer.parseInt(md5hex(id.toString).take(4), 16)
    if (bucket < 65536 * 90 / 100) "train"
    else if (bucket < 65536 * 95 / 100) "val" else "test"
  }

  private def words(t: String): Seq[String] = {
    val n = t.toLowerCase.replaceAll("\\s+", " ").trim
    if (n.isEmpty) Seq.empty else n.split(" ").toSeq
  }

  test("q220 holdout LM eval == driver stupid-backoff replay") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) "" else r.getString(1)))
      .map { case (id, t) => (splitOf(id), words(t)) }
      .filter(_._2.nonEmpty)
    def bigrams(s: Seq[(String, Seq[String])]) =
      s.flatMap(_._2.sliding(2).collect { case Seq(a, b) => (a, b) })
    val train = docs.filter(_._1 == "train")
    val trBi = bigrams(train).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = trBi.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val uni = train.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val t = uni.values.sum
    val testBi = bigrams(docs.filter(_._1 == "test"))
    var (hits, backs, oovs, sumP) = (0L, 0L, 0L, 0L)
    testBi.foreach { case (w1, w2) =>
      trBi.get((w1, w2)) match {
        case Some(cnt) => hits += 1; sumP += cnt * 10000 / c1(w1)
        case None => uni.get(w2) match {
          case Some(cu) => backs += 1; sumP += cu * 4000 / t
          case None => oovs += 1; sumP += 1
        }
      }
    }
    val n = testBi.size.toLong
    val r = text.TextQueries.holdoutLmEval(spark, TestSpark.sfDir).collect().head
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == hits * 10000 / n)
    assert(r.getLong(2) == backs * 10000 / n)
    assert(r.getLong(3) == oovs * 10000 / n)
    assert(r.getLong(4) == sumP / n)
  }

  test("q221 incremental merge == full clustering (via the q164 " +
      "component frame)") {
    // full-corpus clustering, independently produced by softDedupWeights
    val full = text.TextQueries.softDedupWeights(spark, TestSpark.sfDir)
      .select("component", "csize").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
      .filter(_._2 >= 2).sortBy { case (c, s) => (-s, c) }.take(20)
      .zipWithIndex.map { case ((c, s), i) => (c, s, i + 1) }
    val got = text.TextQueries.incrementalComponents(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == full.toSeq)
  }

  test("q222 calibration buckets == driver recomputation from the " +
      "public classifier and gopher frames") {
    val scores = text.Classifier.classify(spark, TestSpark.sfDir)
      .select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val keeps = text.TextQueries.gopherRules(spark, TestSpark.sfDir)
      .select("doc_id", "keep").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong)).toMap
    val joined = scores.toSeq.map { case (id, sc) => (sc, keeps(id)) }
    val n = joined.size.toLong
    val hist = joined.groupBy(_._1).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    def cut(k: Int): Long = {
      var cum = 0L
      hist.collectFirst {
        case (sc, c) if { cum += c; cum * 10 >= n * k } => sc
      }.get
    }
    val cuts = (1 to 9).map(cut)
    val exp = joined.groupBy { case (sc, _) => 1 + cuts.count(_ < sc) }
      .toSeq.sortBy(_._1).map { case (d, rs) =>
        val sumS = rs.map(_._1).sum
        (d, rs.size.toLong, rs.map(_._2).sum * 10000 / rs.size,
          rs.map(_._1).min, rs.map(_._1).max,
          java.lang.Long.signum(sumS).toLong * (math.abs(sumS) / rs.size))
      }
    val got = text.TextQueries.calibrationCurve(spark, TestSpark.sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == exp)
  }
}
