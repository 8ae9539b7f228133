package graft

import org.scalatest.funsuite.AnyFunSuite

/** kNN label-agreement evaluation (q195): the distributed eval must
  * equal a driver recomputation (same 4dp-rounded cosine ranking, same
  * min-tie majority vote) at sf0.001. */
class KnnEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q195 == driver recomputation at sf0.001") {
    val rows = Tables.embeddings(spark, TestSpark.sfDir)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val queries = rows.sortBy { case (id, _, _) => (md5hex(id.toString), id) }
      .take(40)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0d; var na = 0d; var nb = 0d
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      val raw = d / (math.sqrt(na) * math.sqrt(nb))
      if (raw.isNaN || math.abs(raw) > 1.000001) -1.0 else raw
    }
    val perQuery = queries.map { case (qid, qv, qlab) =>
      val topk = rows.filter(_._1 != qid)
        .map { case (id, v, lab) =>
          (id, lab, BigDecimal(cos(qv, v))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .sortBy { case (id, _, c) => (-c, id) }.take(10)
      val hits = topk.count(_._2 == qlab).toLong
      val pred = topk.groupBy(_._2).view.mapValues(_.size).toSeq
        .minBy { case (l, c) => (-c, l) }._1
      (qlab, hits, pred)
    }
    val exp = perQuery.groupBy(_._1).map { case (lab, xs) =>
      val n = xs.size.toLong
      def r4(x: Double) = BigDecimal(x)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (lab, n, r4(xs.map(_._2).sum.toDouble / (n * 10)),
        r4(xs.count(x => x._3 == x._1).toDouble / n))
    }.toSeq.sortBy(_._1)
    val got = similarity.SimilarityQueries.knnLabelEval(spark, TestSpark.sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.toSeq == exp)
  }
}
