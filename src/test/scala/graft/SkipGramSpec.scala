package graft

import org.scalatest.funsuite.AnyFunSuite

/** Skip-gram pair generation (q192): the distributed subsample + window
  * pipeline must equal a driver recomputation of the md5-threshold rule
  * and compacted-sequence windowing at sf0.001. */
class SkipGramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5bucket(s: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    Integer.parseInt(d.take(2).map("%02x".format(_)).mkString, 16)
  }

  test("q192 == driver recomputation at sf0.001") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        Option(if (r.isNullAt(1)) null else r.getString(1)).getOrElse("")))
    def toks(t: String): Seq[String] = {
      val n = t.toLowerCase.replaceAll("\\s+", " ").trim
      if (n.isEmpty) Seq.empty else n.split(" ").toSeq
    }
    val tokenized = docs.map { case (id, t) => (id, toks(t)) }
    val freq = tokenized.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val total = freq.values.sum
    val thr: Map[String, Int] = freq.map { case (w, f) =>
      w -> math.floor(math.min(1.0,
        math.sqrt(1e-3 * total / f)) * 65536).toInt
    }
    val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
    tokenized.foreach { case (id, ts) =>
      val kept = ts.zipWithIndex.collect {
        case (w, pos) if md5bucket(s"$id:$pos") < thr(w) => w
      }
      for (i <- kept.indices; off <- -2 to 2 if off != 0) {
        val j = i + off
        if (j >= 0 && j < kept.size)
          pairs((kept(i), kept(j))) =
            pairs.getOrElse((kept(i), kept(j)), 0L) + 1
      }
    }
    val exp = pairs.toSeq.map { case ((c, x), n) => (c, x, n) }
      .sortBy { case (c, x, n) => (-n, c, x) }.take(50)
      .zipWithIndex.map { case ((c, x, n), i) => (c, x, n, i + 1) }
    val got = text.SkipGram.skipgramPairs(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3)))
    assert(got.toSeq == exp)
  }
}
