package graft

import graft.text.{TextFunctions, TextQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Efraimidis–Spirakis weighted sampling (q178) and temperature mixing
  * (q180): the distributed runs must equal from-first-principles driver
  * recomputations of the same deterministic arithmetic, and the
  * temperature mix must actually FLATTEN source shares. */
class WeightedSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("A-Res sample == driver recomputation of keys and top-k") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val keyed = docs.map { case (id, nc) =>
      val w = math.max(nc, 1L)
      val u = (java.lang.Long.parseLong(md5hex(id.toString).take(12), 16) + 1L) /
        281474976710656.0
      (id, w, math.log(u) / w)
    }
    val exp = keyed.sortBy { case (id, _, key) => (-key, id) }.take(200)
      .zipWithIndex.map { case ((id, w, _), i) => (i + 1, id, w) }
    val got = TextQueries.weightedSample(spark, TestSpark.sfDir)
      .select("rn", "doc_id", "weight").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == exp.toSeq)
  }

  test("temperature mix thresholds == driver recomputation; shares flatten") {
    val perDoc = Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), col("source"),
        TextFunctions.tokenCount(col("text")).cast("long").as("nt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = perDoc.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val total = bySrc.values.sum
    val sumSq = bySrc.values.map(v => math.sqrt(v.toDouble)).sum
    val thr = bySrc.map { case (src, toks) =>
      val rate = math.min(1.0,
        (0.5 * total * (math.sqrt(toks.toDouble) / sumSq)) / toks.toDouble)
      src -> math.floor(rate * 65536).toInt
    }
    val kept = perDoc.filter { case (id, src, _) =>
      Integer.parseInt(md5hex(id.toString).take(4), 16) < thr(src)
    }
    val expRows = kept.groupBy(_._2).map { case (src, rows) =>
      (src, thr(src), rows.size.toLong, rows.map(_._3).sum)
    }.toSeq.sortBy(_._1)
    val got = TextQueries.temperatureMix(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expRows)

    // flattening: the EXPECTED kept-token spread (rate · tokens — what the
    // α-power rule promises; realized counts at sf0.001 carry hash-draw
    // noise) must shrink vs the corpus spread
    def spread(vs: Iterable[Double]): Double = vs.max / math.max(vs.min, 1.0)
    val expected = bySrc.map { case (src, toks) =>
      (thr(src) / 65536.0) * toks.toDouble
    }
    assert(spread(expected) <= spread(bySrc.values.map(_.toDouble)))
  }
}
