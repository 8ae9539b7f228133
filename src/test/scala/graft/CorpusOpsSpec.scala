package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** Per-source caps (q207), readability (q208) and tokenizer fertility
  * (q209): driver recomputations + structural invariants on sf0.001. */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def normalize(t: String): String =
    t.toLowerCase.replaceAll("\\s+", " ").trim

  private def words(t: String): Seq[String] = {
    val n = normalize(t)
    if (n.isEmpty) Seq.empty else n.split(" ").toSeq
  }

  test("q207 caps == driver row_number replay; every source keeps " +
      "min(cap, n_docs)") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) "" else r.getString(2)))
    val exp = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, rs) =>
      val ranked = rs.sortBy(r => (md5hex(r._1.toString), r._1))
      val kept = ranked.take(15)
      (src, rs.size.toLong, kept.size.toLong,
        rs.map(r => words(r._3).size.toLong).sum,
        kept.map(r => words(r._3).size.toLong).sum,
        kept.size.toLong * 10000 / rs.size)
    }
    val got = text.TextQueries.sourceCaps(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == exp)
    got.foreach { case (src, nDocs, nKept, _, _, _) =>
      assert(nKept == math.min(15L, nDocs), s"$src cap violated")
    }
  }

  test("q208 readability histogram == driver FK recomputation") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .select("text").collect()
      .map(r => if (r.isNullAt(0)) "" else r.getString(0))
    def runs(s: String, re: String): Long =
      re.r.findAllIn(s).size.toLong
    val exp = docs.map(normalize).filter(_.nonEmpty).map { n =>
      val w = n.split(" ").length.toLong
      val snt = math.max(1L, runs(n, "[.!?]+"))
      val syl = runs(n, "[aeiouy]+")
      val gradeC = 39 * w / snt + 1180 * syl / w - 1559
      (((gradeC + 10000) / 100 - 100).toInt, w, syl)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, rs) =>
      (b, rs.size.toLong, rs.map(_._2).sum, rs.map(_._3).sum)
    }
    val got = text.TextQueries.readabilityHistogram(spark, TestSpark.sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp)
  }

  test("q209 fertility rollup == driver join of (lang,word) counts with " +
      "the encoded vocabulary; fertility >= 1 subword per word") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) "" else r.getString(1)))
    val langWord = docs.flatMap { case (l, t) => words(t).map((l, _)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    // encoded vocabulary straight from the production encoder (its own
    // fusion semantics are covered by BpeSpec and the q141/q142 oracles)
    val vocabAll = Tables.documents(spark, TestSpark.sfDir)
      .select(org.apache.spark.sql.functions.explode(
        text.TextFunctions.tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("freq"))
    val (merges, _) = text.Bpe.train(
      text.TextQueries.vocabTopK(spark, TestSpark.sfDir, 100)
        .withColumnRenamed("token", "word"), rounds = 4)
    val enc = text.Bpe.encode(vocabAll, merges)
      .select("word", "rep").collect()
      .map(r => r.getString(0) -> r.getString(1).split(" ").length.toLong)
      .toMap
    val exp = langWord.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1)
      .map { case (lang, rs) =>
        val nW = rs.map(_._2).sum
        val nSub = rs.map { case ((_, w), c) => c * enc(w) }.sum
        val nChr = rs.map { case ((_, w), c) => c * w.length }.sum
        (lang, nW, nSub, nSub * 10000 / nW, nChr * 10000 / nSub)
      }
    val got = text.TextQueries.tokenizerFertility(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp)
    got.foreach { case (lang, _, _, fert, _) =>
      assert(fert >= 10000, s"$lang: fewer than one subword per word")
    }
  }
}
