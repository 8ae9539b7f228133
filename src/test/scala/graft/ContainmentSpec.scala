package graft

import org.scalatest.funsuite.AnyFunSuite

/** Containment near-dup pairs (q194): the postings-join pipeline must
  * equal a driver recomputation over pruned distinct 3-gram sets, and
  * the measure must catch INCLUSION pairs that symmetric Jaccard
  * misses. */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def grams3(t: String): Set[String] = {
    val n = t.toLowerCase.replaceAll("\\s+", " ").trim
    val ts = if (n.isEmpty) Array.empty[String] else n.split(" ")
    if (ts.length < 3) Set.empty
    else ts.sliding(3).map(_.mkString(" ")).toSet
  }

  test("q194 == driver recomputation at sf0.001") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        grams3(if (r.isNullAt(1)) "" else r.getString(1))))
    val df = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val pruned = docs.map { case (id, gs) =>
      (id, gs.filter(g => df(g) <= 20))
    }.filter(_._2.nonEmpty)
    val exp = (for {
      (a, ga) <- pruned; (b, gb) <- pruned if a != b
      i = (ga & gb).size if i > 0
      score = BigDecimal(i.toDouble / ga.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if score >= 0.5
    } yield (a, b, i.toLong, score)).toSeq.sortBy(t => (t._1, t._2))
    val got = text.TextQueries.containmentPairs(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == exp)
  }

  test("containment catches inclusion pairs Jaccard scores low") {
    import spark.implicits._
    // b contains all of a's grams plus many more: containment(a->b)=1,
    // jaccard well under 0.5
    val a = "alpha beta gamma delta epsilon"
    val b = a + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val ga = grams3(a); val gb = grams3(b)
    val jac = (ga & gb).size.toDouble / (ga | gb).size
    assert((ga & gb).size.toDouble / ga.size == 1.0)
    assert(jac < 0.5)
  }
}
