package graft

import graft.similarity.SimilarityQueries
import org.scalatest.funsuite.AnyFunSuite

/** MMR re-ranking (q184): the distributed flatMapGroups greedy must equal
  * a from-first-principles driver recomputation — pool top-30 by 4dp
  * cosine, λ·rel − (1−λ)·max-sim greedy, ties by id, every intermediate
  * argmax included. */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    val raw = dot / (math.sqrt(na) * math.sqrt(nb))
    if (raw.isNaN || math.abs(raw) > 1.000001) -1.0 else raw
  }

  test("distributed MMR == driver greedy recomputation") {
    val vecs = Tables.embeddings(spark, TestSpark.sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val byId = vecs.toMap
    val lam = 0.7
    val exp = (0L until 3L).flatMap { q =>
      val qv = byId(q)
      val pool = vecs.filter(_._1 != q)
        .map { case (id, v) => (id, round4(cos(v, qv))) }
        .sortBy { case (id, c) => (-c, id) }.take(30)
      val rel = pool.toMap
      val sim = (for ((a, _) <- pool; (b, _) <- pool if a != b)
        yield ((a, b), round4(cos(byId(a), byId(b))))).toMap
      var remaining = pool.map(_._1).toVector.sorted
      val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      while (sel.size < 10 && remaining.nonEmpty) {
        val best = remaining.map { c =>
          val sc = if (sel.isEmpty) rel(c)
            else lam * rel(c) - (1 - lam) * sel.map(x => sim((c, x._1))).max
          (c, sc)
        }.minBy { case (c, sc) => (-sc, c) }
        sel += best
        remaining = remaining.filterNot(_ == best._1)
      }
      sel.zipWithIndex.map { case ((v, sc), i) => (q, v, i + 1, round4(sc)) }
    }
    val got = SimilarityQueries.mmrRerank(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.toSeq == exp)
  }
}
