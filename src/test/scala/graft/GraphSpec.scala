package graft

import org.scalatest.funsuite.AnyFunSuite

/** Integer PageRank (q152): the distributed run must equal a driver-side
  * from-first-principles recomputation of the same integer semantics
  * (rank₀=10⁶, contribution = rank div deg, rank' = 150000 +
  * (85·Σc) div 100) on the sf0.001 co-purchase graph. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("distributed integer PageRank == driver recomputation") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
      .select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // undirected distinct co-purchase edges
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted)
    val half = byOrder.values.flatMap(parts =>
      for (i <- parts.indices; j <- i + 1 until parts.size)
        yield (parts(i), parts(j))).toSet
    val edges = half.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val contrib = edges.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        rank(s) / deg(s) }.sum)
      rank = contrib.map { case (n, sc) => n -> (150000L + 85L * sc / 100L) }.toMap
    }
    val expTop = rank.toSeq.map { case (n, r) => (n, deg(n), r) }
      .sortBy { case (n, _, r) => (-r, n) }.take(20)
      .zipWithIndex.map { case ((n, d, r), i) => (n, d, r, i + 1) }
    val got = reports.Graph.copurchasePageRank(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == expTop)
  }
}
