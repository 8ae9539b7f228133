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

  test("degree-oriented triangle count == driver brute force (orientation-invariant)") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
      .select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted)
    // support >= 2 edges, a < b
    val support = scala.collection.mutable.Map.empty[(Long, Long), Int]
    byOrder.values.foreach(parts =>
      for (i <- parts.indices; j <- i + 1 until parts.size)
        support((parts(i), parts(j))) = support.getOrElse((parts(i), parts(j)), 0) + 1)
    // NB: `support.collect { case (e, c) ... => e }` would rebuild a MAP
    // (e is a pair), silently collapsing keys — filter+keySet instead
    val edges = support.filter(_._2 >= 2).keySet.toSet
    // brute-force closure over id-sorted wedges
    val bySrc = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted)
    val tris = for {
      (x, nbrs) <- bySrc.toSeq
      i <- nbrs.indices; j <- i + 1 until nbrs.size
      if edges.contains((nbrs(i), nbrs(j)))
    } yield (x, nbrs(i), nbrs(j))
    val perNode = tris.flatMap { case (a, b, c) => Seq(a, b, c) }
      .groupBy(identity).view.mapValues(_.size.toLong)
    val expTop = perNode.toSeq.sortBy { case (n, t) => (-t, n) }.take(10)
      .zipWithIndex.map { case ((n, t), i) => (n, t, tris.size.toLong, i + 1) }
    val got = reports.Graph.copurchaseTriangles(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == expTop)
  }

  test("Apriori candidate pruning loses no frequent triple (vs brute force)") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
      .select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val baskets = li.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted)
      .values.toSeq
    // brute force: count EVERY basket triple, keep support >= 2
    val sup3 = scala.collection.mutable.Map.empty[(Long, Long, Long), Int]
    baskets.foreach { p =>
      for (i <- p.indices; j <- i + 1 until p.size; l <- j + 1 until p.size) {
        val t = (p(i), p(j), p(l))
        sup3(t) = sup3.getOrElse(t, 0) + 1
      }
    }
    val expL3 = sup3.filter(_._2 >= 2).toSeq
      .map { case ((a, b, c), s) => (a, b, c, s.toLong) }
      .sortBy { case (a, b, c, s) => (-s, a, b, c) }.take(20)
      .zipWithIndex.map { case ((a, b, c, s), i) => (a, b, c, s, i + 1) }
    val got = reports.Graph.frequentItemsets(spark, TestSpark.sfDir)
      .filter("isize = 3").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getInt(5)))
    assert(got.toSeq == expL3)
  }

  /** Shared driver-side build of the support>=2 symmetrized graph. */
  private def driverGraph(): (Set[(Long, Long)], Map[Long, Seq[Long]]) = {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
      .select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted)
    val support = scala.collection.mutable.Map.empty[(Long, Long), Int]
    byOrder.values.foreach(parts =>
      for (i <- parts.indices; j <- i + 1 until parts.size)
        support((parts(i), parts(j))) =
          support.getOrElse((parts(i), parts(j)), 0) + 1)
    val half = support.filter(_._2 >= 2).keySet.toSet
    val sym = half.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val nbrs = sym.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq.sorted).toMap
    (half, nbrs)
  }

  test("synchronous min-tie LPA == driver recomputation") {
    val (_, nbrs) = driverGraph()
    var lab: Map[Long, Long] = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lab = nbrs.map { case (n, ns) =>
        val counts = ns.map(lab).groupBy(identity).view.mapValues(_.size)
        // most frequent neighbour label, ties by smallest label
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val expTop = lab.values.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (l, c) => (-c, l) }.take(20)
      .zipWithIndex.map { case ((l, c), i) => (l, c, i + 1) }
    val got = reports.Graph.lpaCommunities(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == expTop)
  }

  test("multi-source BFS hop histogram == driver BFS") {
    val (_, nbrs) = driverGraph()
    val seeds = nbrs.keys.toSeq.sorted.take(3)
    val dist = scala.collection.mutable.Map[Long, Int](seeds.map(_ -> 0): _*)
    var frontier = seeds.toSet
    for (h <- 1 to 3) {
      frontier = frontier.flatMap(nbrs).filterNot(dist.contains)
      frontier.foreach(n => dist(n) = h)
    }
    val exp = nbrs.keys.toSeq.map(n => dist.getOrElse(n, -1))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val got = reports.Graph.bfsHops(spark, TestSpark.sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq == exp)
  }

  test("k-core peeling trace == driver peeling, and reaches a fixpoint") {
    val (_, nbrs0) = driverGraph()
    var nbrs = nbrs0
    val exp = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    def record(r: Int): Unit = exp += ((r, nbrs.size.toLong,
      nbrs.values.map(_.size).sum.toLong / 2))
    record(0)
    for (r <- 1 to 4) {
      val keep = nbrs.filter(_._2.size >= 3).keySet
      nbrs = nbrs.collect { case (n, ns) if keep(n) =>
        n -> ns.filter(keep)
      }.filter(_._2.nonEmpty)
      record(r)
    }
    val got = reports.Graph.kCorePeeling(spark, TestSpark.sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == exp.toSeq)
  }

  test("integer HITS == driver replay of the max-normalized half-steps") {
    val custOf = Tables.orders(spark, TestSpark.sfDir)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val edges = Tables.lineitem(spark, TestSpark.sfDir)
      .select("l_orderkey", "l_partkey").collect()
      .flatMap(r => custOf.get(r.getLong(0)).map(c => (c, r.getLong(1))))
      .toSet
    // toSeq before the score lookup: mapping a SET through the score map
    // collapses equal scores and corrupts the sum
    val byC = edges.groupBy(_._1).view.mapValues(_.toSeq.map(_._2)).toMap
    val byP = edges.groupBy(_._2).view.mapValues(_.toSeq.map(_._1)).toMap
    var h: Map[Long, Long] = byC.keys.map(_ -> 1000000L).toMap
    var a: Map[Long, Long] = Map.empty
    def rescale(raw: Map[Long, Long]): Map[Long, Long] = {
      val mx = raw.values.max
      raw.view.mapValues(v => v * 1000000L / mx).toMap
    }
    for (_ <- 1 to 2) {
      a = rescale(byP.view.mapValues(_.map(h).sum).toMap)
      h = rescale(byC.view.mapValues(_.map(a).sum).toMap)
    }
    def top(m: Map[Long, Long], side: String) =
      m.toSeq.sortBy { case (n, s) => (-s, n) }.take(10)
        .zipWithIndex.map { case ((n, s), i) => (side, n, s, i + 1) }
    val exp = top(a, "authority") ++ top(h, "hub")
    val got = reports.Graph.purchaseHits(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3)))
    assert(got.toSeq == exp)
  }

  test("q224 basket lift == driver cross-multiplied ranking") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val support = li.groupBy(_._1).values.flatMap { rs =>
      val parts = rs.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.size)
        yield (parts(i), parts(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 3).toMap
    val freq = li.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size.toLong)
    val n = li.map(_._1).distinct.size.toLong
    val exp = support.toSeq.map { case ((a, b), s) =>
      (a, b, s, freq(a), freq(b), s * n * 1000000L / (freq(a) * freq(b)))
    }.sortBy { case (a, b, _, _, _, l) => (-l, a, b) }.take(15)
      .zipWithIndex.map { case ((a, b, s, fa, fb, l), i) =>
        (a, b, s, fa, fb, l, i + 1) }
    val got = reports.Graph.basketLift(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6)))
    assert(got.toSeq == exp)
  }

  test("RA link prediction == driver wedge scoring, no existing edges") {
    val (half, nbrs) = driverGraph()
    val deg = nbrs.view.mapValues(_.size.toLong).toMap
    val scores = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    nbrs.foreach { case (z, ns) =>
      for (i <- ns.indices; j <- i + 1 until ns.size) {
        val key = (ns(i), ns(j))
        val (cn, ra) = scores.getOrElse(key, (0L, 0L))
        scores(key) = (cn + 1, ra + 1000000L / deg(z))
      }
    }
    val expTop = scores.toSeq.filterNot { case (k, _) => half(k) }
      .map { case ((u, v), (cn, ra)) => (u, v, cn, ra) }
      .sortBy { case (u, v, _, ra) => (-ra, u, v) }.take(20)
      .zipWithIndex.map { case ((u, v, cn, ra), i) => (u, v, cn, ra, i + 1) }
    val got = reports.Graph.linkPrediction(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    assert(got.toSeq == expTop)
  }
}
