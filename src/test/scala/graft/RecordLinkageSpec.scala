package graft

import graft.etl.RecordLinkage
import org.scalatest.funsuite.AnyFunSuite

/** Entity-resolution semantics on hand-built masters: the positional-
  * wildcard blocking must find EVERY substitution-distance-1 name pair
  * (the structural guarantee), attribute conjunctions must gate matches,
  * and clusters must form transitively through chains. */
class RecordLinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // rows: (custkey, 9-digit suffix, nation, segment)
  private def run(rows: Seq[(Long, String, Int, String)]) =
    RecordLinkage.resolveCustomersOf(
        rows.map { case (k, digits, n, seg) =>
          (k, s"Customer#$digits", n, seg)
        }.toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("distance-1 pair in the same block clusters; distance-2 does not") {
    val got = run(Seq(
      (1L, "000000001", 5, "AUTO"),
      (2L, "000000002", 5, "AUTO"),   // dist 1 from #1 -> same cluster
      (3L, "000000033", 5, "AUTO")))  // dist 2 from both -> singleton, dropped
    assert(got == Seq((1L, 1L, 2L), (2L, 1L, 2L)))
  }

  test("attribute conjunction gates the match (nation, then segment)") {
    assert(run(Seq(
      (1L, "000000001", 5, "AUTO"),
      (2L, "000000002", 6, "AUTO"))).isEmpty)   // nation differs
    assert(run(Seq(
      (1L, "000000001", 5, "AUTO"),
      (2L, "000000002", 5, "BIKE"))).isEmpty)   // segment differs
  }

  test("clusters form transitively through distance-1 chains") {
    // 1-2 and 2-3 are distance 1; 1-3 is distance 2 but chains into one
    // cluster labeled by the minimum key
    val got = run(Seq(
      (1L, "000000010", 5, "AUTO"),
      (2L, "000000011", 5, "AUTO"),
      (3L, "000000012", 5, "AUTO")))
    assert(got == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L)))
  }

  test("every masked position can carry the difference") {
    // pairs differing in each of the 9 suffix positions must all match
    for (p <- 0 until 9) {
      val base = "123456789".toCharArray
      val variant = base.clone()
      variant(p) = if (base(p) == '9') '0' else (base(p) + 1).toChar
      val got = run(Seq(
        (1L, new String(base), 3, "HOUSE"),
        (2L, new String(variant), 3, "HOUSE")))
      assert(got == Seq((1L, 1L, 2L), (2L, 1L, 2L)), s"position $p")
    }
  }
}
