package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the Z-order curve arithmetic: the Column-expression
  * zValue must equal a bit-twiddling reference on random rank tuples
  * (the curve key IS the layout — a wrong interleave silently destroys
  * locality while everything still "works"), and bucketRank must stay in
  * range and be monotonic. */
class LayoutPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference interleave: bit i of rank j → curve bit i*k + j. */
  private def refZ(ranks: Seq[Long], bits: Int): Long = {
    val k = ranks.size
    var z = 0L
    for (i <- 0 until bits; j <- 0 until k)
      z |= ((ranks(j) >> i) & 1L) << (i * k + j)
    z
  }

  test("zValue equals the bit-twiddling reference on random rank tuples") {
    val gen = for {
      a <- Gen.choose(0L, 255L); b <- Gen.choose(0L, 255L); c <- Gen.choose(0L, 255L)
    } yield (a, b, c)
    val rows = Gen.listOfN(200, gen)
      .pureApply(Gen.Parameters.default, Seed(42L))
    // 2-column and 3-column curves, several widths
    for (bits <- Seq(4, 8)) {
      val df = rows.toDF("a", "b", "c")
      val got2 = df.select(col("a"), col("b"),
          Layout.zValue(Seq(col("a"), col("b")), bits).as("z"))
        .as[(Long, Long, Long)].collect()
      got2.foreach { case (a, b, z) =>
        assert(z == refZ(Seq(a, b), bits), s"2col bits=$bits a=$a b=$b")
      }
      val got3 = df.select(col("a"), col("b"), col("c"),
          Layout.zValue(Seq(col("a"), col("b"), col("c")), bits).as("z"))
        .as[(Long, Long, Long, Long)].collect()
      got3.foreach { case (a, b, c, z) =>
        assert(z == refZ(Seq(a, b, c), bits), s"3col bits=$bits")
      }
    }
  }

  test("bucketRank: in range, monotonic, null-safe") {
    val df = (Seq[Option[Double]](None) ++ (0 to 1000).map(v => Some(v.toDouble)))
      .toDF("v")
    val ranked = df.select(col("v"),
        Layout.bucketRank(col("v"), 0.0, 1000.0, 4).as("r"))
      .orderBy(col("v").asc_nulls_first)
      .as[(Option[Double], Long)].collect()
    assert(ranked.forall { case (_, r) => r >= 0 && r < 16 })
    assert(ranked.head == ((None, 0L)), "null lands in bucket 0")
    // monotonic over the non-null values
    val rs = ranked.collect { case (Some(_), r) => r }
    assert(rs.zip(rs.tail).forall { case (x, y) => x <= y })
    assert(rs.last == 15L, "max value lands in the top bucket")
  }
}
