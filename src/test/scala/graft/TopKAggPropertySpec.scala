package graft

import graft.functions.TopKAgg
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test: the bounded-heap top-k aggregate must equal the
  * sort-then-take reference on random multisets — across group sizes
  * around k (empty, < k, = k, > k), duplicate ordering keys (struct
  * ordering resolves by the tie-break field), negative values, and
  * many-partition partial/merge plans. */
class TopKAggPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowGen: Gen[(Int, Int, Long)] = for {
    g <- Gen.choose(0, 5)       // group
    v <- Gen.choose(-20, 20)    // ordering value, small range => many ties
    id <- Gen.choose(0L, 999L)  // tie-break (not necessarily unique)
  } yield (g, v, id)

  private def batch(seed: Long, n: Int): List[(Int, Int, Long)] =
    Gen.listOfN(n, rowGen).pureApply(Gen.Parameters.default, Seed(seed))

  test("heap top-k equals sort-based reference over random batches") {
    for (seed <- 1 to 8) {
      val rows = batch(seed, 50 + seed * 37)
      val k = 1 + seed % 5
      val df = rows.toDF("g", "v", "id").repartition(7)
      val got = df.groupBy(col("g"))
        .agg(TopKAgg.topK(struct(col("v"), col("id")), k).as("top"))
        .select(col("g"), col("top"))
        .as[(Int, Seq[(Int, Long)])].collect().toMap
      val expected = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._2, r._3)).sorted.take(k)
      }
      assert(got.keySet == expected.keySet, s"seed=$seed groups")
      expected.foreach { case (g, exp) =>
        assert(got(g) == exp, s"seed=$seed k=$k group=$g")
      }
    }
  }
}
