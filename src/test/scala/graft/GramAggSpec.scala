package graft

import graft.functions.GramAgg
import graft.similarity.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GramMoments aggregate + principal-direction power iteration. */
class GramAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def q(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  test("moments match the brute-force reference and survive repartitioning") {
    val data = Seq(
      (1L, Array(0.5f, -0.25f, 0.125f)),
      (2L, Array(-0.1f, 0.3f, 0.7f)),
      (3L, Array(0.0f, 0.0f, -0.9f)),
      (4L, Array(0.33f, 0.44f, 0.55f))
    )
    val xs = data.map(_._2.map(v => q(v.toDouble)))
    val expSums = (0 until 3).map(i => xs.map(_(i)).sum)
    val expProds = for (i <- 0 until 3; j <- i until 3)
      yield xs.map(x => x(i) * x(j)).sum
    for (parts <- Seq(1, 3)) {
      val r = data.toDF("id", "v").repartition(parts)
        .agg(GramAgg.gramMoments(col("v"), 3).as("m")).head().getStruct(0)
      assert(r.getLong(0) == 4L)
      assert(r.getSeq[Long](1) == expSums)
      assert(r.getSeq[Long](2) == expProds)
    }
  }

  test("null array and null-element rows are skipped whole, not read as 0") {
    val df = Seq(
      (1L, Some(Array[java.lang.Float](1.0f, 2.0f))),
      (2L, None),
      (3L, Some(Array[java.lang.Float](0.5f, null)))
    ).toDF("id", "v")
    val r = df.agg(GramAgg.gramMoments(col("v"), 2).as("m")).head().getStruct(0)
    assert(r.getLong(0) == 1L) // only row 1 counted
    assert(r.getSeq[Long](1) == Seq(1000000L, 2000000L))
  }

  test("wrong-dimension input throws instead of mis-accumulating") {
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "v")
    val e = intercept[Exception] {
      df.agg(GramAgg.gramMoments(col("v"), 2)).head()
    }
    assert(e.getMessage != null)
  }

  test("principalDirection recovers a planted dominant axis; projection " +
      "separates the clusters") {
    // variance concentrated on dim 1: ±0.5 swings there, ±0.01 noise on 0/2
    val rows = (0 until 40).map { i =>
      val s = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, Array((0.01 * (i % 3)).toFloat, (0.5 * s).toFloat,
        (0.005 * (i % 5)).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val v = Ann.principalDirection(df, "embedding", 3, iters = 2)
    assert(math.abs(v(1)) == 1000000L) // dominant axis pinned to max scale
    assert(math.abs(v(0)) < 200000L && math.abs(v(2)) < 200000L)
    // projections: the two planted half-clusters land on opposite sides
    val proj = rows.map { case (id, e) =>
      id -> e.zip(v).map { case (x, w) => q(x.toDouble) * w }.sum
    }
    val (even, odd) = proj.partition(_._1 % 2 == 0)
    assert(even.map(_._2).forall(p => p * math.signum(v(1)) > 0))
    assert(odd.map(_._2).forall(p => p * math.signum(v(1)) < 0))
  }

  test("zero-variance input returns the zero direction (no divide-by-zero)") {
    val df = (1L to 5L).map(i => (i, Array(0.25f, 0.25f))).toDF("id", "v")
    assert(Ann.principalDirection(df, "v", 2, iters = 2).toSeq == Seq(0L, 0L))
  }
}
