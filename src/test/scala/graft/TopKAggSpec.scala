package graft

import graft.functions.TopKAgg
import graft.operators.FilterQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Heap-based bounded top-k aggregate vs the sort-based window ranking. */
class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir
  import spark.implicits._

  test("q68 aggregate form equals the q22 window form row-for-row") {
    val win = FilterQueries.topPerFlag(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3), r.getInt(4)))
    val agg = FilterQueries.topPerFlagAgg(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3), r.getInt(4)))
    assert(agg.toSeq == win.toSeq)
    assert(agg.nonEmpty)
  }

  test("partial/merge path across many partitions keeps exact top-k") {
    val df = spark.range(0, 10000).repartition(17)
      .select((col("id") % 7).as("g"), col("id").as("v"))
    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topK(struct((-col("v")).as("nv")), 5).as("top"))
      .select(col("g"), explode(col("top.nv")).as("nv"))
      .select(col("g"), (-col("nv")).as("v"))
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.toSeq).toMap
    (0L until 7L).foreach { g =>
      val expected = (0L until 10000L).filter(_ % 7 == g).sorted.takeRight(5)
      assert(got(g) == expected)
    }
  }

  test("groups smaller than k return all rows, ordered") {
    val got = Seq(("a", 3), ("a", 1), ("b", 2)).toDF("g", "v")
      .groupBy(col("g"))
      .agg(TopKAgg.topK(struct(col("v")), 5).as("top"))
      .select(col("g"), col("top.v").as("vs"))
      .as[(String, Seq[Int])].collect().toMap
    assert(got("a") == Seq(1, 3) && got("b") == Seq(2))
  }
}
