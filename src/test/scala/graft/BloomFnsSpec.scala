package graft

import graft.functions.BloomFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-filter join pruning (functions.BloomFns): exactness of the
  * pruned pipeline, no-false-negative sketch property, and the plan
  * shape (probe evaluated scan-side, before any exchange). */
class BloomFnsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pruned contamination is identical to the exact form") {
    val exact = text.TextQueries.contamination(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val pruned = text.TextQueries.contaminationBloom(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pruned == exact)
    assert(exact.nonEmpty)
  }

  test("bloom probe never yields a false negative") {
    val keys = (0 until 1000).map(i => s"key_$i").toDF("k")
    val probe = BloomFns.buildProbe(keys, "k", expectedItems = 1000)
    // every inserted key must probe true
    val hits = keys.filter(probe(col("k"))).count()
    assert(hits == 1000L)
    // absent keys mostly probe false (1% design rate; allow generous slack)
    val absent = (0 until 1000).map(i => s"other_$i").toDF("k")
      .filter(probe(col("k"))).count()
    assert(absent < 100L, s"false-positive count $absent exceeds 10%")
  }

  test("empty build side prunes everything (null sketch, no crash)") {
    val keys = Seq.empty[String].toDF("k")
    val probe = BloomFns.buildProbe(keys, "k", expectedItems = 1)
    val n = (0 until 10).map(i => s"x$i").toDF("k")
      .filter(probe(col("k"))).count()
    assert(n == 0L)
  }

  test("probe runs scan-side: might_contain sits below every exchange") {
    val plan = text.TextQueries.contaminationBloom(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    // the probe must appear in a Filter that is NOT above the join —
    // i.e. the corpus scan stage. Cheap structural check: the string
    // order in the plan tree puts the probe filter below the first
    // BroadcastHashJoin/SortMergeJoin mention of the exact join.
    val probeIdx = plan.indexOf("might_contain")
    val joinIdx = math.max(plan.indexOf("BroadcastHashJoin"),
      plan.indexOf("SortMergeJoin"))
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "probe filter should be in the join's child (printed after it)")
  }
}
