package graft

import org.scalatest.funsuite.AnyFunSuite

/** The frozen shuffle-heavy bench control must keep RUNNING forever —
  * it is never edited, so this spec only pins that it executes and has
  * the expected shape (NOT its values: freezing means it must not track
  * q55's evolution, and a value assertion would force exactly that). */
class BenchControlsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val dir = TestSpark.sfDir

  test("qc1 frozen control runs, emits (part_a, part_b, n_orders, rn), " +
      "top-3 per part") {
    val out = BenchControls.controlPairs(spark, dir)
    assert(out.columns.toSeq == Seq("part_a", "part_b", "n_orders", "rn"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    val perPart = rows.groupBy(_.getAs[Long]("part_a"))
    assert(perPart.values.forall(_.length <= 3))
    assert(rows.forall(r => r.getAs[Int]("rn") >= 1 && r.getAs[Int]("rn") <= 3))
  }
}
