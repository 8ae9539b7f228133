package graft

import graft.functions.MoneyFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Money rounding semantics (MoneyTests analog). */
class MoneySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("half-even vs half-away midpoint rounding") {
    val df = Seq(2.345, 2.355, -2.345).toDF("v")
    val r = df.select(
      MoneyFns.moneyRound(col("v"), 2).as("away"),
      MoneyFns.moneyRound(col("v"), 2, halfEven = true).as("even"))
      .collect().map(x => (x.getDouble(0), x.getDouble(1)))
    // 2.345 is stored as 2.34499... in binary; decimal-exact literals:
    val exact = Seq(BigDecimal("2.345"), BigDecimal("2.355"), BigDecimal("-2.345"))
      .toDF("v").select(
        MoneyFns.moneyRound(col("v"), 2).as("away"),
        MoneyFns.moneyRound(col("v"), 2, halfEven = true).as("even"))
      .collect().map(x => (x.getDecimal(0).toString, x.getDecimal(1).toString))
    assert(exact(0) == ("2.35", "2.34"))   // half-away up vs half-even to even
    assert(exact(1) == ("2.36", "2.36"))   // both up (5 → even 6)
    assert(exact(2) == ("-2.35", "-2.34")) // away from zero vs to even
    assert(r.length == 3)
  }

  test("cash rounding to 0.05 steps") {
    val df = Seq(1.02, 1.03, 1.074, 1.076).toDF("v")
    val got = df.select(MoneyFns.cashRound(col("v"), 0.05).as("c"))
      .collect().map(_.getDecimal(0).doubleValue())
    assert(got.toSeq == Seq(1.00, 1.05, 1.05, 1.10))
  }

  test("net/tax from gross") {
    val df = Seq((119.0, 0.19)).toDF("gross", "rate")
    val r = df.select(
      MoneyFns.netFromGross(col("gross"), col("rate")).as("net"),
      MoneyFns.taxFromGross(col("gross"), col("rate")).as("tax")).head()
    assert(r.getDecimal(0).doubleValue() == 100.0)
    assert(r.getDecimal(1).doubleValue() == 19.0)
  }
}
