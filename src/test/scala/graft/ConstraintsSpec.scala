package graft

import org.scalatest.funsuite.AnyFunSuite

/** Deequ-style constraint audit (q187): the one-pass audit must equal a
  * driver-side recomputation, referential must count orphans (and only
  * non-null ones), and a failing constraint must REPORT, not throw. */
class ConstraintsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("audit computes every metric in one pass and flags failures") {
    val df = Seq(
      (1L, Some("a"), 10.0),
      (2L, None, -5.0),
      (2L, Some("c"), 20.0)).toDF("id", "name", "bal")
    import org.apache.spark.sql.functions._
    val out = etl.Constraints.audit(df, Seq(
      etl.Constraints.Constraint("complete_name",
        sum(col("name").isNotNull.cast("long")) / count(lit(1)), _ === 1d),
      etl.Constraints.Constraint("unique_id",
        countDistinct(col("id")) / count(lit(1)), _ === 1d),
      etl.Constraints.Constraint("min_bal", min(col("bal")), _ >= 0d)))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getInt(2))))
      .toMap
    assert(out("complete_name") == ((0.666667, 0)))
    assert(out("unique_id") == ((0.666667, 0)))
    assert(out("min_bal") == ((-5.0, 0)))
  }

  test("referential counts only non-null orphans") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = etl.Constraints.referential("fk_check", child, "fk", parent, "pk")
      .collect().head
    assert(r.getString(0) == "fk_check")
    assert(r.getDouble(1) == 1.0) // only 9 is an orphan; NULL is not
    assert(r.getInt(2) == 0)
  }

  test("q187 battery == driver recomputation at sf0.001") {
    val cust = Tables.customer(spark, TestSpark.sfDir)
      .select("c_custkey", "c_name", "c_acctbal").collect()
    val ord = Tables.orders(spark, TestSpark.sfDir)
      .select("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .collect()
    val custKeys = cust.map(_.getLong(0)).toSet
    val n = cust.length.toDouble
    val on = ord.length.toDouble
    val exp = Map(
      "cust_complete_name" ->
        cust.count(!_.isNullAt(1)) / n,
      "cust_unique_custkey" ->
        cust.map(_.getLong(0)).distinct.length / n,
      "cust_min_acctbal" -> cust.map(_.getDouble(2)).min,
      "ord_status_domain" ->
        ord.count(r => Set("O", "F", "P")(r.getString(1))) / on,
      "ord_price_positive" -> ord.count(_.getDouble(2) > 0) / on,
      "ord_priority_complete" -> ord.count(!_.isNullAt(3)) / on,
      "ord_fk_custkey" ->
        ord.count(r => !r.isNullAt(0) && !custKeys(r.getLong(0))).toDouble)
    val got = etl.Constraints.constraintAudit(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getInt(2))))
      .toMap
    exp.foreach { case (k, v) =>
      val rounded = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      assert(got(k)._1 == rounded, s"metric mismatch for $k")
    }
    // the referential check must pass on the generated star schema
    assert(got("ord_fk_custkey") == ((0.0, 1)))
    assert(got.size == 9)
  }
}
