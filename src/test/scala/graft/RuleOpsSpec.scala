package graft

import graft.operators.RuleOps
import graft.operators.RuleOps._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Truth-table tests for the 20-operator rule algebra, mirroring the
  * reference's FilterTests fixture (FIXTURES.md §2 /
  * test/Smartstore.Core.Tests/Catalog/Rules/Filters/FilterTests.cs). */
class RuleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, username, taxExempt, billingCountryId: Option[Int], roleIds)
  private lazy val customers: DataFrame = Seq(
    (1, Some("john.doe"), true, Some(1), Seq(1, 2)),
    (2, Some("JANE"), false, Some(2), Seq(2, 3)),
    (3, Some(""), false, None, Seq.empty[Int]),
    (4, Some("   "), true, Some(3), Seq(1)),
    (5, None, false, Some(1), Seq(3, 4))
  ).toDF("id", "username", "tax_exempt", "billing_country_id", "role_ids")

  private def ids(op: Op, c: String, v: Any): Seq[Int] =
    customers.filter(RuleOps(op, col(c), v))
      .select("id").as[Int].collect().sorted.toSeq

  test("IsEqualTo is case-insensitive on strings") {
    assert(ids(IsEqualTo, "username", "jane") == Seq(2))
    assert(ids(IsEqualTo, "username", "JOHN.DOE") == Seq(1))
  }
  test("IsEqualTo on bool/int") {
    assert(ids(IsEqualTo, "tax_exempt", true) == Seq(1, 4))
    assert(ids(IsEqualTo, "billing_country_id", 1) == Seq(1, 5))
  }
  test("IsNotEqualTo drops nulls (SQL three-valued logic, like LINQ-to-SQL)") {
    assert(ids(IsNotEqualTo, "username", "jane") == Seq(1, 3, 4))
  }
  test("IsNull / IsNotNull") {
    assert(ids(IsNull, "username", null) == Seq(5))
    assert(ids(IsNull, "billing_country_id", null) == Seq(3))
    assert(ids(IsNotNull, "username", null) == Seq(1, 2, 3, 4))
  }
  test("IsEmpty counts null, empty and whitespace-only") {
    assert(ids(IsEmpty, "username", null) == Seq(3, 4, 5))
    assert(ids(IsNotEmpty, "username", null) == Seq(1, 2))
  }
  test("comparisons") {
    assert(ids(GreaterThan, "billing_country_id", 1) == Seq(2, 4))
    assert(ids(GreaterThanOrEqualTo, "billing_country_id", 2) == Seq(2, 4))
    assert(ids(LessThan, "billing_country_id", 2) == Seq(1, 5))
    assert(ids(LessThanOrEqualTo, "billing_country_id", 1) == Seq(1, 5))
  }
  test("StartsWith / EndsWith / Contains / NotContains are case-insensitive") {
    assert(ids(StartsWith, "username", "JOHN") == Seq(1))
    assert(ids(EndsWith, "username", "ne") == Seq(2))
    assert(ids(Contains, "username", "AN") == Seq(2))
    assert(ids(NotContains, "username", "jane") == Seq(1, 3, 4))
  }
  test("In / NotIn with string case-folding") {
    assert(ids(In, "username", Seq("Jane", "John.Doe")) == Seq(1, 2))
    assert(ids(NotIn, "username", Seq("jane")) == Seq(1, 3, 4))
    assert(ids(In, "billing_country_id", Seq(1, 3)) == Seq(1, 4, 5))
  }
  test("AllIn / NotAllIn over array columns") {
    assert(ids(AllIn, "role_ids", Seq(1, 2)) == Seq(1))
    assert(ids(AllIn, "role_ids", Seq(3)) == Seq(2, 5))
    assert(ids(NotAllIn, "role_ids", Seq(3)) == Seq(1, 3, 4))
  }
  test("Like / NotLike translate * and ? wildcards") {
    assert(ids(Like, "username", "j*") == Seq(1, 2))
    assert(ids(Like, "username", "?ane") == Seq(2))
    assert(ids(NotLike, "username", "j*") == Seq(3, 4))
  }
  test("validOps matrix excludes ordering ops for strings and bools") {
    assert(!RuleOps.validOps("string").contains(GreaterThan))
    assert(!RuleOps.validOps("bool").contains(Contains))
    assert(RuleOps.validOps("int").contains(GreaterThan))
    assert(RuleOps.validOps("array").contains(AllIn))
  }
}
