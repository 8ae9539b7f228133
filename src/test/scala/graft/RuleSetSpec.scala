package graft

import graft.dsl.{QueryStringFactory, Search}
import graft.rules.{FilterExpr, FilterParser, RuleSets}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Persisted rule-set compilation, query-string factory, and DSL-across-
  * members — the §3.1/§3.2 lifecycle front doors. */
class RuleSetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def customers = Seq(
    (1L, "alice", 2, 150.0, true),
    (2L, "bob", 1, 50.0, false),
    (3L, "carol", 3, 999.0, false),
    (4L, "dave", 2, 10.0, true)
  ).toDF("id", "name", "country_id", "spent", "tax_exempt")

  test("rule set with string values coerces by rule type and nests groups") {
    import RuleSets._
    // (country_id In [1,2] AND spent >= 100) OR NOT(tax_exempt = true)
    val set = RuleSet(andCombined = false, rules = Seq.empty, subsets = Seq(
      RuleSet(rules = Seq(
        Rule("country_id", "In", "1,2", "int[]"),
        Rule("spent", ">=", "100", "money"))),
      RuleSet(negated = true, rules = Seq(
        Rule("tax_exempt", "=", "true", "bool")))))
    val got = RuleSets(customers, set).select("id").as[Long].collect().sorted.toSeq
    // subset1: {1}; subset2 negated: !taxexempt → {2,3}
    assert(got == Seq(1L, 2L, 3L))
  }

  test("unknown operator token raises") {
    intercept[IllegalArgumentException](RuleSets.parseOp("~~~"))
  }

  test("query-string factory parses term, paging, sort, range, IN aliases") {
    val cfg = QueryStringFactory.Config(
      termFields = Seq("name"),
      idField = "id",
      fieldAliases = Map("c" -> "country_id"),
      rangeParam = "p", rangeField = "spent",
      sortAliases = Map("price" -> "spent"))
    val q = QueryStringFactory.fromParams(
      Map("q" -> "a", "c" -> "2,3", "p" -> "10-500", "o" -> "price-desc",
        "i" -> "1", "s" -> "2"), cfg)
    assert(q.term.contains("a"))
    assert(q.pageIndex == 0 && q.pageSize == 2)
    assert(q.sorts == Seq(Search.Sort("spent", descending = true)))
    val r = Search.run(customers, q)
    // name contains 'a', country in (2,3), spent 10..500 → alice(150), dave(10)
    assert(r.totalHits == 2)
    assert(r.hits.select("id").as[Long].collect().toSeq == Seq(1L, 4L))
  }

  test("open-ended range: p=100-") {
    val cfg = QueryStringFactory.Config(termFields = Seq("name"),
      idField = "id", rangeField = "spent")
    val q = QueryStringFactory.fromParams(Map("p" -> "100-"), cfg)
    val r = Search.run(customers, q)
    assert(r.hits.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("DSL across members OR-combines (ApplyFilter shape)") {
    val node = FilterParser.parseForMembers("ali*",
      Seq(("name", true), ("id", true)))
    val got = customers.filter(FilterExpr.compile(node, col))
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }
}
