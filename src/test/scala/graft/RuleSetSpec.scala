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

  test("per-language aliases: two localized URLs compile to the same descriptor") {
    // CatalogSearchQueryAliasMapper semantics: field aliases and facet-
    // VALUE aliases are both per-language with a neutral (0) fallback
    val mapper = QueryStringFactory.AliasMapper(
      fields = Map(
        (0, "country") -> "country_id",
        (1, "country") -> "country_id", // en
        (2, "land") -> "country_id"),   // de
      values = Map(
        (1, "country_id", "narnia") -> 2L,
        (2, "country_id", "narnien") -> 2L))
    def cfgFor(lang: Int) = QueryStringFactory.Config(
      termFields = Seq("name"), idField = "id",
      aliases = mapper, languageId = lang, rangeField = "spent")
    val en = QueryStringFactory.fromParams(Map("country" -> "narnia"), cfgFor(1))
    val de = QueryStringFactory.fromParams(Map("land" -> "narnien"), cfgFor(2))
    assert(en.filters == de.filters,
      "differently-localized URLs must produce the identical descriptor")
    assert(en.filters == Seq(graft.rules.FilterExpr.Pred(
      "country_id", graft.operators.RuleOps.In, Seq(2L))))
    val enHits = Search.run(customers, en)
    val deHits = Search.run(customers, de)
    assert(enHits.hits.select("id").as[Long].collect().toSeq ==
      deHits.hits.select("id").as[Long].collect().toSeq)
    assert(enHits.totalHits > 0)
  }

  test("alias cascade falls back to the language-neutral entry") {
    val mapper = QueryStringFactory.AliasMapper(
      fields = Map((0, "c") -> "country_id", (2, "c") -> "name"),
      values = Map((0, "country_id", "somewhere") -> 3L))
    // language 9 has no entries of its own → neutral field + neutral value
    val cfg = QueryStringFactory.Config(termFields = Seq("name"), idField = "id",
      aliases = mapper, languageId = 9, rangeField = "spent")
    val q = QueryStringFactory.fromParams(Map("c" -> "somewhere,4"), cfg)
    assert(q.filters == Seq(graft.rules.FilterExpr.Pred(
      "country_id", graft.operators.RuleOps.In, Seq(3L, 4L))))
    // language 2 OVERRIDES the field alias; unmapped values stay literal
    val q2 = QueryStringFactory.fromParams(Map("c" -> "alice"),
      cfg.copy(languageId = 2))
    assert(q2.filters == Seq(graft.rules.FilterExpr.Pred(
      "name", graft.operators.RuleOps.In, Seq("alice"))))
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
