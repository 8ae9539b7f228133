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

  // --- round-8 modelling surface: parity table vs the C# factory rules ---

  test("TryParseRange grammar: from~to, from~, ~to, reversed bounds swap") {
    import graft.rules.FilterExpr.Pred
    import graft.operators.RuleOps.{GreaterThanOrEqualTo => Ge, LessThanOrEqualTo => Le}
    val cfg = QueryStringFactory.Config(termFields = Seq("name"),
      idField = "id", rangeField = "spent")
    def filtersOf(p: String) =
      QueryStringFactory.fromParams(Map("p" -> p), cfg).filters
    assert(filtersOf("10~500") == Seq(Pred("spent", Ge, 10.0), Pred("spent", Le, 500.0)))
    assert(filtersOf("10~") == Seq(Pred("spent", Ge, 10.0)))
    assert(filtersOf("~500") == Seq(Pred("spent", Le, 500.0)))
    // ConvertPrice normalization: min > max swaps
    assert(filtersOf("500~10") == Seq(Pred("spent", Ge, 10.0), Pred("spent", Le, 500.0)))
    assert(filtersOf("junk") == Seq.empty)
  }

  test("search mode + fuzzy flag flow from config onto the query") {
    val cfg = QueryStringFactory.Config(termFields = Seq("name"), idField = "id",
      mode = Search.TermMode.StartsWith, fuzzy = true)
    val q = QueryStringFactory.fromParams(Map("q" -> "ali"), cfg)
    assert(q.mode == Search.TermMode.StartsWith && q.fuzzy)
    // StartsWith: 'ali' prefixes alice only; Contains would also be just
    // alice here, so check the negative: 'lic' matches via Contains, not
    // via StartsWith
    val prefix = Search.run(customers, q)
    assert(prefix.hits.select("id").as[Long].collect().toSeq == Seq(1L))
    val sub = QueryStringFactory.fromParams(Map("q" -> "lic"), cfg)
    assert(Search.run(customers, sub).totalHits == 0)
    assert(Search.run(customers,
      sub.copy(mode = Search.TermMode.Contains)).totalHits == 1)
    // Exact mode: full-string case-insensitive equality
    val exact = QueryStringFactory.fromParams(Map("q" -> "ALICE"),
      cfg.copy(mode = Search.TermMode.Exact))
    assert(Search.run(customers, exact).totalHits == 1)
    assert(Search.run(customers, exact.copy(term = Some("alic"))).totalHits == 0)
  }

  test("facet specs: descriptor always emitted, filter only when token present") {
    import graft.dsl.QueryStringFactory.FacetSpec
    val cfg = QueryStringFactory.Config(termFields = Seq("name"), idField = "id",
      facetSpecs = Seq(
        FacetSpec("brand", "m", "country_id", sorting = "label",
          minHitCount = 2, maxChoices = 5),
        FacetSpec("price", "p", "spent"),
        FacetSpec("rating", "r", "spent")))
    // no tokens in the URL → descriptors still emitted, no filters, no
    // selections (AddFacet runs unconditionally in the reference)
    val bare = QueryStringFactory.fromParams(Map.empty, cfg)
    assert(bare.facets.map(_.field) == Seq("country_id", "spent", "spent"))
    assert(bare.filters.isEmpty && bare.facets.forall(_.selected.isEmpty))
    assert(bare.facets.head.minHitCount == 2 &&
      bare.facets.head.sorting == "label" && bare.facets.head.maxChoices == 5)
    // with tokens: id-list filter + selection marks; rating is a lower
    // bound (WithRating(fromRate, null))
    val q = QueryStringFactory.fromParams(
      Map("m" -> "2,3", "r" -> "100"), cfg)
    assert(q.filters.contains(graft.rules.FilterExpr.Pred(
      "country_id", graft.operators.RuleOps.In, Seq(2L, 3L))))
    assert(q.filters.contains(graft.rules.FilterExpr.Pred(
      "spent", graft.operators.RuleOps.GreaterThanOrEqualTo, 100.0)))
    assert(q.facets.head.selected == Seq(2L, 3L))
  }

  test("facet param aliases cascade language → neutral → built-in token") {
    import graft.dsl.QueryStringFactory.FacetSpec
    val cfg = QueryStringFactory.Config(termFields = Seq("name"), idField = "id",
      languageId = 3,
      facetSpecs = Seq(FacetSpec("brand", "m", "country_id")),
      facetParamAliases = Map((3, "brand") -> "marque", (0, "brand") -> "brand"))
    def inFilter(q: Search.Query) = q.filters.headOption
    // language-3 token wins
    assert(inFilter(QueryStringFactory.fromParams(Map("marque" -> "2"), cfg))
      .contains(graft.rules.FilterExpr.Pred(
        "country_id", graft.operators.RuleOps.In, Seq(2L))))
    // unknown language falls to neutral mapping
    assert(inFilter(QueryStringFactory.fromParams(Map("brand" -> "2"),
      cfg.copy(languageId = 9))).isDefined)
    // no mappings at all → the spec's built-in token ("m")
    assert(inFilter(QueryStringFactory.fromParams(Map("m" -> "2"),
      cfg.copy(facetParamAliases = Map.empty))).isDefined)
    // the facet param never leaks into the generic alias-IN path
    val q = QueryStringFactory.fromParams(Map("marque" -> "2"), cfg)
    assert(q.filters.size == 1)
  }

  test("localized sort tokens cascade and beat the suffix grammar") {
    val cfg = QueryStringFactory.Config(termFields = Seq("name"), idField = "id",
      languageId = 3,
      sortAliases = Map("price" -> "spent"),
      sortValueAliases = Map(
        (3, "prix-croissant") -> Search.Sort("spent"),
        (0, "cheapest") -> Search.Sort("spent")))
    assert(QueryStringFactory.fromParams(Map("o" -> "prix-croissant"), cfg).sorts
      == Seq(Search.Sort("spent")))
    // neutral fallback for an unmapped language
    assert(QueryStringFactory.fromParams(Map("o" -> "cheapest"),
      cfg.copy(languageId = 9)).sorts == Seq(Search.Sort("spent")))
    // suffix grammar still handles unlocalized tokens
    assert(QueryStringFactory.fromParams(Map("o" -> "price-desc"), cfg).sorts
      == Seq(Search.Sort("spent", descending = true)))
  }

  test("facet computation honors minHitCount and LabelAsc sorting") {
    val q = Search.Query(idField = "id",
      facets = Seq(Search.Facet("country_id", maxChoices = 5,
        minHitCount = 2, sorting = "label")))
    val r = Search.run(customers, q)
    val vals = r.facets("country_id").collect().map(x => x.getInt(0) -> x.getLong(1))
    // only country 2 has >= 2 customers (alice, dave)
    assert(vals.toSeq == Seq(2 -> 2L))
  }

  // --- round-9: the RuleSet => Search.Query rewriter (§3.2(b)) ---------

  test("search-rewriter parity table vs the C# descriptor mappings") {
    import graft.dsl.Search
    import graft.rules.{RuleSets, SearchRules}
    import graft.rules.FilterExpr.Pred
    import graft.operators.RuleOps._
    def q(rules: RuleSets.Rule*) = SearchRules.rewrite(
      RuleSets.RuleSet(rules = rules), SearchRules.productDescriptors,
      Search.Query(idField = "p_partkey"))
    // priceFilter: eq → Must equality (from==to collapse, Mandatory)
    assert(q(RuleSets.Rule("Price", "=", "910", "money")).filters
      == Seq(Pred("p_retailprice", IsEqualTo, 910.0)))
    // NE → MustNot equality (the 'forbidden' collapse)
    val ne = q(RuleSets.Rule("StockQuantity", "!=", "25", "int"))
    assert(ne.filters.isEmpty &&
      ne.mustNotFilters == Seq(Pred("p_size", IsEqualTo, 25L)))
    // the four inequalities map to half-open bounds
    assert(q(RuleSets.Rule("Price", ">", "905", "money")).filters
      == Seq(Pred("p_retailprice", GreaterThan, 905.0)))
    assert(q(RuleSets.Rule("StockQuantity", "<=", "30", "int")).filters
      == Seq(Pred("p_size", LessThanOrEqualTo, 30L)))
    // an operator outside the lambda's dispatch leaves the query UNCHANGED
    // (each reference filter lambda ends in `return ctx.Query`)
    val noop = q(RuleSets.Rule("Price", "Like", "9*", "string"))
    assert(noop.filters.isEmpty && noop.mustNotFilters.isEmpty)
    // In-list descriptors reject other operators (declared Operators array)
    intercept[IllegalArgumentException] {
      q(RuleSets.Rule("Manufacturer", ">=", "Brand#1", "string"))
    }
    // unknown rule name → no descriptor (the provider has no entry)
    intercept[IllegalArgumentException] {
      q(RuleSets.Rule("NoSuchRule", "=", "1", "int"))
    }
    // display order controls fold order; subsets flatten into the AND fold
    val multi = SearchRules.rewrite(RuleSets.RuleSet(
      rules = Seq(
        RuleSets.Rule("Price", ">=", "905", "money", displayOrder = 2),
        RuleSets.Rule("Manufacturer", "In", "Brand#1,Brand#2", "string[]",
          displayOrder = 1)),
      subsets = Seq(RuleSets.RuleSet(rules = Seq(
        RuleSets.Rule("ProductType", "In", "PROMO", "string[]"))))),
      SearchRules.productDescriptors, Search.Query(idField = "p_partkey"))
    assert(multi.filters == Seq(
      Pred("p_brand", In, Seq("Brand#1", "Brand#2")),
      Pred("p_retailprice", GreaterThanOrEqualTo, 905.0),
      Pred("p_type", In, Seq("PROMO"))))
    // OR groups are rejected loudly (LinqCatalogSearchService parity)
    intercept[IllegalArgumentException] {
      SearchRules.rewrite(RuleSets.RuleSet(andCombined = false),
        SearchRules.productDescriptors, Search.Query())
    }
  }

  test("rewritten rule set evaluates through the ordinary search pipeline") {
    import graft.dsl.Search
    import graft.rules.{RuleSets, SearchRules}
    // a custom descriptor table over the spec's customer frame, including
    // the boolean flag shape (PublishedOnly analog → tax_exempt)
    val descriptors = Map(
      "Spent" -> SearchRules.range("Spent", "spent"),
      "TaxExempt" -> SearchRules.flag("TaxExempt", "tax_exempt"),
      "Country" -> SearchRules.inList("Country", "country_id"))
    val set = RuleSets.RuleSet(rules = Seq(
      RuleSets.Rule("Spent", ">=", "100", "money"),
      RuleSets.Rule("TaxExempt", "=", "false", "bool")))
    val q = SearchRules.rewrite(set, descriptors, Search.Query(
      sorts = Seq(Search.Sort("id")), idField = "id"))
    val got = Search.pageOf(customers, q).select("id").as[Long].collect().toSeq
    assert(got == Seq(3L)) // carol: spent 999, not exempt
  }

  // --- round-9 ADVICE regressions -------------------------------------

  test("legacy '-' range grammar needs exactly two non-negative parts") {
    import graft.rules.FilterExpr.Pred
    import graft.operators.RuleOps.{GreaterThanOrEqualTo => Ge, LessThanOrEqualTo => Le}
    val cfg = QueryStringFactory.Config(termFields = Seq("name"),
      idField = "id", rangeField = "spent")
    def filtersOf(p: String) =
      QueryStringFactory.fromParams(Map("p" -> p), cfg).filters
    assert(filtersOf("10-50") == Seq(Pred("spent", Ge, 10.0), Pred("spent", Le, 50.0)))
    assert(filtersOf("-50") == Seq(Pred("spent", Le, 50.0))) // documented open end
    // a bare value is NOT a legacy range (the old grammar required two parts)
    assert(filtersOf("500") == Seq.empty)
    // negative values cannot mis-parse into bounds
    assert(filtersOf("-10--5") == Seq.empty)
    // the '~' reference grammar still accepts a bare lower bound
    assert(filtersOf("500~") == Seq(Pred("spent", Ge, 500.0)))
  }

  test("legacy rangeParam still parses when the price facet token is absent") {
    import graft.rules.FilterExpr.Pred
    import graft.operators.RuleOps.{GreaterThanOrEqualTo => Ge, LessThanOrEqualTo => Le}
    val cfg = QueryStringFactory.Config(termFields = Seq("name"),
      idField = "id", rangeField = "spent", languageId = 3,
      facetSpecs = Seq(QueryStringFactory.FacetSpec("price", "p", "spent")),
      facetParamAliases = Map((3, "price") -> "prix"))
    // the price facet resolves to 'prix'; a legacy URL carrying p=10~50
    // must still produce the range filter instead of dropping it
    val legacy = QueryStringFactory.fromParams(Map("p" -> "10~50"), cfg)
    assert(legacy.filters == Seq(Pred("spent", Ge, 10.0), Pred("spent", Le, 50.0)))
    // when the facet token IS present, the spec owns the range (no doubling)
    val viaFacet = QueryStringFactory.fromParams(
      Map("prix" -> "10~50", "p" -> "1~2"), cfg)
    assert(viaFacet.filters == Seq(Pred("spent", Ge, 10.0), Pred("spent", Le, 50.0)))
    // and when the resolved token IS the rangeParam, the spec also owns it
    val neutral = QueryStringFactory.fromParams(Map("p" -> "10~50"),
      cfg.copy(languageId = 0))
    assert(neutral.filters == Seq(Pred("spent", Ge, 10.0), Pred("spent", Le, 50.0)))
  }
}
