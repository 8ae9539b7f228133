package graft

import graft.dsl.{Localized, Search}
import graft.operators.RuleOps
import graft.rules.FilterExpr
import org.apache.spark.sql.functions.lower
import org.scalatest.funsuite.AnyFunSuite

/** Search-DSL engine tests mirroring the reference's search-service suite
  * (LinqCatalogSearchServiceTests.cs:26-91): ordering, paging slices,
  * boundary fix-up, term matching, facets off the shared frame. */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 20 products, skus 1..20
  private def products = (1 to 20).map(i =>
    (i.toLong, s"Product $i", s"SKU-$i", if (i % 2 == 0) "even" else "odd", i * 10.0))
    .toDF("id", "name", "sku", "kind", "price")

  test("paging slice: page 3 of size 5 → ids 11-15 (reference slice test)") {
    val q = Search.Query(sorts = Seq(Search.Sort("id")), pageIndex = 2, pageSize = 5)
    val r = Search.run(products, q)
    assert(r.totalHits == 20)
    assert(r.hits.select("id").as[Long].collect().toSeq == (11L to 15L))
  }

  test("page boundary fix-up: page index beyond total falls to last page") {
    val q = Search.Query(sorts = Seq(Search.Sort("id")), pageIndex = 99, pageSize = 6)
    val r = Search.run(products, q)
    assert(r.pageIndex == 3)
    assert(r.hits.select("id").as[Long].collect().toSeq == Seq(19L, 20L))
  }

  test("term + structured filter + descending sort") {
    val q = Search.Query(
      term = Some("product 1"),                   // matches 1, 10..19
      termFields = Seq("name"),
      filters = Seq(FilterExpr.Pred("kind", RuleOps.IsEqualTo, "even")),
      sorts = Seq(Search.Sort("price", descending = true)),
      pageSize = 3)
    val r = Search.run(products, q)
    assert(r.totalHits == 5)                      // evens among {1,10..19}: 10,12,14,16,18
    assert(r.hits.select("id").as[Long].collect().toSeq == Seq(18L, 16L, 14L))
  }

  test("Should/MustNot occurrence (F6): one should must hold, no mustNot may") {
    import graft.operators.RuleOps._
    val q = Search.Query(
      shouldFilters = Seq(
        FilterExpr.Pred("id", LessThanOrEqualTo, 4),
        FilterExpr.Pred("id", GreaterThanOrEqualTo, 18)),
      mustNotFilters = Seq(FilterExpr.Pred("kind", IsEqualTo, "even")),
      sorts = Seq(Search.Sort("id")))
    val r = Search.run(products, q)
    // (id<=4 or id>=18) and not even → 1,3,19
    assert(r.hits.select("id").as[Long].collect().toSeq == Seq(1L, 3L, 19L))
  }

  test("facets computed off the same filtered frame") {
    val q = Search.Query(term = Some("product 1"), termFields = Seq("name"),
      facets = Seq(Search.Facet("kind")))
    val r = Search.run(products, q)
    val f = r.facets("kind").collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(f == Map("odd" -> 6L, "even" -> 5L))   // 1,11,13,15,17,19 / 10,12,14,16,18
  }

  // --- J3: localized term search (ApplySearchTerm two-table OR-join) ---

  // lp fixture: id 2 has TWO matching German rows (Name + ShortDescription
  // both contain "stiefel") → join multiplies, distinct must collapse;
  // id 3 matches ONLY via its localized Name; id 5's FRENCH row contains
  // the term → must NOT leak into a German search; id 7 has a German row
  // in another key group → must not match either.
  private def lpRows = Seq(
    (2L, 2, "Product", "Name", "Stiefel rot"),
    (2L, 2, "Product", "ShortDescription", "Kurz: stiefel"),
    (3L, 2, "Product", "Name", "Winterstiefel"),
    (5L, 1, "Product", "Name", "le stiefel"),
    (7L, 2, "Category", "Name", "stiefelwaren"))
    .toDF("entity_id", "language_id", "locale_key_group", "locale_key", "locale_value")

  private def lpQuery(lang: Int) = Search.Query(
    term = Some("stiefel"),
    termFields = Seq("name"),
    localized = Some(Localized.Source(lpRows, languageId = lang)))

  test("J3: localized-only match found, duplicates collapsed, one plain match kept") {
    // plain side: name "Product 1".contains("stiefel") never holds; add a
    // product whose PLAIN name matches to prove the OR keeps both sides
    val prods = products.union(Seq(
      (21L, "Stiefelhaus 21", "SKU-21", "odd", 210.0)).toDF(products.columns: _*))
    val hits = Search.compileFiltered(prods, lpQuery(lang = 2))
    val ids = hits.select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(2L, 3L, 21L))               // 5 (french) and 7 (group) excluded
    assert(ids.distinct == ids)                   // the double-match on id 2 collapsed
  }

  test("J3: the pre-distinct join really multiplies (grouping was required)") {
    val src = Localized.Source(lpRows, languageId = 2)
    val q = lpQuery(lang = 2)
    val prods = products
    val lp = lpRows.filter($"language_id" === 2 && $"locale_key_group" === "Product")
    val preDistinct = prods.join(lp, prods("id") === lp("entity_id"), "left")
      .filter(lp("locale_value").isNotNull &&
        lower(lp("locale_value")).contains("stiefel"))
      .count()
    val postDistinct = Localized.termSearch(prods, q, "stiefel", src).count()
    assert(preDistinct == 3)                      // id 2 twice + id 3 once
    assert(postDistinct == 2)
  }

  test("J3: languageId 0 (no working language) skips the localized join") {
    val hits = Search.compileFiltered(products, lpQuery(lang = 0))
    assert(hits.count() == 0)                     // plain names never match
    assert(!hits.queryExecution.optimizedPlan.toString.toLowerCase.contains("join"))
  }

  // --- §3.1 provider seam (CatalogSearchService.SearchAsync dispatch) ---

  test("provider seam: registered provider serves; direct/missing-index falls back") {
    import graft.dsl.{InvertedIndexProvider, SearchProvider, SearchService}
    val scope = "test-scope"
    val q = Search.Query(term = Some("product"), termFields = Seq("name"),
      sorts = Seq(Search.Sort("id")), pageSize = 50, idField = "id")
    try {
      // the index knows only ids 1 and 2 — if the provider path runs, the
      // result set proves it (the direct contains-scan would find all 20)
      val index = Seq((1L, "product"), (2L, "product")).toDF("id", "token")
      SearchService.register(scope, new InvertedIndexProvider(index))
      val viaProvider = SearchService.search(products, q, scope)
      assert(viaProvider.totalHits == 2)
      // direct = true bypasses the provider (SearchDirectAsync)
      val direct = SearchService.search(products, q, scope, direct = true)
      assert(direct.totalHits == 20)
      // a provider whose index store does not exist is skipped
      SearchService.register(scope, new SearchProvider {
        val name = "unbuilt"
        val indexExists = false
        def search(df: org.apache.spark.sql.DataFrame, q: Search.Query) =
          fail("an index-less provider must never serve")
      })
      assert(SearchService.search(products, q, scope).totalHits == 20)
      // no provider registered for the scope at all
      assert(SearchService.search(products, q, "other-scope").totalHits == 20)
    } finally SearchService.unregister(scope)
  }

  test("inverted-index build + token search agree with direct search on whole tokens") {
    import graft.dsl.{InvertedIndexProvider, SearchService}
    val scope = "test-idx"
    try {
      val index = InvertedIndexProvider.build(products, "id", Seq("name", "sku"))
      SearchService.register(scope, new InvertedIndexProvider(index))
      // "7" is a whole token of no name ("Product 7" tokenizes to
      // [product, 7]) — token search finds exactly id 7; the direct
      // substring scan ALSO matches 17 ("Product 17"): the honest
      // index-vs-LIKE semantic difference, both asserted
      val q = Search.Query(term = Some("7"), termFields = Seq("name"),
        sorts = Seq(Search.Sort("id")), idField = "id")
      val viaIndex = SearchService.search(products, q, scope)
      assert(viaIndex.hits.select("id").as[Long].collect().toSeq == Seq(7L))
      val direct = SearchService.search(products, q, scope, direct = true)
      assert(direct.hits.select("id").as[Long].collect().toSeq == Seq(7L, 17L))
      // structured filters/paging run in the SHARED compiler on both paths
      val filtered = q.copy(term = Some("product"),
        filters = Seq(FilterExpr.Pred("kind", RuleOps.IsEqualTo, "even")))
      assert(SearchService.search(products, filtered, scope).totalHits == 10)
    } finally SearchService.unregister(scope)
  }

  test("fuzzy flag: consumed by the index provider, ignored by the direct path") {
    import graft.dsl.{InvertedIndexProvider, SearchService}
    val scope = "test-fuzzy"
    try {
      SearchService.register(scope, new InvertedIndexProvider(
        InvertedIndexProvider.build(products, "id", Seq("sku"))))
      // 'SKU-20' misspelled as 'sku-29' is one edit away
      val q = Search.Query(term = Some("sku-29"), termFields = Seq("sku"),
        fuzzy = true, sorts = Seq(Search.Sort("id")), idField = "id")
      val viaProvider = SearchService.search(products, q, scope)
      // within one edit: sku-29 → sku-20..sku-2/sku-9/sku-19... exact set:
      val expect = (1 to 20).map(i => s"sku-$i")
        .filter(s => editDist(s, "sku-29") <= 1).size
      assert(viaProvider.totalHits == expect && viaProvider.totalHits > 0)
      // the direct path ignores fuzzy (reference LINQ semantics): a
      // substring scan for the misspelling finds nothing
      assert(SearchService.search(products, q, scope, direct = true).totalHits == 0)
    } finally SearchService.unregister(scope)
  }

  test("deletion-neighborhood fuzzy candidates == vocabulary-scan candidates") {
    import graft.dsl.InvertedIndexProvider
    val idx = InvertedIndexProvider.build(products, "id", Seq("sku", "name"))
    val scan = new InvertedIndexProvider(idx)
    val dels = InvertedIndexProvider.buildDeletions(idx)
    val keyed = new InvertedIndexProvider(idx, Some(dels))
    // every query term shape: exact token, substitution, insertion,
    // deletion, distance-2 (must be rejected by the verify residual)
    for (term <- Seq("sku-7", "sku-29", "skuu-2", "sk-2", "xku-2x", "product")) {
      val viaScan = scan.fuzzyTokens(term).collect().map(_.getString(0)).toSet
      val viaKeys = keyed.fuzzyTokens(term).collect().map(_.getString(0)).toSet
      assert(viaKeys == viaScan, s"term '$term'")
    }
    // the deletion gear must NOT scan the vocabulary with levenshtein:
    // its plan filters the deletion-key table by key equality (dkey IN …)
    // and applies levenshtein only on the candidate aggregate above it
    val plan = keyed.fuzzyTokens("sku-29").queryExecution.analyzed.toString
    val dkeyLine = plan.linesIterator.indexWhere(l =>
      l.contains("Filter dkey") && l.contains(" IN ("))
    val levLine = plan.linesIterator.indexWhere(_.contains("levenshtein"))
    assert(dkeyLine >= 0, plan)
    assert(levLine >= 0 && levLine < dkeyLine, plan) // verify sits ABOVE the lookup
    // a same-key pair at true distance 2 exists and is filtered: both
    // 'ab-1x' and 'xab-1' delete to 'ab-1' but sit 2 edits apart
    assert(InvertedIndexProvider.deletionKeys("ab-1x").contains("ab-1"))
    // end-to-end: the q130 shape returns identical hits on both gears
    val q = Search.Query(term = Some("sku-29"), termFields = Seq("sku"),
      fuzzy = true, sorts = Seq(Search.Sort("id")), idField = "id")
    val a = scan.search(products, q).hits.select("id").as[Long].collect().toSeq
    val b = keyed.search(products, q).hits.select("id").as[Long].collect().toSeq
    assert(a == b && a.nonEmpty)
    // the neighborhood index only claims edit distance 1
    intercept[IllegalArgumentException] {
      new InvertedIndexProvider(idx, Some(dels), maxEdits = 2)
    }
  }

  test("multiselect facet counts exclude the facet's own selection") {
    // URL selected kind=even → hard filter on the hits, but the facet's
    // OWN counts must come from the frame WITHOUT that filter (standard
    // faceted search: sibling choices stay visible); a single-select
    // facet keeps post-selection counts
    val sel = FilterExpr.Pred("kind", RuleOps.In, Seq("even"))
    val price = FilterExpr.Pred("price", RuleOps.GreaterThan, 100.0)
    val multi = Search.Query(idField = "id", filters = Seq(sel, price),
      facets = Seq(Search.Facet("kind", sorting = "label",
        isMultiSelect = true, selected = Seq("even"))))
    val r = Search.run(products, multi)
    // hits honor both filters: even ids > 10 → 12,14,16,18,20
    assert(r.totalHits == 5)
    // counts honor only the price filter: ids 11..20 → 5 even, 5 odd
    val counts = r.facets("kind").collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(counts == Map("even" -> 5L, "odd" -> 5L))
    // single-select: counts stay post-selection (only 'even' survives)
    val single = Search.run(products, multi.copy(facets = Seq(Search.Facet(
      "kind", sorting = "label", isMultiSelect = false, selected = Seq("even")))))
    val sc = single.facets("kind").collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(sc == Map("even" -> 5L))
  }

  private def editDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
