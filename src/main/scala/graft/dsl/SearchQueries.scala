package graft.dsl

import graft.{Q, Tables}
import graft.operators.RuleOps
import graft.rules.{Descriptors, FilterExpr}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Search-DSL, descriptor, raw-SQL, and flatten-join queries — SURVEY §3.1,
  * §2.11, §2.1 S6, §2.4 J4. */
object SearchQueries {

  private def partsQuery = Search.Query(
    term = Some("red"),
    termFields = Seq("p_name", "p_type"),
    filters = Seq(FilterExpr.Pred("p_size", RuleOps.GreaterThanOrEqualTo, 10)),
    sorts = Seq(Search.Sort("p_retailprice", descending = true)),
    pageIndex = 1,
    pageSize = 20,
    idField = "p_partkey")

  /** §3.1: full search pipeline — term + structured filter + sort + page 2. */
  def searchPage(s: SparkSession, dir: String): DataFrame =
    Search.pageOf(Tables.part(s, dir), partsQuery)
      .select(col("p_partkey"), col("p_name"), col("p_type"),
        col("p_size"), col("p_retailprice"))

  /** A8 via the DSL: brand facet over the same filtered frame. */
  def searchFacet(s: SparkSession, dir: String): DataFrame =
    Search.facetOf(Tables.part(s, dir), partsQuery, Search.Facet("p_brand", 10))

  /** §2.11 IRule, distributed bridge: a cart-rule SET segments customers
    * ({SpentAmount ≥ 200000 AND OrderCount ≥ 5} OR SpentAmount ≥ 800000
    * — the `SpentAmountRule`/`OrderCountRule` relational conditions
    * compiled to Columns by `CartRules.Segment`), composed with a search
    * DSL Must filter. The driver-side evaluator (`CartRules.evalExpr` —
    * the `CompositeRule` fold) carries the per-session semantics and is
    * truth-table-tested in CartRuleSpec; this query proves the SAME rule
    * tree also evaluates as one distributed pass. */
  def cartRuleSegment(s: SparkSession, dir: String): DataFrame = {
    import graft.rules.CartRules._
    import java.math.{BigDecimal => JBD}
    val rule: CartExpr = Group(and = false, Seq(
      Group(and = true, Seq(
        Leaf(SpentAmount(NumOp.Ge, new JBD(200000))),
        Leaf(OrderCount(NumOp.Ge, 5)))),
      Leaf(SpentAmount(NumOp.Ge, new JBD(800000)))))
    val stats = Segment.customerStats(Tables.customer(s, dir), Tables.orders(s, dir))
    val q = Search.Query(
      filters = Seq(FilterExpr.Pred("c_mktsegment", RuleOps.In,
        Seq("AUTOMOBILE", "BUILDING"))),
      idField = "c_custkey")
    Search.compileFiltered(stats.filter(Segment.exprColumn(rule)), q)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("spent"), col("order_cnt"))
      .orderBy(col("c_custkey"))
  }

  /** F7 end to end (q124): a LOCALIZED URL query string through the
    * alias-mapping factory (`CatalogSearchQueryFactory.CreateFromQueryAsync`
    * conventions: q/i/s/o params, range filter, aliased IN filters with
    * per-language facet-value aliases) compiled to a Search.Query and
    * paged — the whole front door on the oracle gate, not just specs.
    * German parameter names and value tokens resolve through the
    * language-2 alias layer to the same canonical descriptor an English
    * URL would produce. */
  def queryStringSearch(s: SparkSession, dir: String): DataFrame = {
    val mapper = QueryStringFactory.AliasMapper(
      fields = Map((0, "size") -> "p_size", (2, "groesse") -> "p_size",
        (0, "brand") -> "p_brand", (2, "marke") -> "p_brand"),
      values = Map((2, "p_size", "klein") -> 10L, (2, "p_size", "gross") -> 40L))
    val cfg = QueryStringFactory.Config(
      termFields = Seq("p_name", "p_type"),
      idField = "p_partkey",
      aliases = mapper,
      languageId = 2,
      rangeParam = "p",
      rangeField = "p_retailprice",
      sortAliases = Map("price" -> "p_retailprice"))
    val q = QueryStringFactory.fromParams(Map(
      "q" -> "red",
      "groesse" -> "klein,gross,25",
      "p" -> "900-",
      "o" -> "price-desc",
      "i" -> "1", "s" -> "15"), cfg)
    Search.pageOf(Tables.part(s, dir), q)
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        col("p_retailprice"))
  }

  /** §2.11 IRule breadth, distributed (q128): the round-8 cart rules with
    * a relational surface — BillingCountry (c_nationkey as the address
    * country), PaidBy In/NotIn (o_orderpriority as the per-order payment
    * method), PurchasedProduct (l_partkey across the customer's order
    * items) — composed with SpentAmount over `Segment.customerProfile`
    * and evaluated for EVERY customer in one distributed pass. The same
    * tree evaluates driver-side through `CartRules.evalExpr`; CartRuleSpec
    * asserts both paths agree row for row. */
  def cartRuleProfileSegment(s: SparkSession, dir: String): DataFrame = {
    import graft.rules.CartRules._
    import java.math.{BigDecimal => JBD}
    val rule: CartExpr = Group(and = false, Seq(
      Group(and = true, Seq(
        Leaf(BillingCountry(ListOp.In, 1L to 8L)),
        Leaf(PaidBy(ListOp.In, Seq("1-URGENT", "2-HIGH"))),
        Leaf(PurchasedProduct(ListOp.In, 1L to 40L)))),
      Group(and = true, Seq(
        Leaf(SpentAmount(NumOp.Ge, new JBD(900000))),
        Leaf(PaidBy(ListOp.NotIn, Seq("5-LOW")))))))
    val prof = Segment.customerProfile(Tables.customer(s, dir),
      Tables.orders(s, dir), Tables.lineitem(s, dir))
    prof.filter(Segment.exprColumn(rule))
      .select(col("c_custkey"), col("c_name"), col("country"),
        col("spent"), col("order_cnt"))
      .orderBy(col("c_custkey"))
  }

  /** J3 end to end (q127): the exact localized term-search shape — product
    * ⟕ localized-values OR-join + distinct (ApplySearchTerm,
    * LinqCatalogSearchService.cs:556-601 + :345-348). "rot" appears in NO
    * plain column, so every hit proves the localized join fired; part keys
    * divisible by 6 carry BOTH a matching Name and ShortDescription row,
    * so the pre-distinct frame is strictly larger (the multiplication
    * Distinct must collapse); the language-1 "rotfremd" rows also contain
    * the term, so a leak past the language filter changes the result. */
  def localizedTermSearch(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir)
    val q = Search.Query(
      term = Some("rot"),
      termFields = Seq("p_name", "p_type"),
      idField = "p_partkey",
      localized = Some(Localized.Source(
        Localized.syntheticProperties(part), languageId = 2)))
    Search.compileFiltered(part, q)
      .select(col("p_partkey"), col("p_name"), col("p_type"), col("p_size"))
      .orderBy(col("p_partkey"))
  }

  /** F7/A8 modelling surface (q129): a FRENCH facet-carrying URL through
    * the full factory — per-language facet PARAM aliases ("prix" resolves
    * to the price group through the GetCommonFacetAliasByGroupKind
    * cascade), the reference's "from~to" range grammar with REVERSED
    * bounds (factory swap-normalizes, ConvertPrice.cs:450-455), a
    * localized sort token, and facet-descriptor emission from the spec
    * table (AddFacet runs for every group whether or not its token is in
    * the URL — the brand facet below carries no selection). Output is the
    * brand facet of the filtered frame: min-hit floor 2, LabelAsc,
    * 8 choices. */
  def queryStringFacetSearch(s: SparkSession, dir: String): DataFrame = {
    val cfg = QueryStringFactory.Config(
      termFields = Seq("p_name", "p_type"),
      idField = "p_partkey",
      languageId = 3,
      facetSpecs = Seq(
        QueryStringFactory.FacetSpec("price", "p", "p_retailprice"),
        QueryStringFactory.FacetSpec("brand", "m", "p_brand",
          sorting = "label", minHitCount = 2, maxChoices = 8)),
      facetParamAliases = Map((3, "price") -> "prix", (3, "brand") -> "marque"),
      sortValueAliases = Map((3, "prix-croissant") -> Search.Sort("p_retailprice")))
    val q = QueryStringFactory.fromParams(Map(
      "q" -> "red",
      "prix" -> "1500~500", // reversed bounds — the factory swap-normalizes
      "o" -> "prix-croissant"), cfg)
    Search.facetOf(Tables.part(s, dir), q,
      q.facets.find(_.field == "p_brand").get)
  }

  /** §3.1 provider seam end to end (q130): a FUZZY search through the
    * registered inverted-index provider — the flag the relational path
    * ignores (like the reference's LINQ service) and only an indexed
    * engine can serve. "rad" matches every vocabulary token within one
    * Levenshtein edit ("red"), resolved on the DISTINCT vocabulary first
    * and joined back to the postings; the pruned frame then pages through
    * the shared compiler. Oracle: the same index built in SQL with an
    * EXISTS over levenshtein ≤ 1 (both engines implement classic edit
    * distance). */
  def fuzzySearch(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir)
    val scope = "q130-fuzzy"
    // round 9: candidates come from the 1-deletion-neighborhood index
    // (key-equality lookups + levenshtein verify residual) instead of a
    // vocabulary-wide levenshtein scan; the oracle is unchanged
    val idx = InvertedIndexProvider.build(part, "p_partkey", Seq("p_name", "p_type"))
    SearchService.register(scope, new InvertedIndexProvider(
      idx, Some(InvertedIndexProvider.buildDeletions(idx))))
    try {
      val q = Search.Query(term = Some("rad"), termFields = Seq("p_name", "p_type"),
        fuzzy = true, sorts = Seq(Search.Sort("p_partkey")), pageSize = 50,
        idField = "p_partkey")
      SearchService.search(part, q, scope).hits
        .select(col("p_partkey"), col("p_name"), col("p_type"))
    } finally SearchService.unregister(scope)
  }

  /** §3.2(b) end to end (q132): a persisted PRODUCT rule set evaluated
    * through the `SearchRules` rewriter — each rule row becomes a
    * `Search.Query` builder call via the descriptor table
    * (`ProductRuleProvider.LoadDescriptorsAsync` →
    * `SearchFilterExpressionGroup.ApplyFilters`) and the result runs
    * through the UNCHANGED §3.1 pipeline. The set exercises all three
    * rewrite shapes: In-lists (Manufacturer, nested ProductType subset),
    * an operator-sensitive range (Price ≥), and the NE → MustNot
    * equality collapse (StockQuantity != 25, the `from==to` + forbidden
    * path of `WithStockQuantity`). */
  def ruleSetSearch(s: SparkSession, dir: String): DataFrame = {
    import graft.rules.{RuleSets, SearchRules}
    val set = RuleSets.RuleSet(rules = Seq(
      RuleSets.Rule("Manufacturer", "In",
        "Brand#1,Brand#2,Brand#3,Brand#4,Brand#5", "string[]", displayOrder = 1),
      RuleSets.Rule("Price", ">=", "905", "money", displayOrder = 2),
      RuleSets.Rule("StockQuantity", "!=", "25", "int", displayOrder = 3)),
      subsets = Seq(RuleSets.RuleSet(rules = Seq(
        RuleSets.Rule("ProductType", "In", "PROMO,STANDARD", "string[]")))))
    Search.pageOf(Tables.part(s, dir), SearchRules.searchQuery(set))
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice"))
  }

  /** A8 multiselect semantics end to end (q136): a brand facet whose OWN
    * selection is active as a filter — standard faceted search computes
    * the facet's choice counts on the frame WITHOUT that selection
    * (sibling choices stay visible for the user to widen), while the
    * hits honor it (ADVICE r8; `Facet.isMultiSelect`). The oracle counts
    * under term+size filters only, proving the brand filter was excluded
    * from its own facet's counting frame. */
  def multiselectFacet(s: SparkSession, dir: String): DataFrame = {
    val q = Search.Query(
      term = Some("red"),
      termFields = Seq("p_name", "p_type"),
      filters = Seq(
        FilterExpr.Pred("p_brand", RuleOps.In, Seq("Brand#1", "Brand#2", "Brand#3")),
        FilterExpr.Pred("p_size", RuleOps.GreaterThanOrEqualTo, 10)),
      idField = "p_partkey")
    Search.facetOf(Tables.part(s, dir), q,
      Search.Facet("p_brand", maxChoices = 10, sorting = "label",
        isMultiSelect = true, selected = Seq("Brand#1", "Brand#2", "Brand#3")))
  }

  /** S6: raw-SQL escape hatch — temp view + spark.sql (the analog of
    * `DataProvider` SQL passthrough). */
  def rawSql(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("graft_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS cnt
        |FROM graft_lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** J4: M:N navigation flatten via the lineitem bridge, expressed as a
    * left-semi join (the survey's preferred dedup-free form). */
  def partsInOpenOrders(s: SparkSession, dir: String): DataFrame = {
    val openItems = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "O"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_partkey"))
    Tables.part(s, dir)
      .join(openItems, col("p_partkey") === col("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))
  }

  /** §2.11: aggregate-valued rule descriptors as pre-joined columns, then
    * ordinary rule operators on top. */
  def descriptorFilter(s: SparkSession, dir: String): DataFrame =
    Descriptors.withOrderDescriptors(Tables.customer(s, dir), Tables.orders(s, dir))
      .filter(RuleOps(RuleOps.GreaterThanOrEqualTo, col("completed_order_count"), 3) &&
        RuleOps(RuleOps.GreaterThanOrEqualTo, col("spent_amount"), 300000))
      .select(col("c_custkey"), col("order_count"),
        col("completed_order_count"), col("spent_amount").cast("double").as("spent_amount"))
      .orderBy(col("c_custkey"))

  /** Incremental inverted-index maintenance (q170) — the search-engine
    * refresh contract: the postings table is SET-semantic, so merging a
    * delta batch's postings into the base index (union + distinct) must
    * equal rebuilding the index from the whole corpus. This query runs
    * the INCREMENTAL side in Spark (base = 90% of docs, delta = the
    * rest, both through `InvertedIndexProvider.build`, merged set-wise)
    * and the oracle runs the FULL REBUILD in DuckDB — hash equality IS
    * the refresh-correctness proof. Output: the top-200 document
    * frequencies of the merged index (bounded, deterministic order).
    * At 100 TB both index generations persist bucketed by token, so the
    * merge is hash-partition-local with no re-shuffle of the base. */
  def indexRefresh(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val base = InvertedIndexProvider.build(
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id", Seq("text"))
    val delta = InvertedIndexProvider.build(
      docs.filter(col("doc_id") % 10 === 0), "doc_id", Seq("text"))
    base.unionByName(delta).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token"))
      .limit(200)
  }

  val qs: Seq[Q] = Seq(
    Q("q170_index_refresh", (s, d) => indexRefresh(s, d), Some(
      """WITH p AS (
        |  SELECT DISTINCT doc_id, tok AS token
        |  FROM (SELECT doc_id,
        |               unnest(string_split_regex(lower(text), '\s+')) AS tok
        |        FROM documents) t
        |  WHERE length(tok) > 0)
        |SELECT token, COUNT(*) AS df
        |FROM p GROUP BY token
        |ORDER BY df DESC, token
        |LIMIT 200""".stripMargin)),
    Q("q45_search_page", (s, d) => searchPage(s, d), Some(
      """SELECT p_partkey, p_name, p_type, p_size, p_retailprice
        |FROM part
        |WHERE (lower(p_name) LIKE '%red%' OR lower(p_type) LIKE '%red%')
        |  AND p_size >= 10
        |ORDER BY p_retailprice DESC, p_partkey
        |LIMIT 20 OFFSET 20""".stripMargin)),
    Q("q46_search_facet", (s, d) => searchFacet(s, d), Some(
      """SELECT p_brand AS value, COUNT(*) AS cnt
        |FROM part
        |WHERE (lower(p_name) LIKE '%red%' OR lower(p_type) LIKE '%red%')
        |  AND p_size >= 10
        |GROUP BY p_brand
        |ORDER BY cnt DESC, value
        |LIMIT 10""".stripMargin)),
    Q("q47_raw_sql", (s, d) => rawSql(s, d), Some(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS cnt
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),
    Q("q48_parts_open_orders", (s, d) => partsInOpenOrders(s, d), Some(
      """SELECT p_partkey, p_name
        |FROM part
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'O' AND l_partkey = p_partkey)
        |ORDER BY p_partkey""".stripMargin)),
    Q("q49_descriptor_filter", (s, d) => descriptorFilter(s, d), Some(
      """SELECT c_custkey,
        |       CAST(COALESCE(oc, 0) AS BIGINT) AS order_count,
        |       CAST(COALESCE(cc, 0) AS BIGINT) AS completed_order_count,
        |       CAST(COALESCE(sa, 0) AS DOUBLE) AS spent_amount
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, COUNT(*) AS oc,
        |         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS cc,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sa
        |  FROM orders GROUP BY o_custkey) t ON c_custkey = o_custkey
        |WHERE COALESCE(cc, 0) >= 3 AND COALESCE(sa, 0) >= 300000
        |ORDER BY c_custkey""".stripMargin)),
    Q("q124_querystring_search", (s, d) => queryStringSearch(s, d), Some(
      """SELECT p_partkey, p_name, p_size, p_retailprice
        |FROM part
        |WHERE (lower(p_name) LIKE '%red%' OR lower(p_type) LIKE '%red%')
        |  AND p_size IN (10, 40, 25)
        |  AND p_retailprice >= 900
        |ORDER BY p_retailprice DESC, p_partkey
        |LIMIT 15 OFFSET 0""".stripMargin)),
    Q("q130_fuzzy_search", (s, d) => fuzzySearch(s, d), Some(
      """WITH idx AS (
        |  SELECT DISTINCT p_partkey AS id,
        |         unnest(string_split(lower(p_name), ' ')) AS token FROM part
        |  UNION
        |  SELECT DISTINCT p_partkey AS id,
        |         unnest(string_split(lower(p_type), ' ')) AS token FROM part)
        |SELECT p_partkey, p_name, p_type
        |FROM part
        |WHERE EXISTS (SELECT 1 FROM idx
        |              WHERE idx.id = p_partkey
        |                AND levenshtein(idx.token, 'rad') <= 1)
        |ORDER BY p_partkey
        |LIMIT 50""".stripMargin)),
    Q("q136_multiselect_facet", (s, d) => multiselectFacet(s, d), Some(
      """SELECT p_brand AS value, COUNT(*) AS cnt
        |FROM part
        |WHERE (lower(p_name) LIKE '%red%' OR lower(p_type) LIKE '%red%')
        |  AND p_size >= 10
        |GROUP BY p_brand
        |ORDER BY value
        |LIMIT 10""".stripMargin)),
    Q("q132_rule_search", (s, d) => ruleSetSearch(s, d), Some(
      """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        |FROM part
        |WHERE p_brand IN ('Brand#1','Brand#2','Brand#3','Brand#4','Brand#5')
        |  AND p_retailprice >= 905
        |  AND NOT (p_size = 25)
        |  AND p_type IN ('PROMO','STANDARD')
        |ORDER BY p_partkey""".stripMargin)),
    Q("q129_querystring_facet", (s, d) => queryStringFacetSearch(s, d), Some(
      """SELECT p_brand AS value, COUNT(*) AS cnt
        |FROM part
        |WHERE (lower(p_name) LIKE '%red%' OR lower(p_type) LIKE '%red%')
        |  AND p_retailprice >= 500 AND p_retailprice <= 1500
        |GROUP BY p_brand
        |HAVING COUNT(*) >= 2
        |ORDER BY value
        |LIMIT 8""".stripMargin)),
    Q("q128_cart_rule_profile", (s, d) => cartRuleProfileSegment(s, d), Some(
      """WITH prof AS (
        |  SELECT c.c_custkey, c.c_name, CAST(c.c_nationkey AS BIGINT) AS country,
        |         CAST(COALESCE(SUM(CASE WHEN o.o_orderstatus = 'F'
        |                THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END), 0)
        |              AS DOUBLE) AS spent,
        |         COUNT(o.o_orderkey) AS order_cnt
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY 1, 2, 3)
        |SELECT c_custkey, c_name, country, spent, order_cnt
        |FROM prof p
        |WHERE (p.country <> 0 AND p.country BETWEEN 1 AND 8
        |       AND EXISTS (SELECT 1 FROM orders o
        |                   WHERE o.o_custkey = p.c_custkey
        |                     AND o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
        |       AND EXISTS (SELECT 1 FROM orders o
        |                   JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |                   WHERE o.o_custkey = p.c_custkey
        |                     AND l.l_partkey BETWEEN 1 AND 40))
        |   OR (p.spent >= 900000
        |       AND EXISTS (SELECT 1 FROM orders o
        |                   WHERE o.o_custkey = p.c_custkey
        |                     AND o.o_orderpriority NOT IN ('5-LOW')))
        |ORDER BY c_custkey""".stripMargin)),
    Q("q127_localized_search", (s, d) => localizedTermSearch(s, d), Some(
      """WITH lp AS (
        |  SELECT p_partkey AS entity_id, 2 AS language_id,
        |         'Product' AS locale_key_group, 'Name' AS locale_key,
        |         replace(p_name, 'red', 'rot') AS locale_value
        |  FROM part WHERE p_partkey % 2 = 0
        |  UNION ALL
        |  SELECT p_partkey, 2, 'Product', 'ShortDescription',
        |         'Kurz: ' || replace(p_name, 'red', 'rot')
        |  FROM part WHERE p_partkey % 3 = 0
        |  UNION ALL
        |  SELECT p_partkey, 1, 'Product', 'Name',
        |         replace(p_name, 'red', 'rotfremd')
        |  FROM part)
        |SELECT DISTINCT p.p_partkey, p.p_name, p.p_type, p.p_size
        |FROM part p
        |LEFT JOIN (SELECT * FROM lp
        |           WHERE language_id = 2 AND locale_key_group = 'Product') l
        |  ON p.p_partkey = l.entity_id
        |WHERE lower(p.p_name) LIKE '%rot%' OR lower(p.p_type) LIKE '%rot%'
        |   OR (l.locale_key = 'Name' AND lower(l.locale_value) LIKE '%rot%')
        |   OR (l.locale_key = 'ShortDescription'
        |       AND lower(l.locale_value) LIKE '%rot%')
        |ORDER BY p_partkey""".stripMargin)),
    Q("q119_cart_rule_segment", (s, d) => cartRuleSegment(s, d), Some(
      """WITH st AS (
        |  SELECT c.c_custkey, c.c_name, c.c_mktsegment,
        |         CAST(COALESCE(SUM(CASE WHEN o.o_orderstatus = 'F'
        |                THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END), 0)
        |              AS DOUBLE) AS spent,
        |         COUNT(o.o_orderkey) AS order_cnt
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY 1, 2, 3)
        |SELECT c_custkey, c_name, c_mktsegment, spent, order_cnt
        |FROM st
        |WHERE ((spent >= 200000 AND order_cnt >= 5) OR spent >= 800000)
        |  AND c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
        |ORDER BY c_custkey""".stripMargin))
  )
}
