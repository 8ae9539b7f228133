package graft.rules

import graft.dsl.Search
import graft.operators.RuleOps

/** §3.2(b): the rule-set → search-query rewrite path — the Spark analog
  * of `ProductRuleProvider` + `SearchFilterDescriptor`
  * (`src/Smartstore.Core/Catalog/Rules/ProductRuleProvider.cs:142-260`,
  * `SearchFilterDescriptor.cs:12-37`,
  * `SearchFilterExpressionGroup.cs:35-47`).
  *
  * The reference evaluates a PRODUCT-scope rule set not by compiling
  * rules to predicates (path (a), `RuleSets`) nor by per-session runtime
  * checks (path (c), `CartRules`) but by REWRITING each persisted rule
  * row into `CatalogSearchQuery` builder calls through a name-keyed
  * descriptor table, then running the ordinary search pipeline. This
  * module mirrors that third architecture: a `Descriptor` maps one rule
  * name onto a `Search.Query => Search.Query` builder step, and
  * `rewrite` folds a rule set through the table exactly like
  * `SearchFilterExpressionGroup.ApplyFilters` folds its expressions.
  *
  * Faithful semantics:
  *  - AND-only: the reference group hardcodes `LogicalRuleOperator.And`
  *    and its own HOWTO comment records that the LINQ search service
  *    cannot evaluate OR groups — an OR set is rejected here, loudly.
  *  - Operator-sensitive numeric/datetime rules (`stockQuantityFilter`,
  *    `priceFilter`, `createdFilter`, ProductRuleProvider.cs:165-225):
  *    eq folds to a Must equality, NE to a MustNot equality (the
  *    `from==to` + `forbidden` collapse of `WithStockQuantity`,
  *    CatalogSearchQuery.cs:346-371), gt/ge/lt/le to half-open bounds,
  *    and any OTHER operator returns the query UNCHANGED (each reference
  *    lambda ends in `return ctx.Query`).
  *  - List rules (`WithProductIds`, `WithManufacturerIds`…) fold to an
  *    In filter; boolean flag rules (`PublishedOnly`…) to an equality.
  *  - Subsets flatten into the same fold (`AddExpressions` collects the
  *    leaf expressions of a passed group; nesting carries no precedence
  *    because everything ANDs).
  *
  * The rewritten query then runs through the UNCHANGED §3.1 compiler —
  * at scale the win is that rule evaluation inherits every search-path
  * property (pushdown, shared filtered frame, provider dispatch) instead
  * of owning a second predicate pipeline.
  */
object SearchRules {

  /** `SearchFilterContext`: the query being built + the rule row's
    * operator and coerced value. */
  final case class Ctx(query: Search.Query, op: RuleOps.Op, value: Any)

  /** `SearchFilterDescriptor<TValue>` analog: rule name → builder step.
    * `operators` restricts what the rule may carry (the reference
    * descriptors declare e.g. `{ RuleOperator.IsEqualTo }`); empty means
    * the descriptor handles operator dispatch itself. */
  final case class Descriptor(
      name: String,
      operators: Seq[RuleOps.Op] = Seq.empty,
      rewrite: Ctx => Search.Query)

  private def pred(f: String, op: RuleOps.Op, v: Any) = FilterExpr.Pred(f, op, v)

  private def must(q: Search.Query, n: FilterExpr.Node): Search.Query =
    q.copy(filters = q.filters :+ n)

  /** The shared operator-sensitive shape of `stockQuantityFilter` /
    * `priceFilter` / `createdFilter`: eq → Must equality, ne → MustNot
    * equality, bounds for the four inequalities, anything else no-op. */
  def range(name: String, field: String): Descriptor =
    Descriptor(name, rewrite = ctx => {
      import RuleOps._
      ctx.op match {
        case IsEqualTo    => must(ctx.query, pred(field, IsEqualTo, ctx.value))
        case IsNotEqualTo => ctx.query.copy(mustNotFilters =
          ctx.query.mustNotFilters :+ pred(field, IsEqualTo, ctx.value))
        case GreaterThanOrEqualTo | GreaterThan | LessThanOrEqualTo | LessThan =>
          must(ctx.query, pred(field, ctx.op, ctx.value))
        case _ => ctx.query // reference lambdas fall through unchanged
      }
    })

  /** `WithProductIds`/`WithManufacturerIds`/… : In-list membership. */
  def inList(name: String, field: String): Descriptor =
    Descriptor(name, operators = Seq(RuleOps.In),
      rewrite = ctx => must(ctx.query, pred(field, RuleOps.In, ctx.value)))

  /** `PublishedOnly`/`DownloadOnly`/… boolean flags: equality on the
    * flag column with the rule's bool value. */
  def flag(name: String, field: String): Descriptor =
    Descriptor(name, operators = Seq(RuleOps.IsEqualTo),
      rewrite = ctx => must(ctx.query, pred(field, RuleOps.IsEqualTo, ctx.value)))

  /** The product descriptor table over the star schema's `part` — the
    * analog of `LoadDescriptorsAsync`'s list, with reference rule names
    * kept where the column mapping is direct (Manufacturer binds to the
    * brand column, the schema's only maker dimension). */
  val productDescriptors: Map[String, Descriptor] = Seq(
    inList("Product", "p_partkey"),
    inList("Manufacturer", "p_brand"),
    inList("ProductType", "p_type"),
    range("Price", "p_retailprice"),
    range("StockQuantity", "p_size")
  ).map(d => d.name -> d).toMap

  /** `SearchFilterExpressionGroup.ApplyFilters` + the recursive set walk:
    * fold every rule of the set (and its flattened subsets) through the
    * descriptor table, in display order. */
  def rewrite(set: RuleSets.RuleSet, descriptors: Map[String, Descriptor],
      base: Search.Query): Search.Query = {
    require(set.andCombined,
      "OR rule groups cannot rewrite to a search query " +
        "(reference parity: LinqCatalogSearchService has no OR support)")
    val afterRules = set.rules.sortBy(_.displayOrder).foldLeft(base) { (q, r) =>
      val d = descriptors.getOrElse(r.member, throw new IllegalArgumentException(
        s"no search descriptor for rule '${r.member}'"))
      val op = RuleSets.parseOp(r.op)
      require(d.operators.isEmpty || d.operators.contains(op),
        s"operator '${r.op}' not allowed on rule '${r.member}'")
      d.rewrite(Ctx(q, op, RuleSets.coerce(r.value, r.ruleType)))
    }
    set.subsets.foldLeft(afterRules)((q, sub) => rewrite(sub, descriptors, q))
  }

  /** `ProductRuleProvider.SearchAsync` defaults: evaluated rule sets page
    * through the ordinary pipeline sorted by the entity's creation order
    * (`SortBy(ProductSortingEnum.CreatedOn)` — the id column stands in
    * for CreatedOn on the star schema) with facet mapping off. */
  def searchQuery(set: RuleSets.RuleSet,
      descriptors: Map[String, Descriptor] = productDescriptors,
      pageIndex: Int = 0, pageSize: Int = Int.MaxValue,
      idField: String = "p_partkey"): Search.Query =
    rewrite(set, descriptors, Search.Query(
      sorts = Seq(Search.Sort(idField)),
      pageIndex = pageIndex, pageSize = pageSize, idField = idField))
}
