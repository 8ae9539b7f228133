package graft.dsl
import graft.Ckpt.Ops

import graft.rules.FilterExpr
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative search-query DSL + compiler (SURVEY §3.1) — the Spark
  * analog of `CatalogSearchQuery` → `LinqCatalogSearchService.SearchAsync`
  * (`src/Smartstore.Core/Catalog/Search/CatalogSearchQuery.cs:72-470`,
  * `LinqCatalogSearchService.cs:35-94`): a query value carrying term,
  * filters, sorts, paging, and facet descriptors, compiled to DataFrames.
  *
  * Improvement the reference could not make (SURVEY §3.1 note): the count,
  * page, and every facet group share ONE cached filtered frame instead of
  * issuing a fresh store round-trip per sub-query.
  */
object Search {

  final case class Sort(field: String, descending: Boolean = false)

  /** `SearchMode` (Platform/Search/SearchEnums.cs:3-19): how the term
    * matches a field — exact, prefix, or wildcard/contains. */
  sealed trait TermMode
  object TermMode {
    case object Exact extends TermMode
    case object StartsWith extends TermMode
    case object Contains extends TermMode
  }

  /** Facet descriptor (`FacetDescriptor.cs:17-116`): count rows per value
    * of a dimension — top maxChoices after dropping values under
    * minHitCount, ordered by hits or label (`FacetSorting`); `selected`
    * carries the URL-selected values the factory marks `IsSelected` on
    * (descriptor state for rendering, not a filter — the filter is
    * emitted separately, exactly like `ConvertCategory/Manufacturer`). */
  final case class Facet(
      field: String,
      maxChoices: Int = 20,
      minHitCount: Int = 1,
      isMultiSelect: Boolean = true,
      /** "hits" = HitsDesc, "label" = LabelAsc (FacetSorting). */
      sorting: String = "hits",
      selected: Seq[Any] = Seq.empty,
      displayOrder: Int = 0)

  final case class Query(
      term: Option[String] = None,
      /** Columns the term searches across (OR'd, case-insensitive). */
      termFields: Seq[String] = Seq.empty,
      /** Structured filters with Must occurrence (every one holds). */
      filters: Seq[FilterExpr.Node] = Seq.empty,
      /** Should occurrence (`SearchFilter.cs:117-204`): when non-empty, at
        * least one must hold — compiled to one OR chain. */
      shouldFilters: Seq[FilterExpr.Node] = Seq.empty,
      /** MustNot occurrence: none may hold. */
      mustNotFilters: Seq[FilterExpr.Node] = Seq.empty,
      sorts: Seq[Sort] = Seq.empty,
      pageIndex: Int = 0,
      pageSize: Int = 50,
      facets: Seq[Facet] = Seq.empty,
      /** Deterministic tiebreak / default order (reference defaults to Id —
        * `ApplyOrdering`, LinqCatalogSearchService.cs:877-887). */
      idField: String = "id",
      /** J3: when set, the term search becomes the two-table OR-join
        * against localized values + distinct instead of a single-table
        * predicate (ApplySearchTerm, LinqCatalogSearchService.cs:556-601). */
      localized: Option[Localized.Source] = None,
      /** Term match mode (`CatalogSearchQuery(fields, term, mode)`). */
      mode: TermMode = TermMode.Contains,
      /** `ISearchQuery.IsFuzzySearch`: carried on the query for providers
        * that support it (the indexed provider); the relational compiler
        * ignores it exactly like the reference's LINQ service, which
        * never reads the flag. */
      fuzzy: Boolean = false)

  final case class Result(
      hits: DataFrame,
      totalHits: Long,
      pageIndex: Int,
      facets: Map[String, DataFrame])

  /** Compile the filter surface only (no paging) — the shared frame. */
  def compileFiltered(df: DataFrame, q: Query): DataFrame = {
    val termed: DataFrame = (q.term, q.localized) match {
      case (Some(t), Some(src)) => Localized.termSearch(df, q, t, src)
      case (Some(t), None) =>
        // a term with NO configured fields matches NOTHING — defaulting to
        // true would silently return the whole dataset as "hits" for any
        // query whose caller forgot to set termFields (fail-open search)
        df.filter(q.termFields.map(f => termPred(col(f), t, q.mode))
          .reduceOption(_ || _).getOrElse(lit(false)))
      case _ => df
    }
    val structured = q.filters.map(FilterExpr.compile(_, col))
    val should = q.shouldFilters.map(FilterExpr.compile(_, col))
      .reduceOption(_ || _)
    val mustNot = q.mustNotFilters.map(FilterExpr.compile(_, col))
      .map(p => !coalesce(p, lit(false)))
    (structured ++ should.toSeq ++ mustNot).foldLeft(termed)(_ filter _)
  }

  /** One case-insensitive term disjunct in the requested mode. */
  private[dsl] def termPred(field: Column, term: String, mode: TermMode): Column = {
    val t = term.toLowerCase
    mode match {
      case TermMode.Exact      => lower(field) === t
      case TermMode.StartsWith => lower(field).startsWith(t)
      case TermMode.Contains   => lower(field).contains(t)
    }
  }

  private def sortCols(q: Query): Seq[Column] =
    q.sorts.map(s => if (s.descending) col(s.field).desc else col(s.field).asc) :+
      col(q.idField).asc

  /** Page of hits with the reference's boundary fix-up: a pageIndex beyond
    * the result set falls back to the last non-empty page
    * (LinqCatalogSearchService.cs:51-73). */
  def run(df: DataFrame, q: Query): Result = {
    val filtered = compileFiltered(df, q).cache()
    try {
      val total = filtered.count()
      // fix-up covers BOTH directions: negative/oversized pageIndex and
      // non-positive pageSize all fall back to a valid page instead of
      // throwing from offset(-n)/limit(-n); offset computed in Long so a
      // huge page × size cannot overflow Int into a negative offset
      val size = math.max(1, q.pageSize)
      val maxPage = math.max(0, ((total - 1) / size).toInt)
      val page = math.min(math.max(0, q.pageIndex), maxPage)
      val off = math.min(page.toLong * size, Int.MaxValue.toLong).toInt
      val hits = filtered.orderBy(sortCols(q): _*)
        .offset(off).limit(size)
      // materialize page + facets off the cached frame before unpersisting
      // (these are report-sized: pageSize and maxChoices rows)
      val facetFrames = q.facets.map { f =>
        f.field -> facetFrame(facetBase(df, filtered, q, f), f)
          .ckpt
      }.toMap
      Result(hits.ckpt, total, page, facetFrames)
    } finally filtered.unpersist(blocking = false)
  }

  /** One-shot page compile without the count round (for oracle-checkable
    * deterministic output). */
  def pageOf(df: DataFrame, q: Query): DataFrame = {
    val size = math.max(1, q.pageSize)
    val off = math.min(math.max(0, q.pageIndex).toLong * size,
      Int.MaxValue.toLong).toInt
    compileFiltered(df, q).orderBy(sortCols(q): _*)
      .offset(off).limit(size)
  }

  /** Facet counts off the shared filtered frame. */
  def facetOf(df: DataFrame, q: Query, facet: Facet): DataFrame =
    facetFrame(facetBase(df, compileFiltered(df, q), q, facet), facet)

  private def referencesField(n: FilterExpr.Node, field: String): Boolean =
    n match {
      case FilterExpr.Pred(m, _, _)     => m == field
      case FilterExpr.Group(_, cs, _)   => cs.exists(referencesField(_, field))
    }

  /** The frame a facet's choices are counted on. Multiselect facets count
    * on the frame filtered by every predicate EXCEPT their own selection
    * (standard faceted search — otherwise sibling choices drop to zero
    * under the facet's own filter); single-select facets and facets with
    * no selection share the fully-filtered frame. */
  private def facetBase(df: DataFrame, filtered: DataFrame, q: Query,
      f: Facet): DataFrame =
    if (f.isMultiSelect && f.selected.nonEmpty &&
        q.filters.exists(referencesField(_, f.field)))
      compileFiltered(df, q.copy(
        filters = q.filters.filterNot(referencesField(_, f.field))))
    else filtered

  private def facetFrame(filtered: DataFrame, f: Facet): DataFrame = {
    val counted = filtered.groupBy(col(f.field).as("value"))
      .agg(count(lit(1)).as("cnt"))
    // MinHitCount (FacetDescriptor.cs): values under the floor drop out
    // BEFORE the choice cap; the default 1 adds no predicate
    val floored = if (f.minHitCount > 1)
      counted.filter(col("cnt") >= f.minHitCount) else counted
    val ordered = f.sorting match {
      case "label" => floored.orderBy(col("value"))           // LabelAsc
      case _       => floored.orderBy(col("cnt").desc, col("value")) // HitsDesc
    }
    ordered.limit(f.maxChoices)
  }
}
