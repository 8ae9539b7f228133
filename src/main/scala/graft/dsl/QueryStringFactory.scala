package graft.dsl

import graft.operators.RuleOps
import graft.rules.FilterExpr

/** Query-string → SearchQuery factory (SURVEY §3.1 front door —
  * `CatalogSearchQueryFactory.CreateFromQueryAsync`,
  * Modelling/CatalogSearchQueryFactory.cs; alias→field mapping:
  * CatalogSearchQueryAliasMapper.cs): parses the reference's URL
  * conventions into a `Search.Query`:
  *
  *   q=shoes            term
  *   i=2 s=50           page index (1-based in URLs) / page size
  *   o=price-asc        sort: field-direction
  *   p=10-50            range filter min-max (open ends allowed: "10-", "-50")
  *   <alias>=v1,v2      IN filter on an aliased field
  */
object QueryStringFactory {

  /** Per-LANGUAGE alias mapping (`CatalogSearchQueryAliasMapper.cs`):
    * every lookup tries the requested language first and falls back to
    * the language-NEUTRAL entry (languageId 0) — the exact TryGetValue
    * cascade of `GetAttributeIdByAlias` / `GetAttributeOptionIdByAlias`
    * (CatalogSearchQueryAliasMapper.cs:35-67). Field aliases map URL
    * parameter names to columns ("farbe" and "color" → p_brand); VALUE
    * aliases map localized facet-value tokens to canonical stored values
    * ("rot"@de and "red"@en → the one value the column actually holds),
    * so differently-localized URLs compile to the SAME descriptor. */
  final case class AliasMapper(
      /** (languageId, alias) → field; languageId 0 = neutral. */
      fields: Map[(Int, String), String] = Map.empty,
      /** (languageId, field, valueAlias) → canonical value. */
      values: Map[(Int, String, String), Any] = Map.empty) {

    private def cascade[K, V](m: Map[K, V], keyed: Int => K, languageId: Int): Option[V] =
      m.get(keyed(languageId))
        .orElse(if (languageId != 0) m.get(keyed(0)) else None)

    def fieldOf(alias: String, languageId: Int = 0): Option[String] =
      cascade[(Int, String), String](fields, l => (l, alias), languageId)

    def valueOf(field: String, valueAlias: String, languageId: Int = 0): Option[Any] =
      cascade[(Int, String, String), Any](values, l => (l, field, valueAlias), languageId)
  }

  /** One facet group the factory models from the URL — the `AddFacet`
    * table of CatalogSearchQueryFactory.cs:279-345: a group kind, its
    * language-NEUTRAL URL token (c/m/p/r/a/n), the backing column, and
    * the descriptor knobs (multiselect, FacetSorting, MinHitCount,
    * MaxChoicesCount, display order). `kind` "price" parses a range,
    * "rating" a single lower bound; every other kind is a multi-value
    * id list. */
  final case class FacetSpec(
      kind: String,
      param: String,
      field: String,
      isMultiSelect: Boolean = true,
      sorting: String = "hits",
      minHitCount: Int = 1,
      maxChoices: Int = 20,
      displayOrder: Int = 0,
      /** kind "available" only — `SearchSettings.IncludeNotAvailable`
        * (ConvertAvailability, CatalogSearchQueryFactory.cs:509-529): the
        * setting specifies the filter's logical DIRECTION. false (the
        * reference default): availability filtering is ON unless the URL
        * token opts out (token true = "include not available").
        * true: filtering is OFF unless the token opts in (token true =
        * "exclude out of stock"). */
      includeNotAvailable: Boolean = false)

  final case class Config(
      termFields: Seq[String],
      idField: String = "id",
      /** URL alias → column name (language-neutral shorthand; entries
        * merge into `aliases` as languageId-0 rows). */
      fieldAliases: Map[String, String] = Map.empty,
      /** Per-language alias layer; looked up before `fieldAliases`. */
      aliases: AliasMapper = AliasMapper(),
      /** The request's working language (0 = neutral). */
      languageId: Int = 0,
      /** alias used for the price/range parameter (reference: "p"). */
      rangeParam: String = "p",
      rangeField: String = "price",
      /** sort alias → column name. */
      sortAliases: Map[String, String] = Map.empty,
      defaultPageSize: Int = 50,
      /** Term match mode + fuzzy flag (`new CatalogSearchQuery(fields,
        * term, searchSettings.SearchMode)`; `ISearchQuery.IsFuzzySearch`). */
      mode: Search.TermMode = Search.TermMode.Contains,
      fuzzy: Boolean = false,
      /** Facet groups to model; each also emits its filter when its URL
        * token carries values. */
      facetSpecs: Seq[FacetSpec] = Seq.empty,
      /** (languageId, kind) → localized URL token — the
        * `GetCommonFacetAliasByGroupKind` cascade (language first, then
        * neutral mapping, then the spec's built-in token — the C# `alias
        * ?? "c"` fallback). */
      facetParamAliases: Map[(Int, String), String] = Map.empty,
      /** (languageId, token) → sort; localized sort tokens with the
        * neutral-language fallback, tried before `sortAliases`. */
      sortValueAliases: Map[(Int, String), Search.Sort] = Map.empty)

  private val Reserved = Set("q", "i", "s", "o")

  /** `TryParseRange` (SearchQueryFactoryBase.cs:72-91): "from~to",
    * "from[~]", "~to". The legacy '-' form this factory accepted before
    * is kept but restricted to its old exactly-two-parts shape
    * ("10-50", "10-", "-50") so a bare "500" stays unparsed and negative
    * values ("-10--5") don't silently mis-parse as an upper bound.
    * Reversed bounds swap-normalize (ConvertPrice, .cs:450-455). */
  private def parseRange(raw: String): Option[(Option[Double], Option[Double])] = {
    def bounds(parts: Array[String]): Option[(Option[Double], Option[Double])] = {
      val lo0 = parts.headOption.filter(_.nonEmpty).flatMap(_.toDoubleOption)
      val hi0 = parts.lift(1).filter(_.nonEmpty).flatMap(_.toDoubleOption)
      (lo0, hi0) match {
        case (None, None) => None
        case (Some(a), Some(b)) if a > b => Some((Some(b), Some(a)))
        case other => Some(other)
      }
    }
    if (raw.contains("~")) bounds(raw.split("~", -1).map(_.trim).take(2))
    else {
      val parts = raw.split("-", -1).map(_.trim)
      if (parts.length != 2 || parts.exists(p => p.nonEmpty && p.toDoubleOption.isEmpty))
        None
      else bounds(parts)
    }
  }

  private def rangeFilters(field: String,
      r: (Option[Double], Option[Double])): Seq[FilterExpr.Node] =
    r._1.map(v => FilterExpr.Pred(field, RuleOps.GreaterThanOrEqualTo, v)).toSeq ++
      r._2.map(v => FilterExpr.Pred(field, RuleOps.LessThanOrEqualTo, v)).toSeq

  def fromParams(params: Map[String, String], cfg: Config): Search.Query = {
    val term = params.get("q").filter(_.nonEmpty)
    val pageIndex = params.get("i").flatMap(_.toIntOption).map(i => math.max(0, i - 1))
      .getOrElse(0)
    // clamp like pageIndex: a user-controlled 's=-5' would otherwise flow
    // into Dataset.limit(-5) and throw at runtime ('s=0' → empty pages)
    val pageSize = params.get("s").flatMap(_.toIntOption).map(s => math.max(1, s))
      .getOrElse(cfg.defaultPageSize)
    val sorts = params.get("o").toSeq.flatMap { o =>
      // localized sort token first (language → neutral), then the
      // suffix grammar over sortAliases
      cfg.sortValueAliases.get((cfg.languageId, o))
        .orElse(if (cfg.languageId != 0) cfg.sortValueAliases.get((0, o)) else None)
        .map(Seq(_))
        .getOrElse {
          val (fieldPart, desc) =
            if (o.endsWith("-desc")) (o.dropRight(5), true)
            else if (o.endsWith("-asc")) (o.dropRight(4), false)
            else (o, false)
          val field = cfg.sortAliases.getOrElse(fieldPart, fieldPart)
          Seq(Search.Sort(field, desc))
        }
    }

    // ---- facet modelling (ConvertPrice/Category/Manufacturer/Rating) ----
    def facetParam(spec: FacetSpec): String =
      cfg.facetParamAliases.get((cfg.languageId, spec.kind))
        .orElse(if (cfg.languageId != 0)
          cfg.facetParamAliases.get((0, spec.kind)) else None)
        .getOrElse(spec.param)
    val facetBound: Seq[(FacetSpec, String, Option[String])] =
      cfg.facetSpecs.map(spec => {
        val p = facetParam(spec)
        (spec, p, params.get(p).filter(_.nonEmpty))
      })
    val facetParams: Set[String] = facetBound.map(_._2).toSet
    val facetFilters: Seq[FilterExpr.Node] = facetBound.flatMap {
      // "available" fires on an ABSENT token too: with
      // includeNotAvailable=false (the reference default) availability
      // filtering is on by default and the token opts OUT — the F7
      // `available` branch (ConvertAvailability + the field dispatch at
      // LinqCatalogSearchService.cs:321-331). The predicate compiles
      // against the Catalog.searchable `available` column, which IS the
      // 3-way inventory disjunction.
      case (spec, _, raw) if spec.kind == "available" =>
        val tok = raw.exists(r =>
          Set("1", "true", "on", "yes").contains(r.trim.toLowerCase))
        val filterOn =
          if (spec.includeNotAvailable) tok  // true = exclude out of stock
          else !tok                          // true = include not available
        if (filterOn) Seq(FilterExpr.Pred(spec.field, RuleOps.IsEqualTo, true))
        else Seq.empty
      case (_, _, None) => Seq.empty
      case (spec, _, Some(raw)) => spec.kind match {
        case "price" =>
          parseRange(raw).map(rangeFilters(spec.field, _)).getOrElse(Seq.empty)
        case "rating" => // WithRating(fromRate, null): lower bound only
          raw.toDoubleOption
            .map(v => FilterExpr.Pred(spec.field, RuleOps.GreaterThanOrEqualTo, v))
            .toSeq
        case _ =>
          val vals: Seq[Any] = raw.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            .map(s => cfg.aliases.valueOf(spec.field, s, cfg.languageId)
              .getOrElse(s.toLongOption.getOrElse(s): Any))
          if (vals.isEmpty) Seq.empty
          else Seq(FilterExpr.Pred(spec.field, RuleOps.In, vals))
      }
    }
    // a descriptor is emitted for EVERY spec (AddFacet runs whether or
    // not the token carried values); URL-selected values are marked
    val facets: Seq[Search.Facet] = facetBound.map { case (spec, _, raw) =>
      val selected: Seq[Any] = (spec.kind, raw) match {
        // the availability descriptor is selected iff the token is truthy
        // (FacetValue(true)/IsSelected=availability, ConvertAvailability)
        case ("available", r) =>
          if (r.exists(v =>
            Set("1", "true", "on", "yes").contains(v.trim.toLowerCase)))
            Seq(true) else Seq.empty
        case (_, None) => Seq.empty
        case ("price", Some(r)) => parseRange(r).toSeq.map(x => x: Any)
        case ("rating", Some(r)) => r.toDoubleOption.toSeq.map(x => x: Any)
        case (_, Some(r)) => r.split(",").map(_.trim).filter(_.nonEmpty).toSeq
          .map(s => cfg.aliases.valueOf(spec.field, s, cfg.languageId)
            .getOrElse(s.toLongOption.getOrElse(s): Any))
      }
      Search.Facet(spec.field, spec.maxChoices, spec.minHitCount,
        spec.isMultiSelect, spec.sorting, selected, spec.displayOrder)
    }

    // The price facet owns the range parameter only when its RESOLVED
    // URL token is the legacy rangeParam, or when its token actually
    // carried values this request; otherwise (e.g. a localized "prix"
    // token absent from the URL) the legacy rangeParam still parses, so
    // old URLs keep their range filter instead of silently dropping it.
    val priceOwnsRangeParam = facetBound.exists { case (spec, p, raw) =>
      spec.kind == "price" && (p == cfg.rangeParam || raw.isDefined) }
    val rangeFilter: Seq[FilterExpr.Node] =
      if (priceOwnsRangeParam) Seq.empty // spec owns it
      else params.get(cfg.rangeParam).toSeq.flatMap(p =>
        parseRange(p).map(rangeFilters(cfg.rangeField, _)).getOrElse(Seq.empty))
    val aliasFilters: Seq[FilterExpr.Node] = params.toSeq
      .filterNot { case (k, _) =>
        Reserved.contains(k) || k == cfg.rangeParam || facetParams.contains(k) }
      .flatMap { case (k, v) =>
        cfg.aliases.fieldOf(k, cfg.languageId)
          .orElse(cfg.fieldAliases.get(k))
          .map { field =>
            val values = v.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            // localized facet-value aliases resolve to canonical stored
            // values (language → neutral cascade); unmapped tokens stay
            // literal with the numeric coercion of the base factory
            val coerced: Seq[Any] = values.map { s =>
              cfg.aliases.valueOf(field, s, cfg.languageId)
                .getOrElse(s.toLongOption.getOrElse(s): Any)
            }
            FilterExpr.Pred(field, RuleOps.In, coerced)
          }
      }
    Search.Query(
      term = term,
      termFields = cfg.termFields,
      filters = rangeFilter ++ facetFilters ++ aliasFilters,
      sorts = sorts,
      pageIndex = pageIndex,
      pageSize = pageSize,
      facets = facets,
      idField = cfg.idField,
      mode = cfg.mode,
      fuzzy = cfg.fuzzy)
  }
}
