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
      defaultPageSize: Int = 50)

  private val Reserved = Set("q", "i", "s", "o")

  def fromParams(params: Map[String, String], cfg: Config): Search.Query = {
    val term = params.get("q").filter(_.nonEmpty)
    val pageIndex = params.get("i").flatMap(_.toIntOption).map(i => math.max(0, i - 1))
      .getOrElse(0)
    // clamp like pageIndex: a user-controlled 's=-5' would otherwise flow
    // into Dataset.limit(-5) and throw at runtime ('s=0' → empty pages)
    val pageSize = params.get("s").flatMap(_.toIntOption).map(s => math.max(1, s))
      .getOrElse(cfg.defaultPageSize)
    val sorts = params.get("o").toSeq.flatMap { o =>
      val (fieldPart, desc) =
        if (o.endsWith("-desc")) (o.dropRight(5), true)
        else if (o.endsWith("-asc")) (o.dropRight(4), false)
        else (o, false)
      val field = cfg.sortAliases.getOrElse(fieldPart, fieldPart)
      Seq(Search.Sort(field, desc))
    }
    val rangeFilter: Seq[FilterExpr.Node] = params.get(cfg.rangeParam).toSeq.flatMap { p =>
      val parts = p.split("-", -1)
      if (parts.length != 2) Seq.empty
      else {
        val lo = parts(0).trim match { case "" => None; case v => v.toDoubleOption }
        val hi = parts(1).trim match { case "" => None; case v => v.toDoubleOption }
        lo.map(v => FilterExpr.Pred(cfg.rangeField, RuleOps.GreaterThanOrEqualTo, v)).toSeq ++
          hi.map(v => FilterExpr.Pred(cfg.rangeField, RuleOps.LessThanOrEqualTo, v)).toSeq
      }
    }
    val aliasFilters: Seq[FilterExpr.Node] = params.toSeq
      .filterNot { case (k, _) => Reserved.contains(k) || k == cfg.rangeParam }
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
      filters = rangeFilter ++ aliasFilters,
      sorts = sorts,
      pageIndex = pageIndex,
      pageSize = pageSize,
      idField = cfg.idField)
  }
}
