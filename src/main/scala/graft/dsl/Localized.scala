package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J3 — localized term search: the exact two-table OR-join shape of
  * `LinqCatalogSearchService.ApplySearchTerm`
  * (src/Smartstore.Core/Catalog/Search/LinqCatalogSearchService.cs:556-601):
  * product ⟕ LocalizedProperty group-join (`join … into … DefaultIfEmpty`),
  * ONE OR chain across plain product fields and per-language locale values,
  * then `Distinct()` because the join multiplies matching products
  * (`IsGroupingRequired` → .cs:345-348). The per-language name dictionary of
  * `GetLocalizedNames` (.cs:892-901) is the same (group, key, language)
  * slice of this table.
  */
object Localized {

  /** The localized-values side — the `LocalizedProperty` entity shape:
    * entity_id / language_id / locale_key_group / locale_key /
    * locale_value. `localeKeys` are the locale keys the term searches —
    * the reference hardcodes Name + ShortDescription; they apply whenever
    * a language is set (languageId != 0), independent of the plain field
    * list, exactly like the C# disjuncts. */
  final case class Source(
      lp: DataFrame,
      languageId: Int,
      keyGroup: String = "Product",
      localeKeys: Seq[String] = Seq("Name", "ShortDescription"))

  /** Compile the OR-join.
    *
    * Scale notes (the 100-TB shape, not just the semantics):
    *  - lp is PRE-FILTERED to (language, keyGroup) before the join. Every
    *    localized disjunct in the reference requires both, so rows of other
    *    languages/groups can never satisfy the filter; dropping them before
    *    the shuffle shrinks the join to one language's slice — usually
    *    small enough to broadcast.
    *  - the OR across product-side and lp-side predicates cannot be pushed
    *    below the join (that is inherent to the semantics, same as the
    *    reference's SQL).
    *  - dedup is `dropDuplicates(idField)` — the scalable form of the
    *    reference's `Distinct()` (.cs:347 "Distinct is very slow if there
    *    are many products"): one hash aggregate keyed on the id, which AQE
    *    plans without a second exchange because the join output is already
    *    hash-partitioned by that id.
    */
  def termSearch(df: DataFrame, q: Search.Query, term: String, src: Source): DataFrame = {
    // the reference's joined path knows only StartsWith vs Contains —
    // "SearchMode.ExactMatch doesn't make sense here" (.cs:567) folds to
    // the Contains branch, exactly like the C# if/else
    val mode = q.mode match {
      case Search.TermMode.StartsWith => Search.TermMode.StartsWith
      case _                          => Search.TermMode.Contains
    }
    val prodPred: Column = q.termFields
      .map(f => Search.termPred(df(f), term, mode))
      .reduceOption(_ || _).getOrElse(lit(false))
    // languageId 0 means "no working language": the reference's localized
    // disjuncts are all `languageId != 0 && …` → false, no join needed
    if (src.languageId == 0) return df.filter(prodPred)
    val lp = src.lp.filter(col("language_id") === src.languageId &&
      col("locale_key_group") === src.keyGroup)
    val lpPred: Column = src.localeKeys
      .map(k => lp("locale_key") === k &&
        Search.termPred(lp("locale_value"), term, mode))
      .reduceOption(_ || _).getOrElse(lit(false))
    df.join(lp, df(q.idField) === lp("entity_id"), "left")
      .filter(prodPred || lpPred)
      .select(df.columns.map(df(_)): _*)
      .dropDuplicates(q.idField)
  }

  /** Deterministic localized-property synthesis over `part` — the star
    * schema has no LocalizedProperty analog, so q127 derives one from
    * existing columns (no RNG, reproducible in DuckDB):
    *  - language 2 ("de") Name for even part keys: p_name with "red"→"rot";
    *  - language 2 ShortDescription for part keys divisible by 3:
    *    "Kurz: " + the same translation (keys divisible by 6 get BOTH rows
    *    — the join-multiplication case Distinct must collapse);
    *  - language 1 Name for ALL keys: "red"→"rotfremd" — these CONTAIN the
    *    q127 term "rot", so any row of them leaking past the language
    *    filter changes the result (a built-in language-isolation gate).
    */
  def syntheticProperties(part: DataFrame): DataFrame = {
    def rows(filtered: DataFrame, lang: Int, key: String, value: Column) =
      filtered.select(
        col("p_partkey").as("entity_id"),
        lit(lang).as("language_id"),
        lit("Product").as("locale_key_group"),
        lit(key).as("locale_key"),
        value.as("locale_value"))
    rows(part.filter(col("p_partkey") % 2 === 0), 2, "Name",
        regexp_replace(col("p_name"), "red", "rot"))
      .union(rows(part.filter(col("p_partkey") % 3 === 0), 2, "ShortDescription",
        concat(lit("Kurz: "), regexp_replace(col("p_name"), "red", "rot"))))
      .union(rows(part, 1, "Name",
        regexp_replace(col("p_name"), "red", "rotfremd")))
  }
}
