package graft.dsl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** §3.1 indexed-search provider seam — the dispatch architecture of
  * `CatalogSearchService.SearchAsync` (CatalogSearchService.cs:43-141):
  * an index manager resolves a provider for the scope ("Catalog"); when
  * one is registered, its index store EXISTS, and the caller didn't force
  * `direct`, the provider's engine serves the search; otherwise the
  * relational compiler runs (`SearchDirectAsync` → the LINQ service =
  * `Search.run` here). The provider is where fuzzy/spellcheck-capable
  * engines (the reference's Lucene/MegaSearch plugin) plug in — the
  * relational path ignores `Query.fuzzy` exactly like the LINQ service.
  */
trait SearchProvider {
  def name: String
  /** `provider.GetIndexStore(scope).Exists`: a provider whose index was
    * never built is skipped and the direct path serves the query. */
  def indexExists: Boolean
  def search(df: DataFrame, q: Search.Query): Search.Result
}

/** The dispatcher + registry (`_indexManager.GetIndexProvider(Scope)`). */
object SearchService {
  val Scope = "Catalog" // CatalogSearchService.Scope

  private val providers = TrieMap.empty[String, SearchProvider]

  def register(scope: String, p: SearchProvider): Unit = providers.put(scope, p)
  def unregister(scope: String): Unit = providers.remove(scope)
  def providerFor(scope: String): Option[SearchProvider] = providers.get(scope)

  /** `SearchAsync(query, direct)`: provider → fallback chain. */
  def search(df: DataFrame, q: Search.Query, scope: String = Scope,
      direct: Boolean = false): Search.Result =
    providers.get(scope) match {
      case Some(p) if !direct && p.indexExists => p.search(df, q)
      case _ => Search.run(df, q) // SearchDirectAsync
    }
}

/** A minimal REAL provider for the seam: a pre-built inverted token index
  * (the Spark analog of the reference's Lucene index job). `build` is the
  * indexing pass — tokenize the term fields into a (token, id) posting
  * table, typically written bucketed by token; `search` resolves the term
  * to candidate ids through the index (one semi-join against the posting
  * list instead of a full-corpus LIKE scan — the reason indexed search
  * exists at 100 TB) and hands the PRUNED frame to the shared compiler
  * for filters, sorting, paging and facets, so both paths share one
  * result contract.
  *
  * Semantics are TOKEN matches (an index looks up terms), vs the direct
  * path's substring contains — the same honest difference the reference
  * has between its Lucene provider and the LINQ fallback.
  *
  * This provider CONSUMES `Query.fuzzy` (the whole point of the seam:
  * the relational path cannot): a fuzzy search matches every vocabulary
  * token within `maxEdits` Levenshtein of the term. The edit-distance
  * scan runs over the DISTINCT vocabulary first — vocabulary-sized, ≪
  * corpus and ≪ postings — and only the surviving tokens join back to
  * the posting table, so fuzzy costs one small scan + the same posting
  * semi-join as the exact path. */
final class InvertedIndexProvider(index: DataFrame, maxEdits: Int = 1)
    extends SearchProvider {
  override val name = "inverted-index"
  override def indexExists: Boolean = index != null

  override def search(df: DataFrame, q: Search.Query): Search.Result =
    q.term match {
      case Some(t) =>
        val matched =
          if (q.fuzzy) {
            val tokens = index.select(col("token")).distinct()
              .filter(levenshtein(col("token"), lit(t.toLowerCase)) <= maxEdits)
            index.join(tokens, Seq("token"), "left_semi")
          } else index.filter(col("token") === t.toLowerCase)
        val ids = matched.select(col("id"))
        val pruned = df.join(ids, df(q.idField) === ids("id"), "left_semi")
        Search.run(pruned, q.copy(term = None))
      case None => Search.run(df, q)
    }
}

object InvertedIndexProvider {
  /** The indexing job: one (token, id) posting row per distinct token of
    * each term field — a map-side explode + one distinct shuffle. */
  def build(df: DataFrame, idField: String, fields: Seq[String]): DataFrame =
    fields.map(f => df.select(
        col(idField).as("id"),
        explode(split(lower(col(f)), "\\s+")).as("token")))
      .reduce(_ union _)
      .filter(length(col("token")) > 0)
      .distinct()
}
