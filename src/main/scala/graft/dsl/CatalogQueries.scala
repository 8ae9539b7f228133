package graft.dsl

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** F7 close-out queries (round-15 verdict items 1 and 6): the `available`
  * inventory disjunction, the special-price window, and the rating facet
  * group — each through the full §3.1 pipeline against the
  * [[Catalog.searchable]] product extension, each on the DuckDB oracle
  * gate with the fixture mirrored as CTEs ([[Catalog.fixtureCtes]]). */
object CatalogQueries {

  /** F7 `available` end to end (q280): a URL WITHOUT the availability
    * token, under the reference-default `IncludeNotAvailable=false` —
    * availability filtering fires BY DEFAULT (ConvertAvailability,
    * CatalogSearchQueryFactory.cs:509-529) and compiles to the 3-way
    * inventory disjunction (LinqCatalogSearchService.cs:321-331):
    * DontManageStock rows pass unconditionally, ManageStock rows need
    * stock or a backorder mode, ManageStockByAttributes rows need an
    * attribute combination with stock or allow-out-of-stock. The output
    * carries the inventory columns so the oracle validates hits from all
    * three arms (and the combo-EXISTS arm both ways — method-2 products
    * with no qualifying combo are dropped). */
  def availableSearch(s: SparkSession, dir: String): DataFrame = {
    val cfg = QueryStringFactory.Config(
      termFields = Seq("p_name", "p_type"),
      idField = "p_partkey",
      facetSpecs = Seq(
        QueryStringFactory.FacetSpec("available", "a", "available")),
      sortAliases = Map("price" -> "effective_price"))
    val q = QueryStringFactory.fromParams(
      Map("q" -> "red", "o" -> "price-desc", "s" -> "40"), cfg)
    Search.pageOf(Catalog.searchable(Tables.part(s, dir)), q)
      .select(col("p_partkey"), col("p_name"), col("inventory_method"),
        col("stock_qty"), col("backorder_mode"), col("effective_price"))
  }

  /** F7 special-price window end to end (q281): a price range through the
    * factory's price kind, compiled against the EFFECTIVE price — the
    * special price while its date window is active, the list price
    * otherwise (LinqCatalogSearchService.cs:243-258). The 840~930 window
    * sits so that active specials with list price ABOVE the window enter
    * the page (the special was honored) and in-window list prices with an
    * active special BELOW it drop out (the list price was correctly
    * ignored) — both populated at every gate SF. `special_active` is
    * exposed so the oracle checks the window classification itself. */
  def effectivePriceSearch(s: SparkSession, dir: String): DataFrame = {
    val cfg = QueryStringFactory.Config(
      termFields = Seq("p_name", "p_type"),
      idField = "p_partkey",
      facetSpecs = Seq(
        QueryStringFactory.FacetSpec("price", "p", "effective_price")))
    val q = QueryStringFactory.fromParams(Map("p" -> "840~930"), cfg)
    Search.pageOf(
      Catalog.searchable(Tables.part(s, dir))
        .withColumn("special_active", Catalog.specialActive), q)
      .select(col("p_partkey"), col("p_retailprice"), col("special_price"),
        col("effective_price"), col("special_active"))
  }

  /** Rating facet group with hit counts (q282, verdict item 6): the five
    * `FacetUtility.GetRatings` values (1.0–5.0, FacetUtility.cs:114-124)
    * counted over the term-filtered frame with the rating filter's own
    * semantics — a value is a LOWER bound (`WithRating(fromRate, null)`;
    * LinqCatalogSearchService.cs:704-722: approved_total_reviews > 0 AND
    * sum/reviews >= value). One map-side-combinable aggregate pass
    * computes all five counts; `stack` unpivots the single row to the
    * 5-row facet group — no per-value scans, no shuffle beyond the
    * scalar aggregate. */
  def ratingFacet(s: SparkSession, dir: String): DataFrame = {
    val q = Search.Query(
      term = Some("red"),
      termFields = Seq("p_name", "p_type"),
      idField = "p_partkey")
    val filtered = Search.compileFiltered(
      Catalog.searchable(Tables.part(s, dir)), q)
      .filter(col("approved_total_reviews") > 0)
    // coalesce: a term with zero hits makes the global agg one row of
    // NULL sums, but the oracle's per-value correlated COUNT yields 0
    val aggCols = (1 to 5).map(r =>
      coalesce(sum(when(col("rating") >= r.toDouble, 1L).otherwise(0L)),
        lit(0L)).as(s"r$r"))
    val counts = filtered.agg(aggCols.head, aggCols.tail: _*)
    counts.selectExpr(
      "stack(5, 1.0D, r1, 2.0D, r2, 3.0D, r3, 4.0D, r4, 5.0D, r5) " +
        "AS (value, cnt)")
      .orderBy(col("value"))
  }

  /** Availability facet GROUP with hit counts (q284): ConvertAvailability
    * registers the availability facet multiselect + LabelAsc
    * (CatalogSearchQueryFactory.cs:532-552). With the URL token present
    * (selected), the multiselect rule counts the group on the frame
    * WITHOUT its own filter — both choices stay visible so the user can
    * widen (the `Search.facetBase` exclusion, same as q136's brand
    * group): output is the available/unavailable counts of the
    * term-filtered frame. */
  def availabilityFacet(s: SparkSession, dir: String): DataFrame = {
    val cfg = QueryStringFactory.Config(
      termFields = Seq("p_name", "p_type"),
      idField = "p_partkey",
      facetSpecs = Seq(QueryStringFactory.FacetSpec(
        "available", "a", "available", sorting = "label",
        includeNotAvailable = true)))
    // includeNotAvailable=true + a=1: "exclude out of stock" opt-in —
    // the filter is ACTIVE and the facet value selected
    val q = QueryStringFactory.fromParams(Map("q" -> "red", "a" -> "1"), cfg)
    Search.facetOf(Catalog.searchable(Tables.part(s, dir)), q,
      q.facets.find(_.field == "available").get)
  }

  /** Price-bucket facet over the EFFECTIVE price (q285): the A8 price
    * facet (q09) re-based on the F7 special-price window — a product
    * whose special is active must be counted in its SPECIAL price's
    * bucket (the facet a user sees reflects what they would pay), the
    * q281 semantics lifted from filter to facet. 50-unit buckets
    * (floor(x/50)·50 — exact double division both engines), LabelAsc. */
  def effectivePriceFacet(s: SparkSession, dir: String): DataFrame = {
    val q = Search.Query(
      term = Some("red"),
      termFields = Seq("p_name", "p_type"),
      idField = "p_partkey")
    val frame = Catalog.searchable(Tables.part(s, dir))
      .withColumn("price_bucket",
        (floor(col("effective_price") / 50) * 50).cast("long"))
    Search.facetOf(frame, q,
      Search.Facet("price_bucket", maxChoices = 20, sorting = "label"))
  }

  private val termPred =
    "(lower(p_name) LIKE '%red%' OR lower(p_type) LIKE '%red%')"

  val qs: Seq[Q] = Seq(
    Q("q280_available_filter", (s, d) => availableSearch(s, d), Some(
      s"""${Catalog.fixtureCtes}
         |SELECT p_partkey, p_name, inventory_method, stock_qty,
         |       backorder_mode, effective_price
         |FROM cat_searchable
         |WHERE $termPred
         |  AND available
         |ORDER BY effective_price DESC, p_partkey
         |LIMIT 40 OFFSET 0""".stripMargin)),
    Q("q281_effective_price_window", (s, d) => effectivePriceSearch(s, d), Some(
      s"""${Catalog.fixtureCtes}
         |SELECT p_partkey, p_retailprice, special_price, effective_price,
         |       (special_price IS NOT NULL
         |        AND (special_from IS NULL
         |             OR special_from < ${Catalog.NowLit})
         |        AND (special_to IS NULL
         |             OR special_to > ${Catalog.NowLit})) AS special_active
         |FROM cat_searchable
         |WHERE effective_price >= 840 AND effective_price <= 930
         |ORDER BY p_partkey
         |LIMIT 50 OFFSET 0""".stripMargin)),
    Q("q285_effective_price_facet", (s, d) => effectivePriceFacet(s, d), Some(
      s"""${Catalog.fixtureCtes}
         |SELECT CAST(FLOOR(effective_price / 50) AS BIGINT) * 50 AS value,
         |       COUNT(*) AS cnt
         |FROM cat_searchable
         |WHERE $termPred
         |GROUP BY 1
         |ORDER BY value
         |LIMIT 20""".stripMargin)),
    Q("q284_availability_facet", (s, d) => availabilityFacet(s, d), Some(
      s"""${Catalog.fixtureCtes}
         |SELECT available AS value, COUNT(*) AS cnt
         |FROM cat_searchable
         |WHERE $termPred
         |GROUP BY available
         |ORDER BY value
         |LIMIT 20""".stripMargin)),
    Q("q282_rating_facet", (s, d) => ratingFacet(s, d), Some(
      s"""${Catalog.fixtureCtes},
         |f AS (
         |  SELECT rating FROM cat_searchable
         |  WHERE $termPred
         |    AND approved_total_reviews > 0)
         |SELECT CAST(v AS DOUBLE) AS value,
         |       (SELECT CAST(COUNT(*) AS BIGINT) FROM f
         |        WHERE rating >= v) AS cnt
         |FROM (VALUES (1.0), (2.0), (3.0), (4.0), (5.0)) AS t(v)
         |ORDER BY value""".stripMargin)))
}
