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

  /** The price facet GROUP exactly as the reference assembles it (q286,
    * verdict r15 missing-item 1 — `LinqCatalogSearchService.cs:452-507`
    * + `FacetUtility.MakePriceEven`):
    *
    *  1. min/max list price over the WHOLE catalog (not the hits) are
    *     rounded UP to the even-price grid ([[Catalog.makePriceEven]]);
    *  2. the fixed thresholds 10..1000 are CLIPPED to that range —
    *     thresholds below the evened min are skipped, and the first
    *     threshold ≥ the evened max is the last facet emitted
    *     (`i = int.MaxValue - 1`), DisplayOrder numbering the survivors
    *     in threshold order;
    *  3. each surviving facet is the "< threshold" bucket, counted here
    *     over the term-filtered frame by EFFECTIVE price (the q285
    *     discipline — the facet reflects what a user would pay);
    *  4. a "custom range" pseudo-facet (null bounds, the UI's free-form
    *     price inputs) is INSERTED at position 0 — suppressed only when
    *     the search has zero hits and no custom range is selected.
    *
    * The evened bounds ride along as constant columns so the oracle
    * value-checks the MakePriceEven closed form itself (900 → 900,
    * 999.9 → 1000 on the fixture's price domain). The fixture has no
    * published/system flags, so "the whole catalog" is every part row.
    *
    * Scale shape: two scalar aggregates (bounds, total hits) broadcast
    * into ≤ 7-row facet frames; the only pass over the hits is one
    * broadcast join against the ≤ 7 selected thresholds with map-side
    * combine on the count — no window or shuffle wider than 7 rows. */
  def priceFacetGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val frame = Catalog.searchable(Tables.part(s, dir))
    val q = Search.Query(term = Some("red"),
      termFields = Seq("p_name", "p_type"), idField = "p_partkey")
    val hits = Search.compileFiltered(frame, q)
      .select(col("p_partkey"), col("effective_price"))
    val bounds = frame.agg(
      Catalog.makePriceEven(min(col("p_retailprice"))).as("min_even"),
      Catalog.makePriceEven(max(col("p_retailprice"))).as("max_even"))
    val thr = graft.reports.Reports.priceBuckets.zipWithIndex
      .map { case (t, i) => (t.toDouble, i + 1) }.toDF("t", "pos")
    val withB = thr.crossJoin(broadcast(bounds))
    val stop = withB.filter(col("t") >= col("max_even"))
      .agg(min(col("t")).as("stop_t"))
    val sel = withB.crossJoin(broadcast(stop))
      .filter(col("t") >= col("min_even") &&
        (col("t") < col("max_even") || col("t") === col("stop_t")))
      .withColumn("disp_order", row_number().over(Window.orderBy(col("pos"))))
      .limit(20) // MaxChoicesCount guard; also the audit's maxRows bound
    val cnts = hits.join(broadcast(sel.select(col("t").as("ub"))),
        col("effective_price") < col("ub"))
      .groupBy(col("ub")).agg(count(lit(1)).as("cnt"))
    val custom = hits.agg(count(lit(1)).as("total"))
      .filter(col("total") > 0)
      .select(lit(0).as("disp_order"),
        lit(null).cast("double").as("upper_bound"),
        lit(0L).as("cnt"), lit(1).as("is_custom"))
    val fixed = sel.join(cnts, col("t") === col("ub"), "left")
      .select(col("disp_order"), col("t").as("upper_bound"),
        coalesce(col("cnt"), lit(0L)).as("cnt"), lit(0).as("is_custom"))
    custom.unionByName(fixed)
      .crossJoin(broadcast(bounds))
      .orderBy(col("disp_order"))
  }

  private def priceFacetGroupOracle: String =
    s"""${Catalog.fixtureCtes},
       |bounds AS (
       |  SELECT ${Catalog.makePriceEvenSql("mn")} AS min_even,
       |         ${Catalog.makePriceEvenSql("mx")} AS max_even
       |  FROM (SELECT min(p_retailprice) AS mn, max(p_retailprice) AS mx
       |        FROM cat_searchable)),
       |thr(t, pos) AS (VALUES (10.0, 1), (25.0, 2), (50.0, 3), (100.0, 4),
       |                       (250.0, 5), (500.0, 6), (1000.0, 7)),
       |stop AS (SELECT min(t) AS stop_t FROM thr, bounds WHERE t >= max_even),
       |sel AS (SELECT t, CAST(ROW_NUMBER() OVER (ORDER BY pos) AS INT)
       |               AS disp_order
       |        FROM thr, bounds, stop
       |        WHERE t >= min_even AND (t < max_even OR t = stop_t)
       |        LIMIT 20),
       |hits AS (SELECT p_partkey, effective_price FROM cat_searchable
       |         WHERE $termPred),
       |cnts AS (SELECT s.t, s.disp_order,
       |                CAST(COUNT(h.p_partkey) AS BIGINT) AS cnt
       |         FROM sel s LEFT JOIN hits h ON h.effective_price < s.t
       |         GROUP BY s.t, s.disp_order),
       |total AS (SELECT COUNT(*) AS n FROM hits)
       |SELECT u.disp_order, u.upper_bound, u.cnt, u.is_custom,
       |       b.min_even, b.max_even
       |FROM (
       |  SELECT 0 AS disp_order, CAST(NULL AS DOUBLE) AS upper_bound,
       |         CAST(0 AS BIGINT) AS cnt, 1 AS is_custom
       |  FROM total WHERE n > 0
       |  UNION ALL
       |  SELECT disp_order, t AS upper_bound, cnt, 0 AS is_custom
       |  FROM cnts) u
       |CROSS JOIN bounds b
       |ORDER BY u.disp_order""".stripMargin

  private val termPred =
    "(lower(p_name) LIKE '%red%' OR lower(p_type) LIKE '%red%')"

  val qs: Seq[Q] = Seq(
    Q("q286_price_facet_group", (s, d) => priceFacetGroup(s, d),
      Some(priceFacetGroupOracle)),
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
