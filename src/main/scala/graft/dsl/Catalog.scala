package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Catalog product-extension fixture + the two F7 search-compiler branches
  * the round-14 verdict flagged missing (SURVEY §2.3 F7):
  *
  *  - the `available` 3-way inventory disjunction
  *    (`LinqCatalogSearchService.cs:321-331`): DontManageStock passes
  *    unconditionally; ManageStock passes on stock > 0 OR a non-NoBackorders
  *    backorder mode; ManageStockByAttributes passes iff ANY attribute
  *    combination has stock > 0 or allows out-of-stock orders;
  *  - the special-price date window (`LinqCatalogSearchService.cs:243-258`):
  *    price predicates test the SPECIAL price while it is active
  *    (`special_from` strictly before now when set, `special_to` strictly
  *    after now when set) and the list price otherwise.
  *
  * The driver's star schema has no inventory/special-price/rating columns
  * and its parquet is read-only, so the extension is a DERIVED fixture:
  * every column below is a deterministic function of `p_partkey` /
  * `p_retailprice`, mirrored verbatim by the SQL fragments the oracles
  * embed ([[productsSql]] / [[combosSql]] / [[searchableSql]] — the q127
  * synthetic-fixture discipline). Residue classes are chosen so every
  * branch arm is populated: all three inventory methods, in/out-of-stock,
  * both backorder modes, combo-less method-2 products, and all four
  * special-price window states (no bounds / active window / future start /
  * expired end).
  *
  * Scale shape: [[products]] is a map-only projection over the part scan;
  * [[combos]] is a bounded per-row explode (≤ 3 rows per product); the
  * availability EXISTS is re-expressed as distinct-project + left join on
  * the product key (map-side-combinable aggregate, broadcastable at dim
  * scale, plain key-shuffle join beyond), NOT a correlated per-row
  * subquery. Everything else is a column expression inside whole-stage
  * codegen.
  */
object Catalog {

  /** The catalog's fixed "now" — mid TPC-H date domain; `ctx.Now` in the
    * reference. A fixed clock (not current_timestamp) keeps every query
    * deterministic and oracle-checkable. */
  val NowLit = "TIMESTAMP '1995-06-17 00:00:00'"

  /** `ManageInventoryMethod` (reference enum): 0 = DontManageStock,
    * 1 = ManageStock, 2 = ManageStockByAttributes. */
  val DontManageStock = 0
  val ManageStock = 1
  val ManageStockByAttributes = 2

  /** Part + the synthesized product-extension columns (inventory method,
    * stock, backorder mode, special-price window, approved ratings). */
  def products(part: DataFrame): DataFrame = {
    val pk = col("p_partkey")
    part
      .withColumn("inventory_method", (pk % 3).cast("int"))
      .withColumn("stock_qty", ((pk * 7) % 40 - 5).cast("int"))
      .withColumn("backorder_mode", when(pk % 5 === 0, 1).otherwise(0))
      .withColumn("special_price",
        when(pk % 4 === 0, col("p_retailprice") - 100.0))
      .withColumn("special_from",
        when(pk % 16 === 4, expr("TIMESTAMP '1995-01-01 00:00:00'"))
          .when(pk % 16 === 8, expr("TIMESTAMP '1995-07-01 00:00:00'")))
      .withColumn("special_to",
        when(pk % 16 === 4, expr("TIMESTAMP '1995-12-31 00:00:00'"))
          .when(pk % 16 === 12, expr("TIMESTAMP '1995-01-01 00:00:00'")))
      .withColumn("approved_total_reviews", (pk % 7).cast("int"))
      .withColumn("approved_rating_sum",
        when(pk % 7 > 0, (pk * 3) % (lit(5) * (pk % 7) + 1))
          .otherwise(0).cast("int"))
  }

  /** The `ProductVariantAttributeCombination` child fixture: 0–3 combos
    * per product, each with its own stock and out-of-stock-orders flag. */
  def combos(part: DataFrame): DataFrame =
    part.select(col("p_partkey").as("product_id"), (col("p_partkey") % 4).as("n"))
      .filter(col("n") > 0)
      .select(col("product_id"),
        explode(expr("sequence(CAST(0 AS BIGINT), n - 1)")).as("c"))
      .select(col("product_id"), col("c"),
        ((col("product_id") + lit(13) * col("c")) % 7 - 3).cast("int")
          .as("combo_stock"),
        ((col("product_id") + col("c")) % 11 === 0).as("allow_oos"))

  /** Active-special-price predicate (`LinqCatalogSearchService.cs:245-247`):
    * a special price applies iff set AND its start (when set) is strictly
    * before now AND its end (when set) is strictly after now. */
  def specialActive: Column =
    col("special_price").isNotNull &&
      (col("special_from").isNull || col("special_from") < expr(NowLit)) &&
      (col("special_to").isNull || col("special_to") > expr(NowLit))

  /** The price a price filter/facet actually tests — the reference's
    * nested when/otherwise (`LinqCatalogSearchService.cs:243-258`)
    * re-expressed as one effective-price column: special while active,
    * list price otherwise. Equivalent to the reference's two-arm
    * disjunction for =, != and every range predicate (each row satisfies
    * exactly one arm) — EXCEPT at the exact boundary instants: at
    * `special_from == now` or `special_to == now` the reference's strict
    * comparisons match NEITHER arm (the row is excluded from every price
    * predicate), while this column falls back to the list price and can
    * still match. The fixture's fixed [[NowLit]] never lands on a
    * boundary, so the oracle cannot observe the divergence; a fixture
    * change that makes `special_from`/`special_to` equal NowLit would
    * need the reference's three-state logic instead. */
  def effectivePrice: Column =
    when(specialActive, col("special_price")).otherwise(col("p_retailprice"))

  /** Computed rating (`LinqCatalogSearchService.cs:226-228,704-722`):
    * approved_rating_sum / approved_total_reviews as double; rating
    * predicates additionally require approved_total_reviews > 0. */
  def rating: Column =
    col("approved_rating_sum").cast("double") /
      col("approved_total_reviews").cast("double")

  /** [[products]] + the compiled F7 columns: `available` (the 3-way
    * inventory disjunction, combos-EXISTS re-expressed as a distinct
    * project + left join), `effective_price`, and `rating`. The frame
    * every catalog-search query compiles against. */
  def searchable(part: DataFrame): DataFrame = {
    val comboOk = combos(part)
      .filter(col("combo_stock") > 0 || col("allow_oos"))
      .select(col("product_id")).distinct()
      .withColumn("combo_ok", lit(true))
    products(part)
      .join(comboOk, col("p_partkey") === col("product_id"), "left")
      .drop("product_id")
      .withColumn("available",
        col("inventory_method") === DontManageStock ||
          (col("inventory_method") === ManageStock &&
            (col("stock_qty") > 0 || col("backorder_mode") =!= 0)) ||
          (col("inventory_method") === ManageStockByAttributes &&
            coalesce(col("combo_ok"), lit(false))))
      .drop("combo_ok")
      .withColumn("effective_price", effectivePrice)
      .withColumn("rating", rating)
  }

  /** `FacetUtility.MakePriceEven`'s step grid (`FacetUtility.cs:8-41`):
    * above `lower` up to and including `upper`, the even-price grid
    * advances by `step`. The reference walks GetNextPrice from the
    * previous threshold; on segment (lower, upper] that walk lands on
    * lower + ceil((p - lower)/step)·step — the closed form both the
    * Column and the SQL twin use (ceil of an IEEE quotient is
    * engine-stable; memory: +,-,/ are correctly rounded everywhere). */
  private val evenSegments: Seq[(Double, Double, Double)] = Seq(
    (10d, 25d, 15d), (25d, 200d, 25d), (200d, 500d, 50d),
    (500d, 1000d, 100d), (1000d, 2000d, 250d), (2000d, 5000d, 500d),
    (5000d, 10000d, 1000d), (10000d, 20000d, 2500d),
    (20000d, 50000d, 5000d), (50000d, 100000d, 10000d),
    (100000d, 200000d, 25000d), (200000d, 500000d, 50000d),
    (500000d, 1000000d, 100000d), (1000000d, 2000000d, 250000d),
    (2000000d, 5000000d, 500000d), (5000000d, 10000000d, 1000000d),
    (10000000d, 20000000d, 2500000d), (20000000d, 50000000d, 5000000d))

  /** `FacetUtility.MakePriceEven` as a Column: the smallest even-grid
    * price ≥ p. p = 0 steps once from zero (→ 5); (0, 10] rounds to the
    * first threshold 10 (the reference's previous-threshold loop starts
    * at index 1, so sub-10 prices land ON 10, not on the 5-grid); above
    * the last threshold the walk saturates at MAX_PRICE = 1e9. */
  def makePriceEven(p: Column): Column = {
    val base = when(p === 0d, 5d).when(p <= 10d, 10d)
    evenSegments.foldLeft(base) { case (acc, (lo, hi, st)) =>
      acc.when(p <= hi, lit(lo) + ceil((p - lit(lo)) / st) * st)
    }.otherwise(1000000000d)
  }

  /** [[makePriceEven]]'s DuckDB twin over a SQL expression string —
    * generated from the SAME segment table so the engines cannot drift. */
  def makePriceEvenSql(e: String): String = {
    val segs = evenSegments.map { case (lo, hi, st) =>
      s"WHEN $e <= $hi THEN $lo + ceil(($e - $lo) / $st) * $st"
    }.mkString(" ")
    s"CASE WHEN $e = 0 THEN 5.0 WHEN $e <= 10 THEN 10.0 $segs " +
      "ELSE 1000000000.0 END"
  }

  // ---------------------------------------------------------------------
  // DuckDB twins of the fixture + compiled columns, embedded by oracles.
  // Keep these TEXTUALLY in sync with the Spark builders above — the
  // hash-equality gate is the proof they agree.
  // ---------------------------------------------------------------------

  /** CTE body mirroring [[products]]. */
  val productsSql: String =
    """SELECT p.*,
      |       CAST(p_partkey % 3 AS INTEGER) AS inventory_method,
      |       CAST((p_partkey * 7) % 40 - 5 AS INTEGER) AS stock_qty,
      |       CASE WHEN p_partkey % 5 = 0 THEN 1 ELSE 0 END AS backorder_mode,
      |       CASE WHEN p_partkey % 4 = 0 THEN p_retailprice - 100.0 END AS special_price,
      |       CASE WHEN p_partkey % 16 = 4 THEN TIMESTAMP '1995-01-01 00:00:00'
      |            WHEN p_partkey % 16 = 8 THEN TIMESTAMP '1995-07-01 00:00:00'
      |       END AS special_from,
      |       CASE WHEN p_partkey % 16 = 4 THEN TIMESTAMP '1995-12-31 00:00:00'
      |            WHEN p_partkey % 16 = 12 THEN TIMESTAMP '1995-01-01 00:00:00'
      |       END AS special_to,
      |       CAST(p_partkey % 7 AS INTEGER) AS approved_total_reviews,
      |       CAST(CASE WHEN p_partkey % 7 > 0
      |                 THEN (p_partkey * 3) % (5 * (p_partkey % 7) + 1)
      |                 ELSE 0 END AS INTEGER) AS approved_rating_sum
      |FROM part p""".stripMargin

  /** CTE body mirroring [[combos]]. */
  val combosSql: String =
    """SELECT p_partkey AS product_id, c,
      |       CAST((p_partkey + 13 * c) % 7 - 3 AS INTEGER) AS combo_stock,
      |       ((p_partkey + c) % 11 = 0) AS allow_oos
      |FROM part, unnest(range(0, p_partkey % 4)) AS t(c)""".stripMargin

  /** CTE body mirroring [[searchable]] (expects `cat_products` and
    * `cat_combos` CTEs in scope). The EXISTS is the reference's literal
    * shape; the Spark side's distinct+left-join is the set-equivalent. */
  val searchableSql: String =
    s"""SELECT pr.*,
       |       (pr.inventory_method = 0
       |        OR (pr.inventory_method = 1
       |            AND (pr.stock_qty > 0 OR pr.backorder_mode <> 0))
       |        OR (pr.inventory_method = 2
       |            AND EXISTS (SELECT 1 FROM cat_combos cb
       |                        WHERE cb.product_id = pr.p_partkey
       |                          AND (cb.combo_stock > 0 OR cb.allow_oos)))
       |       ) AS available,
       |       CASE WHEN pr.special_price IS NOT NULL
       |                 AND (pr.special_from IS NULL OR pr.special_from < $NowLit)
       |                 AND (pr.special_to IS NULL OR pr.special_to > $NowLit)
       |            THEN pr.special_price ELSE pr.p_retailprice
       |       END AS effective_price,
       |       CAST(pr.approved_rating_sum AS DOUBLE)
       |         / CAST(pr.approved_total_reviews AS DOUBLE) AS rating
       |FROM cat_products pr""".stripMargin

  /** The full `WITH` prefix oracles start from. */
  val fixtureCtes: String =
    s"""WITH cat_products AS (
       |$productsSql),
       |cat_combos AS (
       |$combosSql),
       |cat_searchable AS (
       |$searchableSql)""".stripMargin
}
