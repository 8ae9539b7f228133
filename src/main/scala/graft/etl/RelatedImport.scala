package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.8 import capstone v2 (round-15 verdict item 3): the related-entity
  * import passes q283 left out — tier prices, attribute values, attribute
  * combinations, and the grouped-parent remap (`ProductImporter.cs:716-1047`)
  * — each as its own oracle-gated query over a real CSV round trip.
  *
  * Shared discipline (the q283 rules):
  *  - the import sheet derives deterministically from `part`, is written by
  *    the K1 CSV provider and read back through the S3 extension dispatcher;
  *    the oracle re-derives the sheet in SQL, so the file round trip must be
  *    lossless for the hash gate to pass;
  *  - the snapshot tables the passes update are derived fixtures (the
  *    `Catalog.combos` pattern) mirrored as verbatim SQL CTEs;
  *  - resolution/merge run through [[Upsert]]; since related-entity rows
  *    resolve by a single Id key, inserts carry `__src_order` as a second
  *    key field (null in the snapshot) — it can never resolve, but it keeps
  *    every insert row a distinct key tuple (all-null keys would collapse to
  *    one minted entity) and makes the minted-id order the file order;
  *  - untouched snapshot rows keep a null `__src_order` after the merge, so
  *    "touched" = `__src_order IS NOT NULL` — no second resolve pass needed.
  *
  * Reference semantics per pass:
  *  - tier prices (`ProcessTierPricesAsync`, ProductImporter.cs:873-962):
  *    update by Id; new rows REQUIRE a ProductId, which may be recovered
  *    from a ProductSku column via the Sku filter when the profile's key
  *    fields include Sku; rows with neither are skipped with an error;
  *  - attribute values (`ProcessAttributeValuesAsync`, cs:964-1045): update
  *    by Id; new rows require ProductVariantAttributeId AND Name, else
  *    skipped with an error;
  *  - attribute combinations (`ProcessAttributeCombinationsAsync`,
  *    cs:1047-1145): NEVER inserts ("to avoid inconsistent attribute
  *    combination data"); resolve by Id, then by each configured key field
  *    in order (Sku → Gtin → Mpn); unresolved rows are skipped with an
  *    error;
  *  - grouped products (`ProcessGroupedProductsAsync`, cs:822-871): after
  *    the product pass, (old associated id → old parent id) pairs are
  *    remapped through the (old id → new id) target map — both sides must
  *    resolve, else the link is dropped — and ParentGroupedProductId is
  *    updated on the associated products.
  *
  * Scale shape: every pass is the q26/q283 join plan — key equi-joins for
  * resolution, one full-outer merge keyed on the surrogate, map-only sheet
  * builds; the sku/target maps join by key (broadcastable at dim scale).
  * No pass holds more than the import batch in any window.
  */
object RelatedImport {

  private def pk = col("p_partkey")

  private def stageDir(dir: String, name: String): String =
    SheetStage.dirFor(dir, name)

  /** TierPrice snapshot fixture: products `p_partkey % 6 = 1` carry two
    * tiers (qty 5 and 10, price list − 10/− 20); `tp_id = p_partkey·10 + t`.
    * Mirrored by [[tierSnapshotSql]]. */
  private[etl] def tierSnapshot(part: DataFrame): DataFrame =
    part.filter(pk % 6 === 1)
      .select(pk, col("p_retailprice"))
      .withColumn("t", explode(array(lit(0L), lit(1L))))
      .select((pk * 10 + col("t")).as("tp_id"),
        pk.as("product_id"),
        (lit(5) * (col("t") + 1)).cast("int").as("qty"),
        (col("p_retailprice") - lit(10) * (col("t") + 1)).as("price"))

  private val tierSnapshotSql =
    """SELECT p_partkey * 10 + t AS tp_id, p_partkey AS product_id,
      |       CAST(5 * (t + 1) AS INT) AS qty,
      |       p_retailprice - 10 * (t + 1) AS price
      |FROM part CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT)))
      |     AS tiers(t)
      |WHERE p_partkey % 6 = 1""".stripMargin

  /** Stage the tier-price import sheet as CSV (strings, K1 writer):
    * updates by Id, inserts by ProductId, inserts recovering ProductId
    * from ProductSku, and key-less rows the pass must skip. */
  private[etl] def stageTierSheet(s: SparkSession, dir: String): String =
    SheetStage.once(stageDir(dir, "tier_import_src")) { out =>
    val part = Tables.part(s, dir)
    val u = part.filter(pk % 12 === 1).select(
      (pk * 10).cast("string").as("Id"),
      lit(null).cast("string").as("ProductId"),
      lit(null).cast("string").as("ProductSku"),
      lit("7").as("Quantity"),
      (col("p_retailprice") - 5.0).cast("string").as("Price"),
      pk.cast("string").as("SrcOrder"))
    val i = part.filter(pk % 6 === 4).select(
      lit(null).cast("string").as("Id"),
      pk.cast("string").as("ProductId"),
      lit(null).cast("string").as("ProductSku"),
      lit("15").as("Quantity"),
      (col("p_retailprice") - 30.0).cast("string").as("Price"),
      (lit(1000000000L) + pk).cast("string").as("SrcOrder"))
    val sk = part.filter(pk % 6 === 2).select(
      lit(null).cast("string").as("Id"),
      lit(null).cast("string").as("ProductId"),
      concat(lit("P-"), pk.cast("string")).as("ProductSku"),
      lit("20").as("Quantity"),
      (col("p_retailprice") - 40.0).cast("string").as("Price"),
      (lit(2000000000L) + pk).cast("string").as("SrcOrder"))
    val x = part.filter(pk % 30 === 5).select(
      lit(null).cast("string").as("Id"),
      lit(null).cast("string").as("ProductId"),
      lit(null).cast("string").as("ProductSku"),
      lit("9").as("Quantity"),
      lit("1.0").as("Price"),
      (lit(3000000000L) + pk).cast("string").as("SrcOrder"))
    Providers("csv")(u.unionByName(i).unionByName(sk).unionByName(x), out, None)
  }

  /** q287: the tier-price related-entity pass. Output = every tier price
    * the batch touched (updated in place or freshly minted above the
    * snapshot max) plus the skip tally as a constant column. */
  def tierPriceImport(s: SparkSession, dir: String): DataFrame =
    ChainCache.memo(s, dir, "q287_tier")(tierPriceImportImpl(s, dir))

  private def tierPriceImportImpl(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir)
    // pin the derived snapshot: it feeds the resolve index, the merge's
    // surrogate-max read and the full-outer merge join — unpinned, the
    // explode re-derives per consumer (3 subtree re-executions)
    val snapshot = graft.Ckpt(tierSnapshot(part)
      .withColumn("__src_order", lit(null).cast("long")))
    val raw = Tabular.fromFile(s, stageTierSheet(s, dir), CsvConfig())
    val typed = ColumnMap(raw, ColumnMapping(renames = Map(
      "Id" -> "tp_id", "ProductId" -> "product_id", "ProductSku" -> "sku",
      "Quantity" -> "qty", "Price" -> "price", "SrcOrder" -> "__src_order")))
      .select(col("tp_id").try_cast("long").as("tp_id"),
        col("product_id").try_cast("long").as("product_id"),
        col("sku"), col("qty").try_cast("int").as("qty"),
        col("price").try_cast("double").as("price"),
        col("__src_order").try_cast("long").as("__src_order"))
    // ProductSku → ProductId recovery (ApplySkuFilter; the profile's key
    // fields include Sku) — the derived product sku index is 'P-' || id
    val skuIndex = part.select(
      concat(lit("P-"), pk.cast("string")).as("sku"), pk.as("__sku_pid"))
    val withPid = typed.join(skuIndex, Seq("sku"), "left")
      .withColumn("product_id", coalesce(col("product_id"), col("__sku_pid")))
      .drop("__sku_pid", "sku")
    val skipped = withPid
      .filter(col("tp_id").isNull && col("product_id").isNull)
      .agg(count(lit(1)).as("n_skipped"))
    val cfg = Upsert.Config(
      surrogate = "tp_id",
      keyPriority = Seq("tp_id", "__src_order"),
      requiredForInsert = Some("product_id"),
      incomingOrder = Seq("__src_order"))
    // pin resolved: merge reads it through both the insert and the
    // update branch (2 executions of the sheet ⋈ sku-index chain unpinned)
    val resolved = graft.Ckpt(Upsert.resolve(snapshot, withPid, cfg))
    val merged = Upsert.merge(snapshot, resolved, cfg)
    merged.filter(col("__src_order").isNotNull) // touched rows only
      .crossJoin(broadcast(skipped))
      .select(col("tp_id"), col("product_id"), col("qty"), col("price"),
        col("n_skipped"))
      .orderBy(col("tp_id"))
  }

  private val tierOracle =
    s"""WITH tp AS (
       |$tierSnapshotSql),
       |maxid AS (SELECT MAX(tp_id) AS m FROM tp),
       |u AS (
       |  SELECT p_partkey * 10 AS tp_id, CAST(NULL AS BIGINT) AS pid,
       |         CAST(7 AS INT) AS qty, p_retailprice - 5.0 AS price,
       |         CAST(p_partkey AS BIGINT) AS src
       |  FROM part WHERE p_partkey % 12 = 1),
       |i AS (
       |  SELECT CAST(NULL AS BIGINT), p_partkey, CAST(15 AS INT),
       |         p_retailprice - 30.0, 1000000000 + p_partkey
       |  FROM part WHERE p_partkey % 6 = 4),
       |sk AS (
       |  -- ProductSku 'P-' || id recovers the ProductId through the sku
       |  -- index (an identity here by construction)
       |  SELECT CAST(NULL AS BIGINT), p_partkey, CAST(20 AS INT),
       |         p_retailprice - 40.0, 2000000000 + p_partkey
       |  FROM part WHERE p_partkey % 6 = 2),
       |x AS (
       |  SELECT CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(9 AS INT),
       |         1.0, 3000000000 + p_partkey
       |  FROM part WHERE p_partkey % 30 = 5),
       |sheet AS (
       |  SELECT * FROM u UNION ALL SELECT * FROM i
       |  UNION ALL SELECT * FROM sk UNION ALL SELECT * FROM x),
       |skipped AS (
       |  SELECT COUNT(*) AS n FROM sheet WHERE tp_id IS NULL AND pid IS NULL),
       |upd AS (
       |  SELECT s.tp_id, tp.product_id, s.qty, s.price
       |  FROM sheet s JOIN tp ON tp.tp_id = s.tp_id),
       |minted AS (
       |  SELECT (SELECT m FROM maxid) + ROW_NUMBER() OVER (ORDER BY src)
       |           AS tp_id,
       |         pid AS product_id, qty, price
       |  FROM sheet WHERE tp_id IS NULL AND pid IS NOT NULL)
       |SELECT t.tp_id, t.product_id, t.qty, t.price,
       |       (SELECT n FROM skipped) AS n_skipped
       |FROM (SELECT * FROM upd UNION ALL SELECT * FROM minted) t
       |ORDER BY t.tp_id""".stripMargin

  // -------------------------------------------------------------------
  // q288: attribute values
  // -------------------------------------------------------------------

  /** ProductVariantAttributeValue snapshot fixture: every product carries
    * one attribute (`pva_id = p_partkey·2`) with `p_partkey % 3` values
    * (0–2); `av_id = p_partkey·100 + v`. Mirrored by [[avSnapshotSql]]. */
  private[etl] def avSnapshot(part: DataFrame): DataFrame =
    part.select(pk)
      .withColumn("v", explode(array(lit(0L), lit(1L))))
      .filter(col("v") < pk % 3)
      .select((pk * 100 + col("v")).as("av_id"),
        (pk * 2).as("pva_id"),
        concat(lit("V"), col("v").cast("string")).as("name"),
        (col("v") * 1.5).as("price_adj"),
        col("v").cast("int").as("display_order"))

  private val avSnapshotSql =
    """SELECT p_partkey * 100 + v AS av_id, p_partkey * 2 AS pva_id,
      |       'V' || v AS name, v * 1.5 AS price_adj,
      |       CAST(v AS INT) AS display_order
      |FROM part CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT)))
      |     AS vv(v)
      |WHERE v < p_partkey % 3""".stripMargin

  private[etl] def stageAvSheet(s: SparkSession, dir: String): String =
    SheetStage.once(stageDir(dir, "attr_value_import_src")) { out =>
    val part = Tables.part(s, dir)
    val u = part.filter(pk % 4 === 1 && pk % 3 > 0).select(
      (pk * 100).cast("string").as("Id"),
      lit(null).cast("string").as("ProductVariantAttributeId"),
      lit(null).cast("string").as("Name"),
      lit("2.5").as("PriceAdjustment"),
      lit("9").as("DisplayOrder"),
      pk.cast("string").as("SrcOrder"))
    val i = part.filter(pk % 4 === 2).select(
      lit(null).cast("string").as("Id"),
      (pk * 2).cast("string").as("ProductVariantAttributeId"),
      concat(lit("NEWV-"), pk.cast("string")).as("Name"),
      lit("0.5").as("PriceAdjustment"),
      lit("0").as("DisplayOrder"),
      (lit(1000000000L) + pk).cast("string").as("SrcOrder"))
    val xPva = part.filter(pk % 20 === 3).select(
      lit(null).cast("string").as("Id"),
      lit(null).cast("string").as("ProductVariantAttributeId"),
      lit("X").as("Name"),
      lit("1.0").as("PriceAdjustment"),
      lit("0").as("DisplayOrder"),
      (lit(2000000000L) + pk).cast("string").as("SrcOrder"))
    val xName = part.filter(pk % 20 === 7).select(
      lit(null).cast("string").as("Id"),
      (pk * 2).cast("string").as("ProductVariantAttributeId"),
      lit(null).cast("string").as("Name"),
      lit("1.0").as("PriceAdjustment"),
      lit("0").as("DisplayOrder"),
      (lit(3000000000L) + pk).cast("string").as("SrcOrder"))
    Providers("csv")(
      u.unionByName(i).unionByName(xPva).unionByName(xName), out, None)
  }

  /** q288: the attribute-value pass — update by Id; inserts require BOTH
    * ProductVariantAttributeId and Name (each missing half is a skipped
    * row with an error). */
  def attrValueImport(s: SparkSession, dir: String): DataFrame =
    ChainCache.memo(s, dir, "q288_av")(attrValueImportImpl(s, dir))

  private def attrValueImportImpl(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir)
    // pinned for the same 3 consumers as the tier snapshot above
    val snapshot = graft.Ckpt(avSnapshot(part)
      .withColumn("__src_order", lit(null).cast("long")))
    val raw = Tabular.fromFile(s, stageAvSheet(s, dir), CsvConfig())
    val typed = ColumnMap(raw, ColumnMapping(renames = Map(
      "Id" -> "av_id", "ProductVariantAttributeId" -> "pva_id",
      "Name" -> "name", "PriceAdjustment" -> "price_adj",
      "DisplayOrder" -> "display_order", "SrcOrder" -> "__src_order")))
      .select(col("av_id").try_cast("long").as("av_id"),
        col("pva_id").try_cast("long").as("pva_id"),
        col("name"),
        col("price_adj").try_cast("double").as("price_adj"),
        col("display_order").try_cast("int").as("display_order"),
        col("__src_order").try_cast("long").as("__src_order"))
      // insert gate: BOTH fields present (ProductImporter.cs:987-1005)
      .withColumn("__insert_ok",
        when(col("pva_id").isNotNull && col("name").isNotNull, lit(1)))
    val skipped = typed
      .filter(col("av_id").isNull && col("__insert_ok").isNull)
      .agg(count(lit(1)).as("n_skipped"))
    val cfg = Upsert.Config(
      surrogate = "av_id",
      keyPriority = Seq("av_id", "__src_order"),
      requiredForInsert = Some("__insert_ok"),
      incomingOrder = Seq("__src_order"))
    // pinned: merge's insert/update branches both read it
    val resolved = graft.Ckpt(Upsert.resolve(snapshot, typed, cfg))
    val merged = Upsert.merge(snapshot, resolved, cfg)
    merged.filter(col("__src_order").isNotNull)
      .crossJoin(broadcast(skipped))
      .select(col("av_id"), col("pva_id"), col("name"), col("price_adj"),
        col("display_order"), col("n_skipped"))
      .orderBy(col("av_id"))
  }

  private val avOracle =
    s"""WITH av AS (
       |$avSnapshotSql),
       |maxid AS (SELECT MAX(av_id) AS m FROM av),
       |u AS (
       |  SELECT p_partkey * 100 AS av_id, CAST(NULL AS BIGINT) AS pva_id,
       |         CAST(NULL AS VARCHAR) AS name, 2.5 AS price_adj,
       |         CAST(9 AS INT) AS display_order,
       |         CAST(p_partkey AS BIGINT) AS src
       |  FROM part WHERE p_partkey % 4 = 1 AND p_partkey % 3 > 0),
       |i AS (
       |  SELECT CAST(NULL AS BIGINT), p_partkey * 2, 'NEWV-' || p_partkey,
       |         0.5, CAST(0 AS INT), 1000000000 + p_partkey
       |  FROM part WHERE p_partkey % 4 = 2),
       |xp AS (
       |  SELECT CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), 'X',
       |         1.0, CAST(0 AS INT), 2000000000 + p_partkey
       |  FROM part WHERE p_partkey % 20 = 3),
       |xn AS (
       |  SELECT CAST(NULL AS BIGINT), p_partkey * 2, CAST(NULL AS VARCHAR),
       |         1.0, CAST(0 AS INT), 3000000000 + p_partkey
       |  FROM part WHERE p_partkey % 20 = 7),
       |sheet AS (
       |  SELECT * FROM u UNION ALL SELECT * FROM i
       |  UNION ALL SELECT * FROM xp UNION ALL SELECT * FROM xn),
       |skipped AS (
       |  SELECT COUNT(*) AS n FROM sheet
       |  WHERE av_id IS NULL AND (pva_id IS NULL OR name IS NULL)),
       |upd AS (
       |  SELECT s.av_id, av.pva_id, av.name, s.price_adj, s.display_order
       |  FROM sheet s JOIN av ON av.av_id = s.av_id),
       |minted AS (
       |  SELECT (SELECT m FROM maxid) + ROW_NUMBER() OVER (ORDER BY src)
       |           AS av_id,
       |         pva_id, name, price_adj, display_order
       |  FROM sheet
       |  WHERE av_id IS NULL AND pva_id IS NOT NULL AND name IS NOT NULL)
       |SELECT t.av_id, t.pva_id, t.name, t.price_adj, t.display_order,
       |       (SELECT n FROM skipped) AS n_skipped
       |FROM (SELECT * FROM upd UNION ALL SELECT * FROM minted) t
       |ORDER BY t.av_id""".stripMargin

  // -------------------------------------------------------------------
  // q289: attribute combinations (update-only, key cascade)
  // -------------------------------------------------------------------

  /** Combination snapshot: [[graft.dsl.Catalog.combos]] extended with the
    * import-side key columns — `combo_id = product_id·4 + c`, a sku on
    * every combo, a gtin on even products only, an mpn on products
    * divisible by 3 only (so each cascade stage has both hits and
    * null-key misses). Mirrored by [[comboSnapshotSql]]. */
  private[etl] def comboSnapshot(s: SparkSession, dir: String): DataFrame =
    graft.dsl.Catalog.combos(Tables.part(s, dir))
      .withColumn("combo_id", col("product_id") * 4 + col("c"))
      .select(col("combo_id"), col("product_id"),
        concat(lit("CS-"), col("combo_id").cast("string")).as("sku"),
        when(col("product_id") % 2 === 0,
          concat(lit("G-"), col("combo_id").cast("string"))).as("gtin"),
        when(col("product_id") % 3 === 0,
          concat(lit("M-"), col("combo_id").cast("string"))).as("mpn"),
        col("combo_stock").as("stock"),
        (col("product_id") % 50 + col("c")).cast("double").as("price"),
        col("allow_oos"))

  private val comboSnapshotSql =
    s"""SELECT product_id * 4 + c AS combo_id, product_id,
       |       'CS-' || (product_id * 4 + c) AS sku,
       |       CASE WHEN product_id % 2 = 0
       |            THEN 'G-' || (product_id * 4 + c) END AS gtin,
       |       CASE WHEN product_id % 3 = 0
       |            THEN 'M-' || (product_id * 4 + c) END AS mpn,
       |       combo_stock AS stock,
       |       CAST(product_id % 50 + c AS DOUBLE) AS price,
       |       allow_oos
       |FROM (${graft.dsl.Catalog.combosSql})""".stripMargin

  private[etl] def stageComboSheet(s: SparkSession, dir: String): String =
    SheetStage.once(stageDir(dir, "combo_import_src")) { out =>
    val part = Tables.part(s, dir)
    def row(idC: org.apache.spark.sql.Column,
        skuC: org.apache.spark.sql.Column, gtinC: org.apache.spark.sql.Column,
        mpnC: org.apache.spark.sql.Column, stockC: org.apache.spark.sql.Column,
        priceC: org.apache.spark.sql.Column, srcBase: Long)(f: DataFrame) =
      f.select(idC.cast("string").as("Id"), skuC.cast("string").as("Sku"),
        gtinC.cast("string").as("Gtin"), mpnC.cast("string").as("Mpn"),
        stockC.cast("string").as("StockQuantity"),
        priceC.cast("string").as("Price"),
        (lit(srcBase) + pk).cast("string").as("SrcOrder"))
    val nul = lit(null).cast("string")
    // by Id (pk%8=1 ⇒ pk%4=1 ⇒ combo c=0 exists)
    val byId = row(pk * 4, nul, nul, nul, lit(50), nul, 0L)(
      part.filter(pk % 8 === 1))
    // by Sku (pk%8=2 ⇒ c=1 exists)
    val bySku = row(nul, concat(lit("CS-"), (pk * 4 + 1).cast("string")),
      nul, nul, nul, lit(123.45), 1000000000L)(part.filter(pk % 8 === 2))
    // by Gtin (pk%8=6: even ⇒ gtin set; c=1 exists)
    val byGtin = row(nul, nul, concat(lit("G-"), (pk * 4 + 1).cast("string")),
      nul, lit(70), nul, 2000000000L)(part.filter(pk % 8 === 6))
    // by Mpn (pk%24=3 ⇒ pk%3=0 ⇒ mpn set; pk%4=3 ⇒ c=2 exists)
    val byMpn = row(nul, nul, nul, concat(lit("M-"), (pk * 4 + 2).cast("string")),
      lit(90), nul, 3000000000L)(part.filter(pk % 24 === 3))
    // unresolvable sku — the pass must skip it (inserting not supported)
    val miss = row(nul, concat(lit("NOPE-"), pk.cast("string")), nul, nul,
      lit(1), nul, 4000000000L)(part.filter(pk % 8 === 5))
    Providers("csv")(Seq(bySku, byGtin, byMpn, miss)
      .foldLeft(byId)(_ unionByName _), out, None)
  }

  /** q289: the attribute-combination pass — resolve by Id, then by each
    * key field in cascade order (Sku → Gtin → Mpn); inserting is NOT
    * supported, so unresolved rows are skipped with an error. */
  def comboImport(s: SparkSession, dir: String): DataFrame =
    ChainCache.memo(s, dir, "q289_combo")(comboImportImpl(s, dir))

  private def comboImportImpl(s: SparkSession, dir: String): DataFrame = {
    // pinned: 4 resolve key indexes + merge's surrogate-max and
    // full-outer join all read the combos explode
    val snapshot = graft.Ckpt(comboSnapshot(s, dir)
      .withColumn("__src_order", lit(null).cast("long")))
    val raw = Tabular.fromFile(s, stageComboSheet(s, dir), CsvConfig())
    val typed = ColumnMap(raw, ColumnMapping(renames = Map(
      "Id" -> "combo_id", "Sku" -> "sku", "Gtin" -> "gtin", "Mpn" -> "mpn",
      "StockQuantity" -> "stock", "Price" -> "price",
      "SrcOrder" -> "__src_order")))
      .select(col("combo_id").try_cast("long").as("combo_id"),
        col("sku"), col("gtin"), col("mpn"),
        col("stock").try_cast("int").as("stock"),
        col("price").try_cast("double").as("price"),
        col("__src_order").try_cast("long").as("__src_order"))
    val cfg = Upsert.Config(
      surrogate = "combo_id",
      keyPriority = Seq("combo_id", "sku", "gtin", "mpn"),
      updateOnly = true,
      incomingOrder = Seq("__src_order"))
    val resolved = graft.Ckpt(Upsert.resolve(snapshot, typed, cfg))
    val skipped = resolved.filter(col(Upsert.IsNewCol))
      .agg(count(lit(1)).as("n_skipped"))
    val merged = Upsert.merge(snapshot, resolved, cfg)
    merged.filter(col("__src_order").isNotNull)
      .crossJoin(broadcast(skipped))
      .select(col("combo_id"), col("product_id"), col("stock"),
        col("price"), col("allow_oos"), col("n_skipped"))
      .orderBy(col("combo_id"))
  }

  private val comboOracle =
    s"""WITH cmb AS (
       |$comboSnapshotSql),
       |sheet AS (
       |  SELECT p_partkey * 4 AS key_id, CAST(NULL AS VARCHAR) AS sku,
       |         CAST(NULL AS VARCHAR) AS gtin, CAST(NULL AS VARCHAR) AS mpn,
       |         CAST(50 AS INT) AS stock, CAST(NULL AS DOUBLE) AS price,
       |         CAST(p_partkey AS BIGINT) AS src
       |  FROM part WHERE p_partkey % 8 = 1
       |  UNION ALL
       |  SELECT NULL, 'CS-' || (p_partkey * 4 + 1), NULL, NULL,
       |         NULL, 123.45, 1000000000 + p_partkey
       |  FROM part WHERE p_partkey % 8 = 2
       |  UNION ALL
       |  SELECT NULL, NULL, 'G-' || (p_partkey * 4 + 1), NULL,
       |         CAST(70 AS INT), NULL, 2000000000 + p_partkey
       |  FROM part WHERE p_partkey % 8 = 6
       |  UNION ALL
       |  SELECT NULL, NULL, NULL, 'M-' || (p_partkey * 4 + 2),
       |         CAST(90 AS INT), NULL, 3000000000 + p_partkey
       |  FROM part WHERE p_partkey % 24 = 3
       |  UNION ALL
       |  SELECT NULL, 'NOPE-' || p_partkey, NULL, NULL,
       |         CAST(1 AS INT), NULL, 4000000000 + p_partkey
       |  FROM part WHERE p_partkey % 8 = 5),
       |resolved AS (
       |  SELECT s.*, COALESCE(s.key_id,
       |           (SELECT c1.combo_id FROM cmb c1 WHERE c1.sku = s.sku),
       |           (SELECT c2.combo_id FROM cmb c2 WHERE c2.gtin = s.gtin),
       |           (SELECT c3.combo_id FROM cmb c3 WHERE c3.mpn = s.mpn))
       |           AS entity
       |  FROM sheet s),
       |skipped AS (SELECT COUNT(*) AS n FROM resolved WHERE entity IS NULL)
       |SELECT r.entity AS combo_id, c.product_id,
       |       COALESCE(r.stock, c.stock) AS stock,
       |       COALESCE(r.price, c.price) AS price,
       |       c.allow_oos,
       |       (SELECT n FROM skipped) AS n_skipped
       |FROM resolved r JOIN cmb c ON c.combo_id = r.entity
       |ORDER BY combo_id""".stripMargin

  // -------------------------------------------------------------------
  // q290: grouped-parent remap
  // -------------------------------------------------------------------

  /** Product sheet for the grouped remap: every row carries the SOURCE
    * shop's Id (`ProcessGroupedProductsAsync` requires Id +
    * ParentGroupedProductId columns). Parents are existing products;
    * associated rows are inserts whose old ids (3e9 + k) exist only in
    * the source file, referencing an existing parent's old id, another
    * INSERT's old id (both sides minted), or an id outside the file
    * (the TryGetValue miss — link dropped). A parent_old of 0 is never
    * collected (the reference's `parentId != 0` gate). */
  private def stageGroupedSheet(s: SparkSession, dir: String): String =
    SheetStage.once(stageDir(dir, "grouped_import_src")) { out =>
    val part = Tables.part(s, dir)
    val nul = lit(null).cast("string")
    val parents = part.filter(pk % 9 === 0).select(
      pk.cast("string").as("Id"),
      lit(graft.functions.Conversions.IgnoreToken).as("Name"),
      nul.as("ParentGroupedProductId"),
      pk.cast("string").as("SrcOrder"))
    val toExisting = part.filter(pk % 9 === 4).select(
      (lit(3000000000L) + pk).cast("string").as("Id"),
      concat(lit("NEW-G-"), pk.cast("string")).as("Name"),
      (pk - 4).cast("string").as("ParentGroupedProductId"),
      (lit(5000000000L) + pk).cast("string").as("SrcOrder"))
    val toInsert = part.filter(pk % 9 === 5).select(
      (lit(3000000000L) + pk).cast("string").as("Id"),
      concat(lit("NEW-H-"), pk.cast("string")).as("Name"),
      (lit(3000000000L) + pk - 1).cast("string").as("ParentGroupedProductId"),
      (lit(6000000000L) + pk).cast("string").as("SrcOrder"))
    val toMissing = part.filter(pk % 9 === 7).select(
      (lit(3000000000L) + pk).cast("string").as("Id"),
      concat(lit("NEW-I-"), pk.cast("string")).as("Name"),
      (lit(4000000000L) + pk).cast("string").as("ParentGroupedProductId"),
      (lit(7000000000L) + pk).cast("string").as("SrcOrder"))
    Providers("csv")(Seq(toExisting, toInsert, toMissing)
      .foldLeft(parents)(_ unionByName _), out, None)
  }

  /** q290: the grouped-parent remap — after the product upsert, the
    * collected (old associated id → old parent id) pairs translate
    * through the (old id → new id) target map; links where either side
    * fails to map are dropped; survivors update ParentGroupedProductId
    * on the associated product. */
  def groupedParentRemap(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir)
    val snapshot = part.select(pk, col("p_name"))
      .withColumn("parent_grouped", lit(null).cast("long"))
      .withColumn("__src_order", lit(null).cast("long"))
    val raw = Tabular.fromFile(s, stageGroupedSheet(s, dir), CsvConfig())
    val typed = ColumnMap(raw, ColumnMapping(renames = Map(
      "Id" -> "p_partkey", "Name" -> "p_name",
      "ParentGroupedProductId" -> "__parent_old", "SrcOrder" -> "__src_order")))
      .select(col("p_partkey").try_cast("long").as("p_partkey"),
        col("p_name"),
        col("__parent_old").try_cast("long").as("__parent_old"),
        col("__src_order").try_cast("long").as("__src_order"))
    val cfg = Upsert.Config(
      surrogate = "p_partkey",
      keyPriority = Seq("p_partkey", "p_name"),
      requiredForInsert = Some("p_name"),
      incomingOrder = Seq("__src_order"))
    val resolved = graft.Ckpt(Upsert.resolve(snapshot, typed, cfg))
    val merged = graft.Ckpt(Upsert.merge(snapshot, resolved, cfg))
    // target map: old file id → final entity id (inserts recover their
    // minted id by their unique fresh name — the q283 pattern)
    val newEnt = merged.filter(col("p_name").startsWith("NEW-"))
      .select(col("p_partkey").as("__new_ent"), col("p_name").as("__new_name"))
    val withEnt = resolved
      .join(newEnt, resolved("p_name") === col("__new_name"), "left")
      .withColumn("__ent", coalesce(col(Upsert.ResolvedCol), col("__new_ent")))
    val targetMap = withEnt.filter(col("p_partkey").isNotNull)
      .select(col("p_partkey").as("__old"), col("__ent").as("__new"))
    // collected pairs (id != 0 AND parentId != 0), remapped through the
    // target map on BOTH sides — inner joins drop the misses
    val links = withEnt
      .filter(col("p_partkey").isNotNull && col("__parent_old").isNotNull &&
        col("__parent_old") =!= 0L)
      .select(col("__ent").as("__child_new"), col("__parent_old"))
    val remapped = links.join(targetMap,
        links("__parent_old") === targetMap("__old"))
      .select(col("__child_new"), col("__new").as("parent_new"))
    val nRemapped = remapped.agg(count(lit(1)).as("n_remapped"))
    merged.filter(col("__src_order").isNotNull)
      .join(remapped, col("p_partkey") === col("__child_new"), "left")
      .crossJoin(broadcast(nRemapped))
      .select(col("p_partkey"), col("p_name"),
        col("parent_new").as("parent_grouped"), col("n_remapped"))
      .orderBy(col("p_partkey"))
  }

  private val groupedOracle =
    """WITH maxid AS (SELECT MAX(p_partkey) AS m FROM part),
      |ga AS (
      |  SELECT p_partkey AS old_id, p_partkey AS new_id, p_name AS name,
      |         CAST(NULL AS BIGINT) AS parent_old
      |  FROM part WHERE p_partkey % 9 = 0),
      |ins AS (
      |  SELECT 3000000000 + p_partkey AS old_id, 'NEW-G-' || p_partkey AS name,
      |         CAST(p_partkey - 4 AS BIGINT) AS parent_old
      |  FROM part WHERE p_partkey % 9 = 4
      |  UNION ALL
      |  SELECT 3000000000 + p_partkey, 'NEW-H-' || p_partkey,
      |         3000000000 + p_partkey - 1
      |  FROM part WHERE p_partkey % 9 = 5
      |  UNION ALL
      |  SELECT 3000000000 + p_partkey, 'NEW-I-' || p_partkey,
      |         4000000000 + p_partkey
      |  FROM part WHERE p_partkey % 9 = 7),
      |minted AS (
      |  SELECT old_id, name, parent_old,
      |         (SELECT m FROM maxid) + ROW_NUMBER() OVER (ORDER BY old_id)
      |           AS new_id
      |  FROM ins),
      |tmap AS (
      |  SELECT old_id, new_id FROM ga
      |  UNION ALL SELECT old_id, new_id FROM minted),
      |remapped AS (
      |  SELECT c.new_id AS child_new, t.new_id AS parent_new
      |  FROM (SELECT new_id, parent_old FROM ga WHERE parent_old IS NOT NULL
      |        UNION ALL
      |        SELECT new_id, parent_old FROM minted
      |        WHERE parent_old IS NOT NULL AND parent_old <> 0) c
      |  JOIN tmap t ON t.old_id = c.parent_old),
      |nrem AS (SELECT COUNT(*) AS n FROM remapped),
      |touched AS (
      |  SELECT new_id, name FROM ga
      |  UNION ALL SELECT new_id, name FROM minted)
      |SELECT u.new_id AS p_partkey, u.name AS p_name,
      |       r.parent_new AS parent_grouped,
      |       (SELECT n FROM nrem) AS n_remapped
      |FROM touched u LEFT JOIN remapped r ON r.child_new = u.new_id
      |ORDER BY p_partkey""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("q287_tier_price_import", (s, d) => tierPriceImport(s, d),
      Some(tierOracle)),
    Q("q288_attr_value_import", (s, d) => attrValueImport(s, d),
      Some(avOracle)),
    Q("q289_attr_combination_import", (s, d) => comboImport(s, d),
      Some(comboOracle)),
    Q("q290_grouped_parent_remap", (s, d) => groupedParentRemap(s, d),
      Some(groupedOracle)))
}
