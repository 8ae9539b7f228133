package graft.etl

import graft.{Q, Tables}
import graft.functions.Conversions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.8 import capstone v3 (round-16 verdict items 1 + 7): the last two
  * import-side reference behaviors plus the result-object rollup.
  *
  *  - q292: the store-mappings per-batch pass
  *    (`EntityImporterBase.ProcessStoreMappingsAsync`,
  *    `/root/reference/src/Smartstore.Core/Platform/DataExchange/Import/EntityImporterBase.cs:168-233`):
  *    each row's `StoreIds` int-list decides the entity's
  *    `LimitedToStores` flag and reconciles the (entity, store) mapping
  *    rows — add missing, delete extra, ids outside the store set
  *    ignored (the reference loops `context.Stores`), a lone `0` or an
  *    empty list meaning "not limited" (flag cleared, mappings left
  *    alone — the reference only flips the flag on that branch).
  *  - q293: the `ImportResult` message rollup (`ImportResult.cs:21,63-80`
  *    — one `ImportMessage` per affected row with severity + affected
  *    field) composed across the whole product-import chain: the product
  *    pass's conversion warnings (q283) and the related passes' skip
  *    errors (q287 tier keyless, q288 missing attribute-id/name, q289
  *    unresolvable combination). Grouped-parent drops (q290) are
  *    SILENT in the reference (`ProductImporter.cs:822-871` has no
  *    AddError/AddWarning) and therefore absent here too.
  *  - q294: `DataImporter.SendCompletionEmail` (`DataImporter.cs:236-309`)
  *    — the queue row the importer emits after every run: recipient
  *    cascade webmaster → company → the email account itself, subject
  *    from the profile name, body carrying the `ImportResult` tallies
  *    (total / skipped / new / modified / errors / warnings + LastError).
  *    The counts derive from the ACTUAL pass outputs (the reference
  *    reads the in-memory `ImportResult` the passes accumulated), and
  *    the per-pass tallies follow `ProductImporter.cs:113-114,954-955,
  *    1040-1041,1135-1136`: every pass adds its inserts to NewRecords
  *    and its updates to ModifiedRecords; SkippedRecords counts the
  *    skip-with-error rows.
  *
  * Scale shape: q292 is key equi-joins plus one broadcast of the 5-row
  * store dim — the mapping table grows with the catalog, and every
  * reconciliation step (desired ∖ existing, existing ∖ desired) is an
  * equi-join on (entity, store), never a window. q293 is map-only sheet
  * scans plus the same key-resolution joins as the passes it audits.
  * q294's result is ONE row: the passes run distributed, the final
  * tallies collapse to scalar aggregates, and the single-row collect is
  * the Spark translation of the reference reading its in-memory result
  * object (bounded by construction — same justification as the BPE
  * argmax).
  */
object ImportFinalize {

  private def pk = col("p_partkey")

  // ------------------------------------------------------------------
  // q292: store mappings
  // ------------------------------------------------------------------

  /** Existing-mapping snapshot: products `pk % 4 = 1` are currently
    * LimitedToStores with mappings to stores `pk % 5` and `(pk+2) % 5`.
    * Mirrored in the oracle's `snap` CTE. */
  private def mappingSnapshot(part: DataFrame): DataFrame =
    part.filter(pk % 4 === 1).select(pk)
      .withColumn("j", explode(array(lit(0L), lit(2L))))
      .select(pk.as("product_id"), ((pk + col("j")) % 5).cast("int").as("store_id"))

  /** Stage the store-mapping sheet (K1 CSV writer; the list separator is
    * ',' inside the ';'-delimited file — `DataReaderTests.cs:81` accepts
    * both for int lists). Classes:
    *  - `pk%6=1`: two valid stores + the invalid id 9 (ignored);
    *  - `pk%6=2`: the lone-zero list — NOT limited (the reference's
    *    `storeIds.Count == 1 && storeIds[0] == 0` gate);
    *  - `pk%6=3`: empty cell — NOT limited;
    *  - `pk%6=4`: ONLY the invalid id 9 — flag still set (hasStoreIds is
    *    checked on the raw list), every existing mapping deleted. */
  private[etl] def stageStoreMappingSheet(s: SparkSession, dir: String): String = {
    SheetStage.once(SheetStage.dirFor(dir, "store_mapping_import_src")) { out =>
    val part = Tables.part(s, dir)
    val nul = lit(null).cast("string")
    def sheetRow(idsC: org.apache.spark.sql.Column)(f: DataFrame) =
      f.select(pk.cast("string").as("Id"), idsC.as("StoreIds"),
        pk.cast("string").as("SrcOrder"))
    val m1 = sheetRow(concat((pk % 5).cast("string"), lit(","),
      ((pk + 1) % 5).cast("string"), lit(",9")))(part.filter(pk % 6 === 1))
    val m2 = sheetRow(lit("0"))(part.filter(pk % 6 === 2))
    val m3 = sheetRow(nul)(part.filter(pk % 6 === 3))
    val m4 = sheetRow(lit("9"))(part.filter(pk % 6 === 4))
    Providers("csv")(m1.unionByName(m2).unionByName(m3).unionByName(m4),
      out, None)
    }
  }

  /** q292: the store-mappings pass. Output = one row per sheet entity:
    * the final `LimitedToStores` flag, the final mapping set (sorted,
    * comma-joined; null when empty), and the reconciliation tallies. */
  def storeMappingImport(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir)
    val stores = Tables.region(s, dir)
      .select(col("r_regionkey").cast("int").as("store_id"))
    val snap = mappingSnapshot(part)
    val raw = Tabular.fromFile(s, stageStoreMappingSheet(s, dir), CsvConfig())
    val typed = ColumnMap(raw, ColumnMapping(renames = Map(
      "Id" -> "product_id", "StoreIds" -> "__ids_raw",
      "SrcOrder" -> "__src_order")))
      .select(col("product_id").try_cast("long").as("product_id"),
        Conversions.intList(col("__ids_raw")).as("ids"))
    // hasStoreIds on the RAW list: non-empty and not the lone zero
    // (EntityImporterBase.cs:186-191)
    val flagged = graft.Ckpt(typed.withColumn("has_ids",
      col("ids").isNotNull && size(col("ids")) > 0 &&
        !(size(col("ids")) === 1 && element_at(col("ids"), 1) === 0)))
    // desired = sheet ids ∩ the store set (ids outside context.Stores
    // are silently ignored — the reference iterates the stores, not the
    // list)
    val desired = flagged.filter(col("has_ids"))
      .select(col("product_id"), explode(col("ids")).as("store_id"))
      .join(broadcast(stores), Seq("store_id"))
      .select(col("product_id"), col("store_id")).distinct()
    // the reconcile only runs for rows WITH store ids; other rows leave
    // their mappings untouched (only the flag is cleared). It is also
    // scoped to context.Stores: the reference's foreach over the store
    // set never visits a mapping to an out-of-set store, so such
    // mappings are neither counted as deletions nor removed — split the
    // snapshot and carry the out-of-set slice straight to the final map.
    val inSet = snap.join(broadcast(stores), Seq("store_id"), "left_semi")
    val outOfSet = snap.join(broadcast(stores), Seq("store_id"), "left_anti")
    val existing = inSet.join(
      flagged.filter(col("has_ids")).select(col("product_id")),
      Seq("product_id"), "left_semi")
    val cls = desired.withColumn("__want", lit(true))
      .join(existing.withColumn("__have", lit(true)),
        Seq("product_id", "store_id"), "full")
    val insCnt = cls.filter(col("__want") && col("__have").isNull)
      .groupBy(col("product_id")).agg(count(lit(1)).as("n_inserted"))
    val delCnt = cls.filter(col("__have") && col("__want").isNull)
      .groupBy(col("product_id")).agg(count(lit(1)).as("n_deleted"))
    val finalMap = desired
      .unionByName(outOfSet.join(
        flagged.filter(col("has_ids")).select(col("product_id")),
        Seq("product_id"), "left_semi"))
      .unionByName(
        snap.join(flagged.filter(!col("has_ids")).select(col("product_id")),
          Seq("product_id"), "left_semi"))
    val agg = finalMap.groupBy(col("product_id"))
      .agg(array_join(transform(array_sort(collect_list(col("store_id"))),
        _.cast("string")), ",").as("store_ids"))
    flagged.select(col("product_id"), col("has_ids"))
      .join(agg, Seq("product_id"), "left")
      .join(insCnt, Seq("product_id"), "left")
      .join(delCnt, Seq("product_id"), "left")
      .select(col("product_id"),
        col("has_ids").cast("int").as("limited_to_stores"),
        col("store_ids"),
        coalesce(col("n_inserted"), lit(0L)).as("n_inserted"),
        coalesce(col("n_deleted"), lit(0L)).as("n_deleted"))
      .orderBy(col("product_id"))
  }

  private val storeMappingOracle =
    """WITH stores AS (SELECT CAST(r_regionkey AS INT) AS store_id FROM region),
      |snap AS (
      |  SELECT p_partkey AS product_id,
      |         CAST((p_partkey + j) % 5 AS INT) AS store_id
      |  FROM part CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(2 AS BIGINT)))
      |       AS jj(j)
      |  WHERE p_partkey % 4 = 1),
      |sheet AS (
      |  SELECT p_partkey AS product_id,
      |         CASE WHEN p_partkey % 6 IN (1, 4) THEN 1 ELSE 0 END AS has_ids
      |  FROM part WHERE p_partkey % 6 IN (1, 2, 3, 4)),
      |desired AS (
      |  -- ids ∩ stores: 9 never joins a real store; m4's lone 9 leaves
      |  -- an empty desired set
      |  SELECT product_id, store_id FROM (
      |    SELECT p_partkey AS product_id,
      |           CAST(p_partkey % 5 AS INT) AS store_id
      |    FROM part WHERE p_partkey % 6 = 1
      |    UNION
      |    SELECT p_partkey, CAST((p_partkey + 1) % 5 AS INT)
      |    FROM part WHERE p_partkey % 6 = 1)),
      |-- the reconcile is scoped to context.Stores: only in-set snapshot
      |-- mappings participate in the delete arithmetic; out-of-set ones
      |-- survive into the final set untouched (mirrors the engine's
      |-- inSet/outOfSet split — vacuously empty on this fixture)
      |snap_in AS (
      |  SELECT s.product_id, s.store_id
      |  FROM snap s JOIN stores st ON st.store_id = s.store_id),
      |snap_out AS (
      |  SELECT s.product_id, s.store_id
      |  FROM snap s LEFT JOIN stores st ON st.store_id = s.store_id
      |  WHERE st.store_id IS NULL),
      |existing AS (
      |  SELECT s.product_id, s.store_id
      |  FROM snap_in s JOIN sheet sh
      |    ON sh.product_id = s.product_id AND sh.has_ids = 1),
      |ins AS (
      |  SELECT product_id, COUNT(*) AS n FROM (
      |    SELECT * FROM desired EXCEPT SELECT * FROM existing)
      |  GROUP BY product_id),
      |del AS (
      |  SELECT product_id, COUNT(*) AS n FROM (
      |    SELECT * FROM existing EXCEPT SELECT * FROM desired)
      |  GROUP BY product_id),
      |final AS (
      |  SELECT * FROM desired
      |  UNION ALL
      |  SELECT s.product_id, s.store_id
      |  FROM snap_out s JOIN sheet sh
      |    ON sh.product_id = s.product_id AND sh.has_ids = 1
      |  UNION ALL
      |  SELECT s.product_id, s.store_id
      |  FROM snap s JOIN sheet sh
      |    ON sh.product_id = s.product_id AND sh.has_ids = 0),
      |agg AS (
      |  SELECT product_id,
      |         string_agg(CAST(store_id AS VARCHAR), ',' ORDER BY store_id)
      |           AS store_ids
      |  FROM final GROUP BY product_id)
      |SELECT sh.product_id,
      |       CAST(sh.has_ids AS INT) AS limited_to_stores,
      |       a.store_ids,
      |       CAST(COALESCE(i.n, 0) AS BIGINT) AS n_inserted,
      |       CAST(COALESCE(d.n, 0) AS BIGINT) AS n_deleted
      |FROM sheet sh
      |LEFT JOIN agg a ON a.product_id = sh.product_id
      |LEFT JOIN ins i ON i.product_id = sh.product_id
      |LEFT JOIN del d ON d.product_id = sh.product_id
      |ORDER BY sh.product_id""".stripMargin

  // ------------------------------------------------------------------
  // q293: ImportResult message rollup
  // ------------------------------------------------------------------

  /** The reference's exact skip-error strings (`ProductImporter.cs:916,
    * 994,1001,1101`). */
  private[etl] val TierErrMsg =
    "The 'ProductId' field is required for new tier prices. Skipping row."
  private[etl] val AvPvaErrMsg =
    "The 'ProductVariantAttributeId' field is required for new attribute values. Skipping row."
  private[etl] val AvNameErrMsg =
    "The 'Name' field is required for new attribute values. Skipping row."
  private[etl] val ComboErrMsg =
    "The 'Id' or another key field is required. Inserting attribute combinations not supported. Skipping row."

  /** The attribute-value pass's insert-gate error rows over the staged
    * sheet — (row_key, field, message), ProductVariantAttributeId
    * checked before Name (`ProductImporter.cs:987-1005` branch order).
    * The ONE derivation of this gate, shared by the q293 rollup and
    * q294's LastError pick so they can never silently diverge. */
  private def avErrorRows(s: SparkSession, dir: String): DataFrame = {
    val avraw = Tabular.fromFile(s, RelatedImport.stageAvSheet(s, dir),
      CsvConfig())
    avraw.filter(col("Id").isNull &&
        (col("ProductVariantAttributeId").isNull || col("Name").isNull))
      .select(col("SrcOrder").try_cast("long").as("row_key"),
        when(col("ProductVariantAttributeId").isNull,
          lit("ProductVariantAttributeId")).otherwise(lit("Name"))
          .as("field"),
        when(col("ProductVariantAttributeId").isNull, lit(AvPvaErrMsg))
          .otherwise(lit(AvNameErrMsg)).as("message"))
  }

  /** q293: one `ImportMessage` row per affected sheet row across the
    * product-import chain — (pass, row_key, field, message, severity),
    * row identity = the sheet's SrcOrder. Each pass's error set is
    * re-derived by that pass's OWN resolution logic over the staged
    * sheet (sku-index recovery for tier prices, the field gate for
    * attribute values, the Id→Sku→Gtin→Mpn cascade for combinations),
    * not by fixture knowledge. */
  def errorRollup(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir)
    def msgRow(pass: String, rowKey: org.apache.spark.sql.Column,
        field: String, msg: String, severity: String)(f: DataFrame) =
      f.select(lit(pass).as("pass"), rowKey.cast("long").as("row_key"),
        lit(field).as("field"), lit(msg).as("message"),
        lit(severity).as("severity"))
    // product pass: the conversion-warning channel (q283's ImportErrors
    // side-channel, keyed by SrcOrder)
    val praw = Tabular.fromFile(s, ImportCapstone.stageBatchCsv(s, dir),
      CsvConfig())
    val pmapped = ColumnMap(praw, ColumnMapping(renames = Map(
      "Id" -> "p_partkey", "Name" -> "p_name", "Price" -> "p_retailprice",
      "ImageUrl" -> "image_url", "SrcOrder" -> "__src_order")))
      .withColumn("__rk", col("__src_order").try_cast("long"))
    val pconvs = Seq(
      ImportErrors.Conv("p_partkey", _.try_cast("long"), "long"),
      ImportErrors.Conv("p_retailprice", c => Conversions.decimalOf(c), "double"))
    val prodErr = ImportErrors.errors(pmapped, pconvs, "__rk")
      .select(lit("product").as("pass"), col("row_key"),
        col("column").as("field"), col("message"),
        lit("warning").as("severity"))
    // tier prices: keyless after the sku-index recovery
    val traw = Tabular.fromFile(s, RelatedImport.stageTierSheet(s, dir),
      CsvConfig())
    val skuIndex = part.select(
      concat(lit("P-"), pk.cast("string")).as("ProductSku"), pk.as("__sku_pid"))
    val tierErr = msgRow("tierprice", col("SrcOrder").try_cast("long"),
      "ProductId", TierErrMsg, "error")(
      traw.join(skuIndex, Seq("ProductSku"), "left")
        .filter(col("Id").isNull && col("ProductId").isNull &&
          col("__sku_pid").isNull))
    // attribute values: the shared gate derivation (avErrorRows — pva id
    // checked first, one error per row, the reference's branch order)
    val avErr = avErrorRows(s, dir)
      .select(lit("attributevalue").as("pass"), col("row_key"),
        col("field"), col("message"), lit("error").as("severity"))
    // attribute combinations: unresolved through the full key cascade
    val craw = Tabular.fromFile(s, RelatedImport.stageComboSheet(s, dir),
      CsvConfig())
    val ctyped = craw.select(col("Id").try_cast("long").as("combo_id"),
      col("Sku").as("sku"), col("Gtin").as("gtin"), col("Mpn").as("mpn"),
      col("SrcOrder").try_cast("long").as("__src_order"))
    val ccfg = Upsert.Config(
      surrogate = "combo_id",
      keyPriority = Seq("combo_id", "sku", "gtin", "mpn"),
      updateOnly = true,
      incomingOrder = Seq("__src_order"))
    val comboErr = msgRow("attributecombination", col("__src_order"),
      "Id", ComboErrMsg, "error")(
      Upsert.resolve(RelatedImport.comboSnapshot(s, dir), ctyped, ccfg)
        .filter(col(Upsert.IsNewCol)))
    // slug pass (d18, verdict r17 item 3): collision-suffixed slugs
    // surface as info rows. The reference's ValidateSlug resolves
    // collisions silently (AddWarning fires only on exceptions,
    // cs:287-290) — these rows are the engine's observability addition,
    // severity 'info' so they can never be mistaken for reference
    // messages; on this sheet the set is provably empty (fresh NEW-
    // names never collide with word-derived registry slugs).
    val slugErr = msgRow("slug", col("entity"), "SeName",
      "Slug collision resolved by suffixing.", "info")(
      importSlugPass(s, dir).filter(col("collided") === 1))
    prodErr.unionByName(tierErr).unionByName(avErr).unionByName(comboErr)
      .unionByName(slugErr)
      .orderBy(col("pass"), col("row_key"), col("field"))
  }

  private lazy val rollupOracle =
    """SELECT * FROM (
      |  SELECT 'product' AS pass, CAST(p_partkey AS BIGINT) AS row_key,
      |         'p_retailprice' AS field,
      |         'cannot convert to double' AS message,
      |         'warning' AS severity
      |  FROM part WHERE p_partkey % 14 = 0
      |  UNION ALL
      |  SELECT 'tierprice', 3000000000 + p_partkey, 'ProductId',
      |         'The ''ProductId'' field is required for new tier prices. Skipping row.',
      |         'error'
      |  FROM part WHERE p_partkey % 30 = 5
      |  UNION ALL
      |  SELECT 'attributevalue', 2000000000 + p_partkey,
      |         'ProductVariantAttributeId',
      |         'The ''ProductVariantAttributeId'' field is required for new attribute values. Skipping row.',
      |         'error'
      |  FROM part WHERE p_partkey % 20 = 3
      |  UNION ALL
      |  SELECT 'attributevalue', 3000000000 + p_partkey, 'Name',
      |         'The ''Name'' field is required for new attribute values. Skipping row.',
      |         'error'
      |  FROM part WHERE p_partkey % 20 = 7
      |  UNION ALL
      |  SELECT 'attributecombination', 4000000000 + p_partkey, 'Id',
      |         'The ''Id'' or another key field is required. Inserting attribute combinations not supported. Skipping row.',
      |         'error'
      |  FROM part WHERE p_partkey % 8 = 5
      |  UNION ALL
      |  SELECT 'slug', CAST(entity AS BIGINT), 'SeName',
      |         'Slug collision resolved by suffixing.', 'info'
      |  FROM (""".stripMargin + "\n" + slugPassOracle + "\n" +
    """  ) slugs WHERE collided = 1)
      |ORDER BY pass, row_key, field""".stripMargin

  // ------------------------------------------------------------------
  // q294: import completion email
  // ------------------------------------------------------------------

  /** `SendCompletionEmail`'s recipient cascade (`DataImporter.cs:280-293`):
    * the webmaster address, else the company address, else the email
    * account itself — the first non-empty wins (the import cascade
    * differs from the export one, which starts from the profile's
    * completed-email address list). */
  def importCompletionRecipients(webmaster: Option[String],
      company: Option[String], accountEmail: String): Seq[String] =
    webmaster.filter(_.nonEmpty).orElse(company.filter(_.nonEmpty))
      .map(Seq(_)).getOrElse(Seq(accountEmail))

  /** The queue the import completion email lands in — exposed so
    * ImportFinalizeSpec can assert the side effect. */
  val completionQueue = new Deploy.InMemoryEmailQueue

  private val ProfileName = "products-batch"

  /** q294: the completion email as a one-row result frame, tallies from
    * the actual pass outputs. `hostConfigured=false` reproduces the
    * reference's early return (`emailAccount.Host.IsEmpty()` — nothing
    * queued); the result frame is still produced either way, because the
    * tallies exist whether or not mail is configured. */
  def completionEmail(s: SparkSession, dir: String,
      hostConfigured: Boolean = true): DataFrame = {
    val part = Tables.part(s, dir)
    val partIds = part.select(pk)
    // the pass outputs — ChainCache-memoized (d18 task 6): already
    // Ckpt-materialized once per (session, dir), shared with q283/q287/
    // q288/q289 instead of re-running each pass's sheet round trip here
    val cap = ImportCapstone.importCapstone(s, dir)
    val tier = RelatedImport.tierPriceImport(s, dir)
    val av = RelatedImport.attrValueImport(s, dir)
    val combo = RelatedImport.comboImport(s, dir)
    // main-pass row count = the staged sheet's rows (TotalRecords is the
    // segmenter's row total over the MAIN entity file)
    val total = Tabular.fromFile(s, ImportCapstone.stageBatchCsv(s, dir),
      CsvConfig()).agg(count(lit(1)).cast("long").as("total_records"))
    // per-pass insert/update splits: an output row is an insert iff its
    // surrogate is absent from the pre-import snapshot
    val tierSnapIds = RelatedImport.tierSnapshot(part).select(col("tp_id"))
    val avSnapIds = RelatedImport.avSnapshot(part).select(col("av_id"))
    def n(name: String)(f: DataFrame) =
      f.agg(count(lit(1)).cast("long").as(name))
    val pNew = n("p_new")(cap.join(partIds, Seq("p_partkey"), "left_anti"))
    val pMod = n("p_mod")(cap.join(partIds, Seq("p_partkey"), "left_semi"))
    val tNew = n("t_new")(tier.join(tierSnapIds, Seq("tp_id"), "left_anti"))
    val tMod = n("t_mod")(tier.join(tierSnapIds, Seq("tp_id"), "left_semi"))
    val aNew = n("a_new")(av.join(avSnapIds, Seq("av_id"), "left_anti"))
    val aMod = n("a_mod")(av.join(avSnapIds, Seq("av_id"), "left_semi"))
    val cMod = n("c_mod")(combo) // combinations never insert
    // skip tallies ride each pass output as a constant column;
    // coalesce(0): an EMPTY pass output (possible on a tiny custom
    // corpus where a residue class is unpopulated) must tally zero,
    // not null-poison the email row
    val tSkip = tier.agg(coalesce(max(col("n_skipped")), lit(0L))
      .cast("long").as("t_skip"))
    val aSkip = av.agg(coalesce(max(col("n_skipped")), lit(0L))
      .cast("long").as("a_skip"))
    val cSkip = combo.agg(coalesce(max(col("n_skipped")), lit(0L))
      .cast("long").as("c_skip"))
    // q283's error channel is the warning channel (bad cells never abort)
    val warn = cap.agg(coalesce(sum(col("n_errors")), lit(0L))
      .cast("long").as("n_warnings"))
    // LastError = the message of the LAST error actually added
    // (ImportResult.LastError). Errors accrue in pass order tier → av →
    // combo; within the av pass the last message depends on which row
    // errored last — the shared gate derivation (avErrorRows) plus
    // max_by over sheet row order.
    val lastAv = avErrorRows(s, dir)
      .agg(max_by(col("message"), col("row_key")).as("last_av_msg"))
    val assembled = Seq(pNew, pMod, tNew, tMod, aNew, aMod, cMod,
      tSkip, aSkip, cSkip, warn, lastAv)
      .foldLeft(total)((acc, f) => acc.crossJoin(broadcast(f)))
      .select(col("t_skip"), col("a_skip"), col("c_skip"),
        col("last_av_msg"),
        col("total_records"),
        (col("p_new") + col("t_new") + col("a_new")).as("new_records"),
        (col("p_mod") + col("t_mod") + col("a_mod") + col("c_mod"))
          .as("modified_records"),
        (col("t_skip") + col("a_skip") + col("c_skip")).as("skipped_records"),
        // every skip in this chain carries exactly one AddError; combos
        // error last in the reference's pass order (cs:873→964→1047)
        (col("t_skip") + col("a_skip") + col("c_skip")).as("n_errors"),
        col("n_warnings"))
    // the single-row read of the accumulated result — the reference's
    // in-memory ImportResult; bounded by construction (one aggregate row)
    val r = assembled.head()
    val recipients = importCompletionRecipients(
      Some("webmaster@example.com"), Some("info@example.com"),
      "noreply@example.com")
    val subject = s"Import completed: $ProfileName"
    val lastError =
      if (r.getAs[Long]("c_skip") > 0L) ComboErrMsg
      else if (r.getAs[Long]("a_skip") > 0L) r.getAs[String]("last_av_msg")
      else if (r.getAs[Long]("t_skip") > 0L) TierErrMsg
      else null
    val body = Seq(
      s"Import of profile $ProfileName completed.",
      s"Total rows: ${r.getAs[Long]("total_records")} - Skipped: ${r.getAs[Long]("skipped_records")}",
      s"New records: ${r.getAs[Long]("new_records")} - Updated: ${r.getAs[Long]("modified_records")}",
      s"Errors: ${r.getAs[Long]("n_errors")} - Warnings: ${r.getAs[Long]("n_warnings")}") ++
      Option(lastError).map(e => s"Last error: $e")
    if (hostConfigured) {
      recipients.foreach(to => completionQueue.enqueue(Deploy.QueuedEmail(
        from = "noreply@example.com", to = to, subject = subject,
        body = body.mkString("\n"), attachments = Seq.empty)))
    }
    import s.implicits._
    Seq((ProfileName, recipients.head, subject,
      r.getAs[Long]("total_records"), r.getAs[Long]("new_records"),
      r.getAs[Long]("modified_records"), r.getAs[Long]("skipped_records"),
      r.getAs[Long]("n_errors"), r.getAs[Long]("n_warnings"), lastError))
      .toDF("profile_name", "email_to", "email_subject", "total_records",
        "new_records", "modified_records", "skipped_records", "n_errors",
        "n_warnings", "last_error")
  }

  private val emailOracle =
    """WITH tot AS (
      |  SELECT (SELECT COUNT(*) FROM part WHERE p_partkey % 7 = 0)
      |       + (SELECT COUNT(DISTINCT p_name) FROM part WHERE p_partkey % 7 = 3)
      |       + (SELECT COUNT(*) FROM part WHERE p_partkey % 7 = 5) AS n),
      |newr AS (
      |  -- product inserts + tier minted (by ProductId / via sku) + av minted
      |  SELECT (SELECT COUNT(*) FROM part WHERE p_partkey % 7 = 5)
      |       + (SELECT COUNT(*) FROM part WHERE p_partkey % 6 = 4)
      |       + (SELECT COUNT(*) FROM part WHERE p_partkey % 6 = 2)
      |       + (SELECT COUNT(*) FROM part WHERE p_partkey % 4 = 2) AS n),
      |modr AS (
      |  -- product updates (distinct entities of the A/B rows) + tier
      |  -- updates + av updates + combo resolutions
      |  SELECT (SELECT COUNT(*) FROM (
      |            SELECT p_partkey AS e FROM part WHERE p_partkey % 7 = 0
      |            UNION
      |            SELECT (SELECT MIN(p2.p_partkey) FROM part p2
      |                    WHERE p2.p_name = g.p_name)
      |            FROM (SELECT DISTINCT p_name FROM part
      |                  WHERE p_partkey % 7 = 3) g))
      |       + (SELECT COUNT(*) FROM part WHERE p_partkey % 12 = 1)
      |       + (SELECT COUNT(*) FROM part
      |          WHERE p_partkey % 4 = 1 AND p_partkey % 3 > 0)
      |       + (SELECT COUNT(*) FROM part WHERE p_partkey % 8 = 1)
      |       + (SELECT COUNT(*) FROM part WHERE p_partkey % 8 = 2)
      |       + (SELECT COUNT(*) FROM part WHERE p_partkey % 8 = 6)
      |       + (SELECT COUNT(*) FROM part WHERE p_partkey % 24 = 3) AS n),
      |skip AS (
      |  SELECT (SELECT COUNT(*) FROM part WHERE p_partkey % 30 = 5)
      |       + (SELECT COUNT(*) FROM part WHERE p_partkey % 20 = 3)
      |       + (SELECT COUNT(*) FROM part WHERE p_partkey % 20 = 7)
      |       + (SELECT COUNT(*) FROM part WHERE p_partkey % 8 = 5) AS n),
      |warn AS (SELECT COUNT(*) AS n FROM part WHERE p_partkey % 14 = 0),
      |lasterr AS (
      |  -- LastError = the message of the last error added, passes in
      |  -- order tier -> av -> combo; within av the name-gate rows
      |  -- (%20=7, SrcOrder 3e9+k) follow the pva-gate rows (%20=3)
      |  SELECT CASE
      |    WHEN (SELECT COUNT(*) FROM part WHERE p_partkey % 8 = 5) > 0
      |      THEN 'The ''Id'' or another key field is required. Inserting attribute combinations not supported. Skipping row.'
      |    WHEN (SELECT COUNT(*) FROM part WHERE p_partkey % 20 = 7) > 0
      |      THEN 'The ''Name'' field is required for new attribute values. Skipping row.'
      |    WHEN (SELECT COUNT(*) FROM part WHERE p_partkey % 20 = 3) > 0
      |      THEN 'The ''ProductVariantAttributeId'' field is required for new attribute values. Skipping row.'
      |    WHEN (SELECT COUNT(*) FROM part WHERE p_partkey % 30 = 5) > 0
      |      THEN 'The ''ProductId'' field is required for new tier prices. Skipping row.'
      |    END AS m)
      |SELECT 'products-batch' AS profile_name,
      |       'webmaster@example.com' AS email_to,
      |       'Import completed: products-batch' AS email_subject,
      |       CAST((SELECT n FROM tot) AS BIGINT) AS total_records,
      |       CAST((SELECT n FROM newr) AS BIGINT) AS new_records,
      |       CAST((SELECT n FROM modr) AS BIGINT) AS modified_records,
      |       CAST((SELECT n FROM skip) AS BIGINT) AS skipped_records,
      |       CAST((SELECT n FROM skip) AS BIGINT) AS n_errors,
      |       CAST((SELECT n FROM warn) AS BIGINT) AS n_warnings,
      |       (SELECT m FROM lasterr) AS last_error""".stripMargin

  // ------------------------------------------------------------------
  // q297: the slug pass, composed into the import chain
  // ------------------------------------------------------------------

  /** q297: `ProcessSlugsAsync` (`EntityImporterBase.cs:244-300`) run
    * after the product upsert — the composition q73 left out (verdict
    * r17 item 3). Reference gate per batch row: a SeName value, or
    * `IsNew`, or `NameChanged`; gated rows get a default slug from
    * `BuildSlug(seName ?? EntityDisplayName)` plus one localized slug
    * per language with a localized SeName/Name. Slugs validate against
    * the EXISTING slug table (the q73 registry) with collision
    * suffixing.
    *
    * Derivation is by the chain's own outputs, not fixture knowledge:
    * the gate compares the memoized capstone output (post-merge names)
    * against the snapshot — inserts are the anti-join, NameChanged the
    * rows whose merged name differs (provably none on this sheet:
    * `[IGNORE]` keeps the old name and name-resolved rows match by
    * name, so the oracle restates the insert class only). Collision
    * resolution is the q73 two-round discipline over registry ∪
    * candidates, registry rows winning every tie; `collided` marks
    * suffixed rows. The one sequential-reference trade (documented at
    * q73): an entity re-claiming a slug its OWN old registry row holds
    * suffixes instead of reclaiming in place.
    *
    * Scale shape: the registry build is q73's two partitioned windows;
    * the validation adds two more windows partitioned by slug value —
    * never a global window; candidates ride equi-joins. */
  // NOT ChainCache-memoized (unlike the four chain passes): its only
  // other consumer is the q293 rollup, which runs BEFORE q297 in suite
  // order and would leave q297's cold bench time a cache read — and the
  // rollup re-deriving each pass's rows by that pass's own logic is
  // q293's stated contract anyway.
  def importSlugPass(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir)
    val cap = ImportCapstone.importCapstone(s, dir)
    val registry = EtlQueries.uniqueSlugs(s, dir)
    val old = part.select(pk, col("p_name").as("__old_name"))
    val gated = cap.join(old, Seq("p_partkey"), "left")
      .filter(col("__old_name").isNull || col("p_name") =!= col("__old_name"))
    val cand = gated.select(pk.as("entity"), lit("").as("language"),
        Conversions.slugify(col("p_name")).as("cand"))
      .unionByName(gated.filter(col("name_de").isNotNull)
        .select(pk.as("entity"), lit("de").as("language"),
          Conversions.slugify(col("name_de")).as("cand")))
    validateSlugs(registry.select(col("p_partkey").as("entity"), col("slug")),
      cand)
      .orderBy(col("entity"), col("language"))
  }

  /** The two-round slug validation (q73 discipline) over registry ∪
    * candidates: registry rows win every tie and keep their slug;
    * colliding candidates suffix `-rank`, second-round survivors
    * re-suffix with the (unique) entity key. Package-visible so
    * ImportFinalizeSpec can drive it with synthetic colliding frames
    * (the chain fixture provably never collides).
    *
    * BOUNDED-ROUNDS TRADE (ADVICE r18, same as documented at q73): the
    * reference's `ValidateSlug` loops until unique; this helper stops
    * after two deterministic window rounds, so a round-2 re-suffixed
    * slug `cand-n-entity` can still collide with a registry slug that
    * is ALREADY spelled exactly `cand-n-entity`. Unbounded loops don't
    * express as a fixed declarative plan (each round is a full shuffle
    * over the slug column — a data-dependent iteration count at 100 TB
    * is an unbounded job chain); the entity key is unique among
    * candidates, so round 2 is collision-free UNLESS the registry
    * pre-contains the exact suffixed spelling — a fixture-level
    * pathology callers must not feed (ImportFinalizeSpec pins both the
    * resolved case and this documented residual). */
  private[graft] def validateSlugs(registry: DataFrame,
      cand: DataFrame): DataFrame = {
    val all = registry.select(lit(0).as("pri"), col("entity"),
        lit(null).cast("string").as("language"), col("slug").as("cand"))
      .unionByName(cand.select(lit(1).as("pri"), col("entity"),
        col("language"), col("cand")))
    val w1 = Window.partitionBy(col("cand"))
      .orderBy(col("pri"), col("entity"), col("language"))
    val r1 = all.withColumn("rn", row_number().over(w1))
      .withColumn("c2", when(col("rn") === 1, col("cand"))
        .otherwise(concat_ws("-", col("cand"), col("rn") - 1)))
    val w2 = Window.partitionBy(col("c2"))
      .orderBy(col("pri"), col("entity"), col("language"))
    r1.withColumn("rn2", row_number().over(w2))
      .withColumn("slug", when(col("rn2") === 1, col("c2"))
        .otherwise(concat_ws("-", col("c2"), col("entity"))))
      .filter(col("pri") === 1)
      .select(col("entity"), col("language"), col("slug"),
        (col("slug") =!= col("cand")).cast("int").as("collided"))
  }

  /** q297 oracle — also embedded whole in the q293 rollup oracle (the
    * q167 CTE-composition discipline) to restate the slug-collision
    * info rows. */
  private[etl] val slugPassOracle =
    """WITH maxid AS (SELECT MAX(p_partkey) AS m FROM part),
      |rb AS (SELECT p_partkey,
      |  regexp_replace(regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g'),
      |                 '^-+|-+$', '', 'g') AS base_slug
      |  FROM part),
      |rr AS (SELECT p_partkey, base_slug,
      |              ROW_NUMBER() OVER (PARTITION BY base_slug
      |                                 ORDER BY p_partkey) AS rn
      |       FROM rb),
      |rc AS (SELECT p_partkey,
      |              CASE WHEN rn = 1 THEN base_slug
      |                   ELSE base_slug || '-' || (rn - 1) END AS candidate
      |       FROM rr),
      |rc2 AS (SELECT p_partkey, candidate,
      |               ROW_NUMBER() OVER (PARTITION BY candidate
      |                                  ORDER BY p_partkey) AS rn2
      |        FROM rc),
      |reg AS (SELECT p_partkey AS entity,
      |               CASE WHEN rn2 = 1 THEN candidate
      |                    ELSE candidate || '-' || p_partkey END AS slug
      |        FROM rc2),
      |nr AS (SELECT (SELECT m FROM maxid)
      |                + ROW_NUMBER() OVER (ORDER BY 'NEW-' || p_partkey)
      |                AS entity,
      |              'NEW-' || p_partkey AS nm,
      |              'DE-NEW-' || p_partkey AS nmde
      |       FROM part WHERE p_partkey % 7 = 5),
      |cand AS (
      |  SELECT entity, '' AS language,
      |         regexp_replace(regexp_replace(lower(nm), '[^a-z0-9]+', '-', 'g'),
      |                        '^-+|-+$', '', 'g') AS cand
      |  FROM nr
      |  UNION ALL
      |  SELECT entity, 'de',
      |         regexp_replace(regexp_replace(lower(nmde), '[^a-z0-9]+', '-', 'g'),
      |                        '^-+|-+$', '', 'g')
      |  FROM nr),
      |allx AS (SELECT 0 AS pri, entity, CAST(NULL AS VARCHAR) AS language,
      |                slug AS cand
      |         FROM reg
      |         UNION ALL
      |         SELECT 1, entity, language, cand FROM cand),
      |s1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cand
      |                   ORDER BY pri, entity, language) AS rn
      |       FROM allx),
      |s2 AS (SELECT pri, entity, language, cand,
      |              CASE WHEN rn = 1 THEN cand
      |                   ELSE cand || '-' || (rn - 1) END AS cc
      |       FROM s1),
      |s3 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cc
      |                   ORDER BY pri, entity, language) AS rn2
      |       FROM s2)
      |SELECT entity, language,
      |       CASE WHEN rn2 = 1 THEN cc ELSE cc || '-' || entity END AS slug,
      |       CAST(CASE WHEN (CASE WHEN rn2 = 1 THEN cc
      |                            ELSE cc || '-' || entity END) <> cand
      |            THEN 1 ELSE 0 END AS INT) AS collided
      |FROM s3 WHERE pri = 1
      |ORDER BY entity, language""".stripMargin

  // ------------------------------------------------------------------
  // q296: SyncMapping external-key reconciliation
  // ------------------------------------------------------------------

  /** q296: the persisted (SourceKey, EntityName, ContextName) → EntityId
    * map an external-system sync maintains across import runs
    * (`SyncMapping.cs:14-36` — unique on both (EntityId, EntityName,
    * ContextName) and (SourceKey, EntityName, ContextName);
    * `SyncMappingQueryExtensions.ApplyEntityFilter`). The last un-ported
    * DataExchange surface (verdict r17 item 2): a re-import whose rows
    * carry ONLY the external source key — no Id/Sku/Gtin — resolves
    * entity ids through the mapping table; unknown keys mint a new
    * entity AND a new mapping row, so the next run resolves them. The
    * reconcile IS the K5 upsert keyed on source_key with the mapping
    * table as the snapshot (surrogate = entity_id, dense minting above
    * the snapshot max in key order).
    *
    * Fixture: products `pk % 3 = 0` are already mapped to context key
    * `EXT-(pk·7)`; the sheet re-imports `pk % 6 ∈ {0, 1}` by source key
    * alone — the `% 6 = 0` half resolves through the mapping (they are
    * `% 3 = 0`), the `% 6 = 1` half is unknown and mints. Output = the
    * FINAL mapping table: (source_key, entity_id, is_new, synced,
    * price), untouched mappings surviving with synced = 0.
    *
    * Scale shape: one equi-join on source_key (the mapping index is
    * (key, id) — 2 columns through the shuffle), the distributed dense
    * numbering (range shuffle + zipWithIndex, no single-partition
    * window), one broadcast of the 1-row snapshot max. */
  def syncMappingImport(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir)
    val snap = part.filter(pk % 3 === 0)
      .select(pk.as("entity_id"),
        concat(lit("EXT-"), (pk * 7).cast("string")).as("source_key"))
    val raw = Tabular.fromFile(s, stageSyncSheet(s, dir), CsvConfig())
    val typed = ColumnMap(raw, ColumnMapping(renames = Map(
      "SourceKey" -> "source_key", "Price" -> "price",
      "SrcOrder" -> "__src_order")))
      .select(col("source_key"),
        col("price").try_cast("double").as("price"),
        col("__src_order").try_cast("long").as("__src_order"))
    val cfg = Upsert.Config(
      surrogate = "entity_id",
      keyPriority = Seq("source_key"),
      incomingOrder = Seq("__src_order"))
    val finalMap = Upsert.merge(snap, Upsert.resolve(snap, typed, cfg), cfg)
    val mx = snap.agg(max(col("entity_id")).as("__mx"))
    // synced = the sheet carried the key (membership, NOT price
    // non-nullness — a bad Price cell must not unmark a synced row)
    finalMap
      .join(typed.select(col("source_key"), col("price"),
        lit(1).as("__synced")), Seq("source_key"), "left")
      .crossJoin(broadcast(mx))
      .select(col("source_key"), col("entity_id"),
        (col("entity_id") > col("__mx")).cast("int").as("is_new"),
        coalesce(col("__synced"), lit(0)).cast("int").as("synced"),
        col("price"))
      .orderBy(col("entity_id"))
  }

  /** Sheet: source-key-only rows (no Id/Sku/Gtin columns at all). */
  private[etl] def stageSyncSheet(s: SparkSession, dir: String): String =
    SheetStage.once(SheetStage.dirFor(dir, "sync_mapping_import_src")) { out =>
      val part = Tables.part(s, dir)
      val rows = part.filter(pk % 6 === 0 || pk % 6 === 1).select(
        concat(lit("EXT-"), (pk * 7).cast("string")).as("SourceKey"),
        (col("p_retailprice") + 1.5).cast("string").as("Price"),
        pk.cast("string").as("SrcOrder"))
      Providers("csv")(rows, out, None)
    }

  private val syncMappingOracle =
    """WITH snap AS (
      |  SELECT p_partkey AS entity_id,
      |         'EXT-' || CAST(p_partkey * 7 AS VARCHAR) AS source_key
      |  FROM part WHERE p_partkey % 3 = 0),
      |sheet AS (
      |  SELECT 'EXT-' || CAST(p_partkey * 7 AS VARCHAR) AS source_key,
      |         p_retailprice + 1.5 AS price
      |  FROM part WHERE p_partkey % 6 IN (0, 1)),
      |mx AS (SELECT MAX(entity_id) AS m FROM snap),
      |resolved AS (
      |  SELECT sh.source_key, sn.entity_id, sh.price
      |  FROM sheet sh LEFT JOIN snap sn USING (source_key)),
      |minted AS (
      |  SELECT source_key,
      |         (SELECT m FROM mx)
      |           + ROW_NUMBER() OVER (ORDER BY source_key) AS entity_id,
      |         price
      |  FROM resolved WHERE entity_id IS NULL),
      |final AS (
      |  SELECT entity_id, source_key FROM snap
      |  UNION ALL
      |  SELECT entity_id, source_key FROM minted)
      |SELECT f.source_key, f.entity_id,
      |       CAST(CASE WHEN f.entity_id > (SELECT m FROM mx)
      |            THEN 1 ELSE 0 END AS INT) AS is_new,
      |       CAST(CASE WHEN sh.source_key IS NOT NULL
      |            THEN 1 ELSE 0 END AS INT) AS synced,
      |       sh.price
      |FROM final f LEFT JOIN sheet sh ON sh.source_key = f.source_key
      |ORDER BY f.entity_id""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("q292_store_mapping_import", (s, d) => storeMappingImport(s, d),
      Some(storeMappingOracle)),
    Q("q296_sync_mapping_import", (s, d) => syncMappingImport(s, d),
      Some(syncMappingOracle)),
    Q("q297_import_slug_pass", (s, d) => importSlugPass(s, d),
      Some(slugPassOracle)),
    Q("q293_import_error_rollup", (s, d) => errorRollup(s, d),
      Some(rollupOracle)),
    Q("q294_import_completion_email", (s, d) => completionEmail(s, d),
      Some(emailOracle)))
}
