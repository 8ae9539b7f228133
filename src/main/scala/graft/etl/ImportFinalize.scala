package graft.etl

import graft.{Q, Tables}
import graft.functions.Conversions
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    val sf = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
    SheetStage.once(s"/tmp/graft_gate/$sf/store_mapping_import_src") { out =>
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
    // their mappings untouched (only the flag is cleared)
    val existing = snap.join(
      flagged.filter(col("has_ids")).select(col("product_id")),
      Seq("product_id"), "left_semi")
    val cls = desired.withColumn("__want", lit(true))
      .join(existing.withColumn("__have", lit(true)),
        Seq("product_id", "store_id"), "full")
    val insCnt = cls.filter(col("__want") && col("__have").isNull)
      .groupBy(col("product_id")).agg(count(lit(1)).as("n_inserted"))
    val delCnt = cls.filter(col("__have") && col("__want").isNull)
      .groupBy(col("product_id")).agg(count(lit(1)).as("n_deleted"))
    val finalMap = desired.unionByName(
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
      |existing AS (
      |  SELECT s.product_id, s.store_id
      |  FROM snap s JOIN sheet sh
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
    // attribute values: the insert field gate (pva id checked first —
    // one error per row, like the reference's branch order)
    val avraw = Tabular.fromFile(s, RelatedImport.stageAvSheet(s, dir),
      CsvConfig())
    val avNew = avraw.filter(col("Id").isNull)
    val avErr = msgRow("attributevalue", col("SrcOrder").try_cast("long"),
      "ProductVariantAttributeId", AvPvaErrMsg, "error")(
      avNew.filter(col("ProductVariantAttributeId").isNull))
      .unionByName(
        msgRow("attributevalue", col("SrcOrder").try_cast("long"),
          "Name", AvNameErrMsg, "error")(
          avNew.filter(col("ProductVariantAttributeId").isNotNull &&
            col("Name").isNull)))
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
    prodErr.unionByName(tierErr).unionByName(avErr).unionByName(comboErr)
      .orderBy(col("pass"), col("row_key"), col("field"))
  }

  private val rollupOracle =
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
      |  FROM part WHERE p_partkey % 8 = 5)
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
    // the pass outputs (each runs its own staged-sheet round trip)
    val cap = graft.Ckpt(ImportCapstone.importCapstone(s, dir))
    val tier = graft.Ckpt(RelatedImport.tierPriceImport(s, dir))
    val av = graft.Ckpt(RelatedImport.attrValueImport(s, dir))
    val combo = graft.Ckpt(RelatedImport.comboImport(s, dir))
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
    val assembled = Seq(pNew, pMod, tNew, tMod, aNew, aMod, cMod,
      tSkip, aSkip, cSkip, warn)
      .foldLeft(total)((acc, f) => acc.crossJoin(broadcast(f)))
      .select(col("total_records"),
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
    val lastError = if (r.getAs[Long]("n_errors") > 0L) ComboErrMsg else null
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
      |warn AS (SELECT COUNT(*) AS n FROM part WHERE p_partkey % 14 = 0)
      |SELECT 'products-batch' AS profile_name,
      |       'webmaster@example.com' AS email_to,
      |       'Import completed: products-batch' AS email_subject,
      |       CAST((SELECT n FROM tot) AS BIGINT) AS total_records,
      |       CAST((SELECT n FROM newr) AS BIGINT) AS new_records,
      |       CAST((SELECT n FROM modr) AS BIGINT) AS modified_records,
      |       CAST((SELECT n FROM skip) AS BIGINT) AS skipped_records,
      |       CAST((SELECT n FROM skip) AS BIGINT) AS n_errors,
      |       CAST((SELECT n FROM warn) AS BIGINT) AS n_warnings,
      |       CASE WHEN (SELECT n FROM skip) > 0
      |            THEN 'The ''Id'' or another key field is required. Inserting attribute combinations not supported. Skipping row.'
      |            END AS last_error""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("q292_store_mapping_import", (s, d) => storeMappingImport(s, d),
      Some(storeMappingOracle)),
    Q("q293_import_error_rollup", (s, d) => errorRollup(s, d),
      Some(rollupOracle)),
    Q("q294_import_completion_email", (s, d) => completionEmail(s, d),
      Some(emailOracle)))
}
