package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A CONCRETE feed-format export provider through the K3 registry — the
  * shape of the reference's Google-Merchant-Center provider
  * (`GmcXmlExportProvider.cs:33-380` in the Smartstore.Google
  * .MerchantCenter module): a templated, per-entity XML feed with
  * namespaced `g:` fields, availability/condition mapping, brand and
  * MPN fallbacks, and invariant-formatted "price currency" strings.
  *
  * Spark-first split: the PROJECTION (all the per-entity field mapping —
  * the part of the reference provider that is per-row logic inside its
  * writer loop) compiles to one declarative `select`, so it distributes,
  * codegens, and is oracle-checkable as a frame (q134); the SINK is the
  * ordinary XML writer with the channel/item element shape and the
  * `xmlns:g` namespace on the root. Registered as `feed-xml` — the
  * extension seam `Providers.register` exists for
  * (IExportProvider.SystemName dispatch, "Feeds.GoogleMerchantCenter
  * ProductXml").
  */
object FeedXml {

  /** Provider config (`GmcXmlExportProvider` profile configuration):
    * `availability = None` keeps the "in stock" default; the reference's
    * `__nospec__` sentinel (an explicitly UNSPECIFIED availability that
    * suppresses the default) maps to `Some(Unspecified)`. */
  final case class Config(
      currencyCode: String = "EUR",
      availability: Option[String] = None,
      linkBase: String = "https://shop.example/p/",
      storeName: String = "graft")

  val Unspecified = "__nospec__"

  /** The per-entity field mapping of the reference's writer loop
    * (GmcXmlExportProvider.cs:224-344), as one projection:
    *  - `condition`: the ProductCondition switch — Damaged/Used → used,
    *    Refurbished → refurbished, anything else → new;
    *  - `availability`: out of stock when stock is exhausted, preorder
    *    when the entity says so, else the configured default;
    *  - `price`: invariant "amount code" concat of the 2dp money value;
    *  - `mpn`: the SKU fallback (ExportFeatures.UsesSkuAsMpnFallback);
    *  - `item_group_id`: the grouping key for variant rows.
    *
    * Input contract: id, title, sku, brand, condition, stock, preorder
    * (bool), price, group_id. Missing nullable inputs surface as null
    * feed fields, which the XML writer omits (WriteString's null check).
    */
  def project(df: DataFrame, cfg: Config): DataFrame = {
    val defaultAvailability = cfg.availability match {
      case Some(Unspecified) => lit("")
      case Some(other)       => lit(other)
      case None              => lit("in stock")
    }
    df.select(
      col("id").cast("string").as("id"),
      col("title").as("title"),
      concat(lit(cfg.linkBase), col("id").cast("string")).as("link"),
      col("brand").as("brand"),
      coalesce(col("sku"), col("id").cast("string")).as("mpn"),
      when(col("condition").isin("Damaged", "Used"), "used")
        .when(col("condition") === "Refurbished", "refurbished")
        .otherwise("new").as("condition"),
      when(col("stock") <= 0,
          when(col("preorder"), "preorder").otherwise("out of stock"))
        .otherwise(defaultAvailability).as("availability"),
      concat(col("price").cast("decimal(18,2)").cast("string"),
        lit(" "), lit(cfg.currencyCode)).as("price"),
      col("group_id").as("item_group_id"))
  }

  /** The `g:` namespace prefix of the feed spec: fields the reference
    * writes via `WriteString(writer, name, g-ns)` get the prefix;
    * title/link stay plain (they're RSS-core). */
  private val gFields = Set("id", "brand", "mpn", "condition",
    "availability", "price", "item_group_id")

  val GoogleNs = "http://base.google.com/ns/1.0"

  /** channel/item feed document with the google namespace declared on
    * the root. The generic XML sink cannot emit namespaced element names
    * (its StAX writer rejects ':' in tags), so the feed drives a real
    * XML stream writer per PARTITION — the same writer pattern as the
    * reference provider, but one concurrent document per partition file
    * instead of one driver-side file (genuine per-partition imperative
    * logic; null fields are skipped like `WriteString`'s null check).
    * Each partition's document assembles in memory before writing, so
    * `recordsPerFile` doubles as the document-size bound — set it for
    * feeds whose partitions would not fit an executor's heap. */
  def write(projected: DataFrame, path: String,
      recordsPerFile: Option[Int] = None, cfg: Config = Config()): Unit = {
    val spark = projected.sparkSession
    // the per-file record contract: size partitions to the cap (the
    // reference's segment loop); one count at export time
    val sized = recordsPerFile match {
      case Some(n) if n > 0 =>
        val parts = math.max(1L, (projected.count() + n - 1) / n)
        projected.repartition(math.min(parts, Int.MaxValue.toLong).toInt)
      case _ => projected
    }
    val fields = sized.columns
    val storeName = cfg.storeName
    import org.apache.spark.sql.Encoders
    val docs = sized.rdd.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val sw = new java.io.StringWriter()
        val w = javax.xml.stream.XMLOutputFactory.newInstance()
          .createXMLStreamWriter(sw)
        w.writeStartDocument("UTF-8", "1.0")
        w.writeStartElement("channel")
        w.writeNamespace("g", GoogleNs)
        // the reference's channel header (GmcXmlExportProvider.cs:193-195)
        def plain(name: String, value: String): Unit = {
          w.writeStartElement(name); w.writeCharacters(value); w.writeEndElement()
        }
        plain("title", s"$storeName - Feed for Merchant Center")
        plain("link", "http://base.google.com/base/")
        plain("description", "Information about products")
        rows.foreach { row =>
          w.writeStartElement("item")
          fields.zipWithIndex.foreach { case (f, i) =>
            if (!row.isNullAt(i)) {
              val v = String.valueOf(row.get(i))
              if (gFields.contains(f)) {
                w.writeStartElement("g", f, GoogleNs)
                w.writeCharacters(v)
                w.writeEndElement()
              } else plain(f, v)
            }
          }
          w.writeEndElement()
        }
        w.writeEndElement()
        w.writeEndDocument()
        w.close()
        Iterator(sw.toString)
      }
    }
    spark.createDataset(docs)(Encoders.STRING).write.mode("overwrite").text(path)
  }

  /** Register with the K3 registry under the provider's system name —
    * the `GmcXmlExportProvider.SystemName` dispatch. Rows must already
    * satisfy the `project` input contract. */
  def install(cfg: Config = Config()): Unit =
    Providers.register("feed-xml",
      (df, path, rpf) => write(project(df, cfg), path, rpf, cfg))
}
