package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Export pipeline (SURVEY §2.9 / §2.2 K1-K4 — `DataExporter.ExportAsync`,
  * DataExporter.cs:138-266; `CsvWriter.cs:36-120`; `ExportProfile`
  * Offset/Limit/BatchSize, ExportProfile.cs:88-126).
  *
  * Re-expressed Spark-first: profile-driven extract = filter Columns +
  * projection; the 100-row segment/file contract becomes
  * `maxRecordsPerFile` (distributed file sizing) rather than a driver
  * loop; format sinks are `DataFrameWriter` formats. Deployment (FTP/HTTP/
  * email, K4) is an out-of-engine post-step in the reference and stays out
  * of the relational core here.
  */
object ExportPipeline {

  final case class Profile(
      /** Composable WHERE predicates (ExportFilter analog). */
      filters: Seq[Column] = Seq.empty,
      /** Projection; empty = all columns (ExportProjection analog). */
      projection: Seq[Column] = Seq.empty,
      offset: Int = 0,
      limit: Option[Int] = None,
      /** Deterministic order for offset/limit semantics. */
      orderBy: Seq[Column] = Seq.empty,
      /** Per-file record cap — the reference's per-segment file contract. */
      recordsPerFile: Option[Int] = None)

  /** Extract step: filter → order → offset/limit → project. */
  def extract(df: DataFrame, p: Profile): DataFrame = {
    var out = p.filters.foldLeft(df)(_ filter _)
    if (p.orderBy.nonEmpty) out = out.orderBy(p.orderBy: _*)
    if (p.offset > 0) out = out.offset(p.offset)
    p.limit.foreach(l => out = out.limit(l))
    if (p.projection.nonEmpty) out = out.select(p.projection: _*)
    out
  }

  /** K1: CSV sink with the reference writer's quoting knobs. */
  def writeCsv(df: DataFrame, path: String, delimiter: String = ";",
      quoteAll: Boolean = false, header: Boolean = true,
      recordsPerFile: Option[Int] = None): Unit = {
    var w = df.write.mode("overwrite")
      .option("sep", delimiter)
      .option("header", header)
      .option("quoteAll", quoteAll)
      .option("escapeQuotes", true)
      // reference CsvWriter escapes quotes by DOUBLING (CsvWriter.cs:36-120)
      .option("escape", "\"")
    recordsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n.toLong))
    w.csv(path)
  }

  /** K2/K3 structured sink: JSON lines (nested structs serialize
    * naturally); the XML provider proper is `writeXml`. */
  def writeJson(df: DataFrame, path: String,
      recordsPerFile: Option[Int] = None): Unit = {
    var w = df.write.mode("overwrite")
    recordsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n.toLong))
    w.json(path)
  }

  /** K2: XML sink (Spark 4 built-in xml source) — the reference's
    * feed-export providers (GMC etc.) emit one element per row under a
    * root collection element; nested structs/arrays become nested
    * elements. Distributed like any file sink: one XML document per
    * partition file, rows split by `maxRecordsPerFile`. */
  def writeXml(df: DataFrame, path: String, rowTag: String = "row",
      rootTag: String = "rows", recordsPerFile: Option[Int] = None): Unit = {
    var w = df.write.mode("overwrite")
      .option("rowTag", rowTag)
      .option("rootTag", rootTag)
      .option("declaration", """version="1.0" encoding="UTF-8"""")
    recordsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n.toLong))
    w.format("xml").save(path)
  }

  /** XML read-back (schema inference or explicit). */
  def readXml(spark: org.apache.spark.sql.SparkSession, path: String,
      rowTag: String = "row"): DataFrame =
    spark.read.option("rowTag", rowTag).format("xml").load(path)

  /** Parquet sink, optionally hash-partitioned by columns (the per-store
    * export loop becomes partitionBy). */
  /** ORC sink — the columnar alternative to parquet for warehouses on
    * ORC-native stacks (Spark-built-in source: predicate pushdown,
    * column pruning, and vectorized reads all apply on read-back). */
  def writeOrc(df: DataFrame, path: String,
      recordsPerFile: Option[Int] = None): Unit = {
    var w = df.write.mode("overwrite")
    recordsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n.toLong))
    w.orc(path)
  }

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Seq.empty,
      recordsPerFile: Option[Int] = None): Unit = {
    var w = df.write.mode("overwrite")
    recordsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n.toLong))
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w.parquet(path)
  }

  /** `ExportProjection` analog (Domain/ExportProjection.cs:18-170) — the
    * DECLARATIVE projection config a profile carries, compiled onto the
    * extracted frame by `applyProjection`:
    *  - `languageId` + `localizedColumns`: per-language value pick with
    *    entity-value fallback (`ctx.GetTranslation`,
    *    DataExporter.DynamicEntity.cs — translation if present, else the
    *    entity's own value; a locale key with no base column appears as a
    *    new nullable column);
    *  - `currency` + `priceColumns`: per-currency price conversion in the
    *    projection (`ctx.ContextCurrency`, DataExporter.cs:332 — prices
    *    multiply by the exchange rate, money-rounded to 2dp, and the
    *    export carries the currency code);
    *  - `descriptionMerging` + critical-character removal: the
    *    `ApplyProductDescription` chain
    *    (DataExporter.DynamicProduct.cs:579-655) — see `mergedDescription`
    *    for the enum's eight cases;
    *  - `brandFallback`: `Projection.Brand`, applied where the brand
    *    column is null/empty. */
  final case class Projection(
      languageId: Option[Int] = None,
      keyGroup: String = "Product",
      /** locale key → target column (overlaid when it exists, created
        * nullable when it doesn't). */
      localizedColumns: Map[String, String] = Map.empty,
      /** (currency code, exchange rate from the store currency). */
      currency: Option[(String, Double)] = None,
      priceColumns: Seq[String] = Seq.empty,
      currencyCodeColumn: String = "currency_code",
      /** ExportDescriptionMerging enum token; "None" emits no column. */
      descriptionMerging: String = "None",
      descriptionColumn: String = "description",
      nameColumn: String = "name",
      shortDescriptionColumn: String = "short_description",
      fullDescriptionColumn: String = "full_description",
      manufacturerColumn: String = "manufacturer",
      removeCriticalCharacters: Boolean = false,
      criticalCharacters: Seq[String] = Seq.empty,
      brandFallback: Option[String] = None,
      brandColumn: String = "brand")

  /** `.Grow(other, " ")`: append when the addition is non-empty, keep
    * the base when it is — null- and empty-safe on both sides. */
  private def grow(a: Column, b: Column): Column = {
    val aEmpty = a.isNull || a === ""
    val bEmpty = b.isNull || b === ""
    when(bEmpty, coalesce(a, lit(""))).otherwise(
      when(aEmpty, b).otherwise(concat(a, lit(" "), b)))
  }

  /** The `ExportDescriptionMerging` switch (ExportEnums.cs:51-61,
    * applied at DataExporter.DynamicProduct.cs:586-632). Note the
    * reference's `ShortDescriptionOrNameIfEmpty` branch actually reads
    * the FULL description first — mirrored faithfully. */
  private def mergedDescription(p: Projection, has: String => Boolean): Column = {
    def c(name: String): Column = if (has(name)) col(name) else lit(null)
    def nonEmpty(x: Column): Column = when(x.isNull || x === "", lit(null)).otherwise(x)
    val (name, short, full, manu) = (c(p.nameColumn), c(p.shortDescriptionColumn),
      c(p.fullDescriptionColumn), c(p.manufacturerColumn))
    p.descriptionMerging match {
      case "None"                        => lit("")
      case "ShortDescriptionOrNameIfEmpty" =>
        coalesce(nonEmpty(full), nonEmpty(short), nonEmpty(name), lit(""))
      case "ShortDescription"            => coalesce(short, lit(""))
      case "Description"                 => coalesce(full, lit(""))
      case "NameAndShortDescription"     => grow(name, short)
      case "NameAndDescription"          => grow(name, full)
      case "ManufacturerAndNameAndShortDescription" => grow(grow(manu, name), short)
      case "ManufacturerAndNameAndDescription"      => grow(grow(manu, name), full)
      case other => throw new IllegalArgumentException(
        s"unknown description merging '$other'")
    }
  }

  /** Compile a `Projection` onto the extracted frame.
    *
    * Scale shape: the localized side is pre-filtered to ONE language +
    * key group + the configured locale keys, pivoted to one row per
    * entity (hash aggregate on the entity id), and broadcast when small —
    * the translation overlay never shuffles the exported frame itself.
    * Everything else is map-side column arithmetic. */
  def applyProjection(df: DataFrame, idColumn: String, p: Projection,
      localized: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    // 1. per-language overlay with entity-value fallback
    var out = (p.languageId, localized) match {
      case (Some(lang), Some(lp)) if p.localizedColumns.nonEmpty =>
        val keys = p.localizedColumns.keys.toSeq
        val slice = lp.filter(col("language_id") === lang &&
          col("locale_key_group") === p.keyGroup &&
          col("locale_key").isin(keys.map(x => x: Any): _*))
        val aggs = keys.map(k =>
          max(when(col("locale_key") === k, col("locale_value")))
            .as(s"__loc_$k"))
        val pivoted = slice.groupBy(col("entity_id").as("__loc_id"))
          .agg(aggs.head, aggs.tail: _*)
        val joined = df.join(broadcast(pivoted),
          df(idColumn) === pivoted("__loc_id"), "left")
        val overlaid = p.localizedColumns.foldLeft(joined) {
          case (acc, (key, target)) =>
            if (df.columns.contains(target))
              acc.withColumn(target, coalesce(col(s"__loc_$key"), acc(target)))
            else acc.withColumn(target, col(s"__loc_$key"))
        }
        overlaid.drop("__loc_id" +: keys.map(k => s"__loc_$k"): _*)
      case _ => df
    }
    // 2. brand fallback (Projection.Brand)
    p.brandFallback.foreach { fb =>
      if (out.columns.contains(p.brandColumn))
        out = out.withColumn(p.brandColumn,
          when(col(p.brandColumn).isNull || col(p.brandColumn) === "", fb)
            .otherwise(col(p.brandColumn)))
    }
    // 3. description merge chain + critical-character removal
    if (p.descriptionMerging != "None") {
      var desc = mergedDescription(p, out.columns.contains)
      if (p.removeCriticalCharacters)
        desc = p.criticalCharacters.foldLeft(desc)((d, ch) =>
          regexp_replace(d, java.util.regex.Pattern.quote(ch), ""))
      out = out.withColumn(p.descriptionColumn, desc)
    }
    // 4. per-currency price conversion: exact decimal product, money-
    // rounded (HALF_UP on positive prices in both engines), double out
    p.currency.foreach { case (code, rate) =>
      p.priceColumns.foreach(pc =>
        out = out.withColumn(pc,
          round(col(pc).cast("decimal(18,2)") *
            lit(rate).cast("decimal(8,4)"), 2).cast("double")))
      out = out.withColumn(p.currencyCodeColumn, lit(code))
    }
    out
  }

  /** Nested-struct projection helper (`DataExporter.DynamicProduct`
    * analog): group child rows as an array-of-structs column keyed by the
    * parent — "related collections as grouped/nested frames" (SURVEY §4). */
  def nestChildren(parent: DataFrame, child: DataFrame, parentKey: String,
      childKey: String, as: String): DataFrame = {
    val nested = child.groupBy(col(childKey))
      .agg(collect_list(struct(child.columns.filterNot(_ == childKey)
        .map(col).toSeq: _*)).as(as))
    parent.join(nested, parent(parentKey) === nested(childKey), "left_outer")
      .drop(childKey)
  }
}
