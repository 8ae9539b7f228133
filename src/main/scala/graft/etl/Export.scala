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
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Seq.empty,
      recordsPerFile: Option[Int] = None): Unit = {
    var w = df.write.mode("overwrite")
    recordsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n.toLong))
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w.parquet(path)
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
