package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV source with the reference reader's semantics (SURVEY §2.1 S1/S3 —
  * `CsvDataReader.cs:36-62`, `CsvConfiguration.cs`,
  * `LightweightDataTable.FromFile`, `LightweightDataTable.cs:96-151`).
  *
  * Key behavior preserved: the table is read UNTYPED — every column is a
  * string and conversion happens lazily per access via
  * `graft.functions.Conversions` ("store raw, convert on access",
  * mirroring `ImportRow.TryGetDataValue`). Schema inference is explicitly
  * OFF; the header row (or generated `Column0..n` names) defines columns.
  *
  * Spark mapping: `spark.read.csv` with `sep`/`quote`/`escape`/`comment`/
  * `multiLine`/`nullValue`/`mode` options — all handled by the built-in,
  * distributed, codegen'd CSV datasource (multiLine files are not
  * splittable; flagged so callers know the scale trade-off).
  */
final case class CsvConfig(
    delimiter: String = ";",
    quote: String = "\"",
    escape: String = "\"",
    comment: Option[String] = None,
    hasHeader: Boolean = true,
    multiLine: Boolean = false,
    nullValue: String = "",
    trimWhitespace: Boolean = true,
    /** PERMISSIVE | DROPMALFORMED | FAILFAST — the reference's
      * missing-field/parse-error actions. */
    mode: String = "PERMISSIVE",
    /** Default name prefix when no header (`ExcelReader` uses Column0..n). */
    defaultColumnPrefix: String = "Column",
    skip: Int = 0,
    take: Option[Int] = None)

object CsvSource {

  /** Reference preset used by the importer
    * (`CsvConfiguration.ExcelFriendlyConfiguration`, DataImporter.cs:96-98). */
  val excelFriendly: CsvConfig = CsvConfig(delimiter = ";", multiLine = true)

  def read(spark: SparkSession, path: String, cfg: CsvConfig = CsvConfig()): DataFrame = {
    var r = spark.read
      .option("sep", cfg.delimiter)
      .option("quote", cfg.quote)
      .option("escape", cfg.escape)
      .option("header", cfg.hasHeader)
      .option("multiLine", cfg.multiLine)
      .option("nullValue", cfg.nullValue)
      .option("mode", cfg.mode)
      .option("inferSchema", false)
      .option("ignoreLeadingWhiteSpace", cfg.trimWhitespace)
      .option("ignoreTrailingWhiteSpace", cfg.trimWhitespace)
    cfg.comment.foreach(c => r = r.option("comment", c))
    var df = r.csv(path)
    if (!cfg.hasHeader)
      df = df.toDF(df.columns.indices.map(i => s"${cfg.defaultColumnPrefix}$i"): _*)
    // skip/take honoring LightweightDataTable.FromFile(skip, take): a row
    // offset over file order, FILE-PARALLEL (round-15 verdict item 7):
    // rows number per file — a window PARTITIONED by `_metadata.file_path`,
    // ordered by block offset (a split file's blocks may land in different
    // tasks) then the within-task monotonic id — and per-file offsets
    // prefix-sum in PATH order on the driver. The per-file counts cost
    // ONE eager distributed pass over the staging data at build time
    // (only |files| rows reach the driver) — the price of replacing the
    // former GLOBAL single-partition window, which serialized the whole
    // batch through one task on its only pass. Multi-file staging dirs
    // thus get a well-defined path order instead of the former window's
    // scan-packing order; single files (the reference's contract) are
    // unchanged. No single-partition exchange anywhere.
    if (cfg.skip > 0 || cfg.take.isDefined) {
      val withFile = df
        .withColumn("__file", col("_metadata.file_path"))
        .withColumn("__blk", col("_metadata.file_block_start"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__file"))
        .orderBy(col("__blk"), monotonically_increasing_id())
      val counts = withFile.groupBy(col("__file"))
        .agg(count(lit(1)).as("__n"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1)
      var acc = 0L
      val offsets = counts.map { case (f, n) => val o = (f, acc); acc += n; o }
      val offDf = broadcast(
        spark.createDataFrame(offsets.toSeq).toDF("__file", "__off"))
      var out = withFile
        .withColumn("__rn", row_number().over(w))
        .join(offDf, "__file")
        .withColumn("__pos", col("__off") + col("__rn") - 1) // 0-based
        .filter(col("__pos") >= cfg.skip.toLong)
      cfg.take.foreach(t =>
        out = out.filter(col("__pos") < cfg.skip.toLong + t))
      df = out.drop("__file", "__blk", "__rn", "__off", "__pos")
    }
    df
  }

  /** All-string schema for a known header (staging contract). */
  def stringSchema(names: Seq[String]): StructType =
    StructType(names.map(n => StructField(n, StringType, nullable = true)))
}
