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
    // offset over file order. File order = input order for CSV; realized
    // via a monotonic id per input-file ordering. Only used for small
    // staged imports (the reference caps these at UI-import sizes).
    if (cfg.skip > 0 || cfg.take.isDefined) {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(monotonically_increasing_id())
      df = df.withColumn("__rownum", row_number().over(w))
        .filter(col("__rownum") > cfg.skip)
      cfg.take.foreach(t => df = df.filter(col("__rownum") <= cfg.skip + t))
      df = df.drop("__rownum")
    }
    df
  }

  /** All-string schema for a known header (staging contract). */
  def stringSchema(names: Seq[String]): StructType =
    StructType(names.map(n => StructField(n, StringType, nullable = true)))
}
