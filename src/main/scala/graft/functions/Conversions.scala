package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Culture-aware conversion layer (SURVEY §2.7 / FIXTURES.md §1) — the Spark
  * analog of the reference's universal `Convert<T>` used by `ImportRow`
  * (`src/Smartstore/Extensions/ConversionExtensions.cs`, behavior pinned by
  * `DataReaderTests.cs:48-82`). The staging model mirrors
  * `LightweightDataTable`: every CSV column is physically a string; these
  * builders convert on access. All are pure Column expressions (codegen'd,
  * no UDFs), so they stay inside whole-stage codegen at 100 TB.
  */
object Conversions {

  /** In-band markers (`ImportRow.cs:9-10`). */
  val NullToken = "[NULL]"
  val IgnoreToken = "[IGNORE]"

  /** Replace the explicit-null token with SQL null (empty string too —
    * `LightweightDataTable` yields null for missing/empty cells). */
  def nullifyTokens(c: Column): Column =
    when(c.isNull || c === NullToken || length(trim(c)) === 0, lit(null)
      .cast(StringType)).otherwise(c)

  /** Bool tokens: on/1/true/yes → true; off/0/false/no → false; else null
    * (`DataReaderTests.cs:74-76`). */
  def boolToken(c: Column): Column = {
    val t = lower(trim(c))
    when(t.isin("on", "1", "true", "yes"), lit(true))
      .when(t.isin("off", "0", "false", "no"), lit(false))
      .otherwise(lit(null).cast(BooleanType))
  }

  /** OLE Automation date (Excel serial): days since 1899-12-30 →
    * timestamp via (x - 25569) * 86400 seconds from the Unix epoch
    * (`DataReaderTests.cs:79`). Malformed input → null (the reference
    * records a conversion warning, it does not abort — ANSI `cast` would
    * throw, so every staging conversion here uses `try_cast`). */
  def oaDateToTs(c: Column): Column =
    timestamp_seconds((c.try_cast(DoubleType) - 25569d) * 86400d)

  /** Unix epoch seconds → timestamp. */
  def unixToTs(c: Column): Column = timestamp_seconds(c.try_cast(LongType))

  /** Invariant-culture date, `MM/dd/yyyy`; malformed → null. */
  def usDate(c: Column): Column = try_to_timestamp(c, lit("MM/dd/yyyy"))

  /** Culture-aware decimal: accepts `1.234,56` (comma-decimal cultures)
    * when `commaDecimal`, else invariant `1234.56`; malformed → null. */
  def decimalOf(c: Column, commaDecimal: Boolean = false): Column = {
    val normalized =
      if (commaDecimal) regexp_replace(regexp_replace(c, "\\.", ""), ",", ".")
      // invariant culture allows thousands separators ('1,234.56' — .NET
      // NumberStyles.Number includes AllowThousands, leniently placed);
      // try_cast alone would null every grouped-format amount
      else regexp_replace(c, ",", "")
    normalized.try_cast(DoubleType)
  }

  /** List cell `"1,2,3,4"` or `"1;2;3;4"` → array<int>
    * (`DataReaderTests.cs:81`: both separators accepted). */
  def intList(c: Column): Column = {
    // honor the in-band [NULL]/[IGNORE] markers like every scalar
    // conversion — a '[NULL]' cell must become SQL null, not []
    val cc = nullifyTokens(c)
    when(cc.isNull || length(trim(cc)) === 0, lit(null).cast(ArrayType(IntegerType)))
      .otherwise(
        filter(
          transform(split(cc, "[,;]"), s => trim(s).try_cast(IntegerType)),
          x => x.isNotNull))
  }

  /** GUID validation: 36-char canonical form or null. */
  def guid(c: Column): Column =
    when(c.rlike("^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"),
      lower(c)).otherwise(lit(null).cast(StringType))

  /** Int with empty→null; malformed → null. */
  def intOf(c: Column): Column = nullifyTokens(c).try_cast(IntegerType)

  /** SEO slug (SURVEY §2.7 "ID/slug/SEO utilities" —
    * `EntityImporterBase.ProcessSlugsAsync`, EntityImporterBase.cs:244-300):
    * lower-case, non-alphanumeric runs → single dash, trim dashes. Pure
    * codegen'd expressions (no UDF). */
  def slugify(c: Column): Column =
    regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9]+", "-"),
      "^-+|-+$", "")

  /** Merge-time cell semantics (`ImportRow.cs:124-234`, SURVEY §2.8 step 6):
    * `[IGNORE]` keeps the existing value; `[NULL]` forces null; a present
    * incoming value wins; otherwise the default applies only to new rows
    * (existing == null on the snapshot side of the full-outer join). */
  def mergeCell(incoming: Column, existing: Column, default: Column,
      isNewRow: Column): Column =
    when(incoming === IgnoreToken, existing)
      .when(incoming === NullToken, lit(null))
      .when(incoming.isNotNull, incoming)
      .when(isNewRow, default)
      .otherwise(existing)
}
