package graft

import graft.etl.{ColumnMap, ColumnMapping, CsvConfig, CsvSource}
import graft.functions.Conversions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-file ETL read test replicating the reference's `DataReaderTests`
  * semantics (FIXTURES.md §1 / DataReaderTests.cs:22-82): semicolon CSV,
  * quoted multiline cells, umlauts, bool tokens, two date epochs, list
  * cells with both separators, [NULL]/[IGNORE] markers, indexed columns. */
class CsvEtlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val raw = CsvSource.read(spark,
    getClass.getResource("/testdata.csv").getPath,
    CsvSource.excelFriendly)

  test("reads untyped: every column is a string") {
    assert(raw.schema.fields.forall(_.dataType.typeName == "string"))
    assert(raw.count() == 5)
  }

  test("umlauts and quoted multiline cells survive") {
    val byId = raw.collect().map(r => r.getString(0) -> r).toMap
    assert(byId("2").getString(2) == "äöü")
    assert(byId("5").getString(2) == "multi\nline")
    assert(byId("4").getString(3) == "with \"quotes\"")
  }

  test("conversion layer: bool tokens, OADate, unix date, int list, guid") {
    val conv = raw.select(
      Conversions.intOf(col("Id")).as("id"),
      Conversions.boolToken(col("Bool")).as("b"),
      Conversions.oaDateToTs(col("OADate")).as("oa"),
      Conversions.unixToTs(col("UnixDate")).as("unix"),
      Conversions.intOf(col("Int")).as("i"),
      Conversions.decimalOf(col("Double")).as("d"),
      Conversions.guid(col("Guid")).as("g"),
      Conversions.intList(col("IntList")).as("l"))
    val rows = conv.collect().map(r => r.getInt(0) -> r).toMap
    assert(rows(1).getBoolean(1) && rows(2).getBoolean(1) && rows(3).getBoolean(1))
    assert(!rows(4).getBoolean(1) && !rows(5).getBoolean(1))
    // OADate 40248.71645 = 2010-03-11T17:11:41Z (approx)
    assert(rows(1).getTimestamp(2).toInstant.toString.startsWith("2010-03-11"))
    assert(rows(1).getTimestamp(3).toInstant.toString.startsWith("2015-11-20"))
    assert(rows(3).isNullAt(4))               // empty Int → null
    assert(rows(4).getDouble(5) == 9999.765)  // invariant decimal point
    assert(rows(4).isNullAt(6))               // invalid guid → null
    // list cells: comma and semicolon separators both accepted
    assert(rows(1).getSeq[Int](7) == Seq(1, 2, 3, 4))
    assert(rows(2).getSeq[Int](7) == Seq(1, 2, 3, 4))
    assert(rows(5).isNullAt(7))               // empty list cell → null
  }

  test("nullifyTokens maps [NULL] and empties to null") {
    val n = raw.select(Conversions.nullifyTokens(col("Name")).as("n"),
      col("Id")).collect().map(r => r.getString(1) -> r.isNullAt(0)).toMap
    assert(n("4"))   // [NULL] marker... stays for merge-time; nullify maps it
    assert(n("3"))   // empty
    assert(!n("1"))
  }

  test("column map: rename, default, ignore, indexed → map column") {
    val mapped = ColumnMap(raw, ColumnMapping(
      renames = Map("Sku" -> "sku"),
      defaults = Map("Description" -> "(none)"),
      ignored = Set("Guid")))
    assert(mapped.columns.contains("sku") && !mapped.columns.contains("Guid"))
    assert(mapped.columns.contains("name_map") && mapped.columns.contains("attr_map"))
    val r1 = mapped.filter(col("Id") === "1").head()
    assert(r1.getAs[Map[String, String]]("name_map")("de") == "Name eins")
    assert(r1.getAs[Map[String, String]]("attr_map")("Color") == "rot")
    val r3 = mapped.filter(col("Id") === "3").head()
    assert(r3.getAs[String]("Description") == "Description 3")
    val r1d = mapped.filter(col("Id") === "1").head().getAs[String]("Description")
    assert(r1d == "(none)") // empty → null (nullValue="") → default
  }

  test("ColumnMap.parseSourceName") {
    assert(ColumnMap.parseSourceName("Attr[Color]") == ("Attr", Some("Color")))
    assert(ColumnMap.parseSourceName("Name") == ("Name", None))
  }

  test("FileGate fixture is the golden resource, byte for byte") {
    val resource = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        getClass.getResource("/testdata.csv").getPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(graft.etl.FileGate.csvContent == resource,
      "q115's embedded fixture drifted from src/test/resources/testdata.csv")
  }

  test("skip/take honors file order") {
    val df = CsvSource.read(spark, getClass.getResource("/testdata.csv").getPath,
      CsvSource.excelFriendly.copy(skip = 1, take = Some(2)))
    assert(df.select("Id").collect().map(_.getString(0)).toSeq == Seq("2", "3"))
  }

  test("Tabular.fromFile dispatches by extension (S3: " +
      "LightweightDataTable.FromFile) with skip/take on both paths") {
    import graft.etl.Tabular
    val csvPath = getClass.getResource("/testdata.csv").getPath
    // CSV branch: identical to CsvSource.read, window included
    val viaDispatch = Tabular.fromFile(spark, csvPath,
      CsvSource.excelFriendly.copy(skip = 1, take = Some(2)))
    assert(viaDispatch.select("Id").collect().map(_.getString(0)).toSeq ==
      Seq("2", "3"))
    // Excel branch: the golden table as .xlsx through the SAME entry
    // point (case-insensitive extension), same window semantics
    val full = CsvSource.read(spark, csvPath, CsvSource.excelFriendly)
    val header = full.columns.toSeq
    val data = full.collect().toSeq.map(r => (0 until r.length).map(i =>
      if (r.isNullAt(i)) null else r.getString(i)))
    val dir = java.nio.file.Files.createTempDirectory("graft-tabular")
    val xlsx = dir.resolve("Testdata.XLSX").toString
    graft.etl.ExcelSource.writeFixture(xlsx, header +: data)
    val viaXlsx = Tabular.fromFile(spark, xlsx,
      CsvSource.excelFriendly.copy(skip = 1, take = Some(2)))
    assert(viaXlsx.columns.toSeq == header)
    assert(viaXlsx.select("Id").collect().map(_.getString(0)).toSeq ==
      Seq("2", "3"),
      "xlsx dispatch did not honor the skip/take window")
  }

  test("skip/take over a MULTI-FILE staging dir numbers rows per file in " +
      "PATH order (file-parallel positional window, no global row_number)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-multifile")
    def write(name: String, ids: Seq[Int]): Unit =
      java.nio.file.Files.write(dir.resolve(name),
        ("Id\n" + ids.mkString("\n") + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // path order a < b < c; 3 rows each → positions 0-8
    write("a.csv", Seq(1, 2, 3))
    write("b.csv", Seq(4, 5, 6))
    write("c.csv", Seq(7, 8, 9))
    val cfg = CsvConfig(delimiter = ",", skip = 2, take = Some(5))
    val got = CsvSource.read(spark, dir.toString, cfg)
      .select("Id").collect().map(_.getString(0).toInt).toSeq.sorted
    // skip 2 of a.csv, take through b.csv into c.csv's first row
    assert(got == Seq(3, 4, 5, 6, 7), got.toString)
    // and the window crossing only file boundaries: skip a whole file
    val whole = CsvSource.read(spark, dir.toString,
      CsvConfig(delimiter = ",", skip = 3, take = Some(3)))
      .select("Id").collect().map(_.getString(0).toInt).toSeq.sorted
    assert(whole == Seq(4, 5, 6), whole.toString)
  }
}
