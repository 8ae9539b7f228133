package graft

import graft.etl.{CsvSource, ExcelSource}
import org.scalatest.funsuite.AnyFunSuite

/** Excel reader parity with the CSV reader, replicating the reference's
  * `DataReaderTests` contract (DataReaderTests.cs:22-82): the same table
  * read from testdata.csv and from a generated .xlsx must parse
  * IDENTICALLY — same columns, same rows, same cells. Plus the
  * `ExcelReader.cs:23-100` behaviors: headerless Column0..n naming,
  * duplicate-header rejection, missing-cell gaps, and multi-file
  * distributed reads. */
class ExcelEtlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("graft_xlsx").toString

  private lazy val csv = CsvSource.read(spark,
    getClass.getResource("/testdata.csv").getPath, CsvSource.excelFriendly)

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(r =>
      (0 until r.length).map(i => if (r.isNullAt(i)) null else r.getString(i)))

  private lazy val xlsxPath = {
    val p = s"$tmp/testdata.xlsx"
    ExcelSource.writeFixture(p, csv.columns.toSeq +: rowsOf(csv))
    p
  }

  test("xlsx parses identically to the CSV golden fixture (DataReaderTests parity)") {
    val back = ExcelSource.read(spark, xlsxPath)
    assert(back.columns.toSeq == csv.columns.toSeq)
    assert(back.schema.fields.forall(_.dataType.typeName == "string"), "untyped staging")
    val a = rowsOf(csv).sortBy(_.head)
    val b = rowsOf(back).sortBy(_.head)
    assert(b == a)
  }

  test("umlauts, quoted cells, and multiline shared strings survive") {
    val byId = ExcelSource.read(spark, xlsxPath).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(byId("2").getString(2) == "äöü")
    assert(byId("5").getString(2) == "multi\nline")
    assert(byId("4").getString(3) == "with \"quotes\"")
    assert(byId("4").getString(2) == "[NULL]") // markers stay in-band
  }

  test("headerless mode names columns Column0..n") {
    val p = s"$tmp/noheader.xlsx"
    ExcelSource.writeFixture(p, Seq(Seq("a", "1"), Seq("b", "2")))
    val df = ExcelSource.read(spark, p, ExcelSource.ExcelConfig(hasHeaders = false))
    assert(df.columns.toSeq == Seq("Column0", "Column1"))
    assert(df.count() == 2)
  }

  test("duplicate header names are rejected (ExcelReader.Init contract)") {
    val p = s"$tmp/dup.xlsx"
    ExcelSource.writeFixture(p, Seq(Seq("Id", "id"), Seq("1", "2")))
    val e = intercept[IllegalArgumentException] {
      ExcelSource.read(spark, p)
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("missing cells read as null; empty header cells get default names") {
    val p = s"$tmp/gaps.xlsx"
    // row 2 skips column B entirely (no <c> element) — A1-ref gap
    ExcelSource.writeFixture(p, Seq(
      Seq("K", null, "V"), // empty header cell at index 1
      Seq("k1", "mid", "v1"),
      Seq("k2", null, "v2")))
    val df = ExcelSource.read(spark, p)
    assert(df.columns.toSeq == Seq("K", "Column1", "V"))
    val r2 = df.filter(df("K") === "k2").head()
    assert(r2.isNullAt(1) && r2.getString(2) == "v2")
  }

  test("empty input dir fails with a clear message, not a head() crash") {
    val p = java.nio.file.Files.createTempDirectory("graft_xlsx_empty").toString
    val e = intercept[IllegalArgumentException] {
      ExcelSource.read(spark, p)
    }
    assert(e.getMessage.contains("no .xlsx files"))
  }

  test("hand-built workbook: inlineStr rich-text runs concatenate; sheet2 < sheet10") {
    // built by hand (not via writeFixture) to exercise reader paths the
    // fixture writer never produces: inline strings with multiple <t>
    // runs, and sheet files whose numeric order differs from string order
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_raw").toString
    val p = s"$dir/raw.xlsx"
    val sheet2 =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>K</t></is></c></row>
        |<row r="2"><c r="A2" t="inlineStr"><is><r><t>Hello </t></r><r><t>World</t></r></is></c></row>
        |</sheetData></worksheet>""".stripMargin
    val sheet10 =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>WRONG</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin
    val zout = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(p)))
    def put(name: String, content: String): Unit = {
      zout.putNextEntry(new java.util.zip.ZipEntry(name))
      zout.write(content.getBytes("UTF-8")); zout.closeEntry()
    }
    // sheet10 FIRST in the archive and lexicographically before sheet2
    put("xl/worksheets/sheet10.xml", sheet10)
    put("xl/worksheets/sheet2.xml", sheet2)
    zout.close()
    val df = ExcelSource.read(spark, p)
    assert(df.columns.toSeq == Seq("K"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("Hello World"))
  }

  test("non-xlsx files in the directory are ignored (pathGlobFilter)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_mixed").toString
    ExcelSource.writeFixture(s"$dir/data.xlsx", Seq(Seq("Id"), Seq("1")))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/readme.txt"), "not a workbook")
    val df = ExcelSource.read(spark, dir)
    assert(df.count() == 1 && df.columns.toSeq == Seq("Id"))
  }

  test("a directory of workbooks reads distributed, rows unioned") {
    val dir = s"$tmp/many"
    ExcelSource.writeFixture(s"$dir/part1.xlsx",
      Seq(Seq("Id", "N"), Seq("1", "one")))
    ExcelSource.writeFixture(s"$dir/part2.xlsx",
      Seq(Seq("Id", "N"), Seq("2", "two"), Seq("3", "three")))
    val df = ExcelSource.read(spark, dir)
    assert(df.count() == 3)
    assert(df.rdd.getNumPartitions >= 1)
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("1", "2", "3"))
  }
}
