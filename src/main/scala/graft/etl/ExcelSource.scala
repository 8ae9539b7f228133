package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import scala.collection.mutable.ArrayBuffer

/** Excel (.xlsx) reader with the reference reader's semantics (SURVEY
  * §2.1 S2 — `ExcelReader.cs:23-100`): first worksheet, optional header
  * row (`hasHeaders`), empty/missing header cells named
  * `Column0..n` (`DefaultColumnName`), duplicate header names rejected,
  * and UNTYPED staging — every cell lands as a string and conversion
  * happens lazily per access via `graft.functions.Conversions`, exactly
  * like `CsvSource` ("store raw, convert on access"). The golden-file
  * contract is `DataReaderTests.cs:22-82`: the same table read from CSV
  * and from .xlsx must parse identically (ExcelEtlSpec + q118).
  *
  * xlsx is a zip of sheet XML, so no binary-format library is needed:
  * `java.util.zip` + the JDK's StAX pull parser (DTD/external entities
  * disabled). Scale design: files load through Spark's distributed
  * `binaryFile` source and each file parses inside `flatMap` on the
  * executors — a directory of workbook files parses with per-FILE
  * parallelism (one xlsx is not splittable — like a multiLine CSV or a
  * gzip part file, the format forces file granularity; the reference
  * reads a single UI-upload stream on one thread). Header/width
  * inference reads ONE file on the driver, mirroring every Spark file
  * source's schema-inference pass. */
object ExcelSource {

  final case class ExcelConfig(
      hasHeaders: Boolean = true,
      /** Name prefix for missing header cells (`ExcelReader` ctor default). */
      defaultColumnPrefix: String = "Column")

  /** Read all .xlsx files under `path` (file or directory) as one
    * all-string DataFrame. Schema (names and width) comes from the
    * FIRST file by path — the same first-file-inference contract as the
    * CSV datasource's header pass; later files' extra trailing columns
    * are dropped and missing ones read as null, exactly like PERMISSIVE
    * CSV against an inferred schema. */
  def read(spark: SparkSession, path: String,
      cfg: ExcelConfig = ExcelConfig()): DataFrame = {
    val bin = spark.read.format("binaryFile")
      // case-insensitive: Windows producers routinely emit .XLSX
      .option("pathGlobFilter", "*.[xX][lL][sS][xX]")
      .load(path)
      .select(col("path"), col("content"))
    // schema pass: first file by path (deterministic), driver-side
    val first = bin.orderBy(col("path")).select(col("content")).take(1)
    if (first.isEmpty)
      throw new IllegalArgumentException(s"no .xlsx files found under $path")
    val firstRows = parseWorkbook(first(0).getAs[Array[Byte]](0))
    val width = if (firstRows.isEmpty) 0 else firstRows.map(_.length).max
    val names: Seq[String] =
      if (cfg.hasHeaders) {
        val header = firstRows.headOption.getOrElse(Array.empty[String])
        (0 until width).map { i =>
          val h = if (i < header.length) header(i) else null
          if (h == null || h.trim.isEmpty) s"${cfg.defaultColumnPrefix}$i" else h
        }
      } else (0 until width).map(i => s"${cfg.defaultColumnPrefix}$i")
    // `ExcelReader.Init`: duplicate header names are a hard error
    require(names.map(_.toLowerCase).distinct.size == names.size,
      "The first row of the Excel table must not contain duplicate column names.")
    val dropHeader = cfg.hasHeaders
    val w = width
    val rows = bin.select(col("content")).rdd.flatMap { r =>
      val parsed = parseWorkbook(r.getAs[Array[Byte]](0))
      val data = if (dropHeader) parsed.drop(1) else parsed
      data.map { cells =>
        Row.fromSeq((0 until w).map(i => if (i < cells.length) cells(i) else null))
      }
    }
    spark.createDataFrame(rows, CsvSource.stringSchema(names))
  }

  /** Parse one workbook's bytes: rows of the FIRST worksheet, each a
    * nullable string array (missing cells null). */
  private[etl] def parseWorkbook(bytes: Array[Byte]): Vector[Array[String]] = {
    // one sequential pass over the zip: stash shared strings + first sheet
    var shared: Array[String] = Array.empty
    var sheet: Array[Byte] = null
    var sheetName: String = null
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val n = e.getName
        if (n == "xl/sharedStrings.xml") shared = parseSharedStrings(zin.readAllBytes())
        else if (n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml") &&
            (sheetName == null || sheetBefore(n, sheetName))) {
          sheet = zin.readAllBytes(); sheetName = n
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    if (sheet == null)
      throw new IllegalArgumentException("no worksheet found in xlsx stream")
    parseSheet(sheet, shared)
  }

  /** First-worksheet selection: sheet indices compare NUMERICALLY
    * ("sheet2.xml" before "sheet10.xml" — lexicographic order would pick
    * sheet10), non-numeric names after all numeric ones, by string. The
    * key is a TOTAL order (numeric magnitude compares as digit-length
    * then digits — no integer parsing, so an absurd 20-digit index can
    * not crash the read). Sheet files are conventionally named
    * sheetN.xml in index order; full workbook.xml.rels resolution is the
    * escape hatch if a producer violates that. */
  private def sheetBefore(a: String, b: String): Boolean =
    Ordering[(Int, Int, String)].lt(sheetKey(a), sheetKey(b))

  private def sheetKey(n: String): (Int, Int, String) =
    "sheet(\\d+)\\.xml$".r.findFirstMatchIn(n) match {
      case Some(m) => (0, m.group(1).length, m.group(1))
      case None    => (1, 0, n)
    }

  private def xmlReader(bytes: Array[Byte]): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_COALESCING, true)
    f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
  }

  /** sharedStrings.xml: one entry per <si>, concatenating its <t> runs
    * (plain and rich-text cells). */
  private def parseSharedStrings(bytes: Array[Byte]): Array[String] = {
    import javax.xml.stream.XMLStreamConstants._
    val out = ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inT = false
    var phonetic = 0 // <rPh>/<phoneticPr> furigana runs are NOT cell text
    val r = xmlReader(bytes)
    try {
      while (r.hasNext) {
        r.next() match {
          case START_ELEMENT =>
            r.getLocalName match {
              case "si" => sb.clear()
              case "rPh" | "phoneticPr" => phonetic += 1
              case "t"  => inT = true
              case _    => ()
            }
          case CHARACTERS | CDATA if inT && phonetic == 0 => sb.append(r.getText)
          case END_ELEMENT =>
            r.getLocalName match {
              case "t"  => inT = false
              case "rPh" | "phoneticPr" => phonetic -= 1
              case "si" => out += sb.toString
              case _    => ()
            }
          case _ => ()
        }
      }
    } finally r.close()
    out.toArray
  }

  /** Worksheet XML → rows of nullable strings. Cell types honored:
    * t="s" shared string, t="inlineStr" inline text, t="b" boolean
    * ("true"/"false" tokens — `Conversions.boolToken` accepts them),
    * t="str"/numeric default → the <v> text verbatim (a numeric cell's
    * stored lexical form round-trips untouched, which is what makes
    * CSV/xlsx parity exact). Cell position comes from the A1-style `r`
    * attribute (gaps → nulls); cells without `r` go to the next slot. */
  private def parseSheet(bytes: Array[Byte],
      shared: Array[String]): Vector[Array[String]] = {
    import javax.xml.stream.XMLStreamConstants._
    val rows = Vector.newBuilder[Array[String]]
    val cells = ArrayBuffer.empty[(Int, String)]
    val sb = new StringBuilder
    var cellIdx = -1
    var nextIdx = 0
    var cellType = ""
    var inText = false
    var phonetic = 0 // <rPh>/<phoneticPr> furigana runs are NOT cell text
    val r = xmlReader(bytes)
    try {
      while (r.hasNext) {
        r.next() match {
          case START_ELEMENT =>
            r.getLocalName match {
              case "row" =>
                cells.clear(); nextIdx = 0
              case "c" =>
                val ref = r.getAttributeValue(null, "r")
                // A malformed r="12" (no column letters) yields -1; fall
                // back to sequential position instead of crashing the
                // whole read with an opaque AIOOBE in the executor flatMap.
                cellIdx = if (ref == null) nextIdx else {
                  val byRef = colIndexOf(ref)
                  if (byRef < 0) nextIdx else byRef
                }
                nextIdx = cellIdx + 1
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                sb.clear(); inText = false; phonetic = 0
              case "rPh" | "phoneticPr" => phonetic += 1
              // no sb.clear() here: an inlineStr cell may carry several
              // rich-text <t> runs that must CONCATENATE (clearing per run
              // kept only the last one; the buffer resets per cell above)
              case "v" | "t" => inText = true
              case _ => ()
            }
          case CHARACTERS | CDATA if inText && phonetic == 0 => sb.append(r.getText)
          case END_ELEMENT =>
            r.getLocalName match {
              case "v" | "t" => inText = false
              case "rPh" | "phoneticPr" => phonetic -= 1
              case "c" =>
                val raw = sb.toString
                val value = cellType match {
                  case "s" => shared(raw.trim.toInt)
                  case "b" => if (raw.trim == "1") "true" else "false"
                  case _   => raw // "", "str", "inlineStr", "n": verbatim
                }
                if (value.nonEmpty || cellType == "inlineStr")
                  cells += cellIdx -> value
              case "row" =>
                val width = if (cells.isEmpty) 0 else cells.map(_._1).max + 1
                val arr = new Array[String](width)
                cells.foreach { case (i, v) => arr(i) = v }
                rows += arr
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally r.close()
    rows.result()
  }

  /** "AB12" → 0-based column index of "AB". */
  private def colIndexOf(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  // ---------------------------------------------------------------------
  // Minimal xlsx WRITER — fixture/test seam only. The reference has no
  // Excel writer (exports are CSV/XML feeds); this exists so specs and
  // the q118 gate can generate workbooks offline that exercise both
  // shared-string and numeric cell paths.
  // ---------------------------------------------------------------------

  private val NumericRe = "^-?\\d+(\\.\\d+)?$".r

  /** Write `rows` (first row = header when read with hasHeaders=true) as
    * a single-sheet workbook. Numeric-looking cells become numeric cells
    * (<v> holds the lexical form verbatim), everything else a shared
    * string; null/empty cells are omitted. */
  def writeFixture(path: String, rows: Seq[Seq[String]]): Unit = {
    def esc(s: String): String =
      s.flatMap {
        case '&' => "&amp;"
        case '<' => "&lt;"
        case '>' => "&gt;"
        // XML 1.0 forbids most C0 controls even escaped — emitting them
        // raw would write a workbook no parser (ours included) can read;
        // U+FFFD marks the spot instead of corrupting the file
        case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => "�"
        case c => c.toString
      }
    val sharedIdx = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sharedOf(s: String): Int =
      sharedIdx.getOrElseUpdate(s, sharedIdx.size)
    def colRef(i: Int): String = {
      var n = i + 1
      val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    val sheetRows = rows.zipWithIndex.map { case (cells, ri) =>
      val cs = cells.zipWithIndex.collect {
        case (v, ci) if v != null && v.nonEmpty =>
          val ref = s"${colRef(ci)}${ri + 1}"
          if (NumericRe.matches(v)) s"""<c r="$ref"><v>$v</v></c>"""
          else s"""<c r="$ref" t="s"><v>${sharedOf(v)}</v></c>"""
      }
      s"""<row r="${ri + 1}">${cs.mkString}</row>"""
    }
    val sheetXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>${sheetRows.mkString("\n")}</sheetData></worksheet>""".stripMargin
    val sstXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sharedIdx.size}" uniqueCount="${sharedIdx.size}">
         |${sharedIdx.keys.map(s => s"""<si><t xml:space="preserve">${esc(s)}</t></si>""").mkString("\n")}
         |</sst>""".stripMargin
    val workbookXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin
    val workbookRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
        |</Relationships>""".stripMargin
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
        |</Types>""".stripMargin
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    val zout = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(p))
    try {
      def put(name: String, content: String): Unit = {
        zout.putNextEntry(new java.util.zip.ZipEntry(name))
        zout.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        zout.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbookXml)
      put("xl/_rels/workbook.xml.rels", workbookRels)
      // sheet BEFORE sharedStrings in the archive on purpose: readers must
      // not depend on zip entry order (parseWorkbook buffers both)
      put("xl/worksheets/sheet1.xml", sheetXml)
      put("xl/sharedStrings.xml", sstXml)
    } finally zout.close()
  }
}
