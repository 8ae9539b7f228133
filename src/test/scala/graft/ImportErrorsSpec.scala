package graft

import graft.etl.ImportErrors
import graft.functions.Conversions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Import error side-channel tests (SURVEY §2.8 step 8): failed cells are
  * reported (row, column, raw, message) without aborting; markers and
  * empties are not errors. */
class ImportErrorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def staging = Seq(
    ("r1", "42", "on", "10/10/2015"),
    ("r2", "abc", "maybe", "31/31/2015"),
    ("r3", "", "[NULL]", null),
    ("r4", "7", "true", "01/01/2020")
  ).toDF("row_id", "Int", "Bool", "Date")

  private val convs = Seq(
    ImportErrors.Conv("Int", Conversions.intOf, "int"),
    ImportErrors.Conv("Bool", Conversions.boolToken, "bool"),
    ImportErrors.Conv("Date", Conversions.usDate, "date MM/dd/yyyy"))

  test("errors reports each failed cell; markers/empties are not errors") {
    val errs = ImportErrors.errors(staging, convs, "row_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(errs.toSet == Set(
      ("r2", "Int", "abc"),
      ("r2", "Bool", "maybe"),
      ("r2", "Date", "31/31/2015")))
  }

  test("typed view nulls failed cells but keeps rows (permissive)") {
    val t = ImportErrors.typed(staging, convs)
    assert(t.count() == 4)
    val r2 = t.filter(col("row_id") === "r2").head()
    assert(r2.isNullAt(1) && r2.isNullAt(2) && r2.isNullAt(3))
    val r1 = t.filter(col("row_id") === "r1").head()
    assert(r1.getInt(1) == 42 && r1.getBoolean(2))
  }
}
