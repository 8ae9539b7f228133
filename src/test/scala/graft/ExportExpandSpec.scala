package graft

import graft.etl.ExportExpand
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Export row expansion semantics (DataExporter.cs:604-658 flattening,
  * DataExporter.DynamicProduct.cs:34-70 combination-as-product). */
class ExportExpandSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def products = Seq(
    (1L, "simple", "S1", 10.0),
    (2L, "grouped", "G2", 20.0),
    (3L, "simple", "S3", 30.0), // ALSO a child of 2 — must not double
    (4L, "grouped", "G4", 40.0) // no children at all
  ).toDF("id", "ptype", "sku", "price")

  private def assoc = Seq(
    (2L, 3L, "simple", "S3", 30.0),  // child identical to its own row
    (2L, 30L, "simple", "S30", 31.0) // child not otherwise exported
  ).toDF("parent_id", "id", "ptype", "sku", "price")

  test("grouped parents replaced by children; segment dedup; childless parents vanish") {
    val flat = ExportExpand.expandGrouped(products, assoc, "id", "ptype")
    val ids = flat.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 3L, 30L)) // 2 and 4 gone, 3 exactly once
  }

  test("combination rows merge overrides; null override inherits; no-combo keeps base") {
    val combos = Seq(
      (1L, 1, "S1-A", Some(11.0)), // overrides sku + price
      (1L, 2, "S1-B", None)        // price inherits
    ).toDF("id", "combo_id", "__ov_sku", "__ov_price")
    val out = ExportExpand.combinationsAsProducts(
      products.filter(col("ptype") === "simple"), combos, "id",
      overrides = Seq("sku", "price"))
    val byUid = out.collect().map(r => r.getAs[String]("unique_id") -> r).toMap
    assert(byUid.keySet == Set("1-1", "1-2", "3"))
    assert(byUid("1-1").getAs[String]("sku") == "S1-A")
    assert(byUid("1-1").getAs[Double]("price") == 11.0)
    assert(byUid("1-2").getAs[String]("sku") == "S1-B")
    assert(byUid("1-2").getAs[Double]("price") == 10.0) // inherited
    assert(byUid("3").getAs[String]("sku") == "S3")     // untouched base
  }

  test("expansion composes inside the export pipeline (flatten then explode)") {
    val flat = ExportExpand.expandGrouped(products, assoc, "id", "ptype")
    val combos = Seq((30L, 1, "S30-A", Some(99.0)))
      .toDF("id", "combo_id", "__ov_sku", "__ov_price")
    val out = ExportExpand.combinationsAsProducts(flat, combos, "id",
      overrides = Seq("sku", "price"))
    assert(out.count() == 3) // 1, 3, 30-1
    assert(out.filter(col("unique_id") === "30-1")
      .head.getAs[Double]("price") == 99.0)
  }
}
