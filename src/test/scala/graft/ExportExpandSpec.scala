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

  // --- round-9: the declarative ExportProjection surface ---------------

  private def catalog = Seq(
    (1L, "Alpha", "", "Long alpha text", "BrandX", 100.0),
    (2L, "Beta", "Beta short", "", "", 250.0),
    (3L, "Gamma", "", "", "BrandZ", 19.99)
  ).toDF("id", "name", "short_description", "full_description", "brand", "price")

  private def lp = Seq(
    (1L, 2, "Product", "Name", "Alpha-DE"),
    (1L, 1, "Product", "Name", "Alpha-WRONG-LANG"), // must not leak
    (2L, 2, "Product", "ShortDescription", "Beta kurz")
  ).toDF("entity_id", "language_id", "locale_key_group", "locale_key", "locale_value")

  test("description merging enum matches the reference switch") {
    import graft.etl.ExportPipeline
    def descOf(merging: String): Map[Long, String] = {
      val out = ExportPipeline.applyProjection(catalog, "id",
        ExportPipeline.Projection(descriptionMerging = merging,
          manufacturerColumn = "brand"))
      out.select("id", "description").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    // the reference's ShortDescriptionOrNameIfEmpty reads FULL first
    assert(descOf("ShortDescriptionOrNameIfEmpty") ==
      Map(1L -> "Long alpha text", 2L -> "Beta short", 3L -> "Gamma"))
    assert(descOf("ShortDescription") == Map(1L -> "", 2L -> "Beta short", 3L -> ""))
    assert(descOf("Description") == Map(1L -> "Long alpha text", 2L -> "", 3L -> ""))
    // Grow skips empty additions (no dangling separators)
    assert(descOf("NameAndShortDescription") ==
      Map(1L -> "Alpha", 2L -> "Beta Beta short", 3L -> "Gamma"))
    assert(descOf("ManufacturerAndNameAndDescription") ==
      Map(1L -> "BrandX Alpha Long alpha text", 2L -> "Beta", 3L -> "BrandZ Gamma"))
    // "None" is the config default: the projection adds NO description
    // column at all (the reference's product-only description step)
    val none = ExportPipeline.applyProjection(catalog, "id",
      ExportPipeline.Projection(descriptionMerging = "None"))
    assert(!none.columns.contains("description"))
    intercept[IllegalArgumentException](descOf("NoSuchMerging"))
  }

  test("translation overlay falls back to entity values; wrong language never leaks") {
    import graft.etl.ExportPipeline
    val out = ExportPipeline.applyProjection(catalog, "id",
      ExportPipeline.Projection(languageId = Some(2),
        localizedColumns = Map("Name" -> "name", "ShortDescription" -> "short_description")),
      localized = Some(lp))
    val names = out.select("id", "name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(names == Map(1L -> "Alpha-DE", 2L -> "Beta", 3L -> "Gamma"))
    val shorts = out.select("id", "short_description").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // id 2's translation OVERLAYS its entity value; 1/3 keep their own
    assert(shorts == Map(1L -> "", 2L -> "Beta kurz", 3L -> ""))
  }

  test("brand fallback and currency conversion") {
    import graft.etl.ExportPipeline
    val out = ExportPipeline.applyProjection(catalog, "id",
      ExportPipeline.Projection(
        brandFallback = Some("Fallback Inc"),
        currency = Some(("EUR", 0.5)), priceColumns = Seq("price")))
    val rows = out.select("id", "brand", "price", "currency_code").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(rows.toSet == Set(
      (1L, "BrandX", 50.0, "EUR"),
      (2L, "Fallback Inc", 125.0, "EUR"),
      (3L, "BrandZ", 10.0, "EUR"))) // 19.99 * 0.5 = 9.995 → HALF_UP 10.00
  }
}
