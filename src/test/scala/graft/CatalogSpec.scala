package graft

import graft.dsl.{Catalog, QueryStringFactory, Search}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** F7 close-out truth tables: the `available` 3-way inventory disjunction
  * (LinqCatalogSearchService.cs:321-331), the special-price date window
  * (:243-258), and ConvertAvailability's filter DIRECTION under both
  * `IncludeNotAvailable` settings (CatalogSearchQueryFactory.cs:509-529).
  * The fixture is key-derived, so expected values come from a straight
  * Scala re-statement of the reference rules evaluated per key. */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def partLike = (1L to 200L).map(k => (k, s"part $k", 900.0 + k))
    .toDF("p_partkey", "p_name", "p_retailprice")

  // reference-rule oracle, evaluated driver-side per key
  private def expectAvailable(k: Long): Boolean = {
    val method = (k % 3).toInt
    val stock = ((k * 7) % 40 - 5).toInt
    val backorder = if (k % 5 == 0) 1 else 0
    val combos = (0L until k % 4).map(c =>
      (((k + 13 * c) % 7 - 3).toInt, (k + c) % 11 == 0))
    method == 0 ||
      (method == 1 && (stock > 0 || backorder != 0)) ||
      (method == 2 && combos.exists { case (s, oos) => s > 0 || oos })
  }

  private def expectSpecialActive(k: Long): Boolean =
    k % 4 == 0 && (k % 16 == 0 || k % 16 == 4) // null/null window or active window

  test("available column equals the reference's 3-way inventory disjunction " +
      "for every key residue class") {
    val got = Catalog.searchable(partLike)
      .select(col("p_partkey"), col("available"))
      .as[(Long, Boolean)].collect().toMap
    (1L to 200L).foreach { k =>
      assert(got(k) == expectAvailable(k), s"key $k: expected " +
        s"${expectAvailable(k)} (method ${k % 3}, combos ${k % 4})")
    }
    // every arm of the disjunction is exercised in both directions
    val arms = (1L to 200L).groupBy(k => (k % 3, expectAvailable(k)))
    assert(arms.keySet.size == 5, // method 0 is always available: 5 classes
      s"fixture lost arm coverage: ${arms.keySet}")
  }

  test("effective price honors the special price exactly while its date " +
      "window is active (all four window states)") {
    val got = Catalog.searchable(partLike)
      .select(col("p_partkey"), col("effective_price"))
      .as[(Long, Double)].collect().toMap
    (1L to 200L).foreach { k =>
      val expected = if (expectSpecialActive(k)) 900.0 + k - 100.0 else 900.0 + k
      assert(got(k) == expected, s"key $k (cls ${k % 16}): $expected")
    }
    // all four window states present: no-bounds active, bounded active,
    // future start, expired end
    assert((1L to 200L).exists(k => k % 16 == 0) &&
      (1L to 200L).exists(k => k % 16 == 4) &&
      (1L to 200L).exists(k => k % 16 == 8) &&
      (1L to 200L).exists(k => k % 16 == 12))
  }

  test("rating filter semantics: zero-review products never match a " +
      "rating lower bound") {
    val frame = Catalog.searchable(partLike)
    val hits = frame
      .filter(col("approved_total_reviews") > 0 && col("rating") >= 1.0)
      .select(col("p_partkey")).as[Long].collect().toSet
    assert(!hits.exists(_ % 7 == 0), "a zero-review product matched")
    assert(hits.nonEmpty)
  }

  test("ConvertAvailability direction: includeNotAvailable=false filters " +
      "by DEFAULT and the token opts out; =true is the reverse") {
    def cfg(include: Boolean) = QueryStringFactory.Config(
      termFields = Seq("p_name"), idField = "p_partkey",
      facetSpecs = Seq(QueryStringFactory.FacetSpec(
        "available", "a", "available", includeNotAvailable = include)))
    def fires(include: Boolean, params: Map[String, String]): Boolean =
      QueryStringFactory.fromParams(params, cfg(include)).filters.nonEmpty
    assert(fires(include = false, Map.empty), "default-on direction lost")
    assert(fires(include = false, Map("a" -> "0")))
    assert(!fires(include = false, Map("a" -> "1")), "opt-out token ignored")
    assert(!fires(include = true, Map.empty))
    assert(fires(include = true, Map("a" -> "1")), "opt-in token ignored")
    // and the emitted filter actually prunes: unavailable keys drop
    val q = QueryStringFactory.fromParams(Map.empty, cfg(include = false))
    val hits = Search.compileFiltered(Catalog.searchable(partLike), q)
      .select(col("p_partkey")).as[Long].collect().toSet
    assert(hits == (1L to 200L).filter(expectAvailable).toSet)
    // the availability descriptor is selected iff the token is truthy
    val sel = QueryStringFactory.fromParams(Map("a" -> "1"), cfg(true))
      .facets.head.selected
    assert(sel == Seq(true))
    assert(QueryStringFactory.fromParams(Map.empty, cfg(true))
      .facets.head.selected.isEmpty)
  }

  test("MakePriceEven closed form matches the reference walk on every " +
      "grid segment (q286 uses only the 500-1000 segment at gate SFs)") {
    // expected values traced through FacetUtility.cs's loop by hand:
    // 0 steps once from zero; (0,10] lands ON the first threshold; each
    // (L,U] segment walks L -> L+step -> ... to the first point >= p;
    // past the last threshold the walk saturates at MAX_PRICE
    val cases: Seq[(Double, Double)] = Seq(
      0.0 -> 5.0, 3.0 -> 10.0, 10.0 -> 10.0, 17.0 -> 25.0, 25.0 -> 25.0,
      30.0 -> 50.0, 60.0 -> 75.0, 200.0 -> 200.0, 210.0 -> 250.0,
      499.0 -> 500.0, 500.0 -> 500.0, 900.0 -> 900.0, 920.5 -> 1000.0,
      999.9 -> 1000.0, 1000.0 -> 1000.0, 1500.0 -> 1500.0,
      1501.0 -> 1750.0, 4200.0 -> 4500.0, 60000.0 -> 60000.0,
      60001.0 -> 70000.0, 2.2e6 -> 2.5e6, 5.2e7 -> 1.0e9)
    val got = cases.map(_._1).toDF("p")
      .select(col("p"), Catalog.makePriceEven(col("p")).as("e"))
      .as[(Double, Double)].collect().toMap
    cases.foreach { case (p, want) =>
      assert(got(p) == want, s"MakePriceEven($p): got ${got(p)}, want $want")
    }
    // and the SQL twin is generated from the same segment table: spot
    // the formula text carries every threshold
    val sql = Catalog.makePriceEvenSql("x")
    assert(sql.contains("<= 25.0") && sql.contains("/ 15.0"))
    assert(sql.contains("ELSE 1000000000.0"))
  }
}
