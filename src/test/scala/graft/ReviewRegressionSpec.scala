package graft

import graft.etl.{EtlQueries, Upsert}
import graft.operators.RuleOps
import graft.rules.{FilterParser, RuleSets}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regressions for the round-1-module review findings: each test fails on
  * the pre-fix behavior. */
class ReviewRegressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("wildcard LIKE matches values containing '/' and '\\'") {
    val df = Seq("a/b", "a//b", "c\\d", "plain").toDF("v")
    val got = df.filter(RuleOps(RuleOps.Like, col("v"), "a/*"))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("a/b", "a//b")) // '/' must match literally
    val bs = df.filter(RuleOps(RuleOps.Like, col("v"), "c\\*"))
      .collect().map(_.getString(0)).toSet
    assert(bs == Set("c\\d")) // '\' must not act as an accidental escape
  }

  test("negation allows whitespace between '!' and '('") {
    val df = Seq((1, 10.0), (2, 99.0)).toDF("id", "price")
    val compiled = graft.rules.FilterExpr.compile(
      FilterParser.parse("! (>50)", member = "price"), m => col(m))
    assert(df.filter(compiled).collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("duplicate NEW business keys collapse to one insert, last wins") {
    val snap = Seq((1L, "A", 10.0)).toDF("id", "sku", "v")
    val inc = Seq(
      (null.asInstanceOf[java.lang.Long], "NEW1", 100.0, 0),
      (null.asInstanceOf[java.lang.Long], "NEW1", 200.0, 1))
      .toDF("id", "sku", "v", "__ord")
    val out = Upsert.upsert(snap, inc, Upsert.Config(
      surrogate = "id", keyPriority = Seq("id", "sku"),
      incomingOrder = Seq("__ord")))
    val newRows = out.filter(col("sku") === "NEW1").collect()
    assert(newRows.length == 1) // one entity for one key
    assert(newRows.head.getDouble(newRows.head.fieldIndex("v")) == 200.0)
  }

  test("rule datetime accepts date-only values") {
    val c = RuleSets.Rule("created", ">=", "2024-05-01", "datetime")
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-04-30 23:59:59")),
      (2L, java.sql.Timestamp.valueOf("2024-05-01 00:00:00")))
      .toDF("id", "created")
    val got = df.filter(RuleSets.compile(RuleSets.RuleSet(rules = Seq(c)), m => col(m)))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L))
  }

  test("malformed int-list cells reach the error channel") {
    import graft.etl.ImportErrors
    val staging = Seq(("r1", "1,2,3"), ("r2", "1,abc,3"), ("r3", "xyz"))
      .toDF("Key", "IntList")
    val convs = Seq(ImportErrors.Conv(
      "IntList", graft.functions.Conversions.intList, "array<int>"))
    val errs = ImportErrors.errors(staging, convs, "Key")
      .collect().map(_.getString(0)).toSet
    assert(errs == Set("r2", "r3")) // element loss is a failure, clean rows are not
  }

  test("indexed columns differing only in base case fold into ONE map") {
    import graft.etl.ColumnMap
    val df = Seq(("x", "red", "L")).toDF("k", "Attr[Color]", "ATTR[Size]")
    val out = ColumnMap.apply(df, graft.etl.ColumnMapping())
    assert(out.columns.count(_ == "attr_map") == 1)
    val m = out.select(col("attr_map")).head().getMap[String, String](0)
    assert(m == Map("Color" -> "red", "Size" -> "L")) // no silent entry loss
  }

  test("unique slugs survive natural-name collisions with generated suffixes") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-slugs").toString
    Seq((1L, "steel wool"), (2L, "steel wool"), (3L, "steel wool 1"))
      .toDF("p_partkey", "p_name").write.mode("overwrite")
      .parquet(s"$tmp/part.parquet")
    val slugs = EtlQueries.uniqueSlugs(spark, tmp)
      .collect().map(_.getString(1))
    assert(slugs.distinct.length == slugs.length, slugs.mkString(","))
  }

  test("negative or zero page size from the URL is clamped, not crashing") {
    import graft.dsl.QueryStringFactory
    val cfg = QueryStringFactory.Config(termFields = Seq("name"))
    val q = QueryStringFactory.fromParams(Map("s" -> "-5"), cfg)
    assert(q.pageSize >= 1)
  }
}
