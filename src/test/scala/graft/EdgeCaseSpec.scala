package graft

import graft.dsl.Search
import graft.etl.{CsvConfig, CsvSource}
import graft.operators.RuleOps
import graft.rules.{FilterExpr, FilterParser}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases across the parser, CSV modes, and search boundaries. */
class EdgeCaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parser: quoted wildcard stays Contains (no LIKE flip inside quotes)") {
    // the reference flips ops only for wildcard TERMS; a quoted value is
    // literal text
    assert(FilterParser.parse("\"a*b\"", isString = true) ==
      FilterExpr.Pred("value", RuleOps.Contains, "a*b"))
    assert(FilterParser.parse("a*b", isString = true) ==
      FilterExpr.Pred("value", RuleOps.Like, "a*b"))
  }

  test("parser: double negation and nested groups") {
    val n = FilterParser.parse("!(!(>5))")
    val df = (1 to 10).toDF("v")
    val got = df.filter(FilterExpr.compile(n, _ => col("v")))
      .as[Int].collect().sorted.toSeq
    assert(got == (6 to 10))
  }

  test("parser: empty/garbage input raises, never mis-parses") {
    intercept[FilterParser.ParseError](FilterParser.parse(""))
    intercept[FilterParser.ParseError](FilterParser.parse(">= and <="))
  }

  test("CSV DROPMALFORMED drops short rows, PERMISSIVE keeps them") {
    val p = java.nio.file.Files.createTempFile("graft-bad", ".csv")
    java.nio.file.Files.writeString(p, "A;B;C\n1;x;y\n2;only-two\n3;a;b\n")
    val strict = CsvSource.read(spark, p.toString,
      CsvConfig(mode = "DROPMALFORMED", multiLine = true))
    // multiLine=false keeps the per-file parallel path; DROPMALFORMED
    // applies either way
    assert(strict.count() == 2)
    val loose = CsvSource.read(spark, p.toString, CsvConfig())
    assert(loose.count() == 3)
    val r2 = loose.filter(col("A") === "2").head()
    assert(r2.isNullAt(2)) // missing trailing field → null (MissingFieldAction)
  }

  test("search: empty result set pages to empty, facets empty, total 0") {
    val df = Seq((1L, "x")).toDF("id", "name")
    val q = Search.Query(term = Some("zzz"), termFields = Seq("name"),
      facets = Seq(Search.Facet("name")))
    val r = Search.run(df, q)
    assert(r.totalHits == 0 && r.pageIndex == 0)
    assert(r.hits.isEmpty)
    assert(r.facets("name").isEmpty)
  }

  test("rule ops: In with empty list matches nothing; AllIn with empty matches all") {
    val df = Seq((1, Seq(1, 2)), (2, Seq.empty[Int])).toDF("id", "xs")
    assert(df.filter(RuleOps(RuleOps.In, col("id"), Seq.empty[Any])).count() == 0)
    assert(df.filter(RuleOps(RuleOps.AllIn, col("xs"), Seq.empty[Any])).count() == 2)
  }

  test("chunking: null and empty texts produce no chunks; short docs one chunk") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "one two three"), (2L, ""), (4L, "   "))
      .toDF("doc_id", "text")
      .union(Seq((3L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    df.createOrReplaceTempView("edge_docs")
    val toks = graft.text.TextFunctions.tokens(col("text"))
    val chunks = df
      .withColumn("toks", toks)
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        posexplode(sequence(lit(0), size(col("toks")) - 1, lit(48))))
    assert(chunks.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("cmsMergedCount: no sketches (empty frame / null cells) means never seen = 0") {
    import org.apache.spark.sql.functions._
    val empty = Seq.empty[Array[Byte]].toDF("cms")
    assert(graft.operators.Scale.cmsMergedCount(empty, 42L) == 0L)
    val nulls = Seq((1, null.asInstanceOf[Array[Byte]])).toDF("k", "cms")
    assert(graft.operators.Scale.cmsMergedCount(nulls, 42L) == 0L)
  }

  test("incrementalRollup on an empty/all-null-ts events table returns empty, typed") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_ev").toString
    Tables.events(spark, TestSpark.sfDir).filter(lit(false))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.streaming.EventQueries.incrementalRollup(spark, dir)
    assert(out.count() == 0)
    assert(out.columns.toSeq ==
      Seq("event_type", "cnt", "total_value", "avg_value"))
  }

  test("stratified sampling is deterministic and respects per-stratum rates") {
    val a = graft.text.TextQueries.stratifiedSample(spark, TestSpark.sfDir).collect()
    val b = graft.text.TextQueries.stratifiedSample(spark, TestSpark.sfDir).collect()
    assert(a.toSeq == b.toSeq) // same rows, same order, run to run
    val byLang = a.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val totals = Tables.documents(spark, TestSpark.sfDir)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'de' keeps everything (threshold 65536 = full hash range)
    assert(byLang.getOrElse("de", 0) == totals.getOrElse("de", 0L))
    // 'en' keeps roughly half (32768/65536); tolerance for 500-doc corpus
    val enRate = byLang.getOrElse("en", 0).toDouble / totals.getOrElse("en", 1L)
    assert(enRate > 0.3 && enRate < 0.7, s"en keep rate $enRate")
  }
}
