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

  test("boilerplate: an all-boiler doc keeps nothing and hashes empty; " +
      "an all-unique corpus flags nothing") {
    import graft.text.TextQueries
    val allBoiler = Seq(
      (1L, "x y z"), (2L, "x y z"), (3L, "x y z"),
      (4L, "p q r s t u")).toDF("doc_id", "text")
    val out = TextQueries.boilerplateOf(allBoiler, w = 3, minDf = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    // docs 1-3: the one segment is corpus-boiler → nothing kept
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id) == ((1, 1, 0, emptyMd5)), out(id).toString)
    }
    // doc 4: both segments unique → everything kept
    assert(out(4L)._2 == 0 && out(4L)._3 == 6)
    val unique = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    val u = TextQueries.boilerplateOf(unique, w = 3, minDf = 3).collect()
    assert(u.forall(_.getInt(2) == 0)) // no boiler anywhere
  }

  test("pqTopK survives a corpus smaller than the codebook size") {
    val tiny = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = graft.similarity.Ann.pqTopK(
        tiny, tiny.filter(col("vec_id") === 0L), "vec_id", "embedding",
        dim = 4, m = 2, k = 4, iters = 2, topk = 5)
      .collect()
    assert(out.nonEmpty && out.forall(_.getLong(0) == 0L))
    assert(out.map(_.getLong(1)).toSet.subsetOf(Set(1L, 2L)))
  }

  test("bigramLm on a corpus of single-token docs returns empty, not error") {
    // every doc shorter than 2 tokens → no bigrams anywhere; the frame-
    // based path is private, so drive the public one through a filter
    // equivalent: the bi aggregate of such a corpus is empty and the
    // top-context limit over it must yield an empty, well-typed frame
    import graft.text.TextQueries
    val out = TextQueries.bigramLm(spark, TestSpark.sfDir,
      topContext = 0, topK = 3) // limit 0 = empty context set, same tail
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq ==
      Seq("w1", "c1", "w2", "cnt", "prob_bp", "rn"))
  }
}
