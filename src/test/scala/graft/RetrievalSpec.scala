package graft

import graft.text.{Retrieval, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 retrieval (q148): ranks a hand-built corpus and compares every
  * quantized score against an independent driver-side reimplementation of
  * the formula (same corpus statistics, same quantization), plus ranking
  * invariants a search engine must satisfy.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // corpus chosen so: "rust" is rare (df=1), "data" is common (df=4);
  // doc 3 repeats "engine" (tf saturation), doc 4 is long (length norm).
  private def corpus = Seq(
    (1L, "rust engine data"),
    (2L, "data store and data query"),
    (3L, "engine engine engine data"),
    (4L, "data systems from a very long document with many filler tokens data"),
    (5L, "unrelated words entirely")
  ).toDF("doc_id", "text")

  private val terms = Seq(0 -> "rust", 0 -> "data", 1 -> "engine")

  /** Driver-side BM25 with the identical integer-quantization contract. */
  private def expected: Map[(Int, Long), Long] = {
    val docs = Map(
      1L -> "rust engine data", 2L -> "data store and data query",
      3L -> "engine engine engine data",
      4L -> "data systems from a very long document with many filler tokens data",
      5L -> "unrelated words entirely")
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val n = docs.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val df = toks.values.flatMap(_.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size }
    val out = for {
      (qid, term) <- terms
      (id, ts) <- toks
      tf = ts.count(_ == term) if tf > 0
    } yield {
      val idf = math.log((n - df(term) + 0.5) / (df(term) + 0.5) + 1)
      val tfc = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * ts.size / avgdl))
      (qid, id) -> math.round(idf * tfc * 10000)
    }
    out.groupBy(_._1).map { case (key, xs) => key -> xs.map(_._2).sum }
  }

  test("q148: every quantized score matches the driver-side formula") {
    val got = Retrieval.bm25(spark, corpus, terms, 10)
      .select(col("query_id"), col("doc_id"),
        round(col("score") * 10000, 0).cast("long").as("iscore"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("q148: ranking invariants — rare term wins, saturation, rn contract") {
    val rows = Retrieval.bm25(spark, corpus, terms, 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    // per-query: rn dense from 1, scores non-increasing, ≤ k rows
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1 to g.length))
      assert(g.length <= 3)
      val scores = sorted.map(_._4).toSeq
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b })
    }
    // query 0 ("rust data"): doc 1 holds the only "rust" (df=1, high idf)
    // and must outrank every data-only doc
    val q0 = rows.filter(_._1 == 0).sortBy(_._3)
    assert(q0.head._2 == 1L)
    // query 1 ("engine"): tf saturation still ranks the tf=3 doc first
    val q1 = rows.filter(_._1 == 1).sortBy(_._3)
    assert(q1.head._2 == 3L)
    // doc 5 shares no query term and never appears
    assert(!rows.exists(_._2 == 5L))
  }

  test("q148: tokenization parity — mixed case/whitespace rank identically") {
    val messy = corpus.select(col("doc_id"),
      upper(regexp_replace(col("text"), " ", "   ")).as("text"))
    val a = Retrieval.bm25(spark, corpus, terms, 10).collect().toSeq
    val b = Retrieval.bm25(spark, messy, terms, 10).collect().toSeq
    assert(TextFunctions.normalize(lit("A  b")) != null) // touch API
    assert(a == b)
  }
}
