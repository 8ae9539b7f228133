package graft

import graft.text.Classifier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hashing-trick classifier (q149): feature extraction against
  * hand-expected arrays, driver-side recomputation of the md5 bucket and
  * weight chain, map-only == explode-path equivalence on the real table,
  * and partitioning invariance (map-only queries must not care).
  */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("features = unigrams then bigrams, in order") {
    val out = Seq((1L, "The quick  brown Fox"), (2L, "one"), (3L, "  "))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Classifier.features(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("the", "quick", "brown", "fox",
      "the quick", "quick brown", "brown fox"))
    assert(out(2L) == Seq("one"))
    assert(out(3L) == Seq.empty)
  }

  /** Driver-side restatement of bucket(f) and weight(b). */
  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }
  private def bucket(f: String): Int =
    Integer.parseInt(md5hex("f:" + f).substring(0, 3), 16)
  private def weight(b: Int): Int =
    Integer.parseInt(md5hex("w:" + b).substring(0, 4), 16) - 32768

  test("score matches a driver-side recomputation of the hash chain") {
    val text = "alpha beta alpha"
    val feats = Seq("alpha", "beta", "alpha", "alpha beta", "beta alpha")
    val exp = feats.map(f => weight(bucket(f)).toLong).sum
    val got = Seq((1L, text)).toDF("doc_id", "text")
      .select(Classifier.scoreOf(col("text"))).as[Long].head()
    assert(got == exp)
  }

  test("empty document scores 0 and keeps") {
    val r = Seq((1L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), Classifier.scoreOf(col("text")).as("score"))
      .collect().head
    assert(r.getLong(1) == 0L)
  }

  test("ClassifierScore expression == the HOF column chain, doc for doc") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .withColumn("toks", graft.text.TextFunctions.tokens(
        coalesce(col("text"), lit(""))))
    val rows = docs.select(col("doc_id"),
        graft.functions.ClassifierScore.score(col("toks")).as("fast"),
        Classifier.scoreOf(col("text")).as("hof"),
        when(size(col("toks")) === 0, 0)
          .otherwise(size(col("toks")) * 2 - 1).as("nf_arith"),
        size(Classifier.features(col("text"))).as("nf_array"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"score mismatch doc ${r.getLong(0)}")
      assert(r.getInt(3) == r.getInt(4), s"n_feats mismatch doc ${r.getLong(0)}")
    }
  }

  test("NULL document scores 0 / 0 feats, matching the oracle's coalesce") {
    // ADVICE r9: scoreOf(NULL) used to return NULL (label 'drop') while
    // the DuckDB oracle coalesces to 0 ('keep') — normalize NULL to ''.
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "alpha"))
      .toDF("doc_id", "text")
    val r = df.select(col("doc_id"),
        size(Classifier.features(col("text"))).as("n_feats"),
        Classifier.scoreOf(col("text")).as("score"))
      .withColumn("label", when(col("score") >= 0, "keep").otherwise("drop"))
      .orderBy("doc_id").collect()
    assert(!r(0).isNullAt(1) && r(0).getInt(1) == 0)
    assert(!r(0).isNullAt(2) && r(0).getLong(2) == 0L)
    assert(r(0).getString(3) == "keep")
    assert(r(1).getInt(1) == 1) // non-null docs unaffected
  }

  test("map-only path == explode path on the sf0.001 corpus") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val a = Classifier.classify(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    val b = Classifier.classifyExploded(docs)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(a.length == docs.count())
    assert(a.toSeq == b.toSeq)
    // the decision boundary discriminates on real data
    val labels = a.map(_._4).toSet
    assert(labels == Set("keep", "drop"))
  }

  test("scores are partitioning-invariant (map-only contract)") {
    val docs = Tables.documents(spark, TestSpark.sfDir).limit(50)
    def run(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), Classifier.scoreOf(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(docs.repartition(1)) == run(docs.repartition(7)))
  }
}
