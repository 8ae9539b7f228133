package graft

import graft.functions.MisraGriesAgg
import graft.text.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries sketch (q181) and phrase search (q182) semantics. The MG
  * guarantee under test: with vocabulary LARGER than the sketch cap
  * (evictions and lossy merges must actually happen), every token with
  * true frequency > n/cap still survives as a candidate — across
  * arbitrary partitionings. */
class HeavyHitterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("MG candidates cover all true heavy hitters despite evictions") {
    val rnd = new scala.util.Random(13)
    // 3 heavy tokens (~1000 each) buried in 5000 singletons: any cap-50
    // summary must evict constantly yet keep the heavy three
    val heavy = Seq.fill(3000)(s"hh${rnd.nextInt(3)}")
    val noise = (1 to 5000).map(i => s"noise$i")
    val all = rnd.shuffle(heavy ++ noise)
    for (parts <- Seq(1, 7)) {
      val cands = all.toDF("token").repartition(parts)
        .agg(MisraGriesAgg.mgCandidates(col("token"), 50).as("c"))
        .collect().head.getSeq[String](0).toSet
      val n = all.size
      val counts = all.groupBy(identity).view.mapValues(_.size)
      val mustKeep = counts.collect { case (t, c) if c > n / 50 => t }.toSet
      assert(mustKeep.subsetOf(cands), s"parts=$parts missing=${mustKeep -- cands}")
      assert(cands.size <= 50 * parts + 50, s"state not bounded: ${cands.size}")
    }
  }

  test("q181 confirmed output is exact and partitioning-invariant") {
    val a = Retrieval.heavyHitters(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // exact recount from the corpus
    val toks = Tables.documents(spark, TestSpark.sfDir)
      .select(explode(graft.text.TextFunctions.tokensOf(
        graft.text.TextFunctions.normalize(col("text")))).as("t"))
      .collect().map(_.getString(0))
    val n = toks.length
    val exp = toks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 50 > n }
      .toSeq.sortBy { case (t, c) => (-c, t) }
    assert(a == exp)
  }

  test("phrase search == driver recount (incl. overlapping matches)") {
    val phrase = "big order scan"
    val got = Retrieval.phraseSearch(spark, TestSpark.sfDir, phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val exp = docs.map { case (id, t) =>
      val toks = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      val w = phrase.split(" ")
      val c = (0 to toks.length - w.length).count(i =>
        w.indices.forall(j => toks(i + j) == w(j)))
      (id, c.toLong)
    }.filter(_._2 > 0).toMap
    assert(got == exp)
  }
}
