package graft

import graft.text.{Dedup, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Text-analysis + dedup operator tests. */
class TextDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog"),
    (2L, "the  quick   Brown fox jumps over the lazy dog"), // ws/case variant
    (3L, "a completely different sentence about spark engines"),
    (4L, ""),
    (5L, "short one")
  ).toDF("doc_id", "text")

  test("normalize collapses whitespace and case; tokenCount handles empty") {
    val r = docs.select(col("doc_id"),
        TextFunctions.normalize(col("text")).as("n"),
        TextFunctions.tokenCount(col("text")).as("c"))
      .collect().map(x => x.getLong(0) -> (x.getString(1), x.getInt(2))).toMap
    assert(r(1L)._1 == r(2L)._1)
    assert(r(1L)._2 == 9)
    assert(r(4L)._2 == 0)
    assert(r(5L)._2 == 2)
  }

  test("exact dedup groups whitespace/case variants together") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
    assert(g.count() == 4)
    val dup = g.filter(col("dup_cnt") === 2).head()
    assert(dup.getAs[Long]("keeper_id") == 1L)
    val kept = Dedup.dropExactDuplicates(docs, "doc_id", "text")
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("fingerprints equal iff normalized text equal") {
    val fp = docs.select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("minhash: identical normalized docs get identical signatures; disjoint docs differ") {
    val sigs = docs.select(col("doc_id"),
        Dedup.minhashSignature(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs.values.forall(_.size == 16))
  }

  test("minhash LSH candidates find the near-dup pair") {
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cands.exists { case (a, b, j) => a == 1L && b == 2L && j == 1.0 })
    assert(!cands.exists { case (a, b, _) => (a, b) == (1L, 3L) || (a, b) == (3L, 1L) })
  }

  test("simhash: identical docs equal; different docs differ") {
    val sh = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(sh(1L) != sh(3L))
  }

  test("jaccard pairs: near-dup pair scores 1.0 on distinct-token sets") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(!pairs.contains((1L, 3L)))
  }

  test("langId picks marker-based argmax with first-wins tie-break") {
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "der hund und die katze das haus"),
      (3L, "le chat et la souris les amis"),
      (4L, "el perro los gatos"),
      (5L, "xyzzy plugh")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextFunctions.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es", 5L -> "und"))
  }

  test("PII scrubber redacts emails, IPs, digit runs; leaves clean text alone") {
    val df = Seq(
      (1L, "mail me at jane.doe+spam@mail.example.org or JOHN@X.CO today"),
      (2L, "server 192.168.1.254 and 10.0.0.1 are internal"),
      (3L, "card 4111111111111111 acct 123456789 short 12345678"),
      (4L, "nothing sensitive here, just 42 and 3.14"),
      (5L, "mixed: bob@corp.io from 172.16.0.9 ref 9876543210")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextFunctions.piiRedact(col("text")).as("red"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1) == "mail me at <EMAIL> or <EMAIL> today")
    assert(out(2) == "server <IP> and <IP> are internal")
    // 16-digit card and 9-digit account redact; 8 digits is below the bar
    assert(out(3) == "card <ID> acct <ID> short 12345678")
    assert(out(4) == "nothing sensitive here, just 42 and 3.14")
    assert(out(5) == "mixed: <EMAIL> from <IP> ref <ID>")
    val counts = df.select(col("doc_id") +:
        TextFunctions.piiCounts(col("text")).zip(Seq("e", "i", "d"))
          .map { case (c, n) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(counts(1) == ((2, 0, 0)))
    assert(counts(2) == ((0, 2, 0)))
    assert(counts(3) == ((0, 0, 2)))
    assert(counts(4) == ((0, 0, 0)))
    assert(counts(5) == ((1, 1, 1)))
  }

  test("quality signals on a punctuated doc") {
    val df = Seq((1L, "Hello, world! This is a test.")).toDF("doc_id", "text")
    val r = df.select(
      TextFunctions.punctRatio(col("text")).as("p"),
      TextFunctions.stopwordRatio(col("text")).as("s"),
      TextFunctions.avgTokenLen(col("text")).as("a")).head()
    assert(r.getDouble(0) == round(3.0 / 29, 4))
    assert(r.getDouble(1) == round(1.0 / 6, 4))
    assert(r.getDouble(2) > 3.0)
  }

  private def round(d: Double, n: Int): Double =
    BigDecimal(d).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("splitLeakage: planted cross-split near-dup caught, within-split " +
      "near-dup and unique docs report zero") {
    // re-derive the released split rule (16-bit md5 bucket, 90/5/5) to
    // pick ids that land where the plant needs them
    def splitOfId(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      val b = Integer.parseInt(hex, 16)
      if (b < 65536 * 90 / 100) "train"
      else if (b < 65536 * 95 / 100) "val" else "test"
    }
    val ids = (1L to 2000L).toList
    val trainIds = ids.filter(splitOfId(_) == "train")
    val testId = ids.find(splitOfId(_) == "test").get
    val valId = ids.find(splitOfId(_) == "val").get
    val dupText = "the quick brown fox jumps over the lazy sleeping dog today"
    val otherDup = "spark engines shuffle partitions across the executor fleet nightly"
    val dir = java.nio.file.Files.createTempDirectory("graft-leak").toString
    Seq(
      (trainIds(0), dupText, "en", "src0", dupText.length.toLong),   // leaks → test
      (testId, dupText, "en", "src0", dupText.length.toLong),
      (trainIds(1), otherDup, "en", "src0", otherDup.length.toLong), // within-split pair
      (trainIds(2), otherDup, "en", "src0", otherDup.length.toLong),
      (valId, "one entirely unrelated unique sentence with nothing shared here",
        "en", "src0", 62L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.text.TextQueries.splitLeakage(spark, dir)
      .collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r.keySet == Set("train", "val", "test"))
    // (docs, leaked_pairs, leaked_docs): only the train↔test plant leaks;
    // the train-internal near-dup pair and the unique val doc report zero
    assert(r("train") == ((3L, 1L, 1L)))
    assert(r("test") == ((1L, 1L, 1L)))
    assert(r("val") == ((1L, 0L, 0L)))
  }
}
