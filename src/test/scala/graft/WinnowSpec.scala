package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WinnowFingerprints (q174's sketch): the one-pass deque expression must
  * equal a from-first-principles window-enumeration recomputation (min
  * hash per window, ties → rightmost, distinct selections) on random
  * strings, and must deliver the winnowing guarantee — any shared
  * substring of length ≥ w + k − 1 yields a shared fingerprint. */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 16
  private val W = 6

  private def viaExpr(texts: Seq[String]): Map[Int, Seq[(Int, String)]] =
    texts.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("id", "text")
      .select(col("id"),
        graft.functions.WinnowExpr.winnowOf(col("text"), K, W).as("f"))
      .collect()
      .map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getInt(0), x.getString(1))))
      .toMap

  /** Driver-side brute force: enumerate every window, argmin by
    * (hash ASC, pos DESC), distinct by position order. */
  private def brute(t: String): Seq[(Int, String)] = {
    val n = t.length // pure-ASCII tests: code points == chars
    if (n < K) return Seq.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (0 to n - K).map { i =>
      md.digest(t.substring(i, i + K).getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
    }
    val g = hs.length
    val maxwin = math.max(1, g - W + 1)
    val sel = (0 until maxwin).map { j =>
      val win = (j until math.min(j + W, g)).map(p => (hs(p), p))
      val best = win.minBy { case (h, p) => (h, -p) }
      (best._2 + 1, best._1)
    }
    sel.distinct
  }

  test("expression == window-enumeration brute force on random strings") {
    val rnd = new scala.util.Random(42)
    // small alphabet forces hash ties and repeated grams
    val texts = (1 to 60).map { i =>
      val len = rnd.nextInt(120)
      (1 to len).map(_ => "ab c"(rnd.nextInt(4))).mkString
    } ++ Seq("", "short", "a" * 16, "a" * 17, "a" * 40, "b" * 21)
    val got = viaExpr(texts)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i) == brute(t), s"text #$i '${t.take(40)}'")
    }
  }

  test("documents shorter than k sketch to nothing; k..k+w-2 grams winnow once") {
    val got = viaExpr(Seq("x" * (K - 1), "y" * K, "z" * (K + W - 2)))
    assert(got(0).isEmpty)
    assert(got(1).size == 1) // one gram, one window
    assert(got(2).nonEmpty && got(2) == brute("z" * (K + W - 2)))
  }

  test("shared substring of >= w+k-1 chars guarantees a shared fingerprint") {
    val rnd = new scala.util.Random(7)
    def randTxt(len: Int) = (1 to len).map(_ =>
      ('a' + rnd.nextInt(26)).toChar).mkString
    val common = randTxt(K + W - 1) // exactly the guarantee threshold
    for (_ <- 1 to 20) {
      val a = randTxt(rnd.nextInt(60)) + common + randTxt(rnd.nextInt(60))
      val b = randTxt(rnd.nextInt(60)) + common + randTxt(rnd.nextInt(60))
      val got = viaExpr(Seq(a, b))
      val ha = got(0).map(_._2).toSet
      val hb = got(1).map(_._2).toSet
      assert(ha.intersect(hb).nonEmpty, s"no shared fingerprint for '$common'")
    }
  }
}
