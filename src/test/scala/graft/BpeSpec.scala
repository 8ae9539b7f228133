package graft

import graft.text.Bpe
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge-training semantics: canonical pair counting, deterministic
  * argmax, and the two-pass fuse on adjacent repeated pairs. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def repsOf(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.collect().map(r => r.getAs[String]("word") -> r.getAs[String]("rep")).toMap

  test("merges learn the weighted best pair and apply everywhere") {
    // 'aa' dominates: pair (a,a) weight 10+6(x2 in aaa: only the leftmost
    // per canonical non-overlap)… freq-weighted counts drive the argmax
    val words = Seq(("aa", 10L), ("aaa", 6L), ("ab", 5L)).toDF("word", "freq")
    val (merges, reps) = Bpe.train(words, rounds = 1)
    assert(merges.head._2 == "a" && merges.head._3 == "a")
    val m = repsOf(reps)
    // canonical left-to-right: aaa → [aa, a]; ab untouched
    assert(m("aa") == "aa </w>")
    assert(m("aaa") == "aa a </w>")
    assert(m("ab") == "a b </w>")
  }

  test("two-pass fuse catches run stragglers without over-merging") {
    // 'abab': after merging (a,b), canonical symbols are [ab, ab, </w>] —
    // a single left-to-right replace would leave the second 'a b' unfused
    val words = Seq(("abab", 9L), ("ab", 1L)).toDF("word", "freq")
    val (merges, reps) = Bpe.train(words, rounds = 1)
    assert(merges.head._2 == "a" && merges.head._3 == "b")
    assert(repsOf(reps)("abab") == "ab ab </w>")
  }

  test("end-of-word sentinel merges like any symbol; training exhausts cleanly") {
    val words = Seq(("go", 8L), ("no", 7L)).toDF("word", "freq")
    // round 1 best: (o, </w>) weight 15 beats (g,o) 8 and (n,o) 7
    val (merges, reps) = Bpe.train(words, rounds = 10)
    assert(merges.head._2 == "o" && merges.head._3 == "</w>")
    // with 10 requested rounds the 2-word vocab fully fuses then stops
    assert(merges.size < 10)
    val m = repsOf(reps)
    assert(m("go") == "go</w>" && m("no") == "no</w>")
  }
}
