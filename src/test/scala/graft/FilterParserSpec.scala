package graft

import graft.operators.RuleOps
import graft.rules.FilterExpr._
import graft.rules.{FilterExpr, FilterParser}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Filter-DSL parser tests — grammar + operator-defaulting rules per
  * `FilterExpressionParser.cs:61-233` and the DSL spec in
  * `RuleQueryableExtensions.cs:28-80` (SURVEY §2.3 F5). */
class FilterParserSpec extends AnyFunSuite {

  test("numeric range or-combination: (>=10 and <=100) or >1000") {
    val n = FilterParser.parse("(>=10 and <=100) or >1000")
    n match {
      case Group(Or, Seq(Group(And, Seq(a, b), false), c), false) =>
        assert(a == Pred("value", RuleOps.GreaterThanOrEqualTo, 10L))
        assert(b == Pred("value", RuleOps.LessThanOrEqualTo, 100L))
        assert(c == Pred("value", RuleOps.GreaterThan, 1000L))
      case other => fail(s"unexpected shape: $other")
    }
  }

  test("default operator: Equals for numerics, Contains for strings") {
    assert(FilterParser.parse("42") == Pred("value", RuleOps.IsEqualTo, 42L))
    assert(FilterParser.parse("foo", isString = true) ==
      Pred("value", RuleOps.Contains, "foo"))
  }

  test("wildcard terms flip to Like / NotLike") {
    assert(FilterParser.parse("foo*", isString = true) ==
      Pred("value", RuleOps.Like, "foo*"))
    assert(FilterParser.parse("!~foo?bar", isString = true) ==
      Pred("value", RuleOps.NotLike, "foo?bar"))
    assert(FilterParser.parse("=ab*c", isString = true) ==
      Pred("value", RuleOps.Like, "ab*c"))
  }

  test("negated group !(...)") {
    FilterParser.parse("!(>5 and <10)") match {
      case Group(And, _, negated) => assert(negated)
      case other => fail(s"unexpected: $other")
    }
  }

  test("quoted values keep spaces and operators literal") {
    assert(FilterParser.parse("\"a and b\"", isString = true) ==
      Pred("value", RuleOps.Contains, "a and b"))
  }

  test("bare adjacency means AND") {
    FilterParser.parse(">5 <10") match {
      case Group(And, Seq(a, b), false) =>
        assert(a == Pred("value", RuleOps.GreaterThan, 5L))
        assert(b == Pred("value", RuleOps.LessThan, 10L))
      case other => fail(s"unexpected: $other")
    }
  }

  test("trailing garbage raises ParseError") {
    intercept[FilterParser.ParseError](FilterParser.parse("(>5"))
  }

  test("compiled DSL filters a DataFrame like the hand-written predicate") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (1 to 100).toDF("v")
    val node = FilterParser.parse("(>=10 and <=20) or >95")
    val got = df.filter(FilterExpr.compile(node, _ => col("v")))
      .as[Int].collect().sorted.toSeq
    assert(got == ((10 to 20) ++ (96 to 100)))
  }

  test("property: any numeric comparison term parses to a single Pred") {
    val ops = Map(">=" -> RuleOps.GreaterThanOrEqualTo, "<=" -> RuleOps.LessThanOrEqualTo,
      ">" -> RuleOps.GreaterThan, "<" -> RuleOps.LessThan,
      "=" -> RuleOps.IsEqualTo, "!=" -> RuleOps.IsNotEqualTo)
    val gen = for {
      op <- Gen.oneOf(ops.keys.toSeq)
      n <- Gen.choose(-100000L, 100000L)
    } yield (op, n)
    (0 until 200).foreach { i =>
      val (op, n) = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      assert(FilterParser.parse(s"$op$n") == Pred("value", ops(op), n))
    }
  }
}
