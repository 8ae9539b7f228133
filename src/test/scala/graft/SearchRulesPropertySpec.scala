package graft

import graft.dsl.Search
import graft.rules.{RuleSets, SearchRules}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Equivalence theorem between two of the reference's rule-evaluation
  * architectures: for rule sets whose descriptors map straight onto
  * columns, path (a) — direct predicate compilation (`RuleSets.apply`) —
  * and path (b) — rewrite to a search query and run the §3.1 compiler
  * (`SearchRules.rewrite` → `Search.compileFiltered`) — must select the
  * SAME rows for ANY generated rule set. The reference never states this
  * property; it follows from both paths compiling the same descriptor
  * semantics, and it pins the rewriter against drift. */
class SearchRulesPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 60 deterministic rows spanning the value domains the rules probe
  private lazy val frame = (1 to 60).map { i =>
    (i.toLong, s"cust-$i", i % 7, (i * 37 % 100) * 10.0, i % 3 == 0)
  }.toDF("id", "name", "country_id", "spent", "tax_exempt")

  // rules carry the COLUMN name as member so path (a) can resolve them
  // directly; the descriptor table keys on the same names for path (b)
  private val descriptors = Map(
    "spent" -> SearchRules.range("spent", "spent"),
    "country_id" -> SearchRules.inList("country_id", "country_id"),
    "tax_exempt" -> SearchRules.flag("tax_exempt", "tax_exempt"))

  private val genRule: Gen[RuleSets.Rule] = Gen.oneOf(
    for {
      op <- Gen.oneOf("=", "!=", ">", ">=", "<", "<=")
      v <- Gen.choose(0, 1000)
    } yield RuleSets.Rule("spent", op, v.toString, "money"),
    for {
      n <- Gen.choose(1, 4)
      vs <- Gen.listOfN(n, Gen.choose(0, 6))
    } yield RuleSets.Rule("country_id", "In", vs.distinct.mkString(","), "int[]"),
    Gen.oneOf(true, false).map(b =>
      RuleSets.Rule("tax_exempt", "=", b.toString, "bool")))

  private val genSet: Gen[RuleSets.RuleSet] = for {
    n <- Gen.choose(1, 5)
    rules <- Gen.listOfN(n, genRule)
    m <- Gen.choose(0, 2)
    subRules <- Gen.listOfN(m, genRule)
  } yield RuleSets.RuleSet(rules = rules,
    subsets = if (subRules.isEmpty) Seq.empty
              else Seq(RuleSets.RuleSet(rules = subRules)))

  /** Path (b)'s NE lands in mustNotFilters; path (a) compiles NE as a
    * direct predicate. On non-null columns these agree (the compiler
    * coalesces nulls to keep); the frame has no nulls by construction. */
  test("rewriter path == direct rule compilation on 40 generated rule sets") {
    (0 until 40).foreach { iter =>
      val set = genSet.pureApply(Gen.Parameters.default, Seed(iter.toLong * 104729))
      val direct = RuleSets(frame, set)
        .select("id").as[Long].collect().toSet
      val viaSearch = Search.compileFiltered(frame,
          SearchRules.rewrite(set, descriptors, Search.Query(idField = "id")))
        .select("id").as[Long].collect().toSet
      assert(direct == viaSearch, s"\niter $iter set: $set")
    }
  }
}
