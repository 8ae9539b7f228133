package graft

import graft.operators.Wildcard
import org.scalatest.funsuite.AnyFunSuite

/** Wildcard translation tests — mirrors the reference's WildcardTests
  * (test/Smartstore.Tests/WildcardTests.cs) plus LIKE-escape rules
  * (Operators/LikeOperator.cs:38-95). */
class WildcardSpec extends AnyFunSuite {
  test("glob to LIKE") {
    assert(Wildcard.toLikePattern("foo*") == "foo%")
    assert(Wildcard.toLikePattern("f?o") == "f_o")
    assert(Wildcard.toLikePattern("100%*") == "100/%%")
    assert(Wildcard.toLikePattern("a_b") == "a/_b")
    assert(Wildcard.toLikePattern("a/b") == "a//b")
  }
  test("glob to regex and in-memory matching") {
    assert(Wildcard.matches("H*llo", "Hello"))
    assert(Wildcard.matches("H?llo", "hallo"))
    assert(!Wildcard.matches("H?llo", "Haallo"))
    assert(Wildcard.matches("*.txt", "notes.txt"))
    assert(!Wildcard.matches("*.txt", "notes.txts"))
    assert(Wildcard.matches("a+b", "a+b"))
  }
  test("hasWildcard") {
    assert(Wildcard.hasWildcard("a*"))
    assert(Wildcard.hasWildcard("a?"))
    assert(!Wildcard.hasWildcard("plain"))
  }
}
