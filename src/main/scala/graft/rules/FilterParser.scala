package graft.rules

import graft.operators.{RuleOps, Wildcard}
import graft.rules.FilterExpr._

/** The string filter mini-DSL (SURVEY §2.3 F5) — a recursive-descent parser
  * producing `FilterExpr` trees, re-creating the grammar the reference
  * builds with Parlot (`Filters/FilterExpressionParser.cs:61-152`; DSL spec
  * and examples: `Filters/RuleQueryableExtensions.cs:28-80`):
  *
  *   expr   := orExpr
  *   orExpr := andExpr (("or"|"|") andExpr)*
  *   andExpr:= unary (("and"|"&") unary)*     -- bare adjacency = AND
  *   unary  := "!" group | group | term
  *   group  := "(" expr ")"
  *   term   := [op] value
  *   op     := ">=" | "<=" | "!=" | "<>" | ">" | "<" | "=" | "~" | "!~"
  *   value  := "quoted string" | bare-token
  *
  * Operator defaulting (FilterExpressionParser.cs:189-233): a term with no
  * explicit operator defaults to Contains for strings and Equals for
  * numerics; a term containing `*`/`?` wildcards flips Equals→Like,
  * NotEquals→NotLike, Contains→Like. `!(...)` negates a whole group.
  */
object FilterParser {

  final case class ParseError(msg: String, pos: Int)
      extends RuntimeException(s"$msg at position $pos")

  /** Apply one DSL string across several members, OR-combined — the
    * reference applies the parsed filter list to N members with a
    * combinator (`RuleQueryableExtensions.ApplyFilter`, :104-150). */
  def parseForMembers(input: String,
      members: Seq[(String, Boolean)]): FilterExpr.Node =
    FilterExpr.Group(FilterExpr.Or,
      members.map { case (m, isString) => parse(input, m, isString) })

  /** Parse a DSL string into a predicate tree over a single member.
    * `isString` selects the default operator per the reference's rules. */
  def parse(input: String, member: String = "value", isString: Boolean = false): Node = {
    val p = new P(input, member, isString)
    val node = p.parseOr()
    p.skipWs()
    if (!p.eof) throw ParseError(s"unexpected trailing input '${p.rest}'", p.pos)
    node
  }

  private final class P(s: String, member: String, isString: Boolean) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def rest: String = s.substring(pos)
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1

    private def keyword(kw: String): Boolean = {
      skipWs()
      if (s.regionMatches(true, pos, kw, 0, kw.length)) {
        val end = pos + kw.length
        val boundary = end >= s.length || !s.charAt(end).isLetterOrDigit
        if (boundary) { pos = end; return true }
      }
      false
    }

    private def sym(t: String): Boolean = {
      skipWs()
      if (s.regionMatches(pos, t, 0, t.length)) { pos += t.length; true }
      else false
    }

    def parseOr(): Node = {
      var nodes = List(parseAnd())
      while (keyword("or") || sym("|")) nodes ::= parseAnd()
      if (nodes.size == 1) nodes.head else Group(Or, nodes.reverse)
    }

    def parseAnd(): Node = {
      var nodes = List(parseUnary())
      var cont = true
      while (cont) {
        if (keyword("and") || sym("&")) nodes ::= parseUnary()
        else {
          // bare adjacency = AND ("term1 term2"), unless next is a closer/or
          skipWs()
          if (!eof && s.charAt(pos) != ')' && !peekKeyword("or") && s.charAt(pos) != '|')
            nodes ::= parseUnary()
          else cont = false
        }
      }
      if (nodes.size == 1) nodes.head else Group(And, nodes.reverse)
    }

    private def peekKeyword(kw: String): Boolean = {
      val save = pos
      val r = keyword(kw)
      pos = save
      r
    }

    def parseUnary(): Node = {
      skipWs()
      // '!' then optional whitespace then '(' — requiring the literal
      // two-char token '!(' would make '! (...)' silently parse the '!'
      // as a value term and drop the negation
      if (!eof && s.charAt(pos) == '!') {
        val save = pos
        pos += 1
        skipWs()
        if (!eof && s.charAt(pos) == '(') {
          pos += 1
          negate(group(closeAlreadyOpen = true))
        } else { pos = save; term() }
      }
      else if (!eof && s.charAt(pos) == '(') { pos += 1; group(closeAlreadyOpen = true) }
      else term()
    }

    private def negate(n: Node): Node = n match {
      case g: Group => g.copy(negated = !g.negated)
      case other => Group(And, Seq(other), negated = true)
    }

    private def group(closeAlreadyOpen: Boolean): Node = {
      val inner = parseOr()
      skipWs()
      if (!sym(")")) throw ParseError("expected ')'", pos)
      inner
    }

    def term(): Node = {
      skipWs()
      if (eof) throw ParseError("expected term", pos)
      val explicit: Option[RuleOps.Op] =
        if (sym(">=")) Some(RuleOps.GreaterThanOrEqualTo)
        else if (sym("<=")) Some(RuleOps.LessThanOrEqualTo)
        else if (sym("!=") || sym("<>")) Some(RuleOps.IsNotEqualTo)
        else if (sym("!~")) Some(RuleOps.NotContains)
        else if (sym(">")) Some(RuleOps.GreaterThan)
        else if (sym("<")) Some(RuleOps.LessThan)
        else if (sym("=")) Some(RuleOps.IsEqualTo)
        else if (sym("~")) Some(RuleOps.Contains)
        else None
      skipWs()
      val quoted = !eof && (s.charAt(pos) == '"' || s.charAt(pos) == '\'')
      val raw = value()
      val defaulted = explicit.getOrElse(
        if (isString) RuleOps.Contains else RuleOps.IsEqualTo)
      // wildcard TERMS flip to LIKE (FilterExpressionParser.cs:189-233);
      // quoted values are literal text and never flip
      val op =
        if (!quoted && Wildcard.hasWildcard(raw)) defaulted match {
          case RuleOps.IsEqualTo | RuleOps.Contains => RuleOps.Like
          case RuleOps.IsNotEqualTo | RuleOps.NotContains => RuleOps.NotLike
          case other => other
        } else defaulted
      val v: Any = if (isString) raw else coerce(raw)
      Pred(member, op, v)
    }

    private def value(): String = {
      if (!eof && (s.charAt(pos) == '"' || s.charAt(pos) == '\'')) {
        val quote = s.charAt(pos)
        pos += 1
        val sb = new StringBuilder
        while (!eof && s.charAt(pos) != quote) { sb += s.charAt(pos); pos += 1 }
        if (eof) throw ParseError("unterminated quoted value", pos)
        pos += 1
        sb.result()
      } else {
        val start = pos
        while (!eof && !s.charAt(pos).isWhitespace &&
               ")|&".indexOf(s.charAt(pos)) < 0) pos += 1
        if (pos == start) throw ParseError("expected value", pos)
        s.substring(start, pos)
      }
    }

    private def coerce(raw: String): Any =
      if (raw.matches("[+-]?\\d+")) raw.toLong
      else if (raw.matches("[+-]?\\d*\\.\\d+([eE][+-]?\\d+)?")) raw.toDouble
      else if (raw.equalsIgnoreCase("true")) true
      else if (raw.equalsIgnoreCase("false")) false
      else raw
  }
}
