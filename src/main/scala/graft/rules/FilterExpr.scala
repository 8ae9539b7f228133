package graft.rules

import graft.operators.RuleOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, not}

/** Rule/filter expression trees (SURVEY §2.3 F4, §3.2) — the Spark analog of
  * the reference's `FilterExpression` / `FilterExpressionGroup`
  * (`src/Smartstore.Core/Platform/Rules/Filters/FilterExpression.cs:3-28`,
  * `FilterExpressionGroup.cs:30-134`): persisted predicate trees with
  * per-group AND/OR combinators and group negation, compiled to a single
  * `Column` predicate (the reference compiles to a LINQ `Expression`).
  *
  * Compilation is pure construction — Catalyst owns all later rewriting
  * (pushdown, constant folding), exactly as EF/SQL did for the reference.
  */
object FilterExpr {

  sealed trait Combinator
  case object And extends Combinator
  case object Or extends Combinator

  sealed trait Node
  /** Leaf: member (resolved to a Column by the caller-supplied catalog),
    * operator, probe value. */
  final case class Pred(member: String, op: RuleOps.Op, value: Any = null) extends Node
  /** Group with one combinator across children; negation via NOT —
    * the reference models negation as `group == false`. */
  final case class Group(
      combinator: Combinator,
      children: Seq[Node],
      negated: Boolean = false) extends Node

  def and(children: Node*): Group = Group(And, children)
  def or(children: Node*): Group = Group(Or, children)

  /** Compile a tree to one Column predicate. `resolve` maps member names to
    * columns (the analog of `FilterDescriptor<T,TValue>`'s member lambda —
    * including derived/aggregate-valued virtual columns, SURVEY §2.11). */
  def compile(node: Node, resolve: String => Column): Column = node match {
    case Pred(member, op, value) => RuleOps(op, resolve(member), value)
    case Group(_, children, negated) if children.isEmpty =>
      if (negated) lit(false) else lit(true)
    case Group(comb, children, negated) =>
      val combined = children.map(compile(_, resolve)).reduce { (a, b) =>
        comb match { case And => a && b; case Or => a || b }
      }
      if (negated) not(combined) else combined
  }
}
