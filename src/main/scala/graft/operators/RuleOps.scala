package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's typed predicate algebra (SURVEY §2.3 F3) as `Column`
  * builders — the direct Spark analog of LINQ expression-tree codegen
  * (reference: `src/Smartstore.Core/Platform/Rules/RuleOperator.cs:94-144`,
  * operator impls under `Platform/Rules/Operators/` — CommonOperators,
  * NumericOperators, StringOperators, ListOperators, LikeOperator).
  *
  * Semantics preserved:
  *  - string comparisons are case-insensitive — both sides lower-cased
  *    (`Operators/CommonOperators.cs` EqualOperator, `StringOperators.cs`);
  *  - `IsEmpty` means null OR empty-after-trim;
  *  - `In` is membership in a literal list (`ListOperators.cs:22-58`);
  *  - `AllIn` means the array column contains every probe value;
  *  - `Like` translates `*`/`?` wildcards to SQL LIKE with `/` escape
  *    (`Operators/LikeOperator.cs:38-95`).
  *
  * These compile to plain Catalyst expressions, so they stay inside
  * whole-stage codegen and push down to parquet scans where possible.
  */
object RuleOps {

  sealed abstract class Op(val token: String)
  case object IsEqualTo extends Op("=")
  case object IsNotEqualTo extends Op("!=")
  case object IsNull extends Op("IsNull")
  case object IsNotNull extends Op("IsNotNull")
  case object GreaterThanOrEqualTo extends Op(">=")
  case object GreaterThan extends Op(">")
  case object LessThanOrEqualTo extends Op("<=")
  case object LessThan extends Op("<")
  case object StartsWith extends Op("StartsWith")
  case object EndsWith extends Op("EndsWith")
  case object Contains extends Op("Contains")
  case object NotContains extends Op("NotContains")
  case object IsEmpty extends Op("IsEmpty")
  case object IsNotEmpty extends Op("IsNotEmpty")
  case object In extends Op("In")
  case object NotIn extends Op("NotIn")
  case object AllIn extends Op("AllIn")
  case object NotAllIn extends Op("NotAllIn")
  case object Like extends Op("Like")
  case object NotLike extends Op("NotLike")

  val allOps: Seq[Op] = Seq(IsEqualTo, IsNotEqualTo, IsNull, IsNotNull,
    GreaterThanOrEqualTo, GreaterThan, LessThanOrEqualTo, LessThan,
    StartsWith, EndsWith, Contains, NotContains, IsEmpty, IsNotEmpty,
    In, NotIn, AllIn, NotAllIn, Like, NotLike)

  private def norm(v: Any): Column = v match {
    case c: Column => c
    case s: String => lower(lit(s))
    case other => lit(other)
  }

  /** Lower-case the left side only when comparing against a string probe —
    * mirrors the reference's "ToLower both sides" string discipline while
    * leaving numeric/date comparisons untouched (and pushdown-friendly). */
  private def lhs(c: Column, v: Any): Column = v match {
    case _: String => lower(c)
    case _ => c
  }

  def apply(op: Op, c: Column, value: Any): Column = op match {
    case IsEqualTo => lhs(c, value) === norm(value)
    case IsNotEqualTo => lhs(c, value) =!= norm(value)
    case IsNull => c.isNull
    case IsNotNull => c.isNotNull
    case GreaterThanOrEqualTo => lhs(c, value) >= norm(value)
    case GreaterThan => lhs(c, value) > norm(value)
    case LessThanOrEqualTo => lhs(c, value) <= norm(value)
    case LessThan => lhs(c, value) < norm(value)
    case StartsWith => lower(c).startsWith(str(value))
    case EndsWith => lower(c).endsWith(str(value))
    case Contains => lower(c).contains(str(value))
    case NotContains => !lower(c).contains(str(value))
    case IsEmpty => c.isNull || length(trim(c)) === 0
    case IsNotEmpty => c.isNotNull && length(trim(c)) > 0
    case In => in(c, value)
    case NotIn => !in(c, value)
    case AllIn => allIn(c, value)
    case NotAllIn => !allIn(c, value)
    case Like => like(c, str(value))
    case NotLike => !like(c, str(value))
  }

  private def str(v: Any): String = String.valueOf(v).toLowerCase

  /** Wildcard LIKE: plain `like` (pushdown-friendly — prefix patterns
    * become StartsWith on the scan) unless the pattern needs escaping of
    * literal `%`/`_`, where the Column API lacks an ESCAPE overload —
    * there we fall back to an anchored `rlike`. */
  private def like(c: Column, wildcard: String): Column =
    if (wildcard.indexOf('%') < 0 && wildcard.indexOf('_') < 0)
      // Column.like has no ESCAPE overload and defaults to backslash, so
      // the pattern must use BACKSLASH escaping — Wildcard.toLikePattern
      // targets the reference's ESCAPE '/' convention and would make '/'
      // or '\' in the value silently never match here
      lower(c).like(wildcard.replace("\\", "\\\\").replace('*', '%').replace('?', '_'))
    else lower(c).rlike(Wildcard.toRegex(wildcard))

  private def in(c: Column, value: Any): Column = value match {
    case vs: Seq[_] if vs.forall(_.isInstanceOf[String]) =>
      lower(c).isin(vs.map(v => v.asInstanceOf[String].toLowerCase): _*)
    case vs: Seq[_] => c.isin(vs: _*)
    case v => c.isin(v)
  }

  private def allIn(c: Column, value: Any): Column = value match {
    case vs: Seq[_] if vs.nonEmpty =>
      vs.map(v => array_contains(c, v)).reduce(_ && _)
    case _ => lit(true)
  }

  /** Valid-operator matrix per logical type — mirrors
    * `RuleType.GetValidOperators` (`RuleType.cs:33-89`). */
  def validOps(ruleType: String): Seq[Op] = ruleType match {
    case "string" => Seq(IsEqualTo, IsNotEqualTo, IsNull, IsNotNull,
      StartsWith, EndsWith, Contains, NotContains, IsEmpty, IsNotEmpty,
      In, NotIn, Like, NotLike)
    case "bool" => Seq(IsEqualTo, IsNotEqualTo, IsNull, IsNotNull)
    case "array" => Seq(In, NotIn, AllIn, NotAllIn)
    case _ => Seq(IsEqualTo, IsNotEqualTo, IsNull, IsNotNull,
      GreaterThanOrEqualTo, GreaterThan, LessThanOrEqualTo, LessThan,
      In, NotIn)
  }
}
