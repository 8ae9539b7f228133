package graft.rules

import graft.operators.RuleOps
import org.apache.spark.sql.{Column, DataFrame}

/** Persisted rule-set model (SURVEY §3.2 — `RuleSetEntity` ⊃
  * `RuleEntity(RuleType, Operator, Value, DisplayOrder)`,
  * Domain/RuleSetEntity.cs:22-140, RuleEntity.cs:14-60; recursive set/
  * subgroup walk: `RuleService.CreateExpressionGroupAsync`,
  * Services/RuleService.cs).
  *
  * A rule row stores its operator as a token and its value as a STRING
  * (`RuleEntity.Value`); compilation coerces by the declared rule type —
  * the reference's `RuleOperator.GenerateExpression` coercion surface
  * (RuleOperator.cs:160-326): int/float/money/bool/datetime scalars,
  * comma-separated lists for In/NotIn/AllIn.
  */
object RuleSets {

  /** One persisted rule row. */
  final case class Rule(
      member: String,
      /** operator token, e.g. "=", "!=", "In", "Like", "IsNull". */
      op: String,
      /** raw persisted value; null for nullary operators. */
      value: String = null,
      /** declared type: int | float | money | bool | datetime | string |
        * int[] | float[] | string[]. */
      ruleType: String = "string",
      displayOrder: Int = 0)

  /** A rule set: rules + nested subsets, one combinator, optional NOT. */
  final case class RuleSet(
      andCombined: Boolean = true,
      negated: Boolean = false,
      rules: Seq[Rule] = Seq.empty,
      subsets: Seq[RuleSet] = Seq.empty)

  private val tokenToOp: Map[String, RuleOps.Op] =
    RuleOps.allOps.map(o => o.token.toLowerCase -> o).toMap ++ Map(
      "==" -> RuleOps.IsEqualTo, "<>" -> RuleOps.IsNotEqualTo)

  def parseOp(token: String): RuleOps.Op =
    tokenToOp.getOrElse(token.toLowerCase,
      throw new IllegalArgumentException(s"unknown rule operator '$token'"))

  /** Culture-invariant value coercion by declared rule type. */
  def coerce(raw: String, ruleType: String): Any = {
    if (raw == null) return null
    ruleType.toLowerCase match {
      case "int" => raw.trim.toLong
      case "float" | "money" => raw.trim.toDouble
      case "bool" => Seq("1", "true", "on", "yes").contains(raw.trim.toLowerCase)
      case "datetime" =>
        // accept date-only values too (the reference's Convert<DateTime>
        // does; Timestamp.valueOf alone requires a time component)
        val t = raw.trim
        scala.util.Try(java.sql.Timestamp.valueOf(t)).getOrElse(
          java.sql.Timestamp.valueOf(java.time.LocalDate.parse(t).atStartOfDay()))
      case "int[]" => split(raw).map(_.toLong)
      case "float[]" => split(raw).map(_.toDouble)
      case "string[]" => split(raw)
      case _ => raw
    }
  }

  private def split(raw: String): Seq[String] =
    raw.split("[,;]").map(_.trim).filter(_.nonEmpty).toSeq

  /** Recursive compile to a FilterExpr tree (the reference's expression-
    * group walk), then to one Column predicate. */
  def toNode(set: RuleSet): FilterExpr.Node = {
    val comb = if (set.andCombined) FilterExpr.And else FilterExpr.Or
    val leafNodes = set.rules.sortBy(_.displayOrder).map { r =>
      FilterExpr.Pred(r.member, parseOp(r.op), coerce(r.value, r.ruleType))
    }
    FilterExpr.Group(comb, leafNodes ++ set.subsets.map(toNode), set.negated)
  }

  def compile(set: RuleSet, resolve: String => Column): Column =
    FilterExpr.compile(toNode(set), resolve)

  def apply(df: DataFrame, set: RuleSet): DataFrame =
    df.filter(compile(set, df.col))
}
