package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Money arithmetic discipline (SURVEY §1.2 / §2.7 — `Money` value type
  * with currency + rounding, src/Smartstore.Core/Common/Domain/Money.cs;
  * rounding significance: CartTotalRule.cs:35-36; pinned by
  * test/Smartstore.Core.Tests/Common/MoneyTests.cs).
  *
  * Amounts are decimal(18,4)-class; display/rounding uses either
  * half-away-from-zero (`round`) or banker's half-even (`bround`), and
  * cash rounding snaps to a smallest-denomination step. */
object MoneyFns {

  val MoneyType: DecimalType = DecimalType(18, 4)

  def money(c: Column): Column = c.cast(MoneyType)

  /** Midpoint rounding: half-even (banker's) or half-away-from-zero —
    * the reference's `MidpointRounding` options. */
  def moneyRound(c: Column, decimals: Int, halfEven: Boolean = false): Column =
    if (halfEven) bround(c, decimals) else round(c, decimals)

  /** Cash rounding to the smallest coin denomination (e.g. 0.05):
    * round(amount / denom) * denom. */
  def cashRound(c: Column, denom: Double, halfEven: Boolean = false): Column = {
    val steps = c.cast("double") / denom
    val rounded = if (halfEven) bround(steps, 0) else round(steps, 0)
    money(rounded * denom)
  }

  /** Tax math on gross/net amounts (OrderTotal shapes): net from gross at
    * rate r = gross / (1 + r); tax part = gross - net. */
  def netFromGross(gross: Column, rate: Column): Column =
    money(gross / (lit(1.0) + rate))
  def taxFromGross(gross: Column, rate: Column): Column =
    money(gross - gross / (lit(1.0) + rate))
}
