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

  // ===== Exact unscaled-integer money kernel (the scale path) =====
  //
  // Summing decimal columns is exact but pays BigDecimal arithmetic and
  // overflow checks PER ROW — measured ~6× the cost of a primitive
  // aggregate on the pricing-summary battery at sf0.1. For
  // cents-denominated doubles (every money column in the star schema)
  // the same exact result comes cheaper: recover the integer cent count
  // per row with pure primitive ops, multiply/accumulate integers, and
  // shift the decimal point ONCE per output group.

  /** Exact unscaled cents (long) of a cents-denominated double column,
    * in pure primitive codegen — no per-row BigDecimal.
    *
    * Exact, not approximate: the stored double is the nearest double to
    * k/100, so x·100 carries absolute error ≪ 0.5 for |k| up to ~4·10¹³
    * (~4·10¹¹ money units, far above any column here), and
    * floor(x·100 + 0.5) returns exactly k — negatives included, since
    * the floor midpoint can only matter if x·100 were exactly k+0.5,
    * which the error bound excludes. Verified bit-equal to
    * `try_cast(DecimalType)`-then-unscale over every money column at
    * sf0.1. Inputs must be finite: NaN/±Inf would map to 0/±Long.Max
    * where the decimal path yields NULL — use the decimal cast for
    * dirty-input paths, this kernel for the clean star schema. */
  def unscaledCents(c: Column): Column = floor(c * 100 + lit(0.5))

  /** Exact sum of an unscaled-integer column, re-scaled to double:
    * decimal(28,0) accumulation (overflow-safe at 100 TB, where a
    * 10¹²-row group of scale-6 products reaches ~10²³ — past long range,
    * so ANSI sum(long) would throw; Spark's Decimal keeps the
    * compact-long fast path until a partial sum leaves long range and
    * only then falls back to BigDecimal), then ONE exact decimal-point
    * shift per group, nearest-double conversion last — bit-identical to
    * summing the equivalent decimals and casting to double. */
  def sumUnscaled(u: Column, scale: Int): Column =
    (sum(u.cast(DecimalType(28, 0))) *
      lit(java.math.BigDecimal.valueOf(1L, scale))).cast("double")
}
