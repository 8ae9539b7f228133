package graft

import graft.rules.CartRules
import graft.rules.CartRules._
import java.math.{BigDecimal => JBD}
import org.scalatest.funsuite.AnyFunSuite

/** Truth tables for the cart-rule runtime predicates, pinned to the
  * reference semantics (CartRuleProvider.cs:37-131, CompositeRule.cs,
  * Extensions/RuleExpressionExtensions.cs, Impl directory) in the style of
  * its FilterTests. */
class CartRuleSpec extends AnyFunSuite {

  private val cart = CartContext(
    items = Seq(
      CartItem(101L, 2, new JBD("19.99")),   // 39.98
      CartItem(102L, 1, new JBD("100.005")), // 100.005 → rounding matters
      CartItem(103L, 3, new JBD("10.00"))),  // 30.00
    roleIds = Seq(1L, 3L),
    weekday = 0, // Sunday
    completedOrderTotals = Seq(new JBD("100.125"), new JBD("50.00")),
    orderCount = 7)

  test("CartTotal rounds half-even before comparing (CartTotalRule.cs:35-36)") {
    // raw total 169.985 → banker's rounding → 169.98 (not 169.99)
    assert(CartTotal(NumOp.Eq, new JBD("169.98")).eval(cart))
    assert(!CartTotal(NumOp.Eq, new JBD("169.99")).eval(cart))
    assert(CartTotal(NumOp.Ge, new JBD("169.98")).eval(cart))
    assert(!CartTotal(NumOp.Gt, new JBD("169.98")).eval(cart))
    assert(CartTotal(NumOp.Eq, new JBD("0.00")).eval(cart.copy(items = Seq.empty)))
  }

  test("SpentAmount sums completed orders, rounded (SpentAmountRule.cs)") {
    // 150.125 → half-even → 150.12
    assert(SpentAmount(NumOp.Eq, new JBD("150.12")).eval(cart))
    assert(SpentAmount(NumOp.Eq, new JBD("0.00"))
      .eval(cart.copy(completedOrderTotals = Seq.empty)))
  }

  test("scalar operators + counts (OrderCountRule, CartProductCountRule)") {
    assert(OrderCount(NumOp.Eq, 7).eval(cart))
    assert(OrderCount(NumOp.Lt, 8).eval(cart))
    assert(!OrderCount(NumOp.Ne, 7).eval(cart))
    assert(CartProductCount(NumOp.Eq, 6).eval(cart)) // 2+1+3 quantities
  }

  test("HasListMatch: empty list matches all; default value matches none") {
    assert(CartRules.hasListMatch(ListOp.In, 5L, Seq.empty))
    assert(!CartRules.hasListMatch(ListOp.In, 0L, Seq(0L, 1L)))   // default
    assert(CartRules.hasListMatch(ListOp.In, 1L, Seq(0L, 1L)))
    assert(CartRules.hasListMatch(ListOp.NotIn, 5L, Seq(0L, 1L)))
    intercept[IllegalArgumentException] {
      CartRules.hasListMatch(ListOp.Contains, 1L, Seq(1L))
    }
    // Sunday = 0 is a REAL value for WeekdayRule, not a default
    assert(Weekday(Seq(0L, 6L)).eval(cart))
    assert(!Weekday(Seq(1L, 2L)).eval(cart))
  }

  test("HasListsMatch eight operators, incl. the documented edge cases") {
    val values = Seq(3L, 2L, 1L)
    def m(op: ListOp, right: Seq[Long]) = CartRules.hasListsMatch(op, values, right)
    assert(m(ListOp.In, Seq.empty))                     // empty right: true
    // Contains is FALSE for left {3,2,1} vs right {0,1,2,3} (right ⊄ values)
    assert(!m(ListOp.Contains, Seq(0L, 1L, 2L, 3L)))
    assert(m(ListOp.Contains, Seq(1L, 2L)))
    // AllIn is TRUE for left {3,2,1} vs right {0,1,2,3} (values ⊆ right)
    assert(m(ListOp.AllIn, Seq(0L, 1L, 2L, 3L)))
    assert(!m(ListOp.AllIn, Seq(1L, 2L)))
    assert(m(ListOp.IsEqualTo, Seq(1L, 2L, 3L)))
    assert(!m(ListOp.IsEqualTo, Seq(1L, 2L, 4L)))
    assert(m(ListOp.IsNotEqualTo, Seq(1L, 4L)))
    assert(m(ListOp.NotContains, Seq(4L, 5L)))
    assert(!m(ListOp.NotContains, Seq(1L, 5L)))
    assert(m(ListOp.In, Seq(3L, 9L)))
    assert(m(ListOp.NotIn, Seq(1L, 2L)))                // 3 ∉ right
    assert(!m(ListOp.NotIn, Seq(1L, 2L, 3L)))
    assert(m(ListOp.NotAllIn, Seq(4L, 5L)))
    assert(!m(ListOp.NotAllIn, Seq(1L, 5L)))
  }

  test("ProductInCart / RoleIn dispatch through HasListsMatch") {
    assert(ProductInCart(ListOp.In, Seq(102L, 999L)).eval(cart))
    assert(!ProductInCart(ListOp.In, Seq(999L)).eval(cart))
    assert(RoleIn(ListOp.Contains, Seq(1L, 3L)).eval(cart))
    assert(!RoleIn(ListOp.Contains, Seq(1L, 2L)).eval(cart))
    assert(StoreIn(Seq(1L)).eval(cart) && !StoreIn(Seq(2L)).eval(cart))
    assert(CurrencyIn(Seq.empty).eval(cart))
  }

  test("CompositeRule fold: AND/OR short-circuit, empty group false, empty sets true") {
    val t = Leaf(OrderCount(NumOp.Ge, 0))
    val f = Leaf(OrderCount(NumOp.Lt, 0))
    assert(evalExpr(Group(and = true, Seq(t, t)), cart))
    assert(!evalExpr(Group(and = true, Seq(t, f)), cart))
    assert(evalExpr(Group(and = false, Seq(f, t)), cart))
    assert(!evalExpr(Group(and = false, Seq(f, f)), cart))
    assert(!evalExpr(Group(and = true, Seq.empty), cart))  // CompositeRule
    assert(ruleSetsMatch(Seq.empty)(cart))                 // RuleMatchesAsync
    assert(ruleSetsMatch(Seq(f, t), or = true)(cart))
    assert(!ruleSetsMatch(Seq(f, t), or = false)(cart))
    // nesting: (f OR (t AND t))
    assert(evalExpr(Group(and = false, Seq(f, Group(and = true, Seq(t, t)))), cart))
  }

  test("Segment bridge: distributed rule segment == driver-side evaluation") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val rule: CartExpr = Group(and = false, Seq(
      Group(and = true, Seq(
        Leaf(SpentAmount(NumOp.Ge, new JBD(200000))),
        Leaf(OrderCount(NumOp.Ge, 5)))),
      Leaf(SpentAmount(NumOp.Ge, new JBD(800000)))))
    val stats = Segment.customerStats(
      Tables.customer(spark, TestSpark.sfDir), Tables.orders(spark, TestSpark.sfDir))
    val distributed = stats.filter(Segment.exprColumn(rule))
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    // driver twin: same stats rows through the CompositeRule evaluator
    val driverSide = stats.select(col("c_custkey"), col("spent"), col("order_cnt"))
      .collect().filter { r =>
        val ctx = CartContext(
          completedOrderTotals = Seq(JBD.valueOf(r.getDouble(1))),
          orderCount = r.getLong(2).toInt)
        evalExpr(rule, ctx)
      }.map(_.getLong(0)).toSet
    assert(distributed == driverSide && distributed.nonEmpty)
  }

  test("cart-local conditions refuse to segment (by design)") {
    intercept[IllegalArgumentException] {
      Segment.condColumn(CartTotal(NumOp.Ge, new JBD(10)))
    }
  }
}
