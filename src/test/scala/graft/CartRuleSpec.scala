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

  // ---- round-8 breadth: the remaining Impl rules ----------------------

  private val full = cart.copy(
    billingCountryId = 5L,
    shippingCountryId = 0L,            // no shipping address
    ipCountryCode = Some("DE"),
    languageId = 2L,
    selectedPaymentMethod = Some("Payments.Invoice"),
    selectedShippingMethodId = 3L,
    orderPaymentMethods = Seq("Payments.Invoice", "payments.paypal", "Payments.Invoice"),
    cartDiscount = new JBD("10.00"),
    wishlistProductIds = Seq(201L, 202L),
    productCategories = Map(101L -> Seq(11L, 12L), 102L -> Seq(12L)),
    productManufacturers = Map(101L -> Seq(31L), 103L -> Seq(32L)),
    reviewCount = 4,
    rewardPoints = 120,
    purchasedProductIds = Seq(101L, 555L, 101L),
    browser = Some("Chrome"),
    browserMajor = Some(120),
    browserMinor = None,
    device = Some("iPhone"),
    os = Some("iOS"),
    isMobile = true)

  test("country rules: billing matches, missing shipping address never does") {
    assert(BillingCountry(ListOp.In, Seq(5L, 9L)).eval(full))
    assert(!BillingCountry(ListOp.In, Seq(9L)).eval(full))
    assert(BillingCountry(ListOp.NotIn, Seq(9L)).eval(full))
    assert(BillingCountry(ListOp.In, Seq.empty).eval(full))      // empty = all
    // CountryId ?? 0 → the default matches NOTHING, even NotIn
    assert(!ShippingCountry(ListOp.In, Seq(0L, 5L)).eval(full))
    assert(!ShippingCountry(ListOp.NotIn, Seq(9L)).eval(full))
  }

  test("IPCountry / PaymentMethod are case-insensitive; null/empty is default") {
    assert(IpCountry(ListOp.In, Seq("de", "AT")).eval(full))
    assert(!IpCountry(ListOp.In, Seq("FR")).eval(full))
    assert(!IpCountry(ListOp.In, Seq("FR")).eval(full.copy(ipCountryCode = None)))
    assert(!IpCountry(ListOp.NotIn, Seq("FR")).eval(full.copy(ipCountryCode = Some(""))))
    assert(PaymentMethod(ListOp.In, Seq("payments.INVOICE")).eval(full))
    assert(!PaymentMethod(ListOp.In, Seq("payments.paypal")).eval(full))
    assert(Language(ListOp.In, Seq(2L)).eval(full))
    assert(ShippingMethod(ListOp.In, Seq(3L)).eval(full))
    assert(!ShippingMethod(ListOp.In, Seq(3L))
      .eval(full.copy(selectedShippingMethodId = 0L)))           // none selected
  }

  test("PaidBy: In/NotIn are EXISTS over orders; other ops HasListsMatch") {
    assert(PaidBy(ListOp.In, Seq("PAYMENTS.PAYPAL")).eval(full))
    assert(!PaidBy(ListOp.In, Seq("payments.cod")).eval(full))
    // NotIn = ∃ order paid with an UNLISTED method (Any, not All)
    assert(PaidBy(ListOp.NotIn, Seq("payments.invoice")).eval(full)) // paypal order
    assert(!PaidBy(ListOp.NotIn, Seq("payments.invoice", "payments.paypal")).eval(full))
    assert(PaidBy(ListOp.In, Seq.empty).eval(full))
    // fallback: AllIn = used set ⊆ right
    assert(PaidBy(ListOp.AllIn,
      Seq("payments.invoice", "payments.paypal", "payments.cod")).eval(full))
    assert(!PaidBy(ListOp.AllIn, Seq("payments.invoice")).eval(full))
  }

  test("CartSubtotal ignores the discount; CartTotal subtracts it") {
    // subtotal 169.985 → 169.98 banker's; total 159.985 → 159.98
    assert(CartSubtotal(NumOp.Eq, new JBD("169.98")).eval(full))
    assert(CartTotal(NumOp.Eq, new JBD("159.98")).eval(full))
  }

  test("CartItemQuantity: window semantics incl. the false edges") {
    def q(pid: Long, lo: Option[Int], hi: Option[Int]) =
      CartItemQuantity(pid, lo, hi).eval(full)
    assert(q(103L, Some(2), Some(5)))          // qty 3 in [2,5]
    assert(q(103L, Some(3), Some(3)))          // min==max exact
    assert(!q(103L, Some(4), Some(4)))
    assert(q(103L, Some(2), None) && q(103L, None, Some(3)))
    assert(!q(103L, None, None))               // no bounds → false
    assert(!q(999L, Some(1), None))            // not in cart
    assert(!q(0L, Some(1), None))              // unconfigured product
  }

  test("cart-reachable category/manufacturer/wishlist list matches") {
    assert(ProductFromCategoryInCart(ListOp.In, Seq(12L, 99L)).eval(full))
    assert(!ProductFromCategoryInCart(ListOp.In, Seq(99L)).eval(full))
    assert(ProductFromCategoryInCart(ListOp.AllIn, Seq(11L, 12L, 13L)).eval(full))
    assert(ProductFromManufacturerInCart(ListOp.Contains, Seq(31L, 32L)).eval(full))
    assert(ProductOnWishlist(ListOp.In, Seq(202L)).eval(full))
    assert(!ProductOnWishlist(ListOp.In, Seq(203L)).eval(full))
  }

  test("review count / reward points scalar matches") {
    assert(ProductReviewCount(NumOp.Ge, 4).eval(full))
    assert(!ProductReviewCount(NumOp.Gt, 4).eval(full))
    assert(RewardPointsBalance(NumOp.Ge, 100).eval(full))
    assert(!RewardPointsBalance(NumOp.Ge, 121).eval(full))
  }

  test("PurchasedProduct / PurchasedFromManufacturer: EXISTS + fallback") {
    assert(PurchasedProduct(ListOp.In, Seq(101L)).eval(full))
    assert(!PurchasedProduct(ListOp.In, Seq(102L)).eval(full))
    assert(PurchasedProduct(ListOp.NotIn, Seq(101L)).eval(full))  // 555 unlisted
    assert(!PurchasedProduct(ListOp.NotIn, Seq(101L, 555L)).eval(full))
    assert(PurchasedProduct(ListOp.AllIn, Seq(101L, 555L)).eval(full))
    // purchased 101 → manufacturer 31; 555 has no mapping
    assert(PurchasedFromManufacturer(ListOp.In, Seq(31L)).eval(full))
    assert(!PurchasedFromManufacturer(ListOp.In, Seq(32L)).eval(full))
  }

  test("UserAgent family: case-insensitive names, missing version is false") {
    assert(BrowserIn(ListOp.In, Seq("chrome", "Firefox")).eval(full))
    assert(DeviceIn(ListOp.In, Seq("IPHONE")).eval(full))
    assert(OsIn(ListOp.NotIn, Seq("Android")).eval(full))
    assert(BrowserMajorVersion(NumOp.Ge, 100).eval(full))
    assert(!BrowserMinorVersion(NumOp.Ge, 0).eval(full))          // minor missing
    assert(!BrowserMajorVersion(NumOp.Ge, 1).eval(full.copy(browserMajor = None)))
    assert(IsMobile(true).eval(full) && !IsMobile(false).eval(full))
  }

  test("RuleSetRule: missing target skipped, IsEqualTo runs it, IsNotEqualTo negates") {
    val t = Group(and = true, Seq(Leaf(OrderCount(NumOp.Ge, 0))))
    val f = Group(and = true, Seq(Leaf(OrderCount(NumOp.Lt, 0))))
    assert(RuleSetRef(None).eval(full))
    assert(RuleSetRef(Some(t)).eval(full))
    assert(!RuleSetRef(Some(f)).eval(full))
    assert(RuleSetRef(Some(f), negate = true).eval(full))
    // recursion: a set referencing a set referencing a leaf
    assert(RuleSetRef(Some(Group(and = true,
      Seq(Leaf(RuleSetRef(Some(t))), Leaf(IsMobile(true)))))).eval(full))
  }

  test("Segment bridge round 8: profile segment == driver evaluation, rule by rule") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val rule: CartExpr = Group(and = false, Seq(
      Group(and = true, Seq(
        Leaf(BillingCountry(ListOp.In, 1L to 8L)),
        Leaf(PaidBy(ListOp.In, Seq("1-URGENT", "2-HIGH"))),
        Leaf(PurchasedProduct(ListOp.In, 1L to 40L)))),
      Group(and = true, Seq(
        Leaf(SpentAmount(NumOp.Ge, new JBD(900000))),
        Leaf(PaidBy(ListOp.NotIn, Seq("5-LOW")))))))
    val prof = Segment.customerProfile(
      Tables.customer(spark, TestSpark.sfDir),
      Tables.orders(spark, TestSpark.sfDir),
      Tables.lineitem(spark, TestSpark.sfDir))
      .localCheckpoint(true)
    val distributed = prof.filter(Segment.exprColumn(rule))
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val driverSide = prof.select(col("c_custkey"), col("spent"), col("order_cnt"),
      col("country"), col("paid_methods"), col("purchased_parts"))
      .collect().filter { r =>
        val ctx = CartContext(
          completedOrderTotals = Seq(JBD.valueOf(r.getDouble(1))),
          orderCount = r.getLong(2).toInt,
          billingCountryId = r.getLong(3),
          orderPaymentMethods = r.getSeq[String](4),
          purchasedProductIds = r.getSeq[Long](5))
        evalExpr(rule, ctx)
      }.map(_.getLong(0)).toSet
    assert(distributed == driverSide && distributed.nonEmpty)
  }
}
