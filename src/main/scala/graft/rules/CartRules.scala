package graft.rules

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Cart-rule runtime predicates (SURVEY §2.11 / §3.2c — the reference's
  * `IRule` implementations under `Checkout/Rules/Impl`, dispatched
  * and folded by `CartRuleProvider.cs:37-131` + `CompositeRule.cs`).
  *
  * These rules decide per-SESSION questions ("does this customer's cart
  * qualify for the discount?") over data already in hand — a cart of a
  * few dozen lines, the customer's roles, a handful of order totals —
  * so the evaluator is deliberately DRIVER-SIDE Scala over small scalars,
  * exactly as SURVEY §3.2c maps it. Nothing here scans a table: the
  * relational inputs (spent amount, order count) arrive pre-aggregated,
  * and `SegmentRules` (below) is the distributed bridge that computes
  * those aggregates for EVERY customer at once when a rule set is used
  * for segmentation rather than a single checkout.
  *
  * Semantics mirrored from the reference:
  *  - scalar operator match (`RuleOperator.Match`) on rounded decimals —
  *    currency values round HALF-EVEN (.NET `decimal.Round` banker's
  *    default) before comparing, `CartTotalRule.cs:35-36`;
  *  - `HasListMatch` (scalar vs list, Extensions/RuleExpressionExtensions
  *    .cs:14-36): EMPTY right list matches everything; a default/zero
  *    left value matches nothing; In/NotIn;
  *  - `HasListsMatch` (list vs list, :44-88): empty right matches;
  *    IsEqualTo/Contains = right ⊆ values, IsNotEqualTo = ∃ right ∉
  *    values, NotContains = right ∩ values = ∅, In = values ∩ right ≠ ∅,
  *    NotIn = ∃ value ∉ right, AllIn = values ⊆ right, NotAllIn =
  *    values ∩ right = ∅ (from the values side);
  *  - `CompositeRule.MatchAsync`: AND short-circuits on the first false,
  *    OR on the first true; an EMPTY group yields false (the initial
  *    `match` value) while an empty rule-SET array yields true
  *    (`RuleMatchesAsync`, CartRuleProvider.cs:95-101).
  */
object CartRules {

  // ---- operator vocabulary -------------------------------------------

  sealed trait NumOp
  object NumOp {
    case object Eq extends NumOp; case object Ne extends NumOp
    case object Gt extends NumOp; case object Ge extends NumOp
    case object Lt extends NumOp; case object Le extends NumOp
  }

  sealed trait ListOp
  object ListOp {
    case object In extends ListOp; case object NotIn extends ListOp
    case object Contains extends ListOp; case object NotContains extends ListOp
    case object IsEqualTo extends ListOp; case object IsNotEqualTo extends ListOp
    case object AllIn extends ListOp; case object NotAllIn extends ListOp
  }

  def matchNum(op: NumOp, left: JBigDecimal, right: JBigDecimal): Boolean = {
    val c = left.compareTo(right)
    op match {
      case NumOp.Eq => c == 0
      case NumOp.Ne => c != 0
      case NumOp.Gt => c > 0
      case NumOp.Ge => c >= 0
      case NumOp.Lt => c < 0
      case NumOp.Le => c <= 0
    }
  }

  /** Scalar-vs-list (`HasListMatch`): only In/NotIn are legal. */
  def hasListMatch(op: ListOp, value: Long, right: Seq[Long],
      zeroIsDefault: Boolean = true): Boolean =
    if (right.isEmpty) true
    else if (zeroIsDefault && value == 0L) false
    else op match {
      case ListOp.In    => right.contains(value)
      case ListOp.NotIn => !right.contains(value)
      case other => throw new IllegalArgumentException(
        s"operator $other is invalid for a scalar list match")
    }

  /** String form of `HasListMatch` — the reference passes
    * `StringComparer.InvariantCultureIgnoreCase` and a `NullEmpty()`'d
    * value, so null AND empty are the non-matching default. */
  def hasListMatchStr(op: ListOp, value: Option[String], right: Seq[String]): Boolean =
    if (right.isEmpty) true
    else value.filter(_.nonEmpty) match {
      case None => false
      case Some(v) =>
        val in = right.exists(_.equalsIgnoreCase(v))
        op match {
          case ListOp.In    => in
          case ListOp.NotIn => !in
          case other => throw new IllegalArgumentException(
            s"operator $other is invalid for a scalar list match")
        }
    }

  /** List-vs-list (`HasListsMatch`), all eight operators. */
  def hasListsMatch[A](op: ListOp, values: Seq[A], right: Seq[A]): Boolean =
    if (right.isEmpty) true
    else op match {
      case ListOp.IsEqualTo    => right.forall(values.contains)
      case ListOp.IsNotEqualTo => right.exists(v => !values.contains(v))
      case ListOp.Contains     => right.forall(values.contains)
      case ListOp.NotContains  => right.forall(v => !values.contains(v))
      case ListOp.In           => values.exists(right.contains)
      case ListOp.NotIn        => values.exists(v => !right.contains(v))
      case ListOp.AllIn        => values.forall(right.contains)
      case ListOp.NotAllIn     => values.forall(v => !right.contains(v))
    }

  // ---- evaluation context --------------------------------------------

  final case class CartItem(productId: Long, quantity: Int, unitPrice: JBigDecimal)

  /** Everything the reference's `CartRuleContext` reaches through
    * services, pre-resolved to plain values. */
  final case class CartContext(
      items: Seq[CartItem] = Seq.empty,
      roleIds: Seq[Long] = Seq.empty,
      /** `(int)DateTime.Now.DayOfWeek`: Sunday = 0 (`WeekdayRule.cs`). */
      weekday: Int = 0,
      /** Completed-order totals of this customer (`SpentAmountRule.cs`). */
      completedOrderTotals: Seq[JBigDecimal] = Seq.empty,
      /** All standard-filter orders of this customer (`OrderCountRule.cs`). */
      orderCount: Int = 0,
      storeId: Long = 1L,
      currencyId: Long = 1L,
      /** `Customer.BillingAddress?.CountryId ?? 0` (`BillingCountryRule.cs`). */
      billingCountryId: Long = 0L,
      /** `Customer.ShippingAddress?.CountryId ?? 0` (`ShippingCountryRule.cs`). */
      shippingCountryId: Long = 0L,
      /** Geo-resolved ISO code of the client IP (`IPCountryRule.cs`). */
      ipCountryCode: Option[String] = None,
      /** `WorkContext.WorkingLanguage.Id` (`LanguageRule.cs`). */
      languageId: Long = 0L,
      /** Selected checkout attributes (`PaymentMethodRule.cs` /
        * `ShippingMethodRule.cs`). */
      selectedPaymentMethod: Option[String] = None,
      selectedShippingMethodId: Long = 0L,
      /** Payment method of EVERY standard-filter order, in order-id order
        * (`PaidByRule.cs` pages the order table). */
      orderPaymentMethods: Seq[String] = Seq.empty,
      /** Order-level discount applied to the cart: `CartTotalRule` matches
        * the payable total, `CartSubtotalRule` the subtotal WITHOUT
        * discount (`SubtotalWithoutDiscount.RoundedAmount`). */
      cartDiscount: JBigDecimal = JBigDecimal.ZERO,
      /** Distinct product ids on the wishlist (`ProductOnWishlistRule.cs`). */
      wishlistProductIds: Seq[Long] = Seq.empty,
      /** productId → category ids (the `ProductCategories` bridge rows of
        * `ProductFromCategoryInCartRule.cs`). */
      productCategories: Map[Long, Seq[Long]] = Map.empty,
      /** productId → manufacturer ids (`ProductFromManufacturerInCartRule.cs`). */
      productManufacturers: Map[Long, Seq[Long]] = Map.empty,
      /** Approved product reviews by this customer (`ProductReviewCountRule.cs`). */
      reviewCount: Int = 0,
      /** `Customer.GetRewardPointsBalance()` (`RewardPointsBalanceRule.cs`). */
      rewardPoints: Int = 0,
      /** Product ids across all order items of the customer's orders
        * (`PurchasedProductRule.cs`). */
      purchasedProductIds: Seq[Long] = Seq.empty,
      /** Parsed user agent (UserAgent rule family); None = not detected. */
      browser: Option[String] = None,
      browserMajor: Option[Int] = None,
      browserMinor: Option[Int] = None,
      device: Option[String] = None,
      os: Option[String] = None,
      isMobile: Boolean = false)

  private def round2(d: JBigDecimal): JBigDecimal =
    d.setScale(2, RoundingMode.HALF_EVEN)

  // ---- the rule set ---------------------------------------------------

  sealed trait CartCond { def eval(ctx: CartContext): Boolean }

  private def subtotalOf(ctx: CartContext): JBigDecimal = ctx.items
    .map(i => i.unitPrice.multiply(JBigDecimal.valueOf(i.quantity.toLong)))
    .foldLeft(JBigDecimal.ZERO)(_ add _)

  /** `CartTotalRule.cs:35-36`: rounded PAYABLE cart total (subtotal minus
    * order discount; zero for an empty cart), scalar operator match. */
  final case class CartTotal(op: NumOp, value: JBigDecimal) extends CartCond {
    def eval(ctx: CartContext): Boolean =
      matchNum(op, round2(subtotalOf(ctx).subtract(ctx.cartDiscount)), value)
  }

  /** `CartSubtotalRule.cs:40-46`: the subtotal WITHOUT discount
    * (`SubtotalWithoutDiscount.RoundedAmount`), rounded before matching
    * "because otherwise unexpected results may occur". */
  final case class CartSubtotal(op: NumOp, value: JBigDecimal) extends CartCond {
    def eval(ctx: CartContext): Boolean =
      matchNum(op, round2(subtotalOf(ctx)), value)
  }

  /** `CartProductCountRule.cs`: total quantity across lines. */
  final case class CartProductCount(op: NumOp, value: Int) extends CartCond {
    def eval(ctx: CartContext): Boolean =
      matchNum(op, JBigDecimal.valueOf(ctx.items.map(_.quantity.toLong).sum),
        JBigDecimal.valueOf(value.toLong))
  }

  /** `ProductInCartRule.cs`: distinct product ids vs the rule list. */
  final case class ProductInCart(op: ListOp, productIds: Seq[Long]) extends CartCond {
    def eval(ctx: CartContext): Boolean =
      hasListsMatch(op, ctx.items.map(_.productId).distinct, productIds)
  }

  /** `CustomerRoleRule.cs`: role ids vs the rule list. */
  final case class RoleIn(op: ListOp, roleIds: Seq[Long]) extends CartCond {
    def eval(ctx: CartContext): Boolean =
      hasListsMatch(op, ctx.roleIds, roleIds)
  }

  /** `WeekdayRule.cs`: scalar weekday vs list (Sunday = 0). The date
    * window a campaign needs is this plus a bounds check at a higher
    * level in the reference; weekday is the IRule form. */
  final case class Weekday(days: Seq[Long]) extends CartCond {
    def eval(ctx: CartContext): Boolean =
      // 0 (Sunday) is a real weekday, not a default/missing value
      hasListMatch(ListOp.In, ctx.weekday.toLong, days, zeroIsDefault = false)
  }

  /** `SpentAmountRule.cs`: rounded sum of completed-order totals. */
  final case class SpentAmount(op: NumOp, value: JBigDecimal) extends CartCond {
    def eval(ctx: CartContext): Boolean =
      matchNum(op,
        round2(ctx.completedOrderTotals.foldLeft(JBigDecimal.ZERO)(_ add _)),
        value)
  }

  /** `OrderCountRule.cs`: count of the customer's orders. */
  final case class OrderCount(op: NumOp, value: Int) extends CartCond {
    def eval(ctx: CartContext): Boolean =
      matchNum(op, JBigDecimal.valueOf(ctx.orderCount.toLong),
        JBigDecimal.valueOf(value.toLong))
  }

  /** `StoreRule.cs` / `CurrencyRule.cs`: scalar id vs list. */
  final case class StoreIn(ids: Seq[Long]) extends CartCond {
    def eval(ctx: CartContext): Boolean = hasListMatch(ListOp.In, ctx.storeId, ids)
  }
  final case class CurrencyIn(ids: Seq[Long]) extends CartCond {
    def eval(ctx: CartContext): Boolean = hasListMatch(ListOp.In, ctx.currencyId, ids)
  }

  /** `BillingCountryRule.cs` / `ShippingCountryRule.cs`: the address's
    * country id (0 when no address) vs the rule list. */
  final case class BillingCountry(op: ListOp, ids: Seq[Long]) extends CartCond {
    def eval(ctx: CartContext): Boolean = hasListMatch(op, ctx.billingCountryId, ids)
  }
  final case class ShippingCountry(op: ListOp, ids: Seq[Long]) extends CartCond {
    def eval(ctx: CartContext): Boolean = hasListMatch(op, ctx.shippingCountryId, ids)
  }

  /** `IPCountryRule.cs`: geo-resolved ISO code, case-insensitive. */
  final case class IpCountry(op: ListOp, codes: Seq[String]) extends CartCond {
    def eval(ctx: CartContext): Boolean = hasListMatchStr(op, ctx.ipCountryCode, codes)
  }

  /** `LanguageRule.cs`: working-language id vs list. */
  final case class Language(op: ListOp, ids: Seq[Long]) extends CartCond {
    def eval(ctx: CartContext): Boolean = hasListMatch(op, ctx.languageId, ids)
  }

  /** `PaymentMethodRule.cs`: the SELECTED payment method (a per-store
    * generic attribute), case-insensitive string list match. */
  final case class PaymentMethod(op: ListOp, methods: Seq[String]) extends CartCond {
    def eval(ctx: CartContext): Boolean =
      hasListMatchStr(op, ctx.selectedPaymentMethod, methods)
  }

  /** `ShippingMethodRule.cs`: selected shipping method id (0 = none). */
  final case class ShippingMethod(op: ListOp, ids: Seq[Long]) extends CartCond {
    def eval(ctx: CartContext): Boolean =
      hasListMatch(op, ctx.selectedShippingMethodId, ids)
  }

  /** `PaidByRule.cs`: payment methods used across the customer's ORDERS.
    * In = any order paid with a listed method; NotIn = any order paid
    * with an UNLISTED method (the reference's `Any`, not `All`); every
    * other operator runs `HasListsMatch` over the distinct used set
    * (case-insensitive throughout). */
  final case class PaidBy(op: ListOp, methods: Seq[String]) extends CartCond {
    def eval(ctx: CartContext): Boolean = {
      val used = ctx.orderPaymentMethods.map(_.toLowerCase)
      val right = methods.map(_.toLowerCase)
      op match {
        case _ if right.isEmpty => true
        case ListOp.In    => used.exists(right.contains)
        case ListOp.NotIn => used.exists(m => !right.contains(m))
        case other        => hasListsMatch(other, used.distinct, right)
      }
    }
  }

  /** `CartItemQuantityRule.cs`: quantity of ONE product across its cart
    * lines vs an optional [min, max] window — false when the product is
    * missing, quantity is zero, or no bound is configured; min == max is
    * an exact match. */
  final case class CartItemQuantity(productId: Long, minQuantity: Option[Int],
      maxQuantity: Option[Int]) extends CartCond {
    def eval(ctx: CartContext): Boolean = {
      if (productId == 0L) return false
      val quantity = ctx.items.filter(_.productId == productId).map(_.quantity).sum
      if (quantity == 0) return false
      (minQuantity, maxQuantity) match {
        case (Some(lo), Some(hi)) =>
          if (lo == hi) quantity == lo else quantity >= lo && quantity <= hi
        case (Some(lo), None) => quantity >= lo
        case (None, Some(hi)) => quantity <= hi
        case (None, None)     => false
      }
    }
  }

  /** `ProductFromCategoryInCartRule.cs` / `ProductFromManufacturerInCart
    * Rule.cs`: the distinct category/manufacturer ids reachable from the
    * cart's products vs the rule list. */
  final case class ProductFromCategoryInCart(op: ListOp, categoryIds: Seq[Long])
      extends CartCond {
    def eval(ctx: CartContext): Boolean =
      hasListsMatch(op,
        ctx.items.flatMap(i => ctx.productCategories.getOrElse(i.productId, Seq.empty))
          .distinct, categoryIds)
  }
  final case class ProductFromManufacturerInCart(op: ListOp, manufacturerIds: Seq[Long])
      extends CartCond {
    def eval(ctx: CartContext): Boolean =
      hasListsMatch(op,
        ctx.items.flatMap(i => ctx.productManufacturers.getOrElse(i.productId, Seq.empty))
          .distinct, manufacturerIds)
  }

  /** `ProductOnWishlistRule.cs`: distinct wishlist product ids vs list. */
  final case class ProductOnWishlist(op: ListOp, productIds: Seq[Long]) extends CartCond {
    def eval(ctx: CartContext): Boolean =
      hasListsMatch(op, ctx.wishlistProductIds.distinct, productIds)
  }

  /** `ProductReviewCountRule.cs`: approved-review count, scalar match. */
  final case class ProductReviewCount(op: NumOp, value: Int) extends CartCond {
    def eval(ctx: CartContext): Boolean =
      matchNum(op, JBigDecimal.valueOf(ctx.reviewCount.toLong),
        JBigDecimal.valueOf(value.toLong))
  }

  /** `RewardPointsBalanceRule.cs`: points balance, scalar match. */
  final case class RewardPointsBalance(op: NumOp, value: Int) extends CartCond {
    def eval(ctx: CartContext): Boolean =
      matchNum(op, JBigDecimal.valueOf(ctx.rewardPoints.toLong),
        JBigDecimal.valueOf(value.toLong))
  }

  /** `PurchasedProductRule.cs`: product ids across all order items.
    * Same In / NotIn / fallback split as `PaidBy`. */
  final case class PurchasedProduct(op: ListOp, productIds: Seq[Long]) extends CartCond {
    def eval(ctx: CartContext): Boolean = op match {
      case _ if productIds.isEmpty => true
      case ListOp.In    => ctx.purchasedProductIds.exists(productIds.contains)
      case ListOp.NotIn => ctx.purchasedProductIds.exists(p => !productIds.contains(p))
      case other        => hasListsMatch(other, ctx.purchasedProductIds.distinct, productIds)
    }
  }

  /** `PurchasedFromManufacturerRule.cs`: manufacturer ids reachable from
    * purchased products (order items → product → manufacturers). */
  final case class PurchasedFromManufacturer(op: ListOp, manufacturerIds: Seq[Long])
      extends CartCond {
    def eval(ctx: CartContext): Boolean = {
      val manus = ctx.purchasedProductIds
        .flatMap(p => ctx.productManufacturers.getOrElse(p, Seq.empty))
      op match {
        case _ if manufacturerIds.isEmpty => true
        case ListOp.In    => manus.exists(manufacturerIds.contains)
        case ListOp.NotIn => manus.exists(m => !manufacturerIds.contains(m))
        case other        => hasListsMatch(other, manus.distinct, manufacturerIds)
      }
    }
  }

  /** UserAgent rule family (Impl UserAgent directory): family names are
    * case-insensitive list matches; version rules are FALSE when the
    * version is missing/unparsable; IsMobile is a plain boolean match. */
  final case class BrowserIn(op: ListOp, names: Seq[String]) extends CartCond {
    def eval(ctx: CartContext): Boolean = hasListMatchStr(op, ctx.browser, names)
  }
  final case class DeviceIn(op: ListOp, names: Seq[String]) extends CartCond {
    def eval(ctx: CartContext): Boolean = hasListMatchStr(op, ctx.device, names)
  }
  final case class OsIn(op: ListOp, names: Seq[String]) extends CartCond {
    def eval(ctx: CartContext): Boolean = hasListMatchStr(op, ctx.os, names)
  }
  final case class BrowserMajorVersion(op: NumOp, value: Int) extends CartCond {
    def eval(ctx: CartContext): Boolean = ctx.browserMajor.exists(v =>
      matchNum(op, JBigDecimal.valueOf(v.toLong), JBigDecimal.valueOf(value.toLong)))
  }
  final case class BrowserMinorVersion(op: NumOp, value: Int) extends CartCond {
    def eval(ctx: CartContext): Boolean = ctx.browserMinor.exists(v =>
      matchNum(op, JBigDecimal.valueOf(v.toLong), JBigDecimal.valueOf(value.toLong)))
  }
  final case class IsMobile(value: Boolean) extends CartCond {
    def eval(ctx: CartContext): Boolean = ctx.isMobile == value
  }

  /** `RuleSetRule.cs`: a rule that references ANOTHER rule set. A
    * missing/unresolvable target is skipped (true, "Skip\ignore
    * expression"); IsEqualTo evaluates the target, IsNotEqualTo negates
    * it (any other operator is invalid in the reference). The reference
    * resolves the id through the provider at match time; here the target
    * arrives pre-resolved as an expression tree, so reference cycles
    * cannot be constructed and the recursion is structurally bounded. */
  final case class RuleSetRef(target: Option[CartExpr], negate: Boolean = false)
      extends CartCond {
    def eval(ctx: CartContext): Boolean = target match {
      case None    => true
      case Some(e) => negate != evalExpr(e, ctx)
    }
  }

  // ---- composition (CompositeRule / RuleMatchesAsync) ------------------

  sealed trait CartExpr
  final case class Leaf(cond: CartCond) extends CartExpr
  /** `and = true` → LogicalRuleOperator.And, else Or. */
  final case class Group(and: Boolean, exprs: Seq[CartExpr]) extends CartExpr

  /** `CompositeRule.MatchAsync`: sequential fold with short-circuit; the
    * result is the LAST evaluated member — an empty group is false. */
  def evalExpr(expr: CartExpr, ctx: CartContext): Boolean = expr match {
    case Leaf(c) => c.eval(ctx)
    case Group(and, exprs) =>
      var m = false
      val it = exprs.iterator
      var break = false
      while (it.hasNext && !break) {
        m = evalExpr(it.next(), ctx)
        if (!m && and) break = true
        if (m && !and) break = true
      }
      m
  }

  /** `CartRuleProvider.RuleMatchesAsync`: NO rule sets means no
    * constraint (true); otherwise the groups fold under the given
    * operator exactly like a group's members. */
  def ruleSetsMatch(groups: Seq[CartExpr], or: Boolean = true)(
      ctx: CartContext): Boolean =
    if (groups.isEmpty) true
    else evalExpr(Group(and = !or, groups), ctx)

  // ---- distributed bridge ----------------------------------------------

  /** The SCALE form of the relational cart rules: when a rule set
    * segments CUSTOMERS (target groups / campaign audiences) instead of
    * deciding one checkout, evaluating it per customer driver-side would
    * be a collect-and-loop — so the relational conditions compile to
    * Catalyst Columns over a per-customer stats frame and the whole
    * segment materializes in one distributed pass (one aggregate over
    * orders, one broadcast-or-shuffle join back to customers). Cart-local
    * conditions (cart total, product-in-cart) have no meaning outside a
    * session and are rejected here by design. */
  object Segment {
    import org.apache.spark.sql.{Column, DataFrame}
    import org.apache.spark.sql.functions._

    /** Per-customer stats: `spent` = exact decimal sum of completed
      * ('F') order totals (cast to double at the boundary), `order_cnt` =
      * all orders — the `SpentAmountRule` / `OrderCountRule` aggregates
      * for every customer at once. */
    def customerStats(customer: DataFrame, orders: DataFrame): DataFrame = {
      val agg = orders.groupBy(col("o_custkey")).agg(
        sum(when(col("o_orderstatus") === "F",
          col("o_totalprice").cast("decimal(18,2)"))).as("__spent"),
        count(lit(1)).as("__cnt"))
      customer.join(agg, customer("c_custkey") === agg("o_custkey"), "left")
        .drop("o_custkey")
        .withColumn("spent",
          coalesce(col("__spent"), lit(0).cast("decimal(18,2)")).cast("double"))
        .withColumn("order_cnt", coalesce(col("__cnt"), lit(0L)))
        .drop("__spent", "__cnt")
    }

    private def numCol(op: NumOp, left: Column, right: JBigDecimal): Column = {
      val r = lit(right.doubleValue)
      op match {
        case NumOp.Eq => left === r
        case NumOp.Ne => left =!= r
        case NumOp.Gt => left > r
        case NumOp.Ge => left >= r
        case NumOp.Lt => left < r
        case NumOp.Le => left <= r
      }
    }

    /** Per-customer PROFILE: `customerStats` plus the relational inputs
      * of the round-8 rules, mapped onto the star schema —
      * `country` = c_nationkey (the address-country analog),
      * `paid_methods` = distinct o_orderpriority values (the per-order
      * payment-method analog of `PaidByRule`), `purchased_parts` =
      * distinct l_partkey across the customer's order items
      * (`PurchasedProductRule`). Two key-partitioned aggregates (orders,
      * lineitem⋈orders) joined back to customers — the collect_sets are
      * bounded by a customer's own purchase history, the same bound the
      * reference's 4000-row pager relies on, so no key grows with the
      * corpus. */
    def customerProfile(customer: DataFrame, orders: DataFrame,
        lineitem: DataFrame): DataFrame = {
      val byOrder = orders.groupBy(col("o_custkey")).agg(
        sum(when(col("o_orderstatus") === "F",
          col("o_totalprice").cast("decimal(18,2)"))).as("__spent"),
        count(lit(1)).as("__cnt"),
        collect_set(col("o_orderpriority")).as("__paid"))
      val byItem = lineitem
        .join(orders.select(col("o_orderkey"), col("o_custkey").as("__ck")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("__ck"))
        .agg(collect_set(col("l_partkey")).as("__parts"))
      customer
        .join(byOrder, customer("c_custkey") === byOrder("o_custkey"), "left")
        .drop("o_custkey")
        .join(byItem, customer("c_custkey") === col("__ck"), "left")
        .drop("__ck")
        .withColumn("spent",
          coalesce(col("__spent"), lit(0).cast("decimal(18,2)")).cast("double"))
        .withColumn("order_cnt", coalesce(col("__cnt"), lit(0L)))
        .withColumn("country", col("c_nationkey").cast("long"))
        .withColumn("paid_methods",
          coalesce(col("__paid"), array().cast("array<string>")))
        .withColumn("purchased_parts",
          coalesce(col("__parts"), array().cast("array<bigint>")))
        .drop("__spent", "__cnt", "__paid", "__parts")
    }

    /** Same contract as the driver's `hasListMatch`: empty list matches
      * everything, the zero/default value (`CountryId ?? 0` = no address)
      * matches NOTHING, null folds to false. */
    private def listMatchCol(op: ListOp, value: Column, ids: Seq[Long]): Column =
      if (ids.isEmpty) lit(true)
      else {
        val in = value.isin(ids: _*)
        val res = op match {
          case ListOp.In    => in
          case ListOp.NotIn => !in
          case other => throw new IllegalArgumentException(
            s"operator $other is invalid for a scalar list match")
        }
        coalesce(value =!= 0 && res, lit(false))
      }

    /** In = ∃ element ∈ list, NotIn = ∃ element ∉ list — the exact
      * `Any()`-based semantics of `PaidByRule`/`PurchasedProductRule`,
      * as array ops on the profile's collected sets (no extra join). */
    private def existsMatchCol[A](op: ListOp, arr: Column, vals: Seq[A],
        asLit: Seq[A] => Column): Column =
      if (vals.isEmpty) lit(true)
      else op match {
        case ListOp.In    => arrays_overlap(arr, asLit(vals))
        case ListOp.NotIn => size(array_except(arr, asLit(vals))) > 0
        case other => throw new IllegalArgumentException(
          s"operator $other has no distributed form here (driver evaluator covers it)")
      }

    /** Column form of one relational condition over `customerProfile`
      * (the original pair needs only `customerStats`). */
    def condColumn(cond: CartCond): Column = cond match {
      case SpentAmount(op, v) => numCol(op, col("spent"), v)
      case OrderCount(op, v) =>
        numCol(op, col("order_cnt"), JBigDecimal.valueOf(v.toLong))
      case BillingCountry(op, ids)  => listMatchCol(op, col("country"), ids)
      case ShippingCountry(op, ids) => listMatchCol(op, col("country"), ids)
      case PaidBy(op, methods) =>
        existsMatchCol[String](op, col("paid_methods"), methods,
          vs => array(vs.map(lit): _*))
      case PurchasedProduct(op, ids) =>
        existsMatchCol[Long](op, col("purchased_parts"), ids,
          vs => array(vs.map(lit): _*))
      case other => throw new IllegalArgumentException(
        s"$other is cart-session-local; it cannot segment customers")
    }

    /** Column form of a composed expression. The short-circuit fold and
      * the boolean fold agree on every input, and an empty group is
      * `false` exactly like `CompositeRule`'s initial match value. */
    def exprColumn(expr: CartExpr): Column = expr match {
      case Leaf(c) => condColumn(c)
      case Group(and, exprs) =>
        exprs.map(exprColumn)
          .reduceOption((a: Column, b: Column) => if (and) a && b else a || b)
          .getOrElse(lit(false))
    }
  }
}
