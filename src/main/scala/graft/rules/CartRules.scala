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

  /** List-vs-list (`HasListsMatch`), all eight operators. */
  def hasListsMatch(op: ListOp, values: Seq[Long], right: Seq[Long]): Boolean =
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
      currencyId: Long = 1L)

  private def round2(d: JBigDecimal): JBigDecimal =
    d.setScale(2, RoundingMode.HALF_EVEN)

  // ---- the rule set ---------------------------------------------------

  sealed trait CartCond { def eval(ctx: CartContext): Boolean }

  /** `CartTotalRule.cs:35-36`: rounded cart total (zero for an empty
    * cart), scalar operator match. */
  final case class CartTotal(op: NumOp, value: JBigDecimal) extends CartCond {
    def eval(ctx: CartContext): Boolean = {
      val total = ctx.items
        .map(i => i.unitPrice.multiply(JBigDecimal.valueOf(i.quantity.toLong)))
        .foldLeft(JBigDecimal.ZERO)(_ add _)
      matchNum(op, round2(total), value)
    }
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

    /** Column form of one relational condition over `customerStats`. */
    def condColumn(cond: CartCond): Column = cond match {
      case SpentAmount(op, v) => numCol(op, col("spent"), v)
      case OrderCount(op, v) =>
        numCol(op, col("order_cnt"), JBigDecimal.valueOf(v.toLong))
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
