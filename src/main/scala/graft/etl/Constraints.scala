package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint auditing — the Deequ-style
  * "unit tests for data" pass a pipeline runs before trusting an import
  * batch (the validation step of the reference's import pipeline,
  * `ImportProfile`/row-error reporting at `ImportErrors.scala`,
  * generalized from per-row errors to table-level contracts:
  * completeness, uniqueness, referential integrity, range and
  * set-membership compliance).
  *
  * Scale shape: every constraint on one table compiles into a SINGLE
  * aggregation pass over that table (metrics are aggregate expressions
  * merged into one `agg`, map-side partials, constraint-count-sized
  * result) — never one scan per constraint. Referential checks are the
  * only joins and run as a count over a key anti-join. The audit result
  * is tiny by construction (rows = constraints), so the final union and
  * ordering are driver-trivial. At 100 TB swap the exact
  * `countDistinct` uniqueness metric for `approx_count_distinct` —
  * identical plan shape, bounded state.
  */
object Constraints {

  /** One table-level constraint: an aggregate metric expression and a
    * pass predicate over the computed metric value. */
  final case class Constraint(name: String, metric: Column,
      pass: Column => Column)

  /** Compile a constraint battery against one table: ONE aggregation
    * pass computes every metric, then the single result row explodes to
    * long form (the Profiler.scala discipline). Output per constraint:
    * (constraint_name, metric double, passed int 0/1). */
  def audit(df: DataFrame, cs: Seq[Constraint]): DataFrame = {
    require(cs.nonEmpty, "audit needs at least one constraint")
    val aggs = cs.map(c => c.metric.cast("double").as(c.name))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cs.map(c => struct(
        lit(c.name).as("constraint_name"),
        round(col(c.name), 6).as("metric"),
        c.pass(col(c.name)).cast("int").as("passed"))): _*)).as("s"))
      .select(col("s.*"))
  }

  /** Referential-integrity constraint as a frame: orphan count of `fk`
    * values in `child` with no match in `parent.pk` (NULL fks are not
    * orphans — SQL FK semantics). Anti-join on the key only; at scale
    * this is one shuffle of the child's key column, or a broadcast when
    * the parent key set is dimension-sized. */
  def referential(name: String, child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame = {
    val orphans = child.select(col(fk).as("__fk")).filter(col("__fk").isNotNull)
      .join(parent.select(col(pk).as("__fk")).distinct(),
        Seq("__fk"), "left_anti")
      .agg(count(lit(1)).cast("double").as("m"))
    orphans.select(
      lit(name).as("constraint_name"),
      round(col("m"), 6).as("metric"),
      (col("m") === 0d).cast("int").as("passed"))
  }

  /** Fraction-of-rows-satisfying helper: compliance metrics are exact
    * integer counts divided ONCE at the end (identical operands ⇒
    * bit-identical quotients in both engines). */
  private def fraction(pred: Column): Column =
    sum(pred.cast("long")) / count(lit(1))

  /** q187: the full audit battery over the star schema — customer
    * completeness/uniqueness/range, orders set-membership/positivity,
    * lineitem range compliance, plus orders→customer referential
    * integrity. Mixed passing and failing rows are expected output, not
    * errors: the audit REPORTS, thresholds decide. */
  def constraintAudit(s: SparkSession, dir: String): DataFrame = {
    val cust = audit(Tables.customer(s, dir), Seq(
      Constraint("cust_complete_name",
        fraction(col("c_name").isNotNull), _ === 1d),
      Constraint("cust_unique_custkey",
        countDistinct(col("c_custkey")) / count(lit(1)), _ === 1d),
      Constraint("cust_min_acctbal",
        min(col("c_acctbal")), _ >= -1000d)))
    val ord = audit(Tables.orders(s, dir), Seq(
      Constraint("ord_status_domain",
        fraction(col("o_orderstatus").isin("O", "F", "P")), _ === 1d),
      Constraint("ord_price_positive",
        fraction(col("o_totalprice") > 0d), _ === 1d),
      Constraint("ord_priority_complete",
        fraction(col("o_orderpriority").isNotNull), _ === 1d)))
    val li = audit(Tables.lineitem(s, dir), Seq(
      Constraint("li_qty_range",
        fraction(col("l_quantity").between(1d, 50d)), _ === 1d),
      Constraint("li_discount_range",
        fraction(col("l_discount").between(0d, 0.15d)), _ === 1d)))
    val ref = referential("ord_fk_custkey",
      Tables.orders(s, dir), "o_custkey", Tables.customer(s, dir), "c_custkey")
    cust.unionByName(ord).unionByName(li).unionByName(ref)
      .orderBy(col("constraint_name"))
  }

  private val auditOracle: String =
    """WITH cust AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |         CAST(COUNT(c_name) AS DOUBLE) AS nn_name,
      |         CAST(COUNT(DISTINCT c_custkey) AS DOUBLE) AS nd_key,
      |         MIN(c_acctbal) AS min_bal
      |  FROM customer),
      |ord AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |         CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P')
      |                       THEN 1 ELSE 0 END) AS DOUBLE) AS n_dom,
      |         CAST(SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END)
      |              AS DOUBLE) AS n_pos,
      |         CAST(COUNT(o_orderpriority) AS DOUBLE) AS nn_prio
      |  FROM orders),
      |li AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |         CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50
      |                       THEN 1 ELSE 0 END) AS DOUBLE) AS n_qty,
      |         CAST(SUM(CASE WHEN l_discount BETWEEN 0 AND 0.15
      |                       THEN 1 ELSE 0 END) AS DOUBLE) AS n_disc
      |  FROM lineitem),
      |orph AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS m
      |  FROM orders o
      |  WHERE o.o_custkey IS NOT NULL
      |    AND NOT EXISTS (SELECT 1 FROM customer c
      |                    WHERE c.c_custkey = o.o_custkey))
      |SELECT constraint_name, metric, passed FROM (
      |  SELECT 'cust_complete_name' AS constraint_name,
      |         ROUND(nn_name / n, 6) AS metric,
      |         CAST(nn_name / n = 1.0 AS INT) AS passed FROM cust
      |  UNION ALL
      |  SELECT 'cust_unique_custkey', ROUND(nd_key / n, 6),
      |         CAST(nd_key / n = 1.0 AS INT) FROM cust
      |  UNION ALL
      |  SELECT 'cust_min_acctbal', ROUND(min_bal, 6),
      |         CAST(min_bal >= -1000 AS INT) FROM cust
      |  UNION ALL
      |  SELECT 'ord_status_domain', ROUND(n_dom / n, 6),
      |         CAST(n_dom / n = 1.0 AS INT) FROM ord
      |  UNION ALL
      |  SELECT 'ord_price_positive', ROUND(n_pos / n, 6),
      |         CAST(n_pos / n = 1.0 AS INT) FROM ord
      |  UNION ALL
      |  SELECT 'ord_priority_complete', ROUND(nn_prio / n, 6),
      |         CAST(nn_prio / n = 1.0 AS INT) FROM ord
      |  UNION ALL
      |  SELECT 'li_qty_range', ROUND(n_qty / n, 6),
      |         CAST(n_qty / n = 1.0 AS INT) FROM li
      |  UNION ALL
      |  SELECT 'li_discount_range', ROUND(n_disc / n, 6),
      |         CAST(n_disc / n = 1.0 AS INT) FROM li
      |  UNION ALL
      |  SELECT 'ord_fk_custkey', ROUND(m, 6),
      |         CAST(m = 0 AS INT) FROM orph)
      |ORDER BY constraint_name""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("q187_constraint_audit", (s, d) => constraintAudit(s, d),
      Some(auditOracle)))
}
