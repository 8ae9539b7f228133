package graft.reports

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional report rollups and statistical data-quality audits
  * over the sales tables — the OLAP `GROUPING SETS` surface the
  * reference's report grids expose one slice at a time (SURVEY §2.5
  * dashboards, e.g. `OrderReportService` pivots), plus the
  * distribution-level audits (Benford, winsorized robust stats,
  * snapshot drift) a warehouse runs to catch data-entry and ingestion
  * anomalies before they poison downstream aggregates.
  */
object Audits {

  /** Sales CUBE (q204): order count and exact revenue over EVERY
    * combination of (market segment × order status) including both
    * marginals and the grand total — one `cube()` instead of four
    * hand-written GROUP BYs.
    *
    * Scale shape: Catalyst plans cube as ONE scan + Expand(4 grouping
    * sets) + a single partial→final hash aggregate — the fact table is
    * read once and shuffled once (carrying 4× pre-aggregated rows, the
    * inherent grouping-set cost), vs four separate scans+shuffles for
    * the per-slice formulation. The customer dimension broadcasts onto
    * orders before the Expand. Money sums are per-element
    * `decimal(18,2)` casts (exact, order-independent), surfaced as
    * doubles; grouping flags disambiguate a real value from a rolled-up
    * level without relying on NULL markers. */
  def salesCube(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderstatus"))
      .agg(
        grouping(col("c_mktsegment")).cast("int").as("g_seg"),
        grouping(col("o_orderstatus")).cast("int").as("g_stat"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_price"))
      .select(
        coalesce(col("c_mktsegment"), lit("ALL")).as("seg"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("stat"),
        col("g_seg"), col("g_stat"), col("n_orders"), col("total_price"))
      .orderBy(col("g_seg"), col("g_stat"), col("seg"), col("stat"))
  }

  private val cubeOracle: String =
    """SELECT COALESCE(c_mktsegment, 'ALL') AS seg,
      |       COALESCE(o_orderstatus, 'ALL') AS stat,
      |       CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
      |       CAST(GROUPING(o_orderstatus) AS INT) AS g_stat,
      |       CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |         AS total_price
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY CUBE (c_mktsegment, o_orderstatus)
      |ORDER BY g_seg, g_stat, seg, stat""".stripMargin

  /** Benford first-digit audit (q211): the leading-digit distribution of
    * order totals against Benford's law — the classic fraud /
    * synthetic-data screen (fabricated or template-generated amounts
    * drift from log₁₀(1+1/d); a large deviation flags the source for
    * review, it does not prove anomaly).
    *
    * Determinism: the first digit comes from the EXACT decimal(18,2)
    * cents rendering (never from a double's string form); observed
    * shares are integer basis points via floor division; the expected
    * shares are pre-quantized literal constants ⌊log₁₀(1+1/d)·10⁴⌋ —
    * no runtime log anywhere, so nothing can drift between engines.
    *
    * Scale shape: one map-side projection (digit extraction) + one
    * 9-row hash aggregate with map-side partials; the total is a 1-row
    * broadcast. Map-only at any corpus size. */
  def benfordAudit(s: SparkSession, dir: String): DataFrame = {
    // ⌊log₁₀(1 + 1/d) · 10⁴⌋ for d = 1..9
    val expBp = Seq(3010, 1760, 1249, 969, 791, 669, 579, 511, 457)
    val expCase = expBp.zipWithIndex
      .map { case (bp, i) => s"WHEN ${i + 1} THEN $bp" }
      .mkString("CASE digit ", " ", " ELSE 0 END")
    val digits = Tables.orders(s, dir)
      .select(substring(
        col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_orders"))
    val total = digits.agg(sum(col("n_orders")).as("total"))
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n_orders"),
        expr("n_orders * 10000 div total").as("obs_bp"),
        expr(expCase).cast("long").as("exp_bp"))
      .withColumn("dev_bp", col("obs_bp") - col("exp_bp"))
      .orderBy(col("digit"))
  }

  private val benfordOracle: String =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS
      |           VARCHAR), 1, 1) AS INT) AS digit,
      |         CAST(COUNT(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY 1),
      |t AS (SELECT SUM(n_orders) AS total FROM d)
      |SELECT digit, n_orders,
      |       CAST(n_orders * 10000 // total AS BIGINT) AS obs_bp,
      |       CAST(CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1760
      |            WHEN 3 THEN 1249 WHEN 4 THEN 969 WHEN 5 THEN 791
      |            WHEN 6 THEN 669 WHEN 7 THEN 579 WHEN 8 THEN 511
      |            WHEN 9 THEN 457 ELSE 0 END AS BIGINT) AS exp_bp,
      |       CAST(n_orders * 10000 // total
      |            - CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1760
      |              WHEN 3 THEN 1249 WHEN 4 THEN 969 WHEN 5 THEN 791
      |              WHEN 6 THEN 669 WHEN 7 THEN 579 WHEN 8 THEN 511
      |              WHEN 9 THEN 457 ELSE 0 END AS BIGINT) AS dev_bp
      |FROM d, t
      |ORDER BY digit""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("q204_sales_cube", (s, d) => salesCube(s, d), Some(cubeOracle)),
    Q("q211_benford_audit", (s, d) => benfordAudit(s, d),
      Some(benfordOracle)))
}
