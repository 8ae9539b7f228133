package graft.streaming

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer-lifecycle and behavioral-sequence analytics: the life-table /
  * transition-matrix / concurrency rollups a retention team runs on top
  * of the same event and order history the reference's dashboards read
  * (SURVEY §2.5; `CustomerReportService` new-vs-returning slices,
  * generalized to proper survival and Markov form).
  */
object Lifecycle {

  /** Discrete-time churn life table (q202): per 30-day "month" k since
    * first order, how many customers' purchasing lifetime ENDED at k
    * (last order k months after their first) out of those still at risk
    * (lifetime ≥ k), with the hazard rate in integer basis points — the
    * actuarial life-table form of churn (each customer is one complete
    * observation; the generator's window has no censoring mechanism, so
    * no censored column exists to model).
    *
    * Determinism: lifetime is `datediff(day) div 30` — integer floor
    * division; hazards are `ended·10⁴ div at_risk` — exact at any
    * parallelism, identical in DuckDB (`//`).
    *
    * Scale shape: ONE custkey-keyed aggregate (map-side partial
    * min/max) reduces orders to a per-customer row; the lifetime
    * histogram is calendar-bounded (≤ a few hundred rows at ANY corpus
    * size), and the at-risk reverse cumulative sum is a window over
    * THAT histogram — never a corpus-wide window (plan-asserted). */
  def churnLifeTable(s: SparkSession, dir: String): DataFrame = {
    val life = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("first_o"), max(col("o_orderdate")).as("last_o"))
      .select(expr("datediff(last_o, first_o) div 30").as("month_k"))
      .groupBy(col("month_k")).agg(count(lit(1)).as("n_ended"))
    life
      .withColumn("n_at_risk", sum(col("n_ended")).over(
        Window.orderBy(col("month_k").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("month_k").cast("int").as("month_k"), col("n_ended"),
        col("n_at_risk"),
        expr("n_ended * 10000 div n_at_risk").as("hazard_bp"))
      .orderBy(col("month_k"))
  }

  private val lifeTableOracle: String =
    """WITH cl AS (
      |  SELECT date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) // 30
      |           AS month_k
      |  FROM orders GROUP BY o_custkey),
      |h AS (SELECT month_k, CAST(COUNT(*) AS BIGINT) AS n_ended
      |      FROM cl GROUP BY month_k)
      |SELECT CAST(month_k AS INT) AS month_k, n_ended,
      |       CAST(SUM(n_ended) OVER (ORDER BY month_k DESC
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |            AS BIGINT) AS n_at_risk,
      |       CAST(n_ended * 10000 // SUM(n_ended) OVER (ORDER BY month_k DESC
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |            AS BIGINT) AS hazard_bp
      |FROM h
      |ORDER BY month_k""".stripMargin

  /** First-order Markov transition matrix (q203) over in-session event
    * sequences: P(next = b | current = a) in integer basis points, next
    * to the unconditional base rate of b — the (p − base) delta is the
    * behavioral lift a next-action model would exploit. Transitions
    * never cross the 30-minute session boundary (q39/q186 semantics).
    *
    * Scale shape: sessionization and the LEAD ride ONE user-keyed
    * exchange (plan-asserted); everything downstream operates on the
    * transition MATRIX — |event types|² rows at any corpus size — via
    * broadcast joins of its own marginals. */
  def markovTransitions(s: SparkSession, dir: String, k: Int = 25): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val trans = Tables.events(s, dir)
      .withColumn("new_s",
        when(unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(w)
          > 1800000L, 1).otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(wRun))
      .withColumn("nxt", lead(col("event_type"), 1).over(
        Window.partitionBy(col("user_id"), col("sid"))
          .orderBy(col("ts"), col("event_id"))))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // consumers: row marginal, col marginal, total
    val rowTot = trans.groupBy(col("cur")).agg(sum(col("cnt")).as("row_tot"))
    val colTot = trans.groupBy(col("nxt")).agg(sum(col("cnt")).as("col_tot"))
    val total = trans.agg(sum(col("cnt")).as("tot"))
    trans.join(broadcast(rowTot), Seq("cur"))
      .join(broadcast(colTot), Seq("nxt"))
      .crossJoin(broadcast(total))
      .select(col("cur"), col("nxt"), col("cnt"),
        expr("cnt * 10000 div row_tot").as("p_bp"),
        expr("col_tot * 10000 div tot").as("base_bp"))
      .withColumn("delta_bp", col("p_bp") - col("base_bp"))
      .orderBy(col("cnt").desc, col("cur"), col("nxt"))
      .limit(k)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("cnt").desc, col("cur"), col("nxt"))))
      .orderBy(col("rn"))
  }

  private def markovOracle(k: Int = 25): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, ts, event_type,
       |         CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts)) OVER
       |                (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
       |              THEN 1 ELSE 0 END AS new_s
       |  FROM events),
       |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
       |        ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |      FROM e),
       |tr AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |         SELECT event_type AS cur,
       |                LEAD(event_type, 1) OVER (PARTITION BY user_id, sid
       |                  ORDER BY ts, event_id) AS nxt
       |         FROM s) t
       |       WHERE nxt IS NOT NULL GROUP BY cur, nxt),
       |rt AS (SELECT cur, SUM(cnt) AS row_tot FROM tr GROUP BY cur),
       |ct AS (SELECT nxt, SUM(cnt) AS col_tot FROM tr GROUP BY nxt),
       |tot AS (SELECT SUM(cnt) AS tot FROM tr)
       |SELECT cur, nxt, cnt, p_bp, base_bp, delta_bp, rn FROM (
       |  SELECT tr.cur, tr.nxt, tr.cnt,
       |         CAST(tr.cnt * 10000 // rt.row_tot AS BIGINT) AS p_bp,
       |         CAST(ct.col_tot * 10000 // tot.tot AS BIGINT) AS base_bp,
       |         CAST(tr.cnt * 10000 // rt.row_tot
       |              - ct.col_tot * 10000 // tot.tot AS BIGINT) AS delta_bp,
       |         CAST(ROW_NUMBER() OVER (ORDER BY tr.cnt DESC, tr.cur, tr.nxt)
       |              AS INT) AS rn
       |  FROM tr JOIN rt ON tr.cur = rt.cur
       |          JOIN ct ON tr.nxt = ct.nxt, tot) t
       |WHERE rn <= $k
       |ORDER BY rn""".stripMargin

  /** Interval-coverage concurrency (q212): per day, the PEAK number of
    * simultaneously-active user sessions and the first minute reaching
    * it — the capacity-planning rollup over the q39 session intervals.
    *
    * Scale shape — the point of the operator: naive peak-concurrency is
    * an interval self-join (quadratic in concurrent sessions) or a
    * GLOBALLY-ordered running sum over start/end deltas (a corpus-wide
    * single-partition window). Instead each session interval EXPLODES to
    * its covered minute buckets (bounded by session length — the
    * sessionize gap caps idle stretches, so rows-out is O(active
    * minutes), linear); concurrency is then ONE minute-keyed hash
    * aggregate with map-side partials, and the per-day peak+argmin is a
    * day-keyed struct-max aggregate over the minute HISTOGRAM
    * (calendar-bounded). Same bucket-decomposition discipline as the
    * q74 range join, applied to interval aggregation. */
  def sessionConcurrency(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = Tables.events(s, dir)
      .withColumn("new_s",
        when(unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(w)
          > 1800000L, 1).otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(wRun))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("ts_min"), max(col("ts")).as("ts_max"))
      .select(expr("unix_millis(ts_min) div 60000").as("m_start"),
        expr("unix_millis(ts_max) div 60000").as("m_end"))
    val perMinute = sessions
      .select(explode(sequence(col("m_start"), col("m_end"))).as("m"))
      .groupBy(col("m")).agg(count(lit(1)).as("conc"))
    perMinute
      .select(date_format(timestamp_millis(col("m") * 60000L), "yyyy-MM-dd")
        .as("day"), col("m"), col("conc"))
      .groupBy(col("day"))
      .agg(max(struct(col("conc"), (-col("m")).as("nm"))).as("pk"))
      .select(col("day"), col("pk.conc").as("peak_sessions"),
        date_format(timestamp_millis(-col("pk.nm") * 60000L),
          "yyyy-MM-dd HH:mm").as("peak_at"))
      .orderBy(col("day"))
  }

  private val concurrencyOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, ts,
      |         CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts)) OVER
      |                (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |      FROM e),
      |iv AS (SELECT user_id, sid,
      |              epoch_ms(MIN(ts)) // 60000 AS m_start,
      |              epoch_ms(MAX(ts)) // 60000 AS m_end
      |       FROM s GROUP BY user_id, sid),
      |pm AS (SELECT u.m, CAST(COUNT(*) AS BIGINT) AS conc
      |       FROM iv, UNNEST(range(iv.m_start, iv.m_end + 1)) AS u(m)
      |       GROUP BY u.m)
      |SELECT strftime(make_timestamp(m * 60000000), '%Y-%m-%d') AS day,
      |       conc AS peak_sessions,
      |       strftime(make_timestamp(m * 60000000), '%Y-%m-%d %H:%M') AS peak_at
      |FROM pm
      |QUALIFY ROW_NUMBER() OVER (
      |  PARTITION BY strftime(make_timestamp(m * 60000000), '%Y-%m-%d')
      |  ORDER BY conc DESC, m) = 1
      |ORDER BY day""".stripMargin

  /** A/B experiment report (q218): users assigned to two arms by the md5
    * parity of user_id (the deterministic hash assignment an
    * experimentation platform uses — no RNG, stable across reruns and
    * engines), conversion = the user ever fired a purchase event; the
    * report carries both arms' exact counts, rates in basis points, and
    * the two-proportion z² statistic with a 95% significance flag.
    *
    * Determinism: z² = d²·N / (n_a·n_b·c·(N−c)) with d = conv_a·n_b −
    * conv_b·n_a — every factor an EXACT long (d < 2⁶³ through ~3·10⁹
    * users per arm), combined in ONE double expression with the same
    * tree in both engines, so the rounded statistic cannot drift. The
    * degenerate no-conversion/all-conversion corpus short-circuits to
    * z² = 0 (the statistic is undefined there; 0/0 NaN would be
    * engine-unstable).
    *
    * Scale shape: ONE user-keyed aggregate reduces events to per-user
    * conversion flags (map-side partial max); arm assignment is a
    * map-side md5; everything after runs on the 2-row arm table. */
  def abTestReport(s: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("conv"))
      .select(col("conv"),
        substring(md5(col("user_id").cast("string")), 32, 1)
          .isin("0", "2", "4", "6", "8", "a", "c", "e").cast("int").as("arm"))
    val zExpr =
      """CASE WHEN conv_a + conv_b = 0
        |       OR conv_a + conv_b = n_a + n_b THEN 0.0
        |     ELSE round(
        |       cast(conv_a * n_b - conv_b * n_a as double)
        |       * cast(conv_a * n_b - conv_b * n_a as double)
        |       * cast(n_a + n_b as double)
        |       / (cast(n_a as double) * cast(n_b as double)
        |          * cast(conv_a + conv_b as double)
        |          * cast(n_a + n_b - conv_a - conv_b as double)), 4)
        |END""".stripMargin
    users.groupBy(col("arm")).agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
      .agg(sum(when(col("arm") === 1, col("n"))).as("n_a"),
        sum(when(col("arm") === 1, col("c"))).as("conv_a"),
        sum(when(col("arm") === 0, col("n"))).as("n_b"),
        sum(when(col("arm") === 0, col("c"))).as("conv_b"))
      .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        expr("conv_a * 10000 div n_a").as("rate_a_bp"),
        expr("conv_b * 10000 div n_b").as("rate_b_bp"))
      .withColumn("diff_bp", col("rate_a_bp") - col("rate_b_bp"))
      .withColumn("z2_4dp", expr(zExpr))
      .withColumn("significant", (col("z2_4dp") > 3.8416).cast("int"))
  }

  private val abTestOracle: String =
    """WITH u AS (
      |  SELECT user_id,
      |         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |           AS conv,
      |         CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 32, 1)
      |                IN ('0','2','4','6','8','a','c','e')
      |              THEN 1 ELSE 0 END AS arm
      |  FROM events GROUP BY user_id),
      |a AS (SELECT CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |               AS n_a,
      |             CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
      |               AS conv_a,
      |             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |               AS n_b,
      |             CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
      |               AS conv_b
      |      FROM u)
      |SELECT n_a, conv_a, n_b, conv_b,
      |       CAST(conv_a * 10000 // n_a AS BIGINT) AS rate_a_bp,
      |       CAST(conv_b * 10000 // n_b AS BIGINT) AS rate_b_bp,
      |       CAST(conv_a * 10000 // n_a - conv_b * 10000 // n_b AS BIGINT)
      |         AS diff_bp,
      |       CASE WHEN conv_a + conv_b = 0
      |              OR conv_a + conv_b = n_a + n_b THEN 0.0
      |            ELSE round(
      |              CAST(conv_a * n_b - conv_b * n_a AS DOUBLE)
      |              * CAST(conv_a * n_b - conv_b * n_a AS DOUBLE)
      |              * CAST(n_a + n_b AS DOUBLE)
      |              / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
      |                 * CAST(conv_a + conv_b AS DOUBLE)
      |                 * CAST(n_a + n_b - conv_a - conv_b AS DOUBLE)), 4)
      |       END AS z2_4dp,
      |       CAST(CASE WHEN (CASE WHEN conv_a + conv_b = 0
      |                        OR conv_a + conv_b = n_a + n_b THEN 0.0
      |                       ELSE round(
      |                         CAST(conv_a * n_b - conv_b * n_a AS DOUBLE)
      |                         * CAST(conv_a * n_b - conv_b * n_a AS DOUBLE)
      |                         * CAST(n_a + n_b AS DOUBLE)
      |                         / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
      |                            * CAST(conv_a + conv_b AS DOUBLE)
      |                            * CAST(n_a + n_b - conv_a - conv_b AS DOUBLE)),
      |                         4)
      |                  END) > 3.8416 THEN 1 ELSE 0 END AS INT) AS significant
      |FROM a""".stripMargin

  /** Signup→purchase conversion latency (q223): per user, the gap
    * between the FIRST signup and the FIRST purchase (users whose first
    * purchase precedes their first signup are excluded — returning
    * buyers, not conversions), as a conversion rate plus exact p50/p90
    * hours from the integer hour histogram.
    *
    * Scale shape: ONE user-keyed aggregate (two conditional map-side
    * mins) reduces the event log; the latency histogram is
    * observation-window-bounded and the percentile walk runs over it
    * (the only unpartitioned window input, plan-asserted). */
  def conversionLatency(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup", col("ts"))).as("s_min"),
        min(when(col("event_type") === "purchase", col("ts"))).as("p_min"))
      .filter(col("s_min").isNotNull)
      .select(
        when(col("p_min") >= col("s_min"),
          expr("(unix_millis(p_min) - unix_millis(s_min)) div 3600000"))
          .as("lat_h"))
      .localCheckpoint(true) // consumers: totals + the hour histogram
    val tot = u.agg(count(lit(1)).as("n_signup"),
      sum(when(col("lat_h").isNotNull, 1L).otherwise(0L)).as("n_conv"))
    val h = u.filter(col("lat_h").isNotNull)
      .groupBy(col("lat_h")).agg(count(lit(1)).as("n"))
    val cum = h
      .withColumn("cum", sum(col("n")).over(Window.orderBy(col("lat_h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tc", sum(col("n")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    def pct(k: Int) =
      min(when(col("cum") * 100 >= col("tc") * k, col("lat_h"))).as(s"p$k")
    cum.agg(pct(50), pct(90))
      .crossJoin(broadcast(tot))
      .select(col("n_signup"), col("n_conv"),
        expr("n_conv * 10000 div n_signup").as("conv_bp"),
        col("p50").as("p50_hours"), col("p90").as("p90_hours"))
  }

  private val conversionLatencyOracle: String =
    """WITH u AS (
      |  SELECT user_id,
      |         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s_min,
      |         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p_min
      |  FROM events GROUP BY user_id),
      |l AS (SELECT CASE WHEN p_min >= s_min
      |               THEN (epoch_ms(p_min) - epoch_ms(s_min)) // 3600000
      |             END AS lat_h
      |      FROM u WHERE s_min IS NOT NULL),
      |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_signup,
      |             CAST(SUM(CASE WHEN lat_h IS NOT NULL THEN 1 ELSE 0 END)
      |                  AS BIGINT) AS n_conv
      |      FROM l),
      |h AS (SELECT lat_h, COUNT(*) AS n FROM l
      |      WHERE lat_h IS NOT NULL GROUP BY 1),
      |c AS (SELECT lat_h, SUM(n) OVER (ORDER BY lat_h) AS cum,
      |             (SELECT SUM(n) FROM h) AS tc
      |      FROM h)
      |SELECT t.n_signup, t.n_conv,
      |       CAST(t.n_conv * 10000 // t.n_signup AS BIGINT) AS conv_bp,
      |       CAST(MIN(CASE WHEN c.cum * 100 >= c.tc * 50 THEN c.lat_h END)
      |            AS BIGINT) AS p50_hours,
      |       CAST(MIN(CASE WHEN c.cum * 100 >= c.tc * 90 THEN c.lat_h END)
      |            AS BIGINT) AS p90_hours
      |FROM c, t
      |GROUP BY t.n_signup, t.n_conv""".stripMargin

  /** DAU/MAU engagement stickiness (q225): distinct active users per day
    * and per month, stickiness = avg-DAU/MAU in basis points — the
    * engagement ratio every growth dashboard carries.
    *
    * Scale shape: ONE corpus shuffle builds the distinct (user, day)
    * frame (checkpointed; consumers: daily counts + monthly distinct);
    * DAU/MAU counts are aggregates of that reduced frame — chained as
    * separate aggregates joined on the tiny month key, never a
    * count_distinct Expand. */
  def stickiness(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .distinct()
      .localCheckpoint(true)
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      .select(substring(col("day"), 1, 7).as("month"), col("dau"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
    val mau = ud.select(col("user_id"), substring(col("day"), 1, 7).as("month"))
      .distinct()
      .groupBy(col("month")).agg(count(lit(1)).as("mau"))
    dau.join(mau, Seq("month"))
      .select(col("month"), col("n_days"), col("sum_dau"), col("mau"),
        expr("sum_dau * 10000 div (n_days * mau)").as("stickiness_bp"))
      .orderBy(col("month"))
  }

  private val stickinessOracle: String =
    """WITH ud AS (SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
      |            FROM events),
      |dau AS (SELECT substr(day, 1, 7) AS month,
      |               CAST(COUNT(*) AS BIGINT) AS n_days,
      |               CAST(SUM(dau) AS BIGINT) AS sum_dau
      |        FROM (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day)
      |        GROUP BY 1),
      |mau AS (SELECT month, CAST(COUNT(*) AS BIGINT) AS mau FROM
      |          (SELECT DISTINCT user_id, substr(day, 1, 7) AS month FROM ud)
      |        GROUP BY month)
      |SELECT dau.month, dau.n_days, dau.sum_dau, mau.mau,
      |       CAST(dau.sum_dau * 10000 // (dau.n_days * mau.mau) AS BIGINT)
      |         AS stickiness_bp
      |FROM dau JOIN mau ON dau.month = mau.month
      |ORDER BY dau.month""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("q218_ab_test", (s, d) => abTestReport(s, d), Some(abTestOracle)),
    Q("q223_conversion_latency", (s, d) => conversionLatency(s, d),
      Some(conversionLatencyOracle)),
    Q("q225_stickiness", (s, d) => stickiness(s, d),
      Some(stickinessOracle)),
    Q("q202_churn_lifetable", (s, d) => churnLifeTable(s, d),
      Some(lifeTableOracle)),
    Q("q203_markov_transitions", (s, d) => markovTransitions(s, d),
      Some(markovOracle())),
    Q("q212_session_concurrency", (s, d) => sessionConcurrency(s, d),
      Some(concurrencyOracle)))
}
