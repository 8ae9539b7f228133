package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PlanAudit

/** Global plan-invariant gate: EVERY registered query's physical plan is
  * linted by [[PlanAudit]], and every occurrence of a scale-hostile
  * operator shape must be on the justified whitelist below. This turns
  * the per-query "plan shape" scaladoc claims into a standing assertion:
  * a future edit that silently introduces a cartesian product, an
  * unjustified broadcast nested-loop join, or a whole-corpus
  * single-partition exchange fails the suite, not the 100-TB run.
  *
  * Whitelist discipline: an entry is (query, kind) with the
  * justification in the comment. 1-row-frame compositions may use
  * broadcast nested-loop joins (they pair SINGLE rows); histogram/
  * calendar walks may use global windows (the frame is |groups| ×
  * |distinct values|, corpus-size-independent). Nothing may use a
  * cartesian product.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** (query name, finding kind) → justification. */
  private val whitelist: Map[(String, String), String] = Map(
    // RangeJoin's documented wide-interval FALLBACK branch: rows whose
    // interval spans > maxBucketsPerRow buckets would explode the
    // bucketed side, so they degrade to a nested loop; the corpus rides
    // the narrow branch's bucketed equi-join (RangeJoin.scala contract).
    ("q74_range_join", "broadcast-nested-loop") -> "wide-interval fallback branch; corpus on bucketed equi-join",
    ("q79_range_rewrite", "broadcast-nested-loop") -> "wide-interval fallback branch (auto-rewrite); corpus on bucketed equi-join",
    ("q273_interval_overlap", "broadcast-nested-loop") -> "intervalOverlap wide-interval fallback branches; corpus on bucketed equi-join",
    // Value-histogram cumulative walks (the q168 percentile discipline):
    // the global window/sort runs over a (groups × distinct-values)
    // grid aggregated from the corpus, never the corpus itself. The
    // grid bound is structural (calendar days, hour gaps, cent values,
    // score deciles), not expressible as a static maxRows.
    ("q08_orders_dashboard", "single-partition-exchange") -> "pivot sort over |days| frame",
    ("q191_rfm_segments", "single-partition-exchange") -> "3 quartile-cut walks over value histograms",
    ("q219_revenue_concentration", "single-partition-exchange") -> "Gini cumulative walks over the cent-value histogram",
    ("q214_seasonality", "single-partition-exchange") -> "weekday-hour grid walk",
    ("q222_calibration_curve", "single-partition-exchange") -> "score-bucket histogram walk",
    ("q198_vocab_growth", "single-partition-exchange") -> "cumulative walk over the 4-row tier frame",
    ("q200_cusum_changepoint", "single-partition-exchange") -> "CUSUM walk over the calendar-day histogram",
    ("q237_event_dashboard", "single-partition-exchange") -> "dashboard pivot sort over |days| frame",
    ("q223_conversion_latency", "single-partition-exchange") -> "percentile walk over the hour-gap histogram",
    ("q202_churn_lifetable", "single-partition-exchange") -> "reverse cumsum over the 30-day-lifetime histogram",
    // Two-pass sharded prefix sum: the single-partition window input is
    // the per-shard TOTALS frame (one row per shard), broadcast back as
    // base offsets — the corpus prefix runs shard-partitioned.
    ("q88_token_pack", "single-partition-exchange") -> "shard-totals exclusive prefix (|shards| rows)",
    // Segmenter.byPosition's documented import-batch contract: global
    // row_number IS the reference's numbered-segment semantics, scoped
    // to import-batch sizes; bySegmentOfKey is the cluster-scale path.
    ("q51_segment_stats", "single-partition-exchange") -> "byPosition import-batch contract; scale path is bySegmentOfKey")

  test("no registered query plans a scale-hostile operator off-whitelist") {
    val offenders = Registry.all.flatMap { q =>
      val df = q.run(spark, TestSpark.sfDir)
      PlanAudit.findings(df)
        .map(f => (q.name, f.kind, f.operator))
        .filterNot { case (n, k, _) => whitelist.contains((n, k)) }
        .distinct
    }
    assert(offenders.isEmpty,
      "unjustified scale-hostile plan shapes:\n" +
        offenders.map { case (n, k, op) => s"  $n: $k ($op)" }.mkString("\n"))
  }
}
