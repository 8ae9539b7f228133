package graft.plans

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Pre-flight plan linter: walks a query's physical plan and reports
  * the operator shapes that kill jobs at 100 TB long before any task
  * runs. Catalyst plans what you declared — this audits whether what
  * you declared is what you meant to run at scale:
  *
  *  - **cartesian**: `CartesianProductExec` — an unconditioned join
  *    pairing every partition with every partition. Never survives a
  *    large input; almost always a missing join key.
  *  - **broadcast-nested-loop**: non-equi or un-keyed join against a
  *    broadcast side. Legitimate when the broadcast side is a 1-row
  *    aggregate frame (the dashboard-composition idiom); fatal when it
  *    is merely "small-ish".
  *  - **single-partition-exchange**: all data moving to ONE task. The
  *    global-aggregate shape (exchange fed by a PARTIAL aggregate, one
  *    pre-combined row per upstream partition) is exempt — that is how
  *    every `df.agg(...)` finishes and moves |partitions| rows, not the
  *    corpus. Anything else (a global window or global sort over a
  *    non-aggregated frame) serializes the job on one core and is only
  *    acceptable on provably tiny frames (histogram walks over
  *    (group × distinct-value) grids — which is exactly what a reviewer
  *    must be able to justify per query; PlanAuditSpec keeps that
  *    justification table for every registered query).
  */
object PlanAudit {

  final case class Finding(kind: String, operator: String)

  /** Physical operators including AQE initial plans and subqueries. */
  def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flatten(a.initialPlan)
    case _ => (p +: p.children.flatMap(flatten)) ++
      p.subqueries.flatMap(flatten)
  }

  /** Is this the map side of an aggregate (Partial / PartialMerge)? */
  def isPartialAgg(p: SparkPlan): Boolean = {
    val aggs = p match {
      case h: HashAggregateExec => Some(h.aggregateExpressions)
      case o: ObjectHashAggregateExec => Some(o.aggregateExpressions)
      case s: SortAggregateExec => Some(s.aggregateExpressions)
      case _ => None
    }
    aggs.exists(as => as.isEmpty || as.forall(a =>
      a.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial ||
        a.mode == org.apache.spark.sql.catalyst.expressions.aggregate.PartialMerge))
  }

  /** Static row bound of a physical subtree, from the OPTIMIZED logical
    * plan Catalyst linked to it (`maxRows`: Some(1) for an ungrouped
    * aggregate, the literal for a LIMIT, row count for a local
    * relation). Walks down past link-less wrappers (exchanges, AQE
    * shims) to the topmost linked node — whose bound is the subtree's
    * output bound. None = unbounded (grows with the corpus). */
  def maxRows(p: SparkPlan): Option[Long] =
    p.logicalLink match {
      case Some(l) => l.maxRows
      case None => p.children match {
        case Seq(only) => maxRows(only)
        case _ => None
      }
    }

  /** A nested-loop join against a PROVABLY tiny broadcast side is the
    * 1-row-aggregate composition idiom (dashboards, corpus-level
    * thresholds broadcast back over the corpus) — benign at any scale:
    * the "loop" pairs each row with ≤`bound` rows. Only an UNBOUNDED
    * build side (merely "small-ish today") is a scale finding. */
  private def boundedBuild(b: BroadcastNestedLoopJoinExec, bound: Long): Boolean = {
    val build = b.buildSide match {
      case BuildLeft => b.left
      case BuildRight => b.right
    }
    maxRows(build).exists(_ <= bound)
  }

  /** The global-limit gather: exchange-to-1 fed by a per-partition
    * LocalLimit moves ≤ limit·|partitions| pre-truncated rows, not the
    * corpus — the physical shape every small `df.limit(k)` (including
    * the cardinality annotations above) plans to. */
  private def boundedLocalLimit(p: SparkPlan): Boolean = p match {
    case l: org.apache.spark.sql.execution.LocalLimitExec => l.limit <= 10000
    case _ => false
  }

  def findings(df: Dataset[_]): Seq[Finding] = {
    val ops = flatten(df.queryExecution.executedPlan)
    ops.flatMap {
      case c: CartesianProductExec =>
        Some(Finding("cartesian", c.nodeName))
      case b: BroadcastNestedLoopJoinExec if !boundedBuild(b, 10000) =>
        Some(Finding("broadcast-nested-loop", b.nodeName))
      case s: ShuffleExchangeExec
          if s.outputPartitioning.numPartitions == 1 &&
            !isPartialAgg(s.child) &&
            !boundedLocalLimit(s.child) &&
            !maxRows(s.child).exists(_ <= 10000) =>
        Some(Finding("single-partition-exchange", s.child.nodeName))
      case _ => None
    }
  }
}
