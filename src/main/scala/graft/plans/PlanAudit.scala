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
    } ++ scanFindings(ops)
  }

  /** Scan-discipline findings of a bare physical (sub)tree — the spec
    * hook for proving the gate FIRES on a hand-built violating plan
    * (the API cannot produce one: `PhysicalOperation` always folds). */
  def scanFindingsOf(plan: SparkPlan): Seq[Finding] =
    scanFindings(flatten(plan))

  // ------------------------------------------------------- scan discipline

  /** Scan-discipline audit — the shuffle linter's complement: a plan can
    * be exchange-clean and still read 100 TB it could have skipped. Two
    * invariants, both machine-checked per scan:
    *
    *  - **unpushed-scan-predicate**: a deterministic scan-adjacent
    *    conjunct that TRANSLATES to a data-source filter (so the parquet
    *    reader could skip row groups / pages with footer statistics) but
    *    is absent from the scan's pushed-filter set. The v1 scan path
    *    offers every translatable data filter itself, so a hit means
    *    drift — pushdown conf turned off, a format losing nested-field
    *    support, a Spark upgrade changing translation — the failure mode
    *    a standing gate catches and a per-round code read does not.
    *  - **filter-not-folded-into-scan**: a deterministic translatable
    *    conjunct sitting in a `Filter` DIRECTLY above the scan (through
    *    the row-conversion shims) that never reached `dataFilters` at
    *    all. `PhysicalOperation` folds scan-adjacent filters into the
    *    scan node during planning; if a predicate escapes the fold it
    *    also escaped pushdown AND partition pruning.
    *
    * Non-translatable residuals (arithmetic like `key % 500 = 0`,
    * multi-column comparisons) are exempt by construction — no engine
    * can push them to footer stats; they run codegen'd over whatever the
    * pushed conjuncts let through. Nondeterministic predicates (rand
    * sampling) are exempt: they are REQUIRED to stay above the scan.
    * V2 `BatchScanExec` paths carry their own pushdown bookkeeping and
    * are out of scope here (the engine's read path is v1; the one v2
    * user, footer-stats, runs in a sealed child session). */
  private def scanFindings(ops: Seq[SparkPlan]): Seq[Finding] =
    ops.flatMap {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        // what the FORMAT can skip with, structurally — deliberately NOT
        // the session conf the scan itself consulted: if conf drift turns
        // nested pushdown off, expectation and plan diverge and the gate
        // fires (reading the same conf here would be a vacuous check)
        val nested = supportsNestedFields(f.relation.fileFormat)
        // pushedDownFilters is `protected`; the scan publishes it in
        // full through the metadata map (the explain "PushedFilters" row
        // — raw mkString, no truncation). Exact TOP-LEVEL element
        // equality, not substring containment: a translated filter that
        // appears only INSIDE a pushed composite (Not(...)/Or(...)) must
        // still count as unpushed (ADVICE r14 — the substring form was a
        // vacuous pass).
        val pushed = topLevelElems(f.metadata.getOrElse("PushedFilters", "[]"))
        f.dataFilters.filter(_.deterministic).flatMap { e =>
          org.apache.spark.sql.GraftBridge.translateSourceFilter(e, nested)
            .filterNot(t => pushed.contains(t.toString))
            .map(t => Finding("unpushed-scan-predicate",
              s"${f.nodeName}: $t not in PushedFilters $pushed"))
        }
      case fl: org.apache.spark.sql.execution.FilterExec =>
        scanBelow(fl.child).toSeq.flatMap { scan =>
          val nested = supportsNestedFields(scan.relation.fileFormat)
          splitConjuncts(fl.condition)
            .filter(_.deterministic)
            .filter(c => org.apache.spark.sql.GraftBridge
              .translateSourceFilter(c, nested).isDefined)
            .filterNot(c => scan.dataFilters.exists(_.semanticEquals(c)))
            .map(c => Finding("filter-not-folded-into-scan",
              s"${scan.nodeName}: $c evaluated above the scan, absent " +
                s"from DataFilters ${scan.dataFilters}"))
        }
      case _ => Nil
    }

  /** Split a `[a, b(c, d), e]` rendering into its TOP-LEVEL elements —
    * commas inside parentheses/brackets (composite filters, In-lists)
    * stay within their element. The inverse of the scan metadata's
    * `mkString("[", ", ", "]")` over `sources.Filter.toString`s. */
  private[graft] def topLevelElems(s: String): Set[String] = {
    val inner = s.trim.stripPrefix("[").stripSuffix("]")
    val out = Set.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    inner.foreach { c =>
      if (c == ',' && depth == 0) { out += cur.result().trim; cur.clear() }
      else {
        if (c == '(' || c == '[') depth += 1
        // clamp at 0: an unbalanced ')' INSIDE a literal value (e.g.
        // StringContains(a,ab)cd) from value "ab)cd") must not push
        // depth negative and glue the next elements together — the
        // worst case is then one mis-split element (a false finding on
        // that scan), never corruption of the rest of the list
        else if ((c == ')' || c == ']') && depth > 0) depth -= 1
        cur += c
      }
    }
    val last = cur.result().trim
    if (last.nonEmpty) out += last
    out.result()
  }

  /** Columnar footer-stat formats take nested-field pushdown; row
    * formats (csv/json/text) translate top-level predicates only. */
  private def supportsNestedFields(
      fmt: org.apache.spark.sql.execution.datasources.FileFormat): Boolean =
    fmt.isInstanceOf[
        org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat] ||
      fmt.isInstanceOf[
        org.apache.spark.sql.execution.datasources.orc.OrcFileFormat]

  /** The file scan this node sits DIRECTLY on top of, looking through
    * only the row-representation shims (columnar→row, codegen adapters)
    * — never through operators that rename, project or reorder rows. */
  private def scanBelow(p: SparkPlan)
      : Option[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case s: org.apache.spark.sql.execution.FileSourceScanExec => Some(s)
    case c: org.apache.spark.sql.execution.ColumnarToRowExec => scanBelow(c.child)
    case i: org.apache.spark.sql.execution.InputAdapter => scanBelow(i.child)
    case w: org.apache.spark.sql.execution.WholeStageCodegenExec => scanBelow(w.child)
    case _ => None
  }

  private def splitConjuncts(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
