package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Scout for the global plan audit: builds EVERY registry query's
  * physical plan at a given SF (no execution — analysis+planning only)
  * and prints, per query, the operators a 100-TB reviewer flags:
  * cartesian products, broadcast nested-loop joins, and
  * single-partition shuffle exchanges. The findings seed
  * PlanAuditSpec's justified whitelists.
  *
  * Usage: Test/runMain graft.tools.PlanScout [sfDir]
  */
object PlanScout {

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("plan-scout")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (q <- graft.Registry.all) {
      try {
        val df = q.run(spark, dir)
        val plan = df.queryExecution.executedPlan
        val ops = graft.plans.PlanAudit.flatten(plan)
        val cart = ops.count(_.isInstanceOf[CartesianProductExec])
        val bnlj = ops.count(_.isInstanceOf[BroadcastNestedLoopJoinExec])
        // a single-partition exchange fed by a PARTIAL aggregate is the
        // normal global-aggregate shape (one partial row per partition
        // crosses); anything else moving to 1 partition is the smell
        val single = ops.count {
          case s: ShuffleExchangeExec
              if s.outputPartitioning.numPartitions == 1 =>
            !graft.plans.PlanAudit.isPartialAgg(s.child)
          case _ => false
        }
        if (cart + bnlj + single > 0) {
          val detail = graft.plans.PlanAudit.findings(df)
            .groupBy(f => (f.kind, f.operator))
            .map { case ((k, op), fs) => s"$k[${fs.size}]($op)" }
            .mkString(" ")
          println(s"SCOUT ${q.name} cart=$cart bnlj=$bnlj single=$single :: $detail")
        }
      } catch {
        case e: Exception =>
          println(s"SCOUT ${q.name} BUILD-ERROR ${e.getClass.getSimpleName}: ${e.getMessage.take(100)}")
      }
    }
    println("SCOUT done")
    spark.stop()
  }
}
