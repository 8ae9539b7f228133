package graft.tools

/** Plan-audit helper: prints the physical plan of the given registry
  * queries (driver-contract surface) — the PLANS.md evidence source.
  * Usage: Test/runMain graft.tools.ExplainProbe <sfDir> <q1,q2,...> */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val qs = if (args.length > 1) args(1).split(",").toSeq
             else Seq("q01_bestsellers")
    val sp = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    sp.sparkContext.setLogLevel("ERROR")
    qs.foreach { q =>
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(sp, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    sp.stop()
  }
}
