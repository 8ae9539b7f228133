package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B measurement of q217's fact-fact join on bucketed vs raw layout
  * (round-10 verdict item 4): lineitem ⋈ orders on the order key is the
  * suite's one fact-fact shuffle; writing both facts bucketed by the
  * join key (`Scale.writeBucketed`) lets Spark plan the same join
  * shuffle-free (co-located buckets, sort-merge without exchange).
  *
  * Prints median-of-3 timings for (a) the raw-parquet plan and (b) the
  * bucketed-table plan of the identical q217 aggregate chain, plus the
  * exchange counts of both plans. Results recorded in PLANS.md.
  *
  * Usage: Test/runMain graft.tools.BucketAb <sfDir> [buckets]
  */
object BucketAb {

  private def slaChain(li: DataFrame, ord: DataFrame): DataFrame = {
    val h = li.select(col("l_orderkey"), col("l_shipdate"))
      .join(ord.select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("days"))
      .groupBy(col("priority"), col("days")).agg(count(lit(1)).as("n"))
    val cum = h
      .withColumn("cum", sum(col("n"))
        .over(Window.partitionBy(col("priority")).orderBy(col("days"))))
      .withColumn("tot", sum(col("n")).over(Window.partitionBy(col("priority"))))
    def pct(k: Int) =
      min(when(col("cum") * 100 >= col("tot") * k, col("days"))).as(s"p$k")
    cum.groupBy(col("priority"))
      .agg(max(col("tot")).as("n_lines"), pct(50), pct(95), pct(99))
  }

  private def timeMedian3(mk: () => DataFrame): Double =
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      mk().collect()
      (System.nanoTime() - t0) / 1e9
    }.sorted.apply(1)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val buckets = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("bucket-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_bucket_ab_wh")
      // facts must not broadcast at this test SF — the point is the
      // 100-TB regime where BOTH sides are too big to broadcast
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // overwrite-mode saveAsTable still trips on a stale warehouse dir from
    // an earlier run (the table is gone from the fresh catalog, the
    // location is not) — clear it first
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("/tmp/graft_bucket_ab_wh"))

    val li = graft.Tables.lineitem(spark, sfDir)
    val ord = graft.Tables.orders(spark, sfDir)

    graft.operators.Scale.writeBucketed(
      li.select("l_orderkey", "l_shipdate"), "ab_lineitem", "l_orderkey", buckets)
    graft.operators.Scale.writeBucketed(
      ord.select("o_orderkey", "o_orderdate", "o_orderpriority"),
      "ab_orders", "o_orderkey", buckets)

    def raw() = slaChain(li, ord)
    def bucketed() = slaChain(spark.table("ab_lineitem"), spark.table("ab_orders"))

    def exchangesBelowJoin(df: DataFrame): Int = {
      val p = df.queryExecution.executedPlan.toString
      // count exchanges keyed on the JOIN key — the aggregate/window
      // exchanges above the join are identical in both plans
      "hashpartitioning\\((l|o)_orderkey".r.findAllIn(p).size
    }

    val tRaw = timeMedian3(() => raw())
    val tBuck = timeMedian3(() => bucketed())
    println(s"RAW:      ${"%.3f".format(tRaw)} s, " +
      s"join-key exchanges=${exchangesBelowJoin(raw())}")
    println(s"BUCKETED: ${"%.3f".format(tBuck)} s, " +
      s"join-key exchanges=${exchangesBelowJoin(bucketed())}")
    spark.stop()
  }
}
