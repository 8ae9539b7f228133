package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only experiment: quantify the single-row-group scan penalty.
  * The driver-generated parquet has ONE row group per table, so every
  * Spark scan decodes serially regardless of maxPartitionBytes (Spark
  * parallelizes across row groups / files; DuckDB parallelizes WITHIN a
  * row group). Measures a scan-heavy aggregate against the original
  * layout vs a 32-file restage.
  */
object LayoutExp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val staged = "/tmp/graft_layout_exp/lineitem"
    li.repartition(32).write.mode("overwrite").parquet(staged)
    val li2 = spark.read.parquet(staged)
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$tag%-28s median ${ts(1)}%.3f s  (${ts.mkString(", ")})")
    }
    def agg(df: org.apache.spark.sql.DataFrame): Unit = {
      df.groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("r"))
        .queryExecution.toRdd.count()
    }
    def scanAll(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count()
    }
    time("agg original 1-rg")(agg(li))
    time("agg staged 32-file")(agg(li2))
    time("full scan original")(scanAll(li))
    time("full scan staged")(scanAll(li2))
    // order-preserving restage: ONE writer task, small row groups
    val rg = "/tmp/graft_layout_exp/lineitem_rg"
    val t0 = System.nanoTime()
    li.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", 1 << 20)
      .parquet(rg)
    println(f"restage took ${(System.nanoTime() - t0) / 1e9}%.3f s")
    val spark2 = spark.newSession()
    spark2.conf.set("spark.sql.files.maxPartitionBytes", (1 << 20).toString)
    val li3 = spark2.read.parquet(rg)
    println("rg scan partitions: " + li3.queryExecution.toRdd.getNumPartitions)
    def agg3(): Unit =
      li3.groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("r"))
        .queryExecution.toRdd.count()
    time("agg rg-staged 1-file")(agg3())
    time("full scan rg-staged")(li3.queryExecution.toRdd.count())
    // order preserved? compare zipWithIndex fingerprints
    val a = li.selectExpr("l_orderkey", "l_linenumber").rdd.zipWithIndex()
      .map { case (r, i) => (i, r.getLong(0) * 31 + r.getInt(1)) }
    val b = li3.selectExpr("l_orderkey", "l_linenumber").rdd.zipWithIndex()
      .map { case (r, i) => (i, r.getLong(0) * 31 + r.getInt(1)) }
    val diff = a.join(b).filter { case (_, (x, y)) => x != y }.count()
    println(s"order mismatches: $diff")
    spark.stop()
  }
}
