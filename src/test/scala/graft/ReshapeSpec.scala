package graft

import graft.reports.Reshape
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reshaping operators: pivot round-trips against its conditional-agg
  * equivalent, melt preserves cell multiset, set-op tags partition, Q19
  * bands filter, running totals are monotone prefix sums. */
class ReshapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("pivot equals the conditional-aggregate formulation") {
    val piv = Reshape.statusPivot(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.get(1), r.get(2), r.get(3))).toMap
    val cond = Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(
        sum(when(col("o_orderstatus") === "F",
          col("o_totalprice").cast("decimal(18,2)"))).cast("double").as("f"),
        sum(when(col("o_orderstatus") === "O",
          col("o_totalprice").cast("decimal(18,2)"))).cast("double").as("o"),
        sum(when(col("o_orderstatus") === "P",
          col("o_totalprice").cast("decimal(18,2)"))).cast("double").as("p"))
      .collect().map(r => r.getInt(0) -> (r.get(1), r.get(2), r.get(3))).toMap
    assert(piv == cond)
    assert(piv.nonEmpty)
  }

  test("melt emits one row per (key, metric) with matching values") {
    val n = Tables.part(spark, dir).count()
    val melted = Reshape.partMelt(spark, dir)
    assert(melted.count() == 2 * n)
    val back = melted.groupBy(col("p_partkey"))
      .pivot("metric", Seq("p_retailprice", "p_size")).agg(first(col("value")))
    val orig = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size").cast("double"))
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("intersect/except tags partition the customer nation set") {
    val rows = Reshape.nationSetOps(spark, dir).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1)))
    val bySrc = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val custNations = Tables.customer(spark, dir)
      .select(col("c_nationkey")).distinct().collect()
      .map(_.getAs[Number](0).longValue).toSet
    assert(bySrc.getOrElse("both", Set.empty)
      .union(bySrc.getOrElse("customer_only", Set.empty)) == custNations)
    assert(bySrc.getOrElse("both", Set.empty)
      .intersect(bySrc.getOrElse("customer_only", Set.empty)).isEmpty)
  }

  test("running totals are positive and peak at the customer sum") {
    // the window accumulates in (o_orderdate, o_orderkey) order, so the
    // per-customer MAX of the prefix sums equals the customer total
    val rows = Reshape.runningTotals(spark, dir).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getDouble(2)))
    val byCust = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    byCust.values.foreach(totals => assert(totals.forall(_ > 0)))
    val expected = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("t"))
      .collect().map(r => r.getAs[Number](0).longValue -> r.getDouble(1)).toMap
    byCust.foreach { case (c, totals) =>
      assert(math.abs(totals.max - expected(c)) < 1e-6)
    }
  }

  test("streaming anomaly detection == the batch RANGE-window run") {
    import graft.streaming.EventStreams
    val tmp = java.nio.file.Files.createTempDirectory("graft-anom").toString
    Tables.events(spark, TestSpark.sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema("user_id LONG, event_id LONG, ts TIMESTAMP, value DOUBLE")
      .parquet(tmp)
      .as[EventStreams.ValueEvent](org.apache.spark.sql.Encoders
        .product[EventStreams.ValueEvent])
    val q = EventStreams.anomalyStream(stream).writeStream
      .outputMode("append").format("memory").queryName("anom_stream").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("anom_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSet
    val batch = reports.Reshape.valueAnomaly(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSet
    assert(streamed.nonEmpty && streamed == batch)
    assert(streamed.exists(_._5 == 1), "no anomalies flagged — vacuous")
  }
}
