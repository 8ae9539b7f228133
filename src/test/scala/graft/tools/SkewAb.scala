package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B measurement of hot-key equi-join treatments (the shape q213
  * audits) over TWO shapes, because AQE's skew detection keys on
  * PARTITION BYTES (empirically bisected; both behaviors pinned in ScaleSpec):
  *
  *  - PAYLOAD JOIN (fact columns survive into the aggregate above the
  *    join — the common production shape): the hot partition is big in
  *    bytes, AQE splits it automatically. Plain vs AQE vs salted.
  *  - KEY-ONLY JOIN (column pruning strips the fact side to the join
  *    key — EXISTS/count-style): the hot partition is 90% of the ROWS
  *    but compresses to almost nothing, so byte-keyed skew detection
  *    never fires at production thresholds — one reducer still does 90%
  *    of the join CPU. Manual `Scale.saltedJoin` is the remedy (or an
  *    aggressive skewedPartitionThresholdInBytes, at the cost of
  *    splitting everything else too).
  *
  * Guidance (recorded in PLANS.md): leave AQE skew-join ON — it covers
  * byte-heavy skew for free; salt by hand when the hot side is narrow
  * (key-only semi/count joins) or when the skew is in an AGGREGATION
  * rather than a join. The q213 audit's salt_factor column sizes the
  * salt count.
  *
  * Usage: Test/runMain graft.tools.SkewAb [rows] [salts]
  */
object SkewAb {

  private def timeMedian3(mk: () => DataFrame): Double =
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      mk().queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }.sorted.apply(1)

  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 20000000L
    val salts = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("skew-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 90% of the fact rows share ONE key; the rest spread over 10k keys.
    val fact = spark.range(rows).select(
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 10000)
        .as("k"),
      concat(lit("payload-"), col("id"), lit("-"),
        md5(col("id").cast("string"))).as("payload"))
      .localCheckpoint(true)
    val dim = spark.range(10000).select(col("id").as("k"),
      concat(lit("dim"), col("id")).as("name")).localCheckpoint(true)

    def withConf(kvs: (String, String)*)(f: => Double): Double = {
      val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f
      finally saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }
    val aqeOn = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8MB")
    val aqeOff = Seq("spark.sql.adaptive.skewJoin.enabled" -> "false")

    def skewTag(df: DataFrame): Boolean = {
      df.queryExecution.toRdd.count()
      val fin = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.finalPhysicalPlan
        case p => p
      }
      fin.toString.contains("skew=true")
    }

    // shape 1: the payload survives into the keyed aggregate — the hot
    // partition is big in BYTES, AQE's split engages
    def payloadShape(j: DataFrame) = j.groupBy(col("name"))
      .agg(sum(length(col("payload"))).as("s"))
    val pPlain = withConf(aqeOff: _*)(
      timeMedian3(() => payloadShape(fact.join(dim, Seq("k")))))
    val pAqe = withConf(aqeOn: _*)(
      timeMedian3(() => payloadShape(fact.join(dim, Seq("k")))))
    val pTag = withConf(aqeOn: _*)(
      if (skewTag(payloadShape(fact.join(dim, Seq("k"))))) 1.0 else 0.0)
    val pSalt = withConf(aqeOff: _*)(
      timeMedian3(() => payloadShape(
        graft.operators.Scale.saltedJoin(fact, dim, "k", salts))))

    // shape 2: pruned key-only join — 90% of ROWS on one reducer, but
    // the bytes compress below any sane threshold: AQE sees no skew
    def keyOnlyShape(j: DataFrame) = j.groupBy(col("name")).count()
    val kPlain = withConf(aqeOff: _*)(
      timeMedian3(() => keyOnlyShape(fact.join(dim, Seq("k")))))
    val kAqe = withConf(aqeOn: _*)(
      timeMedian3(() => keyOnlyShape(fact.join(dim, Seq("k")))))
    val kTag = withConf(aqeOn: _*)(
      if (skewTag(keyOnlyShape(fact.join(dim, Seq("k"))))) 1.0 else 0.0)
    val kSalt = withConf(aqeOff: _*)(
      timeMedian3(() => keyOnlyShape(
        graft.operators.Scale.saltedJoin(fact, dim, "k", salts))))

    println(f"PAYLOAD JOIN   plain: $pPlain%.3f s   aqe: $pAqe%.3f s " +
      f"(split: ${pTag == 1.0})   salted($salts): $pSalt%.3f s")
    println(f"KEY-ONLY JOIN  plain: $kPlain%.3f s   aqe: $kAqe%.3f s " +
      f"(split: ${kTag == 1.0})   salted($salts): $kSalt%.3f s")
    spark.stop()
  }
}
