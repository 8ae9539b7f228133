package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A/B measurement of the upsert MERGE path on bucketed vs raw snapshot
  * layout (round-11 verdict item 1): the nightly merge's full-outer join
  * shuffles BOTH the snapshot and the incoming batch on the surrogate —
  * at 100 TB the snapshot side is the lake. Landing the snapshot bucketed
  * by the surrogate (the q240/q217 recipe applied to the merge) removes
  * the snapshot-side exchange AND the key-index window exchange in
  * `Upsert.resolve`, leaving only the delta-sized incoming shuffle.
  *
  * The bucketed WRITE is a one-time landing cost (reported separately);
  * the A/B times the recurring merge. Results recorded in PLANS.md.
  *
  * Usage: Test/runMain graft.tools.UpsertAb <sfDir> [buckets]
  */
object UpsertAb {

  private def timeMedian3(mk: () => DataFrame): Double =
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      mk().queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }.sorted.apply(1)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val buckets = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("upsert-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_upsert_ab_wh")
      // the snapshot must not broadcast at test SF — the target regime
      // has BOTH merge sides too big to broadcast
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("/tmp/graft_upsert_ab_wh"))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("/tmp/graft_upsert_ab_ext"))

    val rawSnap = graft.Tables.customer(spark, sfDir)

    val t0 = System.nanoTime()
    val snapT = graft.operators.Scale.writeBucketed(
      rawSnap, "ab_customer", "c_custkey", buckets,
      Some("/tmp/graft_upsert_ab_ext/customer"))
    val tLand = (System.nanoTime() - t0) / 1e9
    val bucketSnap = spark.table(snapT)

    def pipeline(snap: DataFrame) = graft.etl.Upsert.upsert(
      snap, graft.etl.EtlQueries.upsertIncoming(snap),
      graft.etl.EtlQueries.upsertCfg)

    val tRaw = timeMedian3(() => pipeline(rawSnap))
    val tBuck = timeMedian3(() => pipeline(bucketSnap))

    // isolate the MERGE JOIN: the resolved incoming frame is pinned once
    // and shared by both arms, so the A/B sees only the snapshot-side
    // scan → (exchange →) sort → full-outer join difference — the term
    // that scales with the lake, stripped of the shared resolve /
    // insert-numbering fixed costs
    val resolved = graft.Ckpt(graft.etl.Upsert.resolve(
      rawSnap, graft.etl.EtlQueries.upsertIncoming(rawSnap),
      graft.etl.EtlQueries.upsertCfg))
    def mergeOnly(snap: DataFrame) = graft.etl.Upsert.merge(
      snap, resolved, graft.etl.EtlQueries.upsertCfg)
    val tRawM = timeMedian3(() => mergeOnly(rawSnap))
    val tBuckM = timeMedian3(() => mergeOnly(bucketSnap))

    println(f"LANDING (one-time bucketed write): $tLand%.3f s")
    println(f"RAW PIPELINE:      $tRaw%.3f s (snapshot shuffles every run)")
    println(f"BUCKETED PIPELINE: $tBuck%.3f s (snapshot-side exchange-free)")
    println(f"RAW MERGE-ONLY:      $tRawM%.3f s")
    println(f"BUCKETED MERGE-ONLY: $tBuckM%.3f s")
    spark.stop()
  }
}
