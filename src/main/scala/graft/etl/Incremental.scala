package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental (snapshot + delta) aggregation — the engine expression of
  * the reference's scheduled re-runs (SURVEY §2.10: cron tasks re-execute
  * batch pipelines; `SyncMapping` tracks what was already processed).
  * Instead of recomputing an aggregate over the full history each run,
  * a run aggregates ONLY the new delta and merges it with the previous
  * snapshot by key.
  *
  * Correctness rests on two disciplines:
  *  - the carried measures are ADDITIVE partials (counts + exact decimal
  *    sums — never averages or ratios, which are derived at read time),
  *    so merge order cannot change the result;
  *  - each run's input boundary is a HIGH-WATER MARK on event time (the
  *    `SyncMapping` analog): delta = rows with hwm_prev < ts <= hwm_new,
  *    so re-running a failed job re-reads exactly the same slice.
  *
  * At 100 TB this is the nightly-rollup pattern: the snapshot is a keyed
  * table many orders of magnitude smaller than the event history, each
  * run scans only the new partition, and the merge is one shuffle of
  * |snapshot| + |delta-aggregate| pre-reduced rows.
  */
object Incremental {

  /** Aggregate one delta slice to the additive snapshot schema:
    * keys → (cnt, total) with an exact decimal total. */
  def aggregateDelta(delta: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    delta.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).try_cast(DecimalType(18, 2))).as("total"))

  /** Merge a previous snapshot with a delta aggregate: union the additive
    * partials and re-reduce per key. Exact and associative (long counts +
    * decimal sums), so daily folds, weekly folds, or one full recompute
    * all produce identical snapshots. */
  def merge(prev: DataFrame, deltaAgg: DataFrame, keys: Seq[String]): DataFrame =
    prev.unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("total")).as("total"))

  /** Time bounds of a slice in ONE aggregate scan: (min, max) event time.
    * The max IS the high-water mark to persist with the snapshot (the
    * next run's delta filter is `ts > hwm`); both Timestamps keep full
    * microsecond precision (only `.getTime` truncates). One job — don't
    * run separate min and max aggregates over the history. */
  def timeBounds(df: DataFrame,
      tsCol: String): Option[(java.sql.Timestamp, java.sql.Timestamp)] = {
    val r = df.agg(min(col(tsCol)), max(col(tsCol))).head
    if (r.isNullAt(0)) None else Some((r.getTimestamp(0), r.getTimestamp(1)))
  }

  /** The delta slice between two high-water marks (lower exclusive,
    * upper inclusive — rows AT the stored mark were already processed). */
  def deltaSlice(df: DataFrame, tsCol: String,
      after: Option[java.sql.Timestamp],
      upTo: java.sql.Timestamp): DataFrame = {
    val upper = col(tsCol) <= lit(upTo)
    after match {
      case Some(lo) => df.filter(col(tsCol) > lit(lo) && upper)
      case None => df.filter(upper)
    }
  }

  /** Read-time projection of a snapshot: derived measures (averages etc.)
    * computed FROM the additive partials, never carried in them. */
  def withDerived(snapshot: DataFrame): DataFrame =
    snapshot.withColumn("avg_value",
      (col("total").cast("double") / col("cnt")))
}
