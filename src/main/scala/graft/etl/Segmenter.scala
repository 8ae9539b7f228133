package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch segmentation contract (SURVEY §2.8 step 3 / §2.9 —
  * `ImportDataSegmenter` BATCHSIZE=100, ImportDataSegmenter.cs:95,221-264;
  * exporter PageSize=100, DataExporter.cs:136): deterministic segment
  * assignment over a sorted key, with the reference's paging metadata
  * (segment index / total segments / is-last).
  *
  * At scale the physical per-100-row loop is replaced by partition sizing
  * (`maxRecordsPerFile`, SURVEY §4) — this operator exists for consumers
  * that need the reference's numbered-segment contract (resumable loads,
  * per-segment files, progress reporting).
  */
object Segmenter {

  /** Attach `segment_index` (0-based) by position in `orderBy` order.
    * Global row_number = single-partition window: correct but serial —
    * use only at import-batch sizes (the reference's use case). For
    * cluster-scale exports use `bySegmentOfKey` instead. */
  def byPosition(df: DataFrame, orderBy: Seq[Column], segmentSize: Int): DataFrame =
    df.withColumn("segment_index",
      ((row_number().over(Window.orderBy(orderBy: _*)) - 1) / segmentSize)
        .cast("long"))

  /** Scale path: segment by key range (keyset contract, `FastPager`) —
    * distributed, no global window; segments are value-aligned rather
    * than exactly-N-rows. */
  def bySegmentOfKey(df: DataFrame, keyCol: String, keysPerSegment: Long): DataFrame =
    df.withColumn("segment_index", floor(col(keyCol) / keysPerSegment))

  /** Segment metadata frame: per-segment row count and key bounds —
    * CurrentSegment/TotalSegments analog as data. */
  def segmentStats(segmented: DataFrame, keyCol: String): DataFrame =
    segmented.groupBy(col("segment_index"))
      .agg(count(lit(1)).as("cnt"),
        min(col(keyCol)).as("min_key"), max(col(keyCol)).as("max_key"))
      .orderBy(col("segment_index"))
}
