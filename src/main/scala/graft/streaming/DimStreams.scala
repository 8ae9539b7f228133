package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Ckpt.Ops
import graft.etl.Scd2

/** Streaming dimension feed → SCD2 snapshot — the foreachBatch MERGE
  * pattern: dimension loads arrive as a stream of dated batches, and
  * each micro-batch advances the versioned snapshot with ONE
  * [[Scd2.mergeMulti]] call covering every load date it carries
  * (a micro-batch may drain several queued loads after downtime;
  * mergeMulti folds them in ascending date order in a single pass, so
  * the snapshot materializes once per micro-batch — not once per
  * date). This is the standard production shape for CDC-fed
  * dimensions in Structured Streaming: the merge itself stays a BATCH
  * operation against the snapshot store, the stream only drives
  * arrival.
  *
  * The snapshot is pinned (`.ckpt`) after every merge: the micro-batch
  * frame is only valid inside its `foreachBatch` call, so the merged
  * result must materialize before the call returns — and the pin also
  * stops merge-lineage stacking across a long-running feed (the same
  * per-superstep discipline as the iterative graph jobs).
  */
object DimStreams {

  /** Start an SCD2 sink over `stream` (key + attrs + `dateCol` ISO-date
    * load tag). Returns the query and a snapshot accessor. */
  def scd2Sink(stream: DataFrame, initial: DataFrame, key: String,
      attrs: Seq[String], dateCol: String): (StreamingQuery, () => DataFrame) = {
    @volatile var snapshot = initial.ckpt
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        snapshot = Scd2.mergeMulti(snapshot, batch, key, attrs, dateCol).ckpt
      }
      .start()
    (q, () => snapshot)
  }

  /** TABLE-backed SCD2 sink — the full production pattern: each
    * micro-batch folds its load dates into the landed
    * `is_current`-partitioned dimension table in ONE pass
    * ([[Scd2.mergeMultiIntoTable]]): closed versions append into the
    * history partition (existing files never rewritten), the current
    * partition dynamic-overwrites. Snapshot state lives in the TABLE,
    * not driver memory — the sink survives restarts with no rebuild
    * (land once, stream forever). */
  def scd2TableSink(stream: DataFrame, table: String, key: String,
      attrs: Seq[String], dateCol: String): StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        Scd2.mergeMultiIntoTable(
          batch.sparkSession, table, batch, key, attrs, dateCol)
      }
      .start()
}
