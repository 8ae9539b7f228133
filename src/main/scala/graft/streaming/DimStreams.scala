package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Ckpt.Ops
import graft.etl.Scd2

/** Streaming dimension feed → SCD2 snapshot — the foreachBatch MERGE
  * pattern: dimension loads arrive as a stream of dated batches, and
  * each micro-batch advances the versioned snapshot with one
  * [[Scd2.merge]] per load date (ascending — a micro-batch may carry
  * several queued loads after downtime). This is the standard
  * production shape for CDC-fed dimensions in Structured Streaming:
  * the merge itself stays a BATCH operation against the snapshot
  * store, the stream only drives arrival.
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
        val dates = batch.select(dateCol).distinct()
          .collect().map(_.getString(0)).sorted
        for (d <- dates) {
          val load = batch.filter(col(dateCol) === d).drop(dateCol)
          snapshot = Scd2.merge(snapshot, load, key, attrs, d).ckpt
        }
      }
      .start()
    (q, () => snapshot)
  }
}
