package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming wrapper over the event operators (SURVEY §2.10:
  * the reference is batch-only — cron-scheduled re-runs; this is the
  * stretch-goal streaming expression of the same shapes, so a pipeline can
  * move from scheduled batch to continuous without changing semantics).
  *
  * The transforms are shared with the batch path: windowed counts with
  * watermarked event time. At scale, state lives in the state store keyed
  * by (window, type) — bounded by the watermark horizon.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("user_id", LongType, nullable = true),
    StructField("event_type", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true),
    StructField("props", StringType, nullable = true)))

  /** File-based stream source over an events directory (parquet drops). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling-window counts per event type with late-data watermark —
    * shared shape with EventQueries.dailyByType. */
  def windowedCounts(events: DataFrame, window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total_value"))

  /** Run a windowed-count stream to a named in-memory sink until all
    * currently-available input is processed (local smoke path). */
  def runToMemory(spark: SparkSession, sourceDir: String, queryName: String,
      window: String = "1 hour"): DataFrame = {
    val q = windowedCounts(readEventStream(spark, sourceDir), window)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
