package graft

import graft.streaming.DocStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming curation == batch curation, row for row: the text gates are
  * stateless projections, so the identical expression tree must produce
  * identical verdicts under Structured Streaming and batch. */
class DocStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming curation gates equal the batch run exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-docs").toString
    Tables.documents(spark, TestSpark.sfDir)
      .write.mode("overwrite").parquet(tmp)
    val streamed = DocStreams
      .runCurationToMemory(spark, tmp, "curation_stream_smoke")
      .orderBy(col("doc_id")).collect().toSeq
    val batch = DocStreams
      .curationGates(Tables.documents(spark, TestSpark.sfDir))
      .orderBy(col("doc_id")).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("incremental arrival: a second file batch appends without reprocessing") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-docs-inc").toString
    val docs = Tables.documents(spark, TestSpark.sfDir)
    docs.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$tmp/batch1")
    // one sink, two availability points — the cron/crawl-drop pattern
    val q = DocStreams.curationGates(DocStreams.readDocStream(spark, s"$tmp/batch*"))
      .writeStream.outputMode("append").format("memory")
      .queryName("curation_inc").start()
    q.processAllAvailable()
    val afterFirst = spark.table("curation_inc").count()
    docs.filter(col("doc_id") % 2 === 1)
      .write.mode("overwrite").parquet(s"$tmp/batch2")
    q.processAllAvailable()
    q.stop()
    val total = spark.table("curation_inc").count()
    assert(afterFirst > 0 && total == docs.count(),
      s"afterFirst=$afterFirst total=$total expected=${docs.count()}")
  }
}
