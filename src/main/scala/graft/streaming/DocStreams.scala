package graft.streaming

import graft.text.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming document curation (SURVEY §2.10 × the training-data
  * pipeline): the text gates — language id, quality signals, PII
  * detection/redaction — are STATELESS projections, so the exact batch
  * expression trees run unchanged under Structured Streaming: a corpus
  * that arrives as files (crawl drops, upload batches) curates
  * incrementally with no reprocessing and no state store at all. Only
  * the cross-document stages (dedup, LM training, clustering) need
  * state or a batch pass; the per-document verdicts stream.
  *
  * The spec (DocStreamSpec) drives the SAME projection through
  * readStream and batch and requires identical rows — the "stream ==
  * batch" equality every stateless gate must satisfy by construction. */
object DocStreams {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /** Per-document curation verdicts — works on a streaming OR batch
    * frame (the expression tree is identical; that is the point). */
  def curationGates(docs: DataFrame): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val pii = TextFunctions.piiCounts(col("text"))
    docs.select(
      col("doc_id"),
      TextFunctions.langId(col("text")).as("lang_pred"),
      size(toks).as("n_tokens"),
      TextFunctions.stopwordRatio(col("text")).as("stopword_ratio"),
      (pii(0) + pii(1) + pii(2)).cast("long").as("n_pii"),
      md5(TextFunctions.piiRedact(col("text"))).as("redacted_md5"))
  }

  /** Run the curation stream over all currently-available files into a
    * named in-memory sink (local smoke path; a deployment writes a
    * parquet/Delta sink with a checkpoint). */
  def runCurationToMemory(spark: SparkSession, sourceDir: String,
      queryName: String): DataFrame = {
    val q = curationGates(readDocStream(spark, sourceDir))
      .writeStream.outputMode("append").format("memory")
      .queryName(queryName).start()
    try q.processAllAvailable()
    finally q.stop() // a failed batch must not leak a running query
    spark.table(queryName)
  }
}
