package graft.multimodal

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing queries: documents wrapped as binary media rows. */
object MultimodalQueries {

  /** Binary metadata projection — oracle-checkable (byte count + digest
    * computed on the same utf-8 payload in both engines). */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaMeta(
        Multimodal.attachBinary(Tables.documents(s, dir), "doc_id", "text"))
      .orderBy(col("media_id"))

  /** Feature extraction through the partition-batched stub codec (no SQL
    * oracle — covered by unit tests on the deterministic fake). */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
        Multimodal.attachBinary(Tables.documents(s, dir), "doc_id", "text"))
      .select(col("media_id"),
        round(aggregate(col("features"), lit(0.0d), (a, x) => a + x), 4)
          .as("feature_sum"))
      .orderBy(col("media_id"))

  val qs: Seq[Q] = Seq(
    Q("q43_media_meta", (s, d) => mediaMeta(s, d), Some(
      """SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
        |       md5(text) AS digest
        |FROM documents
        |ORDER BY media_id""".stripMargin)),
    Q("q44_media_features", (s, d) => mediaFeatures(s, d), None)
  )
}
