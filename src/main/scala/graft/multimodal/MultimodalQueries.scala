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

  /** Feature extraction through the partition-batched stub codec. The
    * float feature vectors have no SQL oracle (unit-tested against the
    * deterministic fake); the decode stage's exact byte-stream checksum,
    * emitted in the same mapPartitions pass, IS oracle-checkable — DuckDB
    * re-derives it from the hex of the same utf-8 payload. */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
        Multimodal.attachBinary(Tables.documents(s, dir), "doc_id", "text"))
      .select(col("media_id"), col("feature_checksum"))
      .orderBy(col("media_id"))

  /** Frame sampling through the stub codec — every 2nd 256-byte frame as
    * its own row; the gate verifies exact frame boundaries and content
    * (hex prefix) against DuckDB's hex-domain slicing of the same
    * payload. */
  def frameSamples(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(
        Multimodal.attachBinary(Tables.documents(s, dir), "doc_id", "text"))
      .select(col("media_id"), col("frame_idx"),
        octet_length(col("frame")).as("frame_bytes"),
        substring(hex(col("frame")), 1, 16).as("frame_hex16"))
      .orderBy(col("media_id"), col("frame_idx"))

  val qs: Seq[Q] = Seq(
    Q("q76_frame_sample", (s, d) => frameSamples(s, d), Some(
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
        |                  octet_length(encode(text)) AS n
        |           FROM documents),
        |f AS (SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |             CAST(least(256, n - i * 256) AS INT) AS frame_bytes,
        |             substr(hx, CAST(i * 512 + 1 AS INT), 16) AS frame_hex16
        |      FROM b, unnest(range(0, CAST(ceil(n / 256.0) AS BIGINT), 2)) AS t(i))
        |SELECT doc_id AS media_id, frame_idx, frame_bytes, frame_hex16
        |FROM f
        |ORDER BY media_id, frame_idx""".stripMargin)),
    Q("q43_media_meta", (s, d) => mediaMeta(s, d), Some(
      """SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
        |       md5(text) AS digest
        |FROM documents
        |ORDER BY media_id""".stripMargin)),
    Q("q44_media_features", (s, d) => mediaFeatures(s, d), Some(
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
        |                  octet_length(encode(text)) AS n
        |           FROM documents)
        |SELECT doc_id AS media_id,
        |       CAST(COALESCE(list_sum(list_transform(range(n), i ->
        |         ((i % 8) + 1) *
        |         (16 * (strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS INT), 1)) - 1)
        |              + strpos('0123456789ABCDEF', substr(hx, CAST(2*i+2 AS INT), 1)) - 1)
        |       )), 0) AS BIGINT) AS feature_checksum
        |FROM b
        |ORDER BY media_id""".stripMargin))
  )
}
