package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus a partition-batched feature
  * extraction pipeline.
  *
  * The Spark-side contract is real and tested — schema, partitioning,
  * batch iteration shape; only the codec itself is STUBBED (the
  * image/audio libraries are not in this container) with a deterministic
  * fake so the pipeline is verifiable end-to-end. On a cluster the decode
  * stage is embarrassingly parallel (mapPartitions, no shuffle), and
  * feature vectors flow into the `similarity.Ann` operators unchanged.
  */
object Multimodal {

  /** Media record schema: opaque payload + typed metadata struct — the
    * binary analog of the reference's media tables (MediaSearcher surface,
    * SURVEY §2.3 F2). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true),
      StructField("digest", StringType, nullable = true))), nullable = true)))

  /** Wrap a text frame as media rows: payload = utf-8 bytes (stand-in for
    * image/audio bytes), metadata derived inline (pure expressions). */
  def attachBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col(textCol)).cast(LongType).as("n_bytes"),
        md5(encode(col(textCol), "UTF-8")).as("digest")).as("meta"))

  val FeatureDim = 8

  /** Partition-batched "decode + feature extraction".
    *
    * STUB CODEC: a real deployment decodes payload bytes with an image/
    * audio library here (batched per partition so codec state is reused).
    * This container has no media codecs, so the decode emits a
    * deterministic fake feature vector derived from the payload bytes —
    * the Spark plumbing (mapPartitions over binary rows, fixed-dim float
    * output schema, no shuffle) is exactly what production would run. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = true),
      StructField("feature_checksum", LongType, nullable = false)))
    val enc = Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      // per-partition setup happens once (codec init in production).
      // null ids (dirty cast upstream) are skipped like null payloads —
      // getLong on a null cell would NPE and kill the whole job
      rows.flatMap { r =>
        if (r.isNullAt(0)) None
        else {
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          Some(Row(r.getLong(0), fakeDecode(bytes), checksum(bytes)))
        }
      }
    }(enc)
  }

  /** Integer byte-stream checksum emitted alongside the decoded features —
    * the cross-engine integrity probe for the decode stage (exact in Long,
    * so the correctness gate can verify the binary plumbing value-level
    * even while the codec itself is stubbed). */
  private[graft] def checksum(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc += ((i % FeatureDim) + 1).toLong * (bytes(i) & 0xFF)
      i += 1
    }
    acc
  }

  /** Deterministic fake decoder: dim-wise byte-histogram projections. */
  private[graft] def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      acc(i % FeatureDim) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    acc
  }

  /** Metadata projection (oracle-checkable: byte counts + digests). */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("meta.n_bytes").as("n_bytes"),
      col("meta.digest").as("digest"))

  /** Video-style frame sampling: payload bytes chunked into fixed-size
    * "frames", every `everyNth` frame emitted as its own row — the
    * row-explosion shape of real frame extraction (one input row → many
    * bounded output rows, no shuffle; a real codec replaces the byte
    * chunking, the partition-batched iteration and output schema stay).
    * Frame payloads are EXACT byte slices, so the gate can verify the
    * plumbing value-level cross-engine (via hex slicing in the oracle). */
  def frameSample(media: DataFrame, frameBytes: Int = 256,
      everyNth: Int = 2): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.isNullAt(0)) Iterator.empty
        else {
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        (0 until nFrames by everyNth).iterator.map { i =>
          val from = i * frameBytes
          val until = math.min(from + frameBytes, bytes.length)
          Row(id, i, java.util.Arrays.copyOfRange(bytes, from, until))
        }
        }
      }
    }(enc)
  }

  /** Image-style resize stub: payload truncated to `maxBytes` (the
    * deterministic fake for a decode→scale→re-encode pass — shrinking,
    * size-bounded output; metadata records both sizes). Same
    * partition-batched shape a real codec needs. */
  def resizeStub(media: DataFrame, maxBytes: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("orig_bytes", LongType, nullable = false),
      StructField("resized_bytes", LongType, nullable = false)))
    val enc = Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.isNullAt(0)) None
        else {
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val out = if (bytes.length <= maxBytes) bytes
            else java.util.Arrays.copyOfRange(bytes, 0, maxBytes)
          Some(Row(r.getLong(0), out, bytes.length.toLong, out.length.toLong))
        }
      }
    }(enc)
  }
}
