package graft.streaming

import graft.text.TextFunctions
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
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

  /** Streaming exact dedup at the ingest edge
    * (`dropDuplicatesWithinWatermark`): re-crawled / re-uploaded copies
    * of a document are dropped while their key is inside the watermark
    * window — and, unlike plain streaming `dropDuplicates`, the state
    * store EVICTS a key once the watermark passes it, so state is
    * bounded by the event-time window instead of growing with the
    * corpus forever (the only viable contract for a 100 TB ingest that
    * runs for months). Key = any column set; for content dedup pass
    * md5(text). Batch twin: `dropDuplicates(keys)` — DocStreamSpec
    * requires equality on a bounded fixture. */
  def dedupWithinWatermark(docs: DataFrame, tsCol: String, delay: String,
      keys: Seq[String]): DataFrame =
    docs.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

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

  final case class BucketRow(band: Int, bucket: String, doc_id: Long, sig: String)
  final case class NearDupCand(id1: Long, id2: Long, est_jaccard: Double)

  /** Per-document banded-minhash bucket rows as a STATELESS projection:
    * the portable md5 signature of q36 (3-shingles → 8 4-hex-char minima
    * → 4 bands of 2), computed per ROW with array HOFs instead of the
    * batch explode + groupBy — no shuffle, so it runs unchanged on a
    * streaming frame. Values are bit-identical to the batch path:
    * `array_min` over the transformed shingle array is the same
    * lexicographic minimum the batch `min` aggregate takes. Documents
    * with fewer than 3 tokens carry no shingles and drop here, exactly
    * like the batch `len(t) >= 3` gate. */
  def minhashBuckets(docs: DataFrame): Dataset[BucketRow] = {
    import docs.sparkSession.implicits._
    minhashBucketsWith(docs, Nil).as[BucketRow]
  }

  /** The bucket projection with pass-through columns (`keep`) — the
    * event-time column must survive to the sink for watermark-based
    * state eviction downstream. */
  def minhashBucketsWith(docs: DataFrame, keep: Seq[String]): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val grams = transform(
      sequence(lit(1), size(col("toks")) - 2, lit(1)),
      i => concat_ws(" ", slice(col("toks"), i, lit(3))))
    val ms = (0 to 7).map { j =>
      array_min(transform(col("grams"),
        g => substring(md5(g), j * 4 + 1, 4))).as(s"m$j")
    }
    val keepCols = keep.map(col)
    docs.select(col("doc_id") +: toks.as("toks") +: keepCols: _*)
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id") +: grams.as("grams") +: keepCols: _*)
      .select(col("doc_id") +: (ms ++ keepCols): _*)
      .select(Seq(col("doc_id"),
        concat_ws(",", (0 to 7).map(j => col(s"m$j")): _*).as("sig"),
        explode(array((0 to 3).map(b =>
          struct(lit(b).as("band"),
            md5(concat_ws(",", col(s"m${b * 2}"), col(s"m${b * 2 + 1}")))
              .as("bucket"))): _*)).as("bb")) ++ keepCols: _*)
      .select(Seq(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("doc_id"), col("sig")) ++ keepCols: _*)
  }

  /** Streaming twin of the incremental LSH dedup (q249): the nightly
    * crawl delta arrives as a STREAM, and each arriving document's
    * bucket rows (the stateless projection above) join the PERSISTED
    * base bucket index as a STREAM-STATIC join — the base side needs no
    * streaming state at all, exactly mirroring the batch operator's
    * delta-buckets ⋈ index shape (TextQueries.incrementalLshDedup). A
    * pair sharing several bands emits once per shared band; those
    * duplicates collapse through `dropDuplicatesWithinWatermark` on the
    * normalized (id1, id2) key, whose state the watermark EVICTS — so
    * pair-dedup state is bounded by the event-time window, not by the
    * corpus (the batch `distinct()`'s streaming analog with the only
    * viable long-running-ingest contract).
    *
    * Scale shape: per micro-batch the work is |delta buckets| ⋈ index,
    * delta-sized against a partition-prunable static side; nothing
    * corpus-sized enters the state store. */
  def incrementalLshStream(delta: DataFrame, baseIndex: DataFrame,
      tsCol: String, delay: String, minEst: Double = 0.5): DataFrame = {
    val db = minhashBucketsWith(delta.withWatermark(tsCol, delay),
      Seq(tsCol))
    val idx = baseIndex.select(col("band"), col("bucket"),
      col("doc_id").as("idb"), col("sig").as("sigb"))
    val matches = (0 to 7)
      .map(j => when(split(col("sig"), ",")(j) === split(col("sigb"), ",")(j),
        1).otherwise(0))
      .reduce(_ + _)
    db.join(idx, Seq("band", "bucket"))
      .filter(col("doc_id") =!= col("idb"))
      .select(least(col("doc_id"), col("idb")).as("id1"),
        greatest(col("doc_id"), col("idb")).as("id2"),
        round(matches.cast("double") / lit(8), 4).as("est_jaccard"),
        col(tsCol))
      .filter(col("est_jaccard") >= minEst)
      .dropDuplicatesWithinWatermark("id1", "id2")
      .select("id1", "id2", "est_jaccard")
  }

  /** Streaming LSH near-dup candidates — the incremental-ingest twin of
    * the q36 batch operator: every arriving document is checked against
    * EVERYTHING seen so far without reprocessing the corpus. State lives
    * per (band, bucket) — the LSH invariant means any pair with
    * estimated Jaccard ≥ the signature threshold shares at least one
    * bucket, so bucket-local state is sufficient and the quadratic term
    * stays bucket-bounded, exactly like the batch band join.
    *
    * Emits (id1 < id2, est_jaccard = signature agreement / 8, ≥ minEst)
    * when the LATER document arrives; a pair sharing several bands emits
    * once per shared band (consumers `dropDuplicates`, as the batch path
    * does with `distinct()`). Within a trigger, documents process in
    * doc_id order, so output is deterministic for a given file order.
    *
    * `maxPerBucket` caps state per bucket (first-arrival wins, later
    * docs still PAIR against the stored set but are not stored) — the
    * streaming form of the batch pipeline's degenerate-bucket routing;
    * a production deployment would additionally age state out with an
    * event-time TTL (`GroupStateTimeout`), which this local form leaves
    * at NoTimeout. */
  def lshCandidateStream(buckets: Dataset[BucketRow],
      minEst: Double = 0.5, maxPerBucket: Int = 64): Dataset[NearDupCand] = {
    import buckets.sparkSession.implicits._
    buckets
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState[Vector[(Long, String)], NearDupCand](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, String), rows: Iterator[BucketRow],
            state: GroupState[Vector[(Long, String)]]) =>
          var stored = state.getOption.getOrElse(Vector.empty)
          val out = scala.collection.mutable.ListBuffer.empty[NearDupCand]
          rows.toSeq.sortBy(_.doc_id).foreach { d =>
            if (!stored.exists(_._1 == d.doc_id)) {
              val dseg = d.sig.split(',')
              stored.foreach { case (oid, osig) =>
                val m = osig.split(',').zip(dseg).count { case (a, b) => a == b }
                val est = m / 8.0
                if (est >= minEst)
                  out += NearDupCand(math.min(oid, d.doc_id),
                    math.max(oid, d.doc_id), est)
              }
              if (stored.size < maxPerBucket) stored = stored :+ (d.doc_id, d.sig)
            }
          }
          state.update(stored)
          out.iterator
      }
  }

  /** Drive the candidate stream over all currently-available files into
    * a named in-memory sink (local smoke path, as `runCurationToMemory`). */
  def runLshCandidatesToMemory(spark: SparkSession, sourceDir: String,
      queryName: String): DataFrame = {
    val q = lshCandidateStream(minhashBuckets(readDocStream(spark, sourceDir)))
      .writeStream.outputMode("append").format("memory")
      .queryName(queryName).start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}
