package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension BATCH MERGE — the history-preserving
  * complement of [[Upsert]]'s overwrite merge (the reference updates
  * entities in place, `DataImporter.cs:55-180`; a warehouse feeding
  * time-travel analytics keeps every version instead). [[Scd.type2]]
  * RECONSTRUCTS history from a complete change log; this is the other
  * production path: an existing versioned snapshot advanced by one
  * point-in-time batch per load — the form a nightly dimension feed
  * actually arrives in.
  *
  * A dimension row carries `(attrs…, valid_from, valid_to, is_current)`
  * with ISO-date strings (`valid_to` null while current — string
  * comparison of ISO dates is lexicographic in every engine, so version
  * lookup needs no timestamp arithmetic). A batch merge at `batchDate`:
  *
  *  - changed keys (any tracked attribute differs, null-safe) → the
  *    current row closes (`valid_to = batchDate`) and a new current
  *    version opens;
  *  - new keys → a new current version opens;
  *  - unchanged and absent keys → rows pass through untouched.
  *
  * Scale shape: HISTORY NEVER MOVES — closed versions are a pure
  * pass-through union (at 100 TB, a partition-pruned scan when the
  * snapshot lands partitioned by `is_current`). The only shuffle is ONE
  * full-outer equi-join of the CURRENT slice against the (delta-sized)
  * batch on the natural key; with the snapshot landed bucketed on the
  * key (the q240/q260 recipe) even that plans exchange-free on the
  * snapshot side. Change detection is a codegen'd null-safe column
  * comparison — no row-by-row diffing.
  */
object Scd2 {

  val ValidFrom = "valid_from"
  val ValidTo = "valid_to"
  val IsCurrent = "is_current"

  /** Wrap an initial dimension load as the first SCD2 version set. */
  def initial(dim: DataFrame, loadDate: String): DataFrame =
    dim.withColumn(ValidFrom, lit(loadDate))
      .withColumn(ValidTo, lit(null).cast("string"))
      .withColumn(IsCurrent, lit(true))

  /** Merge `batch` (natural key + tracked attributes, pre-deduped per
    * key) into an SCD2 `snapshot` as of `batchDate`. */
  def merge(snapshot: DataFrame, batch: DataFrame, key: String,
      attrs: Seq[String], batchDate: String): DataFrame = {
    val history = snapshot.filter(!col(IsCurrent))
    val current = snapshot.filter(col(IsCurrent))
    val b = batch.select((key +: attrs).map(c => col(c).as(s"__b_$c")): _*)
    val j = current.join(b, col(key) === col(s"__b_$key"), "full_outer")

    val inBatch = col(s"__b_$key").isNotNull
    val inCur = col(key).isNotNull
    val differs: Column = attrs
      .map(a => !(col(a) <=> col(s"__b_$a")))
      .reduce(_ || _)
    val closes = inCur && inBatch && differs

    // surviving current rows: closed out where the batch changed them
    val kept = j.filter(inCur).select(
      (key +: attrs).map(col) ++ Seq(
        col(ValidFrom),
        when(closes, lit(batchDate)).otherwise(col(ValidTo)).as(ValidTo),
        (!closes).as(IsCurrent)): _*)
    // new versions: changed keys re-open, unseen keys insert
    val opened = j.filter(inBatch && (!inCur || differs)).select(
      col(s"__b_$key").as(key) +:
        attrs.map(a => col(s"__b_$a").as(a)) ++: Seq(
        lit(batchDate).as(ValidFrom),
        lit(null).cast("string").as(ValidTo),
        lit(true).as(IsCurrent)): _*)

    history.select(kept.columns.map(col): _*)
      .unionByName(kept)
      .unionByName(opened)
  }

  /** Land an SCD2 snapshot in its production layout: PARTITIONED by
    * `is_current` and BUCKETED by the natural key (the q240/q260
    * recipe applied to the versioned dimension). Why this layout: a
    * merge reads the current slice only — with `is_current` as the
    * partition column that filter is directory pruning, so the
    * ever-growing history partition is never scanned (at 100 TB the
    * history IS most of the dimension) — and the full-outer join
    * against the batch plans with zero snapshot-side exchange because
    * the current partition is bucketed on the join key. The history
    * partition is append-only across merges (closed versions land
    * there, existing files never rewrite), so a nightly merge's write
    * amplification is |current| + |closed today|, not |history|. */
  def landSnapshot(snapshot: DataFrame, table: String, key: String,
      buckets: Int, path: Option[String] = None): String = {
    val w = snapshot.write.mode("overwrite")
      .partitionBy(IsCurrent)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
    // external table on an explicit path: overwrite replaces stale data
    // from a previous session even when the fresh catalog has no entry
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
    table
  }

  /** Land an SCD2 snapshot partitioned by `is_current` WITHOUT bucketing
    * — the layout [[mergeIntoTable]] can write incrementally (Spark's
    * `insertInto` refuses bucketed tables). See [[landSnapshot]] for the
    * read-optimized bucketed variant. */
  def landSnapshotPartitioned(snapshot: DataFrame, table: String,
      path: Option[String] = None): String = {
    val w = snapshot.write.mode("overwrite")
      .partitionBy(IsCurrent)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
    table
  }

  /** Apply one batch merge INCREMENTALLY to a landed snapshot table
    * (written partitioned by `is_current`, NOT bucketed — Spark's
    * `insertInto` cannot write bucketed tables, so the two layout
    * variants trade read-side co-location against partition-level
    * incremental writes; pick per dimension). Exactly two writes:
    *
    *  1. APPEND the newly-closed versions — they carry
    *     `is_current = false`, so they land as NEW FILES in the history
    *     partition; every existing history file is untouched (spec-pinned
    *     by mtime), which is the write-amplification claim made concrete:
    *     a nightly merge writes |current| + |closed today| rows, never
    *     |history|.
    *  2. DYNAMIC-OVERWRITE the current partition with the surviving +
    *     opened current rows (`partitionOverwriteMode=dynamic` scoped to
    *     this writer via the DataFrameWriter option, so only the
    *     `is_current=true` directory is replaced).
    *
    * Not transactional across the two writes (a crash between them
    * leaves closed rows appended twice on retry) — the mechanics a real
    * deployment gets atomically from a table format; the LAYOUT and the
    * write set are what this demonstrates. The batch frame is computed
    * off the pre-write snapshot and PINNED (localCheckpoint) before the
    * first write so write 2 cannot observe write 1. */
  def mergeIntoTable(spark: org.apache.spark.sql.SparkSession, table: String,
      batch: DataFrame, key: String, attrs: Seq[String],
      batchDate: String): Unit = {
    val current = spark.table(table).filter(col(IsCurrent))
    val b = batch.select((key +: attrs).map(c => col(c).as(s"__b_$c")): _*)
    val j = current.join(b, col(key) === col(s"__b_$key"), "full_outer")
    val inBatch = col(s"__b_$key").isNotNull
    val inCur = col(key).isNotNull
    val differs: Column = attrs
      .map(a => !(col(a) <=> col(s"__b_$a")))
      .reduce(_ || _)
    val closes = inCur && inBatch && differs
    val outCols = current.columns
    val closed = j.filter(closes).select(
      (key +: attrs).map(col) ++ Seq(
        col(ValidFrom), lit(batchDate).as(ValidTo), lit(false).as(IsCurrent)): _*)
    val survivors = j.filter(inCur && !closes).select(
      (key +: attrs).map(col) ++ Seq(
        col(ValidFrom), col(ValidTo), lit(true).as(IsCurrent)): _*)
    val opened = j.filter(inBatch && (!inCur || differs)).select(
      col(s"__b_$key").as(key) +:
        attrs.map(a => col(s"__b_$a").as(a)) ++: Seq(
        lit(batchDate).as(ValidFrom),
        lit(null).cast("string").as(ValidTo),
        lit(true).as(IsCurrent)): _*)
    // pin BEFORE writing: both frames read the table being rewritten
    val closedPinned = graft.Ckpt(closed.select(outCols.map(col): _*))
    val currentPinned = graft.Ckpt(
      survivors.unionByName(opened).select(outCols.map(col): _*))
    closedPinned.write.mode("append").insertInto(table)
    withDynamicOverwrite(spark) {
      currentPinned.write.mode("overwrite").insertInto(table)
    }
  }

  /** Run `body` with `partitionOverwriteMode=dynamic` scoped around it.
    * The session conf, not the writer option: `insertInto`'s v1 command
    * ignores the per-writer "partitionOverwriteMode" (measured — STATIC
    * overwrite then deletes EVERY partition, history included). The
    * flip+write+restore is SERIALIZED per session (ADVICE r14): two
    * concurrent merges on one SparkSession could otherwise interleave so
    * one writer's overwrite runs under the restored 'static' mode — the
    * every-partition-delete hazard the comment above describes. Distinct
    * sessions (forked confs) stay fully concurrent. */
  private val overwriteLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def withDynamicOverwrite[A](
      spark: org.apache.spark.sql.SparkSession)(body: => A): A = {
    val lockKey = org.apache.spark.sql.GraftBridge.sessionUUID(spark)
      .getOrElse("identity@" + System.identityHashCode(spark))
    val lock = overwriteLocks.computeIfAbsent(lockKey, _ => new Object)
    lock.synchronized {
      val confKey = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(confKey)
      spark.conf.set(confKey, "dynamic")
      try body
      finally prev match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    }
  }

  /** Multi-date merge — fold a batch carrying SEVERAL load dates into
    * the snapshot in ONE pass, equal to merging each date's slice
    * sequentially in ascending date order (spec-pinned). This is the
    * streaming micro-batch shape: after downtime a batch drains many
    * queued loads, and a per-date merge loop would re-materialize the
    * snapshot once per date.
    *
    * Mechanics: per key, the current version (ordered first) is
    * prepended to the batch rows in load-date order; a row VERSIONS iff
    * its tracked attributes differ (null-safe) from its predecessor in
    * that sequence — a non-versioning row's attributes equal its own
    * predecessor's, so by induction comparing with the immediate lag
    * equals comparing with the last surviving version, exactly the
    * sequential-merge semantics. Each kept version closes at the NEXT
    * kept version's date (`lead`); the last stays current.
    *
    * Scale shape: history is still a pure pass-through union; the
    * current slice + batch shuffle ONCE on the key for the two window
    * passes (identical window spec — one exchange, one sort), vs one
    * full-outer-join shuffle PER DATE in the loop form. Contract: batch
    * rows are pre-deduped per (key, load date). */
  def mergeMulti(snapshot: DataFrame, batch: DataFrame, key: String,
      attrs: Seq[String], dateCol: String): DataFrame = {
    val history = snapshot.filter(!col(IsCurrent))
    val out = mergeMultiCore(
      snapshot.filter(col(IsCurrent)), batch, key, attrs, dateCol)
    history.select(out.columns.map(col): _*).unionByName(out)
  }

  /** The multi-date versioning core over (current slice, batch) — the
    * affected-row set only, no history pass-through: rows with
    * `is_current = false` are versions CLOSED by this merge (including
    * formerly-current survivors now superseded), rows with `true` are
    * the new current set. [[mergeMulti]] unions history back on;
    * [[mergeMultiIntoTable]] routes the two slices to their partitions. */
  private def mergeMultiCore(current: DataFrame, batch: DataFrame,
      key: String, attrs: Seq[String], dateCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c0 = current.select(col(key) +: attrs.map(col) ++: Seq(
      col(ValidFrom), lit(0).as("__ord")): _*)
    val bb = batch.select(col(key) +: attrs.map(col) ++: Seq(
      col(dateCol).as(ValidFrom), lit(1).as("__ord")): _*)
    // __ord keys the current version FIRST even when a batch load is
    // dated at (or before) the current version's valid_from
    val w = Window.partitionBy(key).orderBy(col("__ord"), col(ValidFrom))
    val differs = attrs.map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val kept = c0.unionByName(bb)
      // window expressions are select-only — materialize the keep flag
      // as a column before filtering on it
      .withColumn("__keep", row_number().over(w) === 1 || differs)
      .filter(col("__keep"))
    kept
      .withColumn("__next", lead(col(ValidFrom), 1).over(w))
      .select(col(key) +: attrs.map(col) ++: Seq(
        col(ValidFrom),
        col("__next").as(ValidTo),
        col("__next").isNull.as(IsCurrent)): _*)
  }

  /** [[mergeIntoTable]]'s multi-date twin: fold a batch carrying several
    * load dates into the landed (`is_current`-partitioned) table in ONE
    * pass — one key shuffle + two window passes over current∪batch (the
    * [[mergeMulti]] core), then the same two writes as the single-date
    * form: closed versions APPEND into the history partition (existing
    * files byte-untouched), the current partition dynamic-overwrites.
    * Same non-transactionality note as [[mergeIntoTable]]. */
  def mergeMultiIntoTable(spark: org.apache.spark.sql.SparkSession,
      table: String, batch: DataFrame, key: String, attrs: Seq[String],
      dateCol: String): Unit = {
    val current = spark.table(table).filter(col(IsCurrent))
    val outCols = current.columns
    val core = graft.Ckpt(
      mergeMultiCore(current, batch, key, attrs, dateCol)
        .select(outCols.map(col): _*))
    core.filter(!col(IsCurrent)).write.mode("append").insertInto(table)
    withDynamicOverwrite(spark) {
      core.filter(col(IsCurrent)).write.mode("overwrite").insertInto(table)
    }
  }

  /** The version of each SCD2 `dim` row valid at `asOfCol` (an ISO date
    * string): `valid_from <= asOf < coalesce(valid_to, '9999-12-31')`.
    * Returns the join condition for the fact→dim temporal lookup; the
    * interval predicate is a residual on the key equi-join, so the plan
    * stays a hash join on the key (never an interval cross product). */
  def asOfCondition(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, asOfCol: String): Column =
    fact(factKey) === dim(dimKey) &&
      fact(asOfCol) >= dim(ValidFrom) &&
      fact(asOfCol) < coalesce(dim(ValidTo), lit("9999-12-31"))
}
