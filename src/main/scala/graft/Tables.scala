package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (see /root/repo/TESTDATA.md).
  *
  * Mirrors the reference's entity scans (SURVEY §2.1 S4 — e.g.
  * `DataExporter.cs:735`, `LinqCatalogSearchService.cs:107`): each entity set
  * is exposed as a lazily-scanned relation. On a cluster these reads are
  * partition-parallel parquet scans; Catalyst pushes filters and prunes
  * columns into the scan, so callers should compose filters/projections
  * BEFORE any action (the reference achieves the same via IQueryable
  * composition before materialization).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  /** Resolved-relation cache, keyed per session. `spark.read.parquet` runs
    * a driver-side file-listing job and reads parquet footers every call —
    * tens of ms of fixed latency PER QUERY per table. A real deployment
    * registers each table once in a catalog and reuses the resolved
    * relation; this cache is that catalog registration. (Logical plans
    * only — no data is cached; scans stay distributed.)
    *
    * Session key = `sessionUUID` (globally unique — identityHashCode
    * collides across live/recycled sessions and could hand back a plan
    * bound to a stopped session). Entries for stopped sessions are pruned
    * on access; since a cached DataFrame strongly references its session
    * (so abandoned-but-unstopped sibling sessions can never be collected
    * through this map), a hard cap backstops the prune: past MaxSessions
    * live sessions the whole cache resets, trading a one-time re-listing
    * for guaranteed bounded memory under session churn. */
  // session held directly: a WeakReference would be dead weight — cached
  // DataFrames strongly reference their session, so it can never be
  // collected while its entry exists; isStopped + the cap do the pruning
  private val relations = new java.util.concurrent.ConcurrentHashMap[
    String,
    (SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame])]()

  private def sessionKey(spark: SparkSession): String =
    org.apache.spark.sql.GraftBridge.sessionUUID(spark)
      .getOrElse("identity@" + System.identityHashCode(spark)) // non-classic fallback

  private val MaxSessions = 32

  private def prune(): Unit = {
    val it = relations.entrySet().iterator()
    while (it.hasNext) {
      if (it.next().getValue._1.sparkContext.isStopped) it.remove()
    }
    if (relations.size > MaxSessions) relations.clear()
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (relations.size > 4) prune()
    val (_, perSession) = relations.computeIfAbsent(
      sessionKey(spark),
      _ => (spark,
        new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()))
    val src = resolve(spark, dir, name)
    perSession.computeIfAbsent((src, name), _ => spark.read.parquet(src))
  }

  /** Layout indirection: when `spark.graft.scan.stagedDir` names a
    * directory holding a row-group-split copy of `name` (written by
    * [[stageLayout]] — same rows, same order, many row groups instead of
    * one), scans read the copy. The driver-generated tables arrive as one
    * monolithic row group each, which serializes every first stage (see
    * `operators.Layout.splitRowGroups`); a real deployment fixes the
    * layout once at ingest — this conf is that fix for a read-only
    * source dir. Unset (the default, and the correctness gate's mode):
    * read the original files. */
  private def resolve(spark: SparkSession, dir: String, name: String): String = {
    val orig = s"$dir/$name.parquet"
    spark.conf.getOption("spark.graft.scan.stagedDir") match {
      case Some(staged) if staged.nonEmpty =>
        // the staged copies belong to ONE source dir (recorded by
        // stageLayout): a session that stages one dataset and then reads
        // another — or two sfDirs sharing a basename — must NOT be
        // silently redirected to the wrong data. Checked TWICE: against
        // the session conf (this session's binding) AND against the
        // per-table marker ON DISK (another process staging a
        // basename-colliding dir can rewrite the copies under a live
        // session — the conf can't see that, the marker's src= can).
        val canonical = new java.io.File(dir).getCanonicalPath
        val confOk = spark.conf
          .getOption("spark.graft.scan.stagedSrc").filter(_.nonEmpty)
          .forall(_ == canonical)
        val cand = new java.io.File(s"$staged/$name.parquet")
        val marker = new java.io.File(s"$staged/$name.stamp")
        // the marker can vanish between exists() and the read (another
        // process's stageLayout deletes it when a source declines or
        // disappears) — any read failure means "not staged", fall back
        // to the original file rather than failing the query.
        val markerOk = marker.exists() && scala.util.Try {
          val st = new String(java.nio.file.Files.readAllBytes(marker.toPath),
            java.nio.charset.StandardCharsets.UTF_8)
          st.startsWith(s"src=$canonical;")
        }.getOrElse(false)
        if (confOk && markerOk && cand.exists()) cand.getPath else orig
      case _ => orig
    }
  }

  /** Restage every single-row-group table of `dir` into `stagedDir` as an
    * order-preserving multi-row-group copy and point the session's
    * `spark.graft.scan.stagedDir` at it. Idempotent and mtime-keyed: a
    * marker per table records (source length, source mtime, block size);
    * current copies are reused, stale ones rewritten. Returns the number
    * of tables (re)staged this call. */
  def stageLayout(spark: SparkSession, dir: String, stagedDir: String,
      blockBytes: Long = 1L << 20): Int = {
    val base = new java.io.File(stagedDir)
    base.mkdirs()
    val srcDirCanonical = new java.io.File(dir).getCanonicalPath
    // stamp over the DATA FILES, not the path: a directory-shaped table
    // whose part file is rewritten in place keeps the directory's own
    // length/mtime, so a path-level stamp would serve the stale copy.
    // The stamp also pins the SOURCE DIR: two datasets sharing a staged
    // location (e.g. keyed by basename) must never reuse each other's
    // copies even if their file stats coincide.
    def stamp(f: java.io.File): String = {
      val leaves =
        if (f.isFile) Seq(f)
        else {
          val ls = f.listFiles()
          require(ls != null,
            s"stageLayout: cannot list ${f.getPath} (I/O error or " +
              "permission denied) — refusing to stage a table blind")
          ls.toSeq.filter(_.isFile)
            .filterNot(c => c.getName.startsWith("_") || c.getName.startsWith("."))
            .sortBy(_.getName)
        }
      s"src=$srcDirCanonical;" +
        leaves.map(c => s"${c.getName}=${c.length()}@${c.lastModified()}")
          .mkString(";") + s":$blockBytes"
    }
    def deleteRecursively(f: java.io.File): Unit =
      graft.operators.Layout.deleteRec(f)
    var n = 0
    // exclusion at BOTH levels: two Bench runs sharing a staged dir must
    // not interleave rewrite + marker (stale marker over fresh data or
    // vice versa). The JVM monitor serializes same-process callers (a
    // second FileChannel.lock() in one JVM THROWS OverlappingFileLock
    // instead of blocking); the OS file lock serializes processes; the
    // per-table tmp-dir + atomic rename inside splitRowGroups
    // additionally keeps a crashed run from leaving a half-written copy.
    stagingMonitor.synchronized {
    val lockCh = java.nio.channels.FileChannel.open(
      new java.io.File(base, ".lock").toPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lock = lockCh.lock()
    try {
      names.foreach { t =>
        val src = new java.io.File(s"$dir/$t.parquet")
        val out = new java.io.File(s"$stagedDir/$t.parquet")
        val marker = new java.io.File(base, s"$t.stamp")
        if (src.exists()) {
          val st = stamp(src)
          val current = marker.exists() &&
            new String(java.nio.file.Files.readAllBytes(marker.toPath),
              java.nio.charset.StandardCharsets.UTF_8) == st
          if (!current) {
            if (graft.operators.Layout.splitRowGroups(
                spark, src.getPath, out.getPath, blockBytes).isDefined) {
              java.nio.file.Files.write(marker.toPath,
                st.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              n += 1
            } else {
              // declined (nothing qualifies for splitting): a LEFTOVER
              // staged copy from an earlier shape must not keep shadowing
              // the source — resolve() checks existence, not currency
              deleteRecursively(out)
              marker.delete(): Unit
            }
          }
        } else {
          // source gone: drop any shadowing copy
          deleteRecursively(out)
          marker.delete(): Unit
        }
      }
    } finally {
      lock.release()
      lockCh.close()
    }
    }
    spark.conf.set("spark.graft.scan.stagedDir", stagedDir)
    spark.conf.set("spark.graft.scan.stagedSrc", srcDirCanonical)
    n
  }

  /** Same-JVM staging mutex — see the exclusion comment in
    * [[stageLayout]]. */
  private val stagingMonitor = new Object

  def region(s: SparkSession, dir: String): DataFrame = table(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame = table(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = table(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = table(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame = table(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = table(s, dir, "lineitem")
  /** The generator has written `ts` under two physical types across data
    * drops: TIMESTAMP(NANOS) (no native Spark type — sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and the nanos long is
    * converted here; values are micro-aligned, so no precision is lost)
    * and TIMESTAMP(MICROS) with isAdjustedToUTC=false, which Spark 4
    * infers as TimestampNTZType. Both normalize to TimestampType so every
    * consumer (window ops, the native as-of exec, streaming) sees ONE
    * type; sessions run UTC, so the NTZ→TZ cast is value-preserving and
    * matches how the DuckDB oracle reads the same naive timestamps. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = table(s, dir, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        // integer `div`, NOT `/`: epoch nanos (~1.7e18) exceed double's
        // 52-bit mantissa, so float division drifts timestamps by ±256ns
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // The NTZ→TZ cast re-interprets wall-clock values in the SESSION
        // zone; it is value-preserving only under UTC. Fail loudly on a
        // misconfigured session instead of silently shifting timestamps.
        val tz = s.conf.get("spark.sql.session.timeZone",
          java.util.TimeZone.getDefault.getID)
        require(tz == "UTC",
          s"events: TimestampNTZ ts requires spark.sql.session.timeZone=UTC " +
            s"(got '$tz') — the NTZ->TZ normalization would shift values")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")
}
