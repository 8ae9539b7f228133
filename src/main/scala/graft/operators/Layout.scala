package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data layout for scan pruning — the write-side half of the
  * 100 TB story. Partition pruning (IVF index) and bucketing (ScaleSpec)
  * cover equality keys; Z-ORDERING covers RANGE predicates over several
  * columns at once: interleave the bits of per-column bucket ranks into
  * one space-filling-curve key, range-partition and sort the write by
  * it, and every output file/row-group ends up covering a small
  * HYPER-RECTANGLE of the value space instead of a thin slice of one
  * column. Parquet min/max statistics then skip most row groups for a
  * selective filter on ANY of the curve's columns — a single-column sort
  * gives that for the leading column only.
  *
  * All pure Column arithmetic (width_bucket + shifts), so the curve key
  * costs one narrow projection; the layout write is one range shuffle —
  * the same cost as any sorted write.
  */
object Layout {

  /** Equi-width bucket rank of `c` in [0, 2^bits): width_bucket over the
    * [lo, hi] range, clamped (values at/above hi land in the top bucket,
    * nulls in bucket 0 so they cluster together). */
  def bucketRank(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = 1 << bits
    val wb = width_bucket(c.cast("double"), lit(lo), lit(hi), lit(n))
    // null/NaN handled FIRST: least/greatest SKIP nulls (least(null, n)
    // = n), so a trailing coalesce would drop nulls into the TOP bucket,
    // not bucket 0 as documented
    when(wb.isNull, lit(0L))
      .otherwise(greatest(least(wb, lit(n)) - 1, lit(0)).cast("long"))
  }

  /** Interleave the low `bits` bits of k rank columns into a Z-value:
    * bit i of rank j lands at curve bit (i*k + j). */
  def zValue(ranks: Seq[Column], bits: Int): Column = {
    val k = ranks.size
    require(k >= 1 && bits * k <= 62, s"curve needs $bits*$k bits")
    val terms = for {
      i <- 0 until bits
      (r, j) <- ranks.zipWithIndex
    } yield shiftleft(shiftright(r, i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ + _)
  }

  /** Z-order `df` by `cols` and write `numFiles` parquet files: one
    * min/max pass (two doubles per column to the driver — statistics,
    * not data), one narrow projection for the curve key, one range
    * shuffle. At cluster scale this is the nightly compaction job's
    * layout; readers need no cooperation — parquet row-group stats do
    * the skipping. */
  def zorderWrite(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int, bits: Int = 8): Unit = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val st = df.agg(aggs.head, aggs.tail: _*).head()
    val ranks = cols.zipWithIndex.map { case (c, i) =>
      // all-null / non-castable column ⇒ null stats; degenerate range ⇒
      // single constant bucket — either way the curve stays valid
      if (st.isNullAt(2 * i) || st.isNullAt(2 * i + 1)) lit(0L)
      else {
        val lo = st.getDouble(2 * i)
        val hi = st.getDouble(2 * i + 1)
        if (hi > lo) bucketRank(col(c), lo, hi, bits) else lit(0L)
      }
    }
    df.withColumn("__z", zValue(ranks, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Data files of a parquet directory with sizes, via the Hadoop FS API
    * (skips _SUCCESS / checksums / hidden files). */
  private def dataFiles(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).toSeq
      .filter(_.isFile)
      .map(st => (st.getPath.getName, st.getLen))
      .filterNot { case (n, _) => n.startsWith("_") || n.startsWith(".") }
  }

  /** Small-files compaction: rewrite a directory of many small parquet
    * files as ⌈total-bytes / targetBytes⌉ files. Returns
    * (filesBefore, filesAfter).
    *
    * At 100 TB the ingest tail (per-task files, streaming micro-batches,
    * over-parallel writers) degrades every later scan — footer decode
    * per file, scheduler pressure, tiny row groups with useless
    * statistics. The nightly compaction job is this: ONE round-robin
    * repartition (no keyed shuffle — rows only need to coalesce, not
    * co-locate) sized from the actual on-disk bytes, not a guessed
    * partition count. Compose with [[zorderWrite]] when the compacted
    * table should also carry a scan-pruning sort order. */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long): (Int, Int) = {
    val before = dataFiles(spark, inPath)
    val nOut = math.max(1,
      math.ceil(before.map(_._2).sum.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outPath)
    (before.size, dataFiles(spark, outPath).size)
  }

  /** Row-group count from the parquet footer — the property that decides
    * whether a file's scan can parallelize at all (Spark splits across
    * row groups / files, never within one row group). */
  def rowGroupCount(spark: org.apache.spark.sql.SparkSession,
      file: String): Int = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file), spark.sessionState.newHadoopConf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter.getBlocks.size finally r.close()
  }

  /** Row-group split: [[compact]]'s inverse for the OTHER ingest-tail
    * artifact — data delivered as monolithic row groups. Spark
    * parallelizes scans across row groups / file splits, never within
    * one, so a single-row-group file serializes not just the decode but
    * the whole first stage of every query over it (partial aggregation,
    * shuffle-map work — measured 5× on a 600 k-row table at 32 threads).
    * Such files are common hand-offs: a pandas/arrow `write_table` with
    * default settings, a single-threaded exporter, a DB dump — and in a
    * real lake they arrive PER FILE in multi-file directories too, which
    * is why this stages each data file independently.
    *
    * A file QUALIFIES for rewriting when its footer says one row group
    * and it is bigger than `blockBytes` (checked via [[rowGroupCount]] —
    * an already multi-row-group file is left byte-identical rather than
    * re-packed, so its order never depends on Spark's split packing). If
    * NO file qualifies the whole source is left alone and the method
    * returns None: staging would be a pure copy.
    *
    * The rewrite is ORDER-PRESERVING by construction: each source file
    * is processed on its own — one reader, one writer task (the file is
    * one row group, so its read is serial anyway), the writer flushing a
    * row group every `blockBytes` — and output files are named
    * `part-NNNNN.parquet` in SOURCE-PATH-SORTED order, so file order by
    * name matches the source's file order by name (the same contract the
    * CSV skip/take per-file window uses). Positional contracts
    * (file-order import semantics, zipWithIndex segment numbering) stay
    * byte-stable. Readers need `spark.sql.files.maxPartitionBytes` ≤
    * `blockBytes` to actually split the files; a row-count check guards
    * the rewrite. Returns total output bytes.
    *
    * Crash-safe: the copy is assembled in a process-unique `.tmp`
    * sibling and renamed into place, so a killed stage never leaves a
    * half-written `outPath` that a concurrent reader could resolve. */
  /** Null-safe recursive delete — THE one definition (Tables and the
    * layout specs delegate here). */
  private[graft] def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty)
      .foreach(deleteRec)
    f.delete(): Unit
  }

  def splitRowGroups(spark: org.apache.spark.sql.SparkSession,
      inPath: String, outPath: String, blockBytes: Long): Option[Long] = {
    val inFile = new java.io.File(inPath)
    val isDir = inFile.isDirectory
    // only FLAT dirs of .parquet data files qualify — a nested layout
    // (hive partitions) or non-parquet sidecars mean dataFiles() would
    // stage a subset of the relation's rows (and rowGroupCount would
    // choke on a sidecar); DECLINE rather than crash, the original
    // files already read correctly
    if (isDir) {
      val entries = Option(inFile.listFiles()).getOrElse(Array.empty)
        .filterNot(c => c.getName.startsWith("_") || c.getName.startsWith("."))
      if (entries.exists(_.isDirectory) ||
          entries.exists(c => c.isFile && !c.getName.endsWith(".parquet")))
        return None
    }
    val files = dataFiles(spark, inPath).sortBy(_._1)
    if (files.isEmpty) return None
    def filePath(name: String): String = if (isDir) s"$inPath/$name" else inPath
    val qualifies = files.map { case (n, len) =>
      len > blockBytes && rowGroupCount(spark, filePath(n)) == 1
    }
    if (!qualifies.contains(true)) return None
    // reclaim crash leftovers of ANY pid first (the tmp name embeds the
    // writer's pid, so a dead run's dir would otherwise leak forever)
    val outName = new java.io.File(outPath).getName
    Option(new java.io.File(outPath).getParentFile)
      .flatMap(p => Option(p.listFiles())).getOrElse(Array.empty)
      .filter(_.getName.startsWith(outName + ".tmp-"))
      .foreach(deleteRec)
    val tmp = new java.io.File(
      outPath + s".tmp-${java.lang.ProcessHandle.current().pid()}")
    tmp.mkdirs()
    try {
      files.zip(qualifies).zipWithIndex.foreach {
        case (((name, _), split), i) =>
          val srcFile = filePath(name)
          val dst = new java.io.File(tmp, f"part-$i%05d.parquet")
          if (!split) {
            // already multi-row-group (or small): byte-identical copy
            java.nio.file.Files.copy(
              java.nio.file.Paths.get(srcFile), dst.toPath): Unit
          } else {
            // coalesce(1) over ONE file concatenates its byte-range
            // splits in offset order — file order in, file order out
            val scratch = new java.io.File(tmp, s".rw-$i")
            spark.read.parquet(srcFile).coalesce(1).write.mode("overwrite")
              .option("parquet.block.size", blockBytes.toString)
              .parquet(scratch.getPath)
            val part = Option(scratch.listFiles()).getOrElse(Array.empty)
              .filter(f => f.isFile && f.getName.endsWith(".parquet"))
            require(part.length == 1,
              s"splitRowGroups: expected one part file in $scratch")
            java.nio.file.Files.move(part.head.toPath, dst.toPath): Unit
            deleteRec(scratch)
          }
      }
      val n = spark.read.parquet(tmp.getPath).count()
      val srcN = spark.read.parquet(inPath).count()
      require(n == srcN,
        s"splitRowGroups: row count changed rewriting $inPath -> $outPath" +
          s" ($srcN -> $n)")
      deleteRec(new java.io.File(outPath))
      java.nio.file.Files.move(tmp.toPath,
        java.nio.file.Paths.get(outPath)): Unit
      Some(dataFiles(spark, outPath).map(_._2).sum)
    } finally deleteRec(tmp)
  }
}
