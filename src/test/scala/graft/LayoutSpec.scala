package graft

import graft.operators.Layout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout (operators.Layout): files cover small hyper-rectangles
  * (not thin single-column slices), and parquet row-group statistics
  * actually SKIP data for a selective range filter on the non-leading
  * column — the property the 100 TB layout exists for. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two independent-ish uniform columns; deterministic (no RNG state)
  private lazy val data = spark.range(20000).select(
    (col("id") * 7919 % 1000).as("x"),
    (col("id") * 104729 % 1000).as("y"))

  // both layouts written ONCE per suite run into a fresh temp dir — a
  // fixed /tmp path would let a test run in isolation read stale parquet
  // from an earlier checkout and assert against data this code never wrote
  private lazy val (zp, xp) = {
    val base = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val z = s"$base/z"
    val x = s"$base/xsort"
    Layout.zorderWrite(data, Seq("x", "y"), z, numFiles = 16)
    data.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(x)
    (z, x)
  }

  private def perFileRange(path: String, c: String): Double = {
    val spans = spark.read.parquet(path)
      .withColumn("__f", input_file_name())
      .groupBy("__f").agg((max(col(c)) - min(col(c))).as("span"))
      .collect().map(_.getAs[Long]("span").toDouble)
    spans.sum / spans.length
  }

  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s.metrics("numOutputRows").value }
      .getOrElse(fail("no FileSourceScanExec in plan"))
  }

  test("splitRowGroups: order-preserving, actually splittable, multi-file " +
      "sources left alone; stageLayout is marker-idempotent and rebinds scans") {
    val base = java.nio.file.Files.createTempDirectory("graft-rgsplit").toString
    // a single-row-group single-file source (the ingest artifact)
    val src = s"$base/src"
    spark.range(200000)
      .select(col("id"), (col("id") * 7919 % 1000).as("v"))
      .coalesce(1)
      .write.option("parquet.block.size", (1L << 30).toString).parquet(src)
    val out = s"$base/out"
    assert(Layout.splitRowGroups(spark, src, out, blockBytes = 64L << 10).isDefined)
    // splittable: a session sized to the block reads >1 partition
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.files.maxPartitionBytes", (64L << 10).toString)
    assert(s2.read.parquet(out).rdd.getNumPartitions > 1,
      "staged copy still reads as one partition")
    // order-preserving: zipWithIndex fingerprints agree at every index
    def seq(p: String) = spark.read.parquet(p).select("id").rdd
      .zipWithIndex().map { case (r, i) => (i, r.getLong(0)) }
    assert(seq(src).join(seq(out)).filter { case (_, (a, b)) => a != b }
      .count() == 0L)
    // sources where NO file qualifies (all files small / already
    // multi-row-group) decline: staging would be a pure copy
    val multi = s"$base/multi"
    spark.range(1000).repartition(4).write.parquet(multi)
    assert(Layout.splitRowGroups(spark, multi, s"$base/m2", 64L << 10).isEmpty)
    // an already multi-row-group single file declines too (advice: don't
    // re-pack what already parallelizes)
    val alreadySplit = s"$base/already"
    spark.range(200000)
      .select(col("id"), (col("id") * 7919 % 1000).as("v"))
      .coalesce(1)
      .write.option("parquet.block.size", (64L << 10).toString)
      .parquet(alreadySplit)
    assert(Layout.rowGroupCount(spark,
      new java.io.File(alreadySplit).listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .head.getPath) > 1)
    assert(Layout.splitRowGroups(spark, alreadySplit, s"$base/a2", 64L << 10)
      .isEmpty)
    // stageLayout over a table dir shaped like the testdata contract
    val tdir = s"$base/tables"
    new java.io.File(tdir).mkdirs()
    val one = spark.read.parquet(src).coalesce(1)
    one.write.option("parquet.block.size", (1L << 30).toString)
      .parquet(s"$tdir/part.parquet")
    val staged = s"$base/staged"
    val s3 = spark.newSession()
    val n1 = Tables.stageLayout(s3, tdir, staged, blockBytes = 64L << 10)
    assert(n1 == 1) // only `part` exists in tdir
    assert(Tables.stageLayout(s3, tdir, staged, blockBytes = 64L << 10) == 0,
      "marker not honored: restaged an unchanged source")
    assert(s3.conf.get("spark.graft.scan.stagedDir") == staged)
    val files = Tables.table(s3, tdir, "part").inputFiles
    assert(files.nonEmpty && files.forall(_.contains("staged")),
      s"scan not rebound to the staged copy: ${files.toSeq}")
    // and the unstaged default still reads the original
    val s4 = spark.newSession()
    assert(Tables.table(s4, tdir, "part").inputFiles.forall(!_.contains("staged")))
    // source changes SHAPE to multi-file (splitRowGroups declines): the
    // leftover staged copy must be deleted, not keep shadowing the new
    // data through resolve()'s existence check
    Layout.deleteRec(new java.io.File(s"$tdir/part.parquet"))
    spark.range(500).select(col("id"), lit("fresh").as("tag"))
      .repartition(3).write.parquet(s"$tdir/part.parquet")
    val s5 = spark.newSession()
    assert(Tables.stageLayout(s5, tdir, staged, blockBytes = 64L << 10) == 0)
    assert(!new java.io.File(s"$staged/part.parquet").exists(),
      "declined restage left a stale staged copy shadowing the new source")
    val fresh = Tables.table(s5, tdir, "part")
    assert(fresh.inputFiles.forall(!_.contains("staged")))
    assert(fresh.count() == 500L)
  }

  test("splitRowGroups on a MULTI-file dir: each single-row-group file " +
      "staged independently, per-file order preserved, file order by source " +
      "path, small files copied byte-identical") {
    val base = java.nio.file.Files.createTempDirectory("graft-rgmulti").toString
    // a dir of single-row-group files with disjoint id ranges — the
    // common real-lake hand-off (per-file pandas/arrow exports)
    def writeOne(lo: Long, hi: Long, to: java.io.File): Unit = {
      val scratch = new java.io.File(to.getParentFile, s".w-${to.getName}")
      spark.range(lo, hi)
        .select(col("id"), (col("id") * 7919 % 1000).as("v"))
        .coalesce(1)
        .write.option("parquet.block.size", (1L << 30).toString)
        .parquet(scratch.getPath)
      val part = scratch.listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, to.toPath): Unit
    }
    val src = new java.io.File(s"$base/src"); src.mkdirs()
    writeOne(0L, 120000L, new java.io.File(src, "a.parquet"))
    writeOne(120000L, 200000L, new java.io.File(src, "b.parquet"))
    writeOne(200000L, 200100L, new java.io.File(src, "c.parquet")) // tiny
    val out = s"$base/out"
    assert(Layout.splitRowGroups(spark, src.getPath, out, 64L << 10).isDefined)
    val outs = new java.io.File(out).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(outs.map(_.getName).toSeq ==
      Seq("part-00000.parquet", "part-00001.parquet", "part-00002.parquet"))
    // per-file order preserved, file order by source path
    def ids(p: String) = spark.read.parquet(p).select("id").rdd
      .zipWithIndex().map { case (r, i) => (i, r.getLong(0)) }
    Seq("a.parquet" -> "part-00000.parquet", "b.parquet" -> "part-00001.parquet")
      .foreach { case (s0, o0) =>
        assert(ids(s"$src/$s0").join(ids(s"$out/$o0"))
          .filter { case (_, (x, y)) => x != y }.count() == 0L, s"$s0 drifted")
      }
    // the small file rides along byte-identical (never re-packed)
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(new java.io.File(src, "c.parquet").toPath),
      java.nio.file.Files.readAllBytes(new java.io.File(out, "part-00002.parquet").toPath)))
    // the staged copy actually parallelizes past the source's 3 files
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.files.maxPartitionBytes", (64L << 10).toString)
    assert(s2.read.parquet(out).rdd.getNumPartitions > 3,
      "staged multi-file copy still reads at source file granularity")
  }

  test("stageLayout is bound to its source dir: a session reading ANOTHER " +
      "dir (or a basename-sharing sibling) is not redirected to the staged copy") {
    val base = java.nio.file.Files.createTempDirectory("graft-stagebind").toString
    def mkTableDir(d: String, rows: Long, tag: String): Unit = {
      new java.io.File(d).mkdirs()
      spark.range(rows).select(col("id"), lit(tag).as("tag")).coalesce(1)
        .write.option("parquet.block.size", (1L << 30).toString)
        .parquet(s"$d/part.parquet")
    }
    mkTableDir(s"$base/one/sf", 200000L, "one")
    mkTableDir(s"$base/two/sf", 200000L, "two")
    val staged = s"$base/staged"
    val s = spark.newSession()
    Tables.stageLayout(s, s"$base/one/sf", staged, blockBytes = 64L << 10)
    assert(Tables.table(s, s"$base/one/sf", "part").inputFiles
      .forall(_.contains("staged")))
    // the OTHER dir (same basename "sf") must read its own files
    val other = Tables.table(s, s"$base/two/sf", "part")
    assert(other.inputFiles.forall(!_.contains("staged")),
      "resolve() redirected a different source dir to the staged copy")
    assert(other.select("tag").distinct().collect().map(_.getString(0)).toSeq
      == Seq("two"))
  }

  test("stageLayout copies of the REAL testdata equal the originals row for " +
      "row, through every loader's type normalization (events nanos path)") {
    val staged = java.nio.file.Files
      .createTempDirectory("graft-stage-eq").toString
    val s = spark.newSession()
    // sf0.001 tables are tiny — those under one 64 KB block DECLINE
    // staging (a pure copy buys nothing) and keep reading the original;
    // the assertion is row equality through whichever path resolves
    val nStaged = Tables.stageLayout(s, TestSpark.sfDir, staged,
      blockBytes = 64L << 10)
    assert(nStaged >= 1, "no sf0.001 table qualified for staging at 64 KB")
    val orig = spark // stagedDir conf unset here ⇒ reads originals
    Tables.names.foreach { t =>
      if (new java.io.File(s"${TestSpark.sfDir}/$t.parquet").exists()) {
        // through Tables.table's named loaders where they exist, so the
        // events nanos→micros normalization runs on BOTH paths
        def load(ses: org.apache.spark.sql.SparkSession) = t match {
          case "events" => Tables.events(ses, TestSpark.sfDir)
          case _        => Tables.table(ses, TestSpark.sfDir, t)
        }
        val a = load(orig)
        val b = load(s)
        if (new java.io.File(s"$staged/$t.parquet").exists())
          assert(b.inputFiles.forall(_.contains(staged)),
            s"$t staged but not read from its copy")
        else
          assert(b.inputFiles.forall(!_.contains(staged)),
            s"$t declined staging but reads a staged path")
        assert(a.schema == b.schema, s"$t schema drift")
        val cols = a.columns.map(col).toSeq
        assert(a.orderBy(cols: _*).collect().toSeq ==
          b.orderBy(cols: _*).collect().toSeq, s"$t rows drifted")
      }
    }
  }

  test("z-ordered files cover small ranges of BOTH columns") {
    // x-sort: y spans the full range in every file; z-order: both axes
    // bounded. 16 files over a 2-bit-deep effective split → expect ~4×
    // tighter y ranges; assert a conservative 2×.
    val zY = perFileRange(zp, "y")
    val sY = perFileRange(xp, "y")
    assert(zY * 2 < sY, s"z-order y-span $zY not < half of x-sort y-span $sY")
    // and the x axis stays bounded too: files cover a fraction of the
    // global x range (a y-sorted or unsorted layout would span ~all of
    // it). Files straddle z-prefix boundaries under range partitioning,
    // so the bound is the curve's guarantee (≤ half the space), not the
    // perfect-quadrant 1/4.
    val zX = perFileRange(zp, "x")
    assert(zX * 2 < 999.0, s"z-order x-span $zX spans ~the whole axis")
  }

  test("degenerate columns (all-null, constant) don't break the curve") {
    val p = java.nio.file.Files.createTempDirectory("graft-layout-deg").toString + "/p"
    val weird = spark.range(100).select(
      col("id").as("x"),
      lit(null).cast("double").as("allnull"),
      lit(7L).as("const"))
    Layout.zorderWrite(weird, Seq("x", "allnull", "const"), p, numFiles = 2)
    assert(spark.read.parquet(p).count() == 100L)
  }

  test("row-group stats skip data for a selective filter on the second column") {
    val pred = col("y").between(100, 150)
    val zRows = scanOutputRows(spark.read.parquet(zp).filter(pred))
    val sRows = scanOutputRows(spark.read.parquet(xp).filter(pred))
    // x-sorted layout: every row group spans all of y → nothing skipped
    // (scan surfaces ~all 20k rows). z-ordered: most row groups' y
    // min/max miss [100,150] → the scan itself emits far fewer rows.
    assert(zRows * 2 < sRows,
      s"z-order scan emitted $zRows rows, x-sort $sRows — no pruning happened")
    // both layouts return identical query results
    assert(spark.read.parquet(zp).filter(pred).count() ==
      spark.read.parquet(xp).filter(pred).count())
  }

  test("q217 shape on bucketed facts: the orderkey fact-fact join plans " +
      "with ZERO exchanges on the join key") {
    import org.apache.spark.sql.expressions.Window
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast: the 100-TB regime has both facts too large
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      graft.operators.Scale.writeBucketed(
        Tables.lineitem(spark, TestSpark.sfDir)
          .select("l_orderkey", "l_shipdate"),
        "q217_li_b", "l_orderkey", buckets = 8)
      graft.operators.Scale.writeBucketed(
        Tables.orders(spark, TestSpark.sfDir)
          .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        "q217_ord_b", "o_orderkey", buckets = 8)
      // the exact q217 aggregate chain over the bucketed tables
      val h = spark.table("q217_li_b")
        .join(spark.table("q217_ord_b"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("priority"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
            .as("days"))
        .groupBy(col("priority"), col("days")).agg(count(lit(1)).as("n"))
      val cum = h.withColumn("cum", sum(col("n"))
        .over(Window.partitionBy(col("priority")).orderBy(col("days"))))
      val p = cum.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert("hashpartitioning\\((l|o)_orderkey".r.findFirstIn(p).isEmpty,
        s"bucketed fact-fact join still shuffles on the join key:\n$p")
      assert(p.contains("Bucketed: true"), s"bucketing not engaged:\n$p")
      // identical results to the raw-parquet plan
      val raw = Tables.lineitem(spark, TestSpark.sfDir)
        .select("l_orderkey", "l_shipdate")
        .join(Tables.orders(spark, TestSpark.sfDir)
          .select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("priority"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
            .as("days"))
        .groupBy(col("priority"), col("days")).agg(count(lit(1)).as("n"))
      assert(h.orderBy("priority", "days").collect().toSeq ==
        raw.orderBy("priority", "days").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS q217_li_b")
      spark.sql("DROP TABLE IF EXISTS q217_ord_b")
    }
  }
}
