package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp
import scala.util.Random

/** The native as-of operator (plans.AsOfJoinExec) must be
  * indistinguishable from the composition form (AsOfJoin.asOf) on EVERY
  * input — including the dirty ones: null keys, null timestamps on
  * either side, duplicate right timestamps (deterministic tie-break),
  * keys present on only one side, empty sides. Plus the plan properties
  * that are the operator's reason to exist: merge execution and
  * preserved left partitioning. */
class AsOfJoinNativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def assertSame(left: DataFrame, right: DataFrame, partition: String,
      lTs: String, rTs: String, vals: Seq[String], clue: String): Unit = {
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(None, Some(30L * 60 * 1000))) {
      val window = AsOfJoin.asOf(left, right, partition, lTs, rTs, vals, dir, tol)
      val native = AsOfJoin.asOfNative(left, right, partition, lTs, rTs, vals, dir, tol)
      assert(window.columns.toSeq == native.columns.toSeq, s"$clue [$dir tol=$tol] columns")
      assert(sortedRows(window) == sortedRows(native), s"$clue [$dir tol=$tol]")
    }
  }

  test("hand-built cases: ties, no-prior-row, duplicate right timestamps") {
    val left = Seq(
      (1L, Option(100L), Option(ts("2024-01-01 10:00:00"))),
      (2L, Option(100L), Option(ts("2024-01-01 12:00:00"))),
      (3L, Option(100L), Option(ts("2024-01-01 09:00:00"))),
      (4L, Option(200L), Option(ts("2024-01-01 11:00:00"))), // exact tie
      (5L, None, Option(ts("2024-01-01 10:00:00"))),          // null key
      (6L, Option(100L), None)                                 // null left ts
    ).toDF("id", "k", "t")
    val right = Seq(
      (Option(100L), Option(ts("2024-01-01 09:30:00")), Option(1.0)),
      (Option(100L), Option(ts("2024-01-01 11:30:00")), Option(2.0)),
      (Option(200L), Option(ts("2024-01-01 11:00:00")), Option(9.0)),
      (Option(200L), Option(ts("2024-01-01 11:00:00")), Option(8.0)), // dup ts
      (None, Option(ts("2024-01-01 10:00:00")), Option(7.0)),          // null key
      (Option(100L), None, Option(6.0))                                // null right ts
    ).toDF("k", "rt", "v")
    assertSame(left, right, "k", "t", "rt", Seq("v"), "hand-built")
  }

  test("randomized equivalence over dirty inputs (fixed seed)") {
    val rnd = new Random(42)
    def maybe[T](v: T): Option[T] = if (rnd.nextInt(10) == 0) None else Some(v)
    def randTs(): Timestamp = // coarse grid → plenty of duplicate timestamps
      new Timestamp(1700000000000L + rnd.nextInt(50) * 600000L)
    val left = (1 to 300).map(i =>
      (i.toLong, maybe(rnd.nextInt(6).toLong), maybe(randTs()))).toDF("id", "k", "t")
    val right = (1 to 200).map { i =>
      (maybe(rnd.nextInt(8).toLong), maybe(randTs()),
        Option(rnd.nextInt(5).toDouble), Option(s"s${rnd.nextInt(3)}"))
    }.toDF("k", "rt", "v1", "v2")
    assertSame(left, right, "k", "t", "rt", Seq("v1", "v2"), "randomized")
  }

  test("empty right side leaves every left row unmatched") {
    val left = Seq((1L, 100L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq.empty[(Long, Timestamp, Double)].toDF("k", "rt", "v")
    val got = AsOfJoin.asOfNative(left, right, "k", "t", "rt", Seq("v")).head()
    assert(got.isNullAt(got.fieldIndex("asof_v")))
    assert(got.isNullAt(got.fieldIndex("asof_rt")))
  }

  test("self-join over one source (shared attribute ids) binds per side") {
    // both sides derive from the SAME cached frame: without per-side
    // positional binding the right time column binds to the left's
    val events = Seq(
      (1L, "click", ts("2024-01-01 10:00:00")),
      (2L, "error", ts("2024-01-01 09:40:00")),
      (3L, "click", ts("2024-01-01 11:00:00")),
      (4L, "error", ts("2024-01-01 10:30:00"))
    ).toDF("event_id", "kind", "t").withColumn("k", lit(1L))
    val clicks = events.filter(col("kind") === "click")
      .select(col("event_id"), col("k"), col("t"))
    val errors = events.filter(col("kind") === "error")
      .select(col("k"), col("t"))
    val got = AsOfJoin.asOfNative(clicks, errors, "k", "t", "t")
      .collect().map(r => r.getLong(0) -> r.getTimestamp(3).toString).toMap
    assert(got(1L) == "2024-01-01 09:40:00.0")
    assert(got(3L) == "2024-01-01 10:30:00.0")
  }

  test("fail-fast: ambiguous column names and non-timestamp time columns") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 09:00:00")))
      .toDF("k", "t", "t2").withColumnRenamed("t2", "t") // two columns named t
    val r = Seq((1L, ts("2024-01-01 09:30:00"))).toDF("k", "rt")
    val eAmb = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(l, r, "k", "t", "rt")
    }
    assert(eAmb.getMessage.contains("ambiguous"))
    // DateType time column: the window form accepts it, the native exec
    // reads raw micros longs — must reject at call time, not mid-job
    val lDate = Seq((1L, java.sql.Date.valueOf("2024-01-01"))).toDF("k", "d")
    val eTyp = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(lDate, r, "k", "d", "rt")
    }
    assert(eTyp.getMessage.contains("TimestampType"))
  }

  test("bucketed tables satisfy the native as-of's distribution: no shuffle") {
    // the operator's reason to exist at scale: ClusteredDistribution per
    // side means a table already bucketed on the key joins WITHOUT any
    // exchange — the union+window form can never skip that shuffle
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("graft_asof_l", "graft_asof_r").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = java.nio.file.Paths.get(wh, t)
      if (java.nio.file.Files.exists(p))
        org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
    }
    (1 to 2000).map(i => ((i % 40).toLong,
        ts(f"2024-01-${1 + i % 28}%02d 10:00:00"), i.toLong))
      .toDF("k", "t", "id")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k", "t")
      .format("parquet").saveAsTable("graft_asof_l")
    (1 to 500).map(i => ((i % 40).toLong,
        ts(f"2024-01-${1 + i % 28}%02d 09:30:00"), i.toDouble))
      .toDF("k", "rt", "v")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k", "rt")
      .format("parquet").saveAsTable("graft_asof_r")
    val joined = AsOfJoin.asOfNative(
      spark.table("graft_asof_l"), spark.table("graft_asof_r"),
      "k", "t", "rt", Seq("v"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin ["), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed as-of:\n$plan")
    assert(plan.contains("Bucketed: true"), s"bucketing not used:\n$plan")
    // and values still match the window form on the same input
    val viaWindow = AsOfJoin.asOf(
      spark.table("graft_asof_l"), spark.table("graft_asof_r"),
      "k", "t", "rt", Seq("v"))
    assert(sortedRows(joined) == sortedRows(viaWindow))
  }

  test("plan: native exec present, no window, left partitioning reused downstream") {
    val left = (1 to 100).map(i =>
      (i.toLong, (i % 5).toLong, ts(f"2024-01-01 ${10 + i % 12}%02d:00:00"))).toDF("id", "k", "t")
    val right = (1 to 50).map(i =>
      ((i % 7).toLong, ts(f"2024-01-01 ${9 + i % 13}%02d:30:00"), i.toDouble)).toDF("k", "rt", "v")
    val joined = AsOfJoin.asOfNative(left, right, "k", "t", "rt", Seq("v"))
    val agg = joined.groupBy(col("k")).agg(count(lit(1)).as("n"))
    agg.collect()
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin ["), p) // AsOfJoinExec renders sans Exec suffix
    assert(!p.contains("Window"), "native form must not fall back to the window plan")
    // two input shuffles only: the downstream groupBy(k) rides the join's
    // left-side partitioning instead of re-exchanging (count only the
    // final plan — AQE's toString repeats the initial plan below it)
    val finalPlan = p.split("== Initial Plan ==").head
    val shuffles = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(shuffles == 2, s"expected 2 exchanges (left+right), got $shuffles in:\n$p")
  }
}
