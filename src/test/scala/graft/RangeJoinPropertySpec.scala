package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test: the bucketed range join must equal the naive inequality
  * join on ARBITRARY inputs — including reversed intervals (end < start),
  * null bounds, intervals far wider than the per-tier explosion cap, empty overlap,
  * and points outside every interval. The scala-side oracle is the O(n·m)
  * double loop with the inclusive-bounds predicate (null ⇒ no match). */
class RangeJoinPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Base = 1700000000000L // 2023-11-14, epoch millis

  // timestamps over a ±3-day range at second granularity, some null
  private def tsGen: Gen[Option[Long]] = Gen.frequency(
    9 -> Gen.choose(-259200L, 259200L).map(s => Some(Base + s * 1000L)),
    1 -> Gen.const(None))

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("bucketed == naive over random dirty inputs (reversed/null/wide intervals)") {
    val params = Gen.Parameters.default
    for (trial <- 0 until 8) {
      val seed = Seed(trial.toLong)
      def draw[A](g: Gen[A], i: Long): A =
        g.pureApply(params, seed.reseed(i))
      val nPts = 40; val nIvs = 25
      val pts = (0 until nPts).map { i =>
        (i.toLong, draw(tsGen, i * 2 + 1).map(ts).orNull) }
      val ivs = (0 until nIvs).map { i =>
        val lo = draw(tsGen, 1000 + i * 3)
        // widen some ends far beyond the bucket cap; keep some reversed
        val hi = draw(Gen.frequency(
          6 -> tsGen,
          2 -> Gen.const(lo.map(_ + 200L * 24 * 3600 * 1000)), // ~4800 buckets at 1h
          1 -> Gen.const(lo.map(_ - 3600000L))), 2000 + i * 3) // reversed
        (i.toLong + 1000, lo.map(ts).orNull, hi.map(ts).orNull)
      }
      val expected = (for {
        (pid, pt) <- pts if pt != null
        (iid, lo, hi) <- ivs if lo != null && hi != null
        if !pt.before(lo) && !pt.after(hi)
      } yield (pid, iid)).toSet

      val l = pts.toDF("pid", "pts")
      val r = ivs.toDF("iid", "istart", "iend")
      for (bucketMs <- Seq(3600000L, 60000L)) {
        val got = RangeJoin.pointInInterval(
            l, col("pts"), r, col("istart"), col("iend"),
            bucketMs, maxBucketsPerRow = 100L)
          .select(col("pid"), col("iid"))
          .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
        assert(got == expected, s"trial=$trial bucketMs=$bucketMs")
      }
    }
  }

  test("declared-width fast paths == width-filtered naive oracle over " +
      "random dirty inputs (over-wide rows match nothing, by contract)") {
    val params = Gen.Parameters.default
    val declared = 48L * 3600 * 1000 // 2 days
    for (trial <- 0 until 6) {
      val seed = Seed(500 + trial.toLong)
      def draw[A](g: Gen[A], i: Long): A =
        g.pureApply(params, seed.reseed(i))
      def ivGen(tag: Long, n: Int) = (0 until n).map { i =>
        val lo = draw(tsGen, tag + i * 3)
        val hi = draw(Gen.frequency(
          5 -> tsGen,                                           // random (some over-wide)
          2 -> Gen.const(lo.map(_ + 3600000L)),                 // compliant
          2 -> Gen.const(lo.map(_ + 10L * 24 * 3600 * 1000)),   // over-declared
          1 -> Gen.const(lo.map(_ - 3600000L))), tag + 1 + i * 3) // reversed
        (tag + i, lo.map(ts).orNull, hi.map(ts).orNull)
      }
      def ok(lo: java.sql.Timestamp, hi: java.sql.Timestamp) =
        lo != null && hi != null && !hi.before(lo) &&
          hi.getTime - lo.getTime <= declared
      // point-in-interval fast path
      val pts = (0 until 40).map { i =>
        (i.toLong, draw(tsGen, 7000 + i * 2).map(ts).orNull) }
      val ivs = ivGen(1000L, 25)
      val expP = (for {
        (pid, pt) <- pts if pt != null
        (iid, lo, hi) <- ivs if ok(lo, hi)
        if !pt.before(lo) && !pt.after(hi)
      } yield (pid, iid)).toSet
      val gotP = RangeJoin.pointInInterval(
          pts.toDF("pid", "pts"), col("pts"),
          ivs.toDF("iid", "istart", "iend"), col("istart"), col("iend"),
          bucketMs = 3600000L, maxBucketsPerRow = 100L,
          maxIntervalWidthMs = Some(declared))
        .select(col("pid"), col("iid"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(gotP == expP, s"trial=$trial point-in-interval")
      // interval-overlap fast path (both sides width-filtered)
      val as = ivGen(0L, 20)
      val bs = ivGen(2000L, 20)
      val expO = (for {
        (aid, as0, ae0) <- as if ok(as0, ae0)
        (bid, bs0, be0) <- bs if ok(bs0, be0)
        if !as0.after(be0) && !bs0.after(ae0)
      } yield (aid, bid)).toSet
      val rows = RangeJoin.intervalOverlap(
          as.toDF("aid", "as", "ae"), col("as"), col("ae"),
          bs.toDF("bid", "bs", "be"), col("bs"), col("be"),
          bucketMs = 3600000L, maxBucketsPerRow = 100L,
          maxAWidthMs = Some(declared), maxBWidthMs = Some(declared))
        .select(col("aid"), col("bid"))
        .collect().map(x => (x.getLong(0), x.getLong(1)))
      assert(rows.length == rows.toSet.size, s"trial=$trial dup pairs")
      assert(rows.toSet == expO, s"trial=$trial interval-overlap")
    }
  }

  test("interval overlap bucketed == naive over random dirty intervals, no duplicates") {
    val params = Gen.Parameters.default
    for (trial <- 0 until 8) {
      val seed = Seed(100 + trial.toLong)
      def draw[A](g: Gen[A], i: Long): A =
        g.pureApply(params, seed.reseed(i))
      def ivGen(tag: Long, n: Int) = (0 until n).map { i =>
        val lo = draw(tsGen, tag + i * 3)
        val hi = draw(Gen.frequency(
          6 -> tsGen,
          2 -> Gen.const(lo.map(_ + 200L * 24 * 3600 * 1000)), // wide: coarse-tier path
          1 -> Gen.const(lo.map(_ - 3600000L))), tag + 1 + i * 3) // reversed
        (tag + i, lo.map(ts).orNull, hi.map(ts).orNull)
      }
      val as = ivGen(0L, 25)
      val bs = ivGen(1000L, 25)
      // scala oracle: well-formed both sides + inclusive intersection
      val expected = (for {
        (aid, as0, ae0) <- as if as0 != null && ae0 != null && !ae0.before(as0)
        (bid, bs0, be0) <- bs if bs0 != null && be0 != null && !be0.before(bs0)
        if !as0.after(be0) && !bs0.after(ae0)
      } yield (aid, bid)).toSet
      val a = as.toDF("aid", "as", "ae")
      val b = bs.toDF("bid", "bs", "be")
      for (bucketMs <- Seq(3600000L, 60000L)) {
        val rows = RangeJoin.intervalOverlap(
            a, col("as"), col("ae"), b, col("bs"), col("be"),
            bucketMs, maxBucketsPerRow = 100L)
          .select(col("aid"), col("bid"))
          .collect().map(x => (x.getLong(0), x.getLong(1)))
        assert(rows.length == rows.toSet.size,
          s"trial=$trial bucketMs=$bucketMs emitted duplicate pairs")
        assert(rows.toSet == expected, s"trial=$trial bucketMs=$bucketMs")
      }
    }
  }
}
