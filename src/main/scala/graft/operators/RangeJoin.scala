package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join on event time: left rows with a point timestamp
  * matched to right rows carrying `[start, end]` intervals (inclusive).
  *
  * Naively this is a pure inequality join — Spark can only execute that as
  * a nested-loop (broadcast or cartesian), quadratic at scale. The scale
  * path implemented here buckets time HIERARCHICALLY: tier `t` buckets are
  * `bucketMs · 4096^t` wide, every interval is exploded to the buckets it
  * covers at the ONE tier whose bucket width fits its span (≤
  * `maxBucketsPerRow` buckets, so a 9999-12-31 SCD-2 sentinel lands at a
  * coarse tier and explodes to a handful of rows instead of 70 M), points
  * map to exactly one bucket per tier, and the join is a single hash
  * EQUI-join on `(tier, bucket)` with the exact range predicate as a
  * residual. Six tiers cover any representable timestamp span. There is NO
  * nested-loop branch for any input — the former O(|other side|) wide-row
  * fallback is gone, which is machine-checked by PlanAuditSpec (no
  * whitelist entry remains for range joins).
  *
  * The point side is exploded only to tiers the interval side actually
  * occupies: a broadcast ≤6-row `distinct(tier)` frame semi-filters the
  * tier explosion map-side, so when every interval is narrow (the common
  * case) the point side stays at exactly one row per point and the plan
  * degenerates to the single-tier bucketed equi-join. Cost of the tier
  * probe: one extra column-pruned pass over the interval side to collect
  * the ≤6 distinct tiers.
  *
  * (Beyond the reference — SURVEY §2.4 notes range joins are absent
  * there; this is the standard interval-join decomposition, same idea as
  * Structured Streaming's time-bound stream-stream join state pruning,
  * with the multi-level-grid tier trick of spatial join processing.) */
object RangeJoin {

  /** Tier t buckets are `bucketMs << (TierShift·t)` ms wide. 4096× per
    * tier: one tier step turns a `maxBucketsPerRow`-bucket span into ≤
    * `maxBucketsPerRow/4096 + 1` rows. */
  private val TierShift = 12
  /** 6 tiers: 4096^5 = 2^60 fine buckets per top-tier bucket ≥ any span
    * of Spark timestamps (±2^63 µs) at any `bucketMs ≥ 1`, for any
    * `maxBucketsPerRow ≥ 1` — the top tier is the catch-all. */
  private val Tiers = 6

  /** Span thresholds per tier, saturating at Long.MaxValue: a row's home
    * tier is the smallest t with `span ≤ maxB · 4096^t`. */
  private def thresholds(maxB: Long): Seq[Long] =
    (0 until Tiers - 1).map { t =>
      val shift = TierShift * t
      if (maxB > (Long.MaxValue >> shift)) Long.MaxValue else maxB << shift
    }

  /** Smallest tier whose bucket width bounds this span at ≤ maxB rows. */
  private def homeTier(span: Column, maxB: Long): Column =
    thresholds(maxB).zipWithIndex.foldRight(lit(Tiers - 1)) {
      case ((th, t), rest) => when(span <= th, lit(t)).otherwise(rest)
    }

  /** The row's bucket id at every tier (arithmetic shift = floor-div by
    * the power-of-two tier factor, exact for negative pre-epoch buckets
    * too); indexed per exploded row via `element_at(arr, tier+1)`. */
  private def tierBuckets(fine: Column): Column =
    array((0 until Tiers).map(t => shiftright(fine, TierShift * t)): _*)

  private def fineBucket(ts: Column, bucketMs: Long): Column =
    floor(unix_millis(ts) / bucketMs).cast("long")

  /** Smallest tier bounding a DECLARED max span (in fine buckets) at ≤
    * maxB exploded rows — the static twin of [[homeTier]] for callers
    * that know their interval widths up front. */
  private def staticTier(spanBuckets: Long, maxB: Long): Int =
    thresholds(maxB).indexWhere(spanBuckets <= _) match {
      case -1 => Tiers - 1
      case t => t
    }

  /** An interval `[s, e]` no wider than `widthMs` spans at most
    * `widthMs/bucketMs + 1` fine buckets (the +1 for straddling a
    * boundary). */
  private def spanBound(widthMs: Long, bucketMs: Long): Long =
    widthMs / bucketMs + 1

  /** `left` (point `leftTs`) ⋈ `right` (`[rightStart, rightEnd]`),
    * inclusive bounds, fine bucket width `bucketMs` millis. Pick bucketMs
    * near the typical interval length: wider → fewer exploded rows,
    * narrower → less residual filtering. `maxBucketsPerRow` caps the
    * per-row explosion at EVERY tier (a row lands at the tier where its
    * span fits the cap).
    *
    * Robust over dirty inputs: reversed (`end < start`) and null-bounded
    * intervals match nothing under the inclusive predicate, so they are
    * filtered off the exploded side (2-arg `sequence` would otherwise
    * generate a descending garbage bucket list for reversed rows).
    * Arbitrarily wide intervals take a coarser tier — never a nested
    * loop, never a > maxBucketsPerRow explosion.
    *
    * Exactly-once: an interval appears at its home tier only; a point
    * appears at most once per tier; so a (point, interval) pair can meet
    * only at the interval's home tier, in the point's single bucket
    * there — at most one joined row per pair before the exact residual.
    *
    * `maxIntervalWidthMs`, when given, is a DECLARED width bound (the
    * streaming twin's contract): intervals wider than it are filtered
    * out — they match nothing, like reversed intervals — and in exchange
    * the whole join runs statically at the one tier that width needs,
    * with NO tier-presence probe (no second pass over `right`) and no
    * per-point tier explosion. Prefer it whenever widths are known
    * (fixed windows, SLA horizons); the probed form is the safety net
    * for unknown-width data.
    *
    * CONTRACT: without a declared width, `right` is referenced twice
    * (tier-presence probe + the exploded join side) — pass deterministic
    * frames (materialize first if an input depends on rand()/unordered
    * limits). */
  def pointInInterval(
      left: DataFrame, leftTs: Column,
      right: DataFrame, rightStart: Column, rightEnd: Column,
      bucketMs: Long, maxBucketsPerRow: Long = 10000L,
      maxIntervalWidthMs: Option[Long] = None): DataFrame = {
    // floor, not cast-truncation: pre-epoch (negative) millis must round
    // toward -inf or the point's bucket misses the interval's bucket set
    val lFine = fineBucket(leftTs, bucketMs)
    val rS = fineBucket(rightStart, bucketMs)
    val rE = fineBucket(rightEnd, bucketMs)
    val rangePred = leftTs >= rightStart && leftTs <= rightEnd

    maxIntervalWidthMs match {
      case Some(w) =>
        val sh = TierShift * staticTier(spanBound(w, bucketMs), maxBucketsPerRow)
        // width-contract filter is null-rejecting like the reversed-
        // interval one: an over-wide row violates the declared contract
        // and matches nothing (total and visible, never a partial match)
        val rOk = right.filter(rightStart <= rightEnd &&
          unix_millis(rightEnd) - unix_millis(rightStart) <= w)
        val rX = rOk.withColumn("__bucket",
          explode(sequence(shiftright(rS, sh), shiftright(rE, sh))))
        val lX = left.withColumn("__bucket", shiftright(lFine, sh))
        lX.join(rX, Seq("__bucket")).filter(rangePred).drop("__bucket")

      case None =>
        // null-rejecting: reversed/null intervals match nothing and are
        // dropped before the explode (sequence needs lo <= hi)
        val rBase = right.filter(rightStart <= rightEnd)
          .withColumn("__tier", homeTier(rE - rS, maxBucketsPerRow))
        val rX = rBase.withColumn("__bucket", explode(sequence(
          element_at(tierBuckets(rS), col("__tier") + 1),
          element_at(tierBuckets(rE), col("__tier") + 1))))

        // a point occupies one bucket per tier, generated only for
        // PRESENT tiers: the probe is a 1-row collect_set (partial-
        // aggregated, column-pruned pass over the interval side)
        // crossJoined broadcast — each point explodes to exactly
        // |present tiers| rows (×1 when every interval is narrow)
        val presentTiers = rBase.agg(collect_set(col("__tier")).as("__tiers"))
        val lX = left
          .crossJoin(broadcast(presentTiers))
          .withColumn("__tier", explode(col("__tiers")))
          .drop("__tiers")
          .withColumn("__bucket",
            element_at(tierBuckets(lFine), col("__tier") + 1))

        lX.join(rX, Seq("__tier", "__bucket"))
          .filter(rangePred)
          .drop("__tier", "__bucket")
    }
  }

  /** INTERVAL × INTERVAL overlap join (inclusive bounds): pairs where
    * `[aStart,aEnd]` and `[bStart,bEnd]` intersect. Both sides explode
    * to the buckets they cover at their HOME tier (the tier fitting the
    * span under `maxBucketsPerRow`), plus — so rows of different tiers
    * can meet — at every coarser tier the OTHER side occupies (≤
    * `maxBucketsPerRow/4096 + 1` extra rows per coarser tier, gated by
    * the other side's broadcast ≤6-row tier-presence frame; when both
    * sides are all-narrow each row explodes at tier 0 only). The join is
    * one hash EQUI-join on `(tier, bucket)`.
    *
    * Exactly-once, structurally (no wide `distinct` over pair output):
    * a pair (x, y) with home tiers (hx, hy) is kept only at tier
    * `max(hx, hy)` — where both rows are guaranteed present — and only
    * in the FIRST bucket of their intersection at that tier,
    * `greatest(xStartBucket, yStartBucket)`.
    *
    * Malformed intervals (reversed or null bounds) match nothing, by
    * contract. No nested-loop branch exists for any width
    * (PlanAudit-checked).
    *
    * `maxAWidthMs`/`maxBWidthMs`, when BOTH given, are DECLARED width
    * bounds (the `intervalOverlapStream` contract): wider rows are
    * filtered out — they match nothing, like reversed intervals — and
    * the whole join runs statically at the one tier the larger width
    * needs, with NO tier probes (no second pass over either input).
    * Prefer it when widths are known; the probed form is the safety net.
    *
    * CONTRACT: column names must be disjoint across `a` and `b` (rename
    * first); without declared widths, both inputs are referenced twice
    * (tier probe + join side) — pass deterministic frames. */
  def intervalOverlap(
      a: DataFrame, aStart: Column, aEnd: Column,
      b: DataFrame, bStart: Column, bEnd: Column,
      bucketMs: Long, maxBucketsPerRow: Long = 10000L,
      maxAWidthMs: Option[Long] = None,
      maxBWidthMs: Option[Long] = None): DataFrame = {
    val aS = fineBucket(aStart, bucketMs)
    val aE = fineBucket(aEnd, bucketMs)
    val bS = fineBucket(bStart, bucketMs)
    val bE = fineBucket(bEnd, bucketMs)
    val overlap = aStart <= aEnd && bStart <= bEnd &&
      aStart <= bEnd && bStart <= aEnd

    (maxAWidthMs, maxBWidthMs) match {
      case (Some(wa), Some(wb)) =>
        // both sides at the ONE tier the larger declared width needs:
        // identical shape to the single-tier bucketed join, just with
        // 4096^t-wide buckets; exactly-once via first-intersection-bucket
        val sh = TierShift * math.max(
          staticTier(spanBound(wa, bucketMs), maxBucketsPerRow),
          staticTier(spanBound(wb, bucketMs), maxBucketsPerRow))
        val aOk = a.filter(aStart <= aEnd &&
          unix_millis(aEnd) - unix_millis(aStart) <= wa)
        val bOk = b.filter(bStart <= bEnd &&
          unix_millis(bEnd) - unix_millis(bStart) <= wb)
        val aX = aOk.withColumn("__abs", shiftright(aS, sh))
          .withColumn("__bucket",
            explode(sequence(col("__abs"), shiftright(aE, sh))))
        val bX = bOk.withColumn("__bbs", shiftright(bS, sh))
          .withColumn("__bucket",
            explode(sequence(col("__bbs"), shiftright(bE, sh))))
        return aX.join(bX, Seq("__bucket"))
          .filter(overlap &&
            col("__bucket") === greatest(col("__abs"), col("__bbs")))
          .drop("__bucket", "__abs", "__bbs")
      case _ => ()
    }

    val aBase = a.filter(aStart <= aEnd)
      .withColumn("__aht", homeTier(aE - aS, maxBucketsPerRow))
    val bBase = b.filter(bStart <= bEnd)
      .withColumn("__bht", homeTier(bE - bS, maxBucketsPerRow))
    // 1-row tier-presence probes (partial-aggregated column-pruned pass
    // per side), crossJoined broadcast so each row explodes to exactly
    // the tiers it needs — its own home tier plus the COARSER tiers the
    // other side occupies; ×1 rows when both sides are all-narrow
    val aTierSet = aBase.agg(collect_set(col("__aht")).as("__ot"))
    val bTierSet = bBase.agg(collect_set(col("__bht")).as("__ot"))

    def explodeSide(base: DataFrame, ht: String, otherTierSet: DataFrame,
        s: Column, e: Column, bsName: String): DataFrame =
      base
        .crossJoin(broadcast(otherTierSet))
        .withColumn("__tier", explode(array_union(
          array(col(ht)), filter(col("__ot"), t => t > col(ht)))))
        .drop("__ot")
        .withColumn(bsName, element_at(tierBuckets(s), col("__tier") + 1))
        .withColumn("__bucket", explode(sequence(
          col(bsName), element_at(tierBuckets(e), col("__tier") + 1))))

    val aX = explodeSide(aBase, "__aht", bTierSet, aS, aE, "__abs")
    val bX = explodeSide(bBase, "__bht", aTierSet, bS, bE, "__bbs")

    aX.join(bX, Seq("__tier", "__bucket"))
      .filter(overlap &&
        col("__tier") === greatest(col("__aht"), col("__bht")) &&
        col("__bucket") === greatest(col("__abs"), col("__bbs")))
      .drop("__tier", "__bucket", "__aht", "__bht", "__abs", "__bbs")
  }
}
