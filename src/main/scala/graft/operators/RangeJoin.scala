package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join on event time: left rows with a point timestamp
  * matched to right rows carrying `[start, end]` intervals (inclusive).
  *
  * Naively this is a pure inequality join — Spark can only execute that as
  * a nested-loop (broadcast or cartesian), quadratic at scale. The scale
  * path implemented here buckets time: each interval is exploded to the
  * fixed-width buckets it covers, each point maps to exactly ONE bucket,
  * and the join becomes a hash EQUI-join on the bucket id with the exact
  * range predicate as a residual. Cost: |right| × (interval/bucket + 1)
  * exploded rows and one shuffle each side — linear, partition-parallel,
  * and skew-handled by AQE like any equi-join. No duplicate results: a
  * point joins an interval only in the point's own bucket.
  *
  * (Beyond the reference — SURVEY §2.4 notes range joins are absent
  * there; this is the standard interval-join decomposition, same idea as
  * Structured Streaming's time-bound stream-stream join state pruning.) */
object RangeJoin {

  /** `left` (point `leftTs`) ⋈ `right` (`[rightStart, rightEnd]`),
    * inclusive bounds, bucket width `bucketMs` millis. Pick bucketMs near
    * the typical interval length: wider → fewer exploded rows, narrower →
    * less residual filtering.
    *
    * Robust over dirty inputs: reversed (`end < start`) and null-bounded
    * intervals match nothing under the inclusive predicate, so they are
    * filtered off the exploded side (2-arg `sequence` would otherwise
    * generate a descending garbage bucket list for reversed rows).
    * Intervals spanning more than `maxBucketsPerRow` buckets (e.g. an
    * SCD-2 sentinel end date) would materialize millions of copies of one
    * row; they are routed down a nested-loop fallback branch instead and
    * the branches union — wide rows degrade to the naive plan rather than
    * exploding the narrow one.
    *
    * CONTRACT: both inputs are referenced in more than one union branch
    * and therefore evaluated more than once — pass deterministic frames
    * (materialize first if an input depends on rand()/unordered limits).
    * The auto-injected rewrite rule checks this; this explicit API leaves
    * it to the caller. */
  def pointInInterval(
      left: DataFrame, leftTs: Column,
      right: DataFrame, rightStart: Column, rightEnd: Column,
      bucketMs: Long, maxBucketsPerRow: Long = 10000L): DataFrame = {
    // floor, not cast-truncation: pre-epoch (negative) millis must round
    // toward -inf or the point's bucket misses the interval's bucket set
    val lb = floor(unix_millis(leftTs) / bucketMs).cast("long").as("__bucket")
    val rStart = floor(unix_millis(rightStart) / bucketMs).cast("long")
    val rEnd = floor(unix_millis(rightEnd) / bucketMs).cast("long")
    val span = rEnd - rStart
    val rangePred = leftTs >= rightStart && leftTs <= rightEnd

    // null-rejecting filters partition the matchable right rows exactly:
    // reversed/null intervals land in neither branch (they match nothing)
    val l = left.withColumn("__bucket", lb)
    val narrow = right
      .filter(rightStart <= rightEnd && span <= maxBucketsPerRow)
      .withColumn("__bucket", explode(sequence(rStart, rEnd)))
    val bucketed = l.join(narrow, Seq("__bucket"))
      .filter(rangePred)
      .drop("__bucket")

    val wide = right.filter(span > maxBucketsPerRow)
    // empty at runtime in the common case → AQE erases the branch
    val fallback = left.join(wide, rangePred)

    bucketed.union(fallback)
  }

  /** INTERVAL × INTERVAL overlap join (inclusive bounds): pairs where
    * `[aStart,aEnd]` and `[bStart,bEnd]` intersect. The naive form is a
    * pure-inequality join (nested loop); here both sides explode to the
    * fixed-width buckets they cover and the join becomes a hash
    * EQUI-join on the bucket id. Overlapping intervals co-occur in
    * EVERY bucket of their intersection, so each pair is attributed to
    * exactly one — the intersection's FIRST bucket,
    * `greatest(aStartBucket, bStartBucket)` — which dedups structurally
    * (no wide `distinct` over the pair output).
    *
    * Cost: |a|·(spanA/bucket+1) + |b|·(spanB/bucket+1) exploded rows,
    * one shuffle each side; pick `bucketMs` near the typical interval
    * length. Malformed intervals (reversed or null bounds) match
    * nothing, by contract. Intervals spanning more than
    * `maxBucketsPerRow` buckets take a nested-loop fallback branch
    * (wide-a × all-b, narrow-a × wide-b — wide×wide pairs ride the
    * first) instead of materializing millions of bucket copies; the
    * branches union and are empty in the common case.
    *
    * CONTRACT (as `pointInInterval`): column names must be disjoint
    * across `a` and `b` (rename first), and both inputs are referenced
    * in multiple union branches — pass deterministic frames. */
  def intervalOverlap(
      a: DataFrame, aStart: Column, aEnd: Column,
      b: DataFrame, bStart: Column, bEnd: Column,
      bucketMs: Long, maxBucketsPerRow: Long = 10000L): DataFrame = {
    val aS = floor(unix_millis(aStart) / bucketMs).cast("long")
    val aE = floor(unix_millis(aEnd) / bucketMs).cast("long")
    val bS = floor(unix_millis(bStart) / bucketMs).cast("long")
    val bE = floor(unix_millis(bEnd) / bucketMs).cast("long")
    val aOk = aStart <= aEnd
    val bOk = bStart <= bEnd
    val overlap = aOk && bOk && aStart <= bEnd && bStart <= aEnd

    val aNarrow = a.filter(aOk && aE - aS <= maxBucketsPerRow)
    val bNarrow = b.filter(bOk && bE - bS <= maxBucketsPerRow)
    val bucketed = aNarrow.withColumn("__bucket", explode(sequence(aS, aE)))
      .join(bNarrow.withColumn("__bucket", explode(sequence(bS, bE))),
        Seq("__bucket"))
      .filter(overlap && greatest(aS, bS) === col("__bucket"))
      .drop("__bucket")

    val aWide = a.filter(aOk && aE - aS > maxBucketsPerRow)
    val bWide = b.filter(bOk && bE - bS > maxBucketsPerRow)
    bucketed
      .union(aWide.join(b, overlap))
      .union(aNarrow.join(bWide, overlap))
  }
}
