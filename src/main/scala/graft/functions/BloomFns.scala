package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning — the runtime-filter primitive Spark's own
  * `InjectRuntimeFilter` rule uses (spark.sql.optimizer.runtime.bloomFilter),
  * exposed as a composable operator for the dedup/decontamination pipelines.
  *
  * Why it matters at 100 TB: a semi-join against a key set that is too big
  * to broadcast as a hash relation (GB of strings) still fits as a bloom
  * sketch at ~10 bits/key. Probing the sketch is a codegen'd scan-side
  * filter, so the big side sheds non-matching rows BEFORE its shuffle —
  * the exact join that follows only pays for rows that (probably) match.
  * False positives pass the pre-filter and are eliminated by the exact
  * join, so results are IDENTICAL to the unpruned plan; the sketch only
  * changes how many rows reach the shuffle.
  *
  * Values are hashed with Spark's own `XxHash64` (seed 42) on both the
  * build and probe side — the same discipline as `InjectRuntimeFilter`.
  */
object BloomFns {

  /** Aggregate a column into a serialized bloom filter (one binary row).
    * `numBits` ≈ items × bits-per-key; 10 bits/key ⇒ ~1% false positives. */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    GraftBridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(GraftBridge.expression(c))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Probe: true when `c` MIGHT be in the serialized filter (false ⇒
    * definitely absent). Codegen'd; null input ⇒ null (filtered). */
  def mightContain(bloomBytes: Array[Byte], c: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal.create(bloomBytes, BinaryType),
      new XxHash64(Seq(GraftBridge.expression(c)))))

  /** Build a bloom filter over `keys.col(keyCol)` and return the probe
    * predicate for a column. The build collects ONE row (the serialized
    * sketch — kilobytes, not data; `BloomFilterMightContain` requires a
    * constant/scalar-subquery bloom side, which is exactly how Spark's
    * own runtime-filter rule ships it to executors).
    *
    * The probe is ONLY valid as a pre-filter ahead of an exact inner
    * join: it may pass false positives (never false negatives), so
    * negating it or using it as a left-join guard is incorrect by
    * construction. An EMPTY build side yields `lit(false)` (nothing can
    * match the empty set) rather than a null sketch whose
    * `might_contain(null, x)` would silently null out every row. */
  def buildProbe(keys: DataFrame, keyCol: String,
      expectedItems: Long, bitsPerKey: Int = 10): Column => Column = {
    val bytes = keys
      .agg(bloomAgg(org.apache.spark.sql.functions.col(keyCol),
        expectedItems, expectedItems * bitsPerKey))
      .head.getAs[Array[Byte]](0)
    if (bytes == null) (_: Column) => org.apache.spark.sql.functions.lit(false)
    else (c: Column) => mightContain(bytes, c)
  }
}
