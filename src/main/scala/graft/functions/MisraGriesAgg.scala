package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Misra–Gries heavy-hitter sketch as a mergeable aggregate: at most
  * `cap` (token → counter) entries per buffer; every item with true
  * frequency > n/cap is GUARANTEED to be a surviving key (undercount is
  * bounded by n/cap — Misra & Gries 1982; the pairwise merge keeps the
  * same bound, Agarwal et al., PODS 2012).
  *
  * Why custom (SURVEY §7.3): exact vocabulary counting shuffles one key
  * per distinct token — at web scale the vocabulary itself is TBs. The
  * sketch pass is map-side with `cap`-bounded state per partition and
  * merges like any aggregate; the heavy-hitter CANDIDATES it emits then
  * drive an exact confirmation pass over a broadcast-filtered corpus
  * (q181), so the final counts carry no approximation at all — the
  * LSH-then-verify discipline applied to frequency estimation.
  *
  * Candidate sets can vary with merge order (any valid MG summary may
  * differ in its sub-threshold tail); every set is a superset of the true
  * heavy hitters, and the exact confirmation collapses them to the same
  * final answer — determinism lives one stage downstream.
  */
case class MisraGriesSketch(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(cap >= 1, "cap must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft mg_sketch expects a string argument, got ${other.catalogString}")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String].toString
      buf.get(t) match {
        case Some(c) => buf.update(t, c + 1)
        case None if buf.size < cap => buf.update(t, 1L)
        case None =>
          // decrement-all: each pass pays for >= cap prior increments,
          // so the aggregate stays amortized O(1) per item
          val dead = buf.collect { case (k, 1L) => k }
          buf.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    if (buf.size > cap) {
      // subtract the (cap+1)-th largest counter from all, drop <= 0 —
      // the mergeable-summaries reduction that preserves the n/cap bound
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - cap - 1)
      val dead = buf.collect { case (k, c) if c <= cut => k }
      buf.mapValuesInPlace((_, c) => c - cut)
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keys.toArray.sorted.map(UTF8String.fromString(_): Any))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray.map { case (k, c) =>
      (k.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(entries.length)
    entries.foreach { case (kb, c) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.update(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesSketch =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Aggregate Column: the sorted surviving keys of a cap-bounded
    * Misra–Gries summary — a guaranteed superset of every item with
    * frequency > n/cap. */
  def mgCandidates(c: Column, cap: Int): Column =
    GraftBridge.column(
      MisraGriesSketch(GraftBridge.expression(c), cap).toAggregateExpression())
}
