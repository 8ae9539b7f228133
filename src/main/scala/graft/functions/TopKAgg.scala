package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.collection.mutable

/** Heap-based bounded top-k aggregate: keeps the k smallest rows of a
  * struct child under the struct's lexicographic field ordering (encode
  * "largest first" by negating / inverting the leading field).
  *
  * Why custom (SURVEY §7.3): the window formulation
  * (`row_number().over(partitionBy(g).orderBy(...)) <= k`) must SORT every
  * partition's rows — O(n log n) per group even with WindowGroupLimit's
  * partial pass. A bounded heap is O(n log k) with k-row state per group,
  * turns the shuffle into k rows per (partition × group), and composes as
  * an ordinary aggregate (map-side partial merge). At 100 TB the sort pass
  * over the fact table is the difference.
  *
  * Deterministic: ordering is total when callers include a unique
  * tie-break field in the struct.
  */
case class TopKStructs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k >= 1, "k must be >= 1")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  // require a struct child at analysis time (clean AnalysisException instead
  // of an executor-side ClassCastException from structType above)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft top_k expects a struct argument, got ${other.catalogString}")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  @transient private lazy val ordering: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(child.dataType)
      .asInstanceOf[Ordering[InternalRow]]

  // max-heap: worst (largest) element on top, evicted first
  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty[InternalRow](ordering)

  @transient private lazy val copyProj = UnsafeProjection.create(structType)

  override def update(
      buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (buf.size < k) {
        buf.enqueue(copyProj(row).copy()) // detach from the shared input row
      } else if (ordering.lt(row, buf.head)) {
        buf.dequeue()
        buf.enqueue(copyProj(row).copy())
      }
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach { row =>
      if (buf.size < k) buf.enqueue(row)
      else if (ordering.lt(row, buf.head)) { buf.dequeue(); buf.enqueue(row) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buf.toArray.sorted(ordering.asInstanceOf[Ordering[InternalRow]]))

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val rows = buf.toArray.map(_.asInstanceOf[UnsafeRow])
    val total = 4 + rows.map(r => 4 + r.getSizeInBytes).sum
    val bb = ByteBuffer.allocate(total)
    bb.putInt(rows.length)
    rows.foreach { r =>
      bb.putInt(r.getSizeInBytes)
      r.writeTo(bb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val size = bb.getInt
      val row = new UnsafeRow(structType.size)
      val arr = new Array[Byte](size)
      bb.get(arr)
      row.pointTo(arr, size)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKStructs =
    copy(child = newChildren.head)
}

object TopKAgg {
  /** Aggregate Column: array of the k lexicographically-smallest struct
    * rows (ascending). Order "by X descending" by negating X in the
    * struct. Include a unique tie-break field for determinism. */
  def topK(structCol: Column, k: Int): Column =
    GraftBridge.column(
      TopKStructs(GraftBridge.expression(structCol), k).toAggregateExpression())
}
