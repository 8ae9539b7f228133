package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Exact integer second-moment (Gram) aggregate over a vector column —
  * the one-pass distributed statistic PCA-style analyses need: row
  * count, per-dimension sums, and the upper triangle of the pairwise
  * product matrix, all in micro-unit integers (x → floor(x·10⁶ + 0.5),
  * the repo's engine-portable quantization), so covariance derives
  * EXACTLY as n·Σxᵢxⱼ − Σxᵢ·Σxⱼ with zero float drift between engines.
  *
  * Why custom (same rationale as TopKStructs): the relational form
  * explodes each vector to dim rows and self-joins on the row id — a
  * dim² row blowup (4096× at dim 64) through a shuffle. This aggregate
  * keeps the whole statistic in one Array[Long] buffer per partition
  * (dim·(dim+1)/2 + dim + 1 longs ≈ 17 KB at dim 64), merges map-side,
  * and ships ONE buffer per partition — at 100 TB the corpus is read
  * once and the shuffle carries kilobytes.
  *
  * Overflow ceiling (documented knob): with |x| ≤ 1 the per-row product
  * is ≤ 10¹², so the Long accumulator holds ~9·10⁶ rows per final
  * buffer at micro-unit scale; beyond that, coarsen the quantization
  * (10⁴ buys 9·10¹⁰ rows) — same trade as the money kernel's scale.
  *
  * Null semantics: a null array or an array containing ANY null element
  * skips the whole row (count excludes it) — explicit, not a silent 0.0
  * read. Arrays of length ≠ dim throw: that is corrupt input, not data.
  */
case class GramMoments(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim >= 1, "dim must be >= 1")

  private val tri = dim * (dim + 1) / 2
  // layout: [0] = n, [1 .. dim] = sums, [1 + dim ..] = upper-tri products
  private val bufLen = 1 + dim + tri

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft gram_moments expects array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("prods", ArrayType(LongType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    require(arr.numElements() == dim,
      s"gram_moments: expected dim $dim, got ${arr.numElements()}")
    val xq = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return buf // null element → skip the row
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      xq(i) = math.floor(x * 1000000d + 0.5d).toLong
      i += 1
    }
    buf(0) += 1L
    i = 0
    var t = 1 + dim
    while (i < dim) {
      buf(1 + i) += xq(i)
      var j = i
      while (j < dim) {
        buf(t) += xq(i) * xq(j)
        t += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    InternalRow(buf(0),
      new GenericArrayData(java.util.Arrays.copyOfRange(buf, 1, 1 + dim)),
      new GenericArrayData(java.util.Arrays.copyOfRange(buf, 1 + dim, bufLen)))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bufLen * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bufLen)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMoments =
    copy(child = newChildren.head)
}

object GramAgg {
  /** Aggregate Column: struct(n, sums, prods) of exact micro-unit
    * integer moments over a vector column of fixed dimension `dim`.
    * `prods` is the upper triangle row-major: (i,j≥i) at index
    * i·dim − i·(i−1)/2 + (j−i). */
  def gramMoments(vecCol: Column, dim: Int): Column =
    GraftBridge.column(
      GramMoments(GraftBridge.expression(vecCol), dim).toAggregateExpression())
}
