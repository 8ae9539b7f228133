package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expression: dot product of two float/double arrays as
  * one primitive loop accumulating in DOUBLE in element order — the hot
  * kernel of similarity search.
  *
  * Why custom (SURVEY §7.3): the composable form
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is CodegenFallback — boxed
  * interpreted lambdas per element, which dominates pair-scoring (|pairs|
  * × dim evaluations). Values are IDENTICAL: same element order, same
  * double accumulation.
  *
  * Mismatched lengths score over the common prefix (zip_with semantics
  * would null-pad; vectors in one table share a fixed dim, so the
  * distinction never triggers — asserting it here keeps eval total). */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  // each side independently float or double (clean analysis-time rejection
  // of non-vector input; the eval handles the mixed case)
  override def inputTypes: Seq[GraftBridge.AbstractType] =
    Seq(GraftBridge.floatOrDoubleArray, GraftBridge.floatOrDoubleArray)

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = elemType(left) == FloatType
    val yf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

/** Symmetric int8 quantize→dequantize round trip as ONE primitive loop:
  * scale = max|x|/127, out_i = round(x_i/scale) * scale — the flat-PQ
  * serving transform of q125's recall audit.
  *
  * Why custom (the q125 scaladoc's own promotion note): the composable
  * form `transform(e, x -> round(x/s, 0) * s)` with `s =
  * aggregate(e, 0.0, greatest(acc, abs(x)))/127` is TWO CodegenFallback
  * HOFs — boxed interpreted lambdas per element per row, which is the
  * hot path when a real corpus is quantized, not just an audit's. This
  * loop reads the ArrayData directly; rounding replicates Spark's
  * `round(x, 0)` bit for bit (HALF_UP on `BigDecimal.valueOf`, NaN and
  * infinities passed through), so expression == HOF output exactly on
  * every non-degenerate vector, which AnnSpec asserts. A ZERO vector
  * (scale 0) yields defined NaN elements here, where the HOF form dies
  * on ANSI divide-by-zero. */
case class QuantDequantI8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[GraftBridge.AbstractType] =
    Seq(GraftBridge.floatOrDoubleArray)

  /** Null elements propagate (matching the HOF cross-check form, where
    * `transform`'s lambda null-propagates and `greatest` skips nulls in
    * the scale aggregate), so containsNull mirrors the input's. */
  override def dataType: DataType = ArrayType(DoubleType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val f = isFloat
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val v = math.abs(if (f) x.getFloat(i).toDouble else x.getDouble(i))
        if (v > maxAbs) maxAbs = v
      }
      i += 1
    }
    val scale = maxAbs / 127d
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (x.isNullAt(i)) out(i) = null
      else {
        val v = (if (f) x.getFloat(i).toDouble else x.getDouble(i)) / scale
        val r =
          if (v.isNaN || v.isInfinite) v // Spark RoundBase passes these through
          else java.math.BigDecimal.valueOf(v)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
        out(i) = r * scale
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): QuantDequantI8 =
    copy(child = newChild)
}

object VectorExpr {
  /** Dot product of two array<float>/array<double> columns (double out). */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProductF(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Int8 quantize→dequantize round trip (array<double> out). */
  def quantDequantI8(v: Column): Column =
    GraftBridge.column(QuantDequantI8(GraftBridge.expression(v)))
}
