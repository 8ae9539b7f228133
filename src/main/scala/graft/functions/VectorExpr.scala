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

object VectorExpr {
  /** Dot product of two array<float>/array<double> columns (double out). */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProductF(GraftBridge.expression(a), GraftBridge.expression(b)))
}
