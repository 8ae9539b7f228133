package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import scala.util.hashing.MurmurHash3

/** Random-hyperplane (SRP) LSH signature in ONE primitive pass: for each
  * of `bits` planes, project the vector onto a deterministic pseudo-random
  * hyperplane (component (p,i) = zero-mean value from a murmur3 mix — no
  * RNG state, reproducible across runs/partitions/engines) and emit the
  * sign bit. Replaces a per-plane zip_with/aggregate composition that
  * evaluated interpreted lambdas bits × dim times per row. */
case class SrpSignature(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")

  // reject non-vector input at analysis time (clean AnalysisException)
  override def inputTypes: Seq[GraftBridge.AbstractType] =
    Seq(GraftBridge.floatOrDoubleArray)

  override def dataType: DataType = LongType

  private val Seed = 0x5851f42d

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var sig = 0L
    var p = 0
    while (p < bits) {
      val hp = MurmurHash3.mix(Seed, p)
      var proj = 0.0
      var i = 0
      while (i < n) {
        val h = MurmurHash3.finalizeHash(MurmurHash3.mix(hp, i), 2)
        val w = java.lang.Math.floorMod(h, 100000) / 100000.0 - 0.5
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        proj += x * w
        i += 1
      }
      if (proj > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
}

/** Fraction of positions where two equal-length long arrays agree — the
  * MinHash signature-agreement estimator, as one primitive loop instead
  * of an interpreted zip_with + filter per candidate pair. */
case class LongArrayAgreement(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[GraftBridge.AbstractType] =
    Seq(GraftBridge.longArray, GraftBridge.longArray)

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    if (n == 0) 0.0
    else {
      var eq = 0
      var i = 0
      while (i < n) {
        if (x.getLong(i) == y.getLong(i)) eq += 1
        i += 1
      }
      eq.toDouble / n
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayAgreement =
    copy(left = newLeft, right = newRight)
}

object SigExpr {
  def srpSignature(vec: Column, bits: Int): Column =
    GraftBridge.column(SrpSignature(GraftBridge.expression(vec), bits))

  def agreement(a: Column, b: Column): Column =
    GraftBridge.column(
      LongArrayAgreement(GraftBridge.expression(a), GraftBridge.expression(b)))
}
