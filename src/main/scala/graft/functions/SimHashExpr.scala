package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expression computing a SimHash over a token array in ONE
  * primitive pass: hash each token once, accumulate the ±1 per-bit counters,
  * emit the sign bits.
  *
  * Why custom (SURVEY §7.3): the composable form — `bits` ×
  * `aggregate(tokens, ...)` — evaluates an interpreted CodegenFallback
  * lambda per token PER BIT, re-hashing every token 32 times (~10 s at
  * sf0.1); this loop hashes each token once and JITs (~100 ms for the same
  * work), and the gap grows linearly with corpus size.
  *
  * Values are IDENTICAL to the higher-order-function formulation: tokens
  * are hashed with Spark's own `xxhash64` (seed 42 via XxHash64Function),
  * bit i taken from the same shift position.
  */
case class SimHashTokens(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")

  // SQL-registered as graft_simhash: reject non-array<string> input at
  // analysis (clean AnalysisException) instead of a runtime ClassCastException
  override def inputTypes: Seq[GraftBridge.AbstractType] = Seq(GraftBridge.stringArray)

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val counters = new Array[Int](bits)
    var i = 0
    while (i < m) {
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (counters(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashTokens =
    copy(child = newChild)
}

object SimHashExpr {
  /** Column wrapper: SimHash of a token-array column. */
  def simhashOfTokens(tokens: Column, bits: Int): Column =
    GraftBridge.column(SimHashTokens(GraftBridge.expression(tokens), bits))
}
