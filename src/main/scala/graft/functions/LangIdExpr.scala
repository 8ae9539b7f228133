package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: language-ID over a token array in ONE
  * primitive pass — per-language marker-occurrence counts, then
  * earliest-argmax (first language in declaration order wins ties), "und"
  * when no marker occurs anywhere.
  *
  * Semantics are IDENTICAL to the composable CASE-chain formulation (and
  * to the DuckDB oracle that restates it); the composable form re-derived
  * the tokenization + marker counts once per CASE branch (~30 regex passes
  * per row without common-subexpression elimination across branches),
  * which dominated the q33 scan. Here: tokenize once upstream, one loop.
  */
case class LangIdTokens(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  // SQL-registered as graft_langid: type-check at analysis time
  override def inputTypes: Seq[GraftBridge.AbstractType] = Seq(GraftBridge.stringArray)

  override def dataType: DataType = StringType

  // flat marker table: marker string -> language index
  @transient private lazy val markerStrs: Array[UTF8String] =
    markers.flatMap(_._2).map(UTF8String.fromString).toArray
  @transient private lazy val markerLang: Array[Int] =
    markers.zipWithIndex.flatMap { case ((_, ms), i) => ms.map(_ => i) }.toArray
  @transient private lazy val langStrs: Array[UTF8String] =
    markers.map(m => UTF8String.fromString(m._1)).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](markers.size)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      var j = 0
      while (j < markerStrs.length) {
        if (markerStrs(j).equals(t)) counts(markerLang(j)) += 1
        j += 1
      }
      i += 1
    }
    var best = 0
    var total = 0
    var j = 0
    while (j < counts.length) {
      total += counts(j)
      if (counts(j) > counts(best)) best = j // strict: earliest argmax wins ties
      j += 1
    }
    if (total == 0) UTF8String.fromString("und") else langStrs(best)
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdTokens =
    copy(child = newChild)
}

object LangIdExpr {
  /** Column wrapper: language-ID of a token-array column. */
  def langIdOfTokens(tokens: Column, markers: Seq[(String, Seq[String])]): Column =
    GraftBridge.column(LangIdTokens(GraftBridge.expression(tokens), markers))
}
