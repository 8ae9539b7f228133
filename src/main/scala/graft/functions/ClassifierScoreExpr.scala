package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** One-pass hashing-trick classifier score over a token array — the
  * primitive-loop form of `text.Classifier.scoreOf` (which stays as the
  * spec cross-check, the QuantDequantI8 precedent).
  *
  * Why custom: the composable form folds an `aggregate` HOF whose lambda
  * body is a conv(substring(md5(concat(...)))) expression TREE — Spark
  * interprets it per feature with boxed UTF8String/decimal churn, two
  * Catalyst md5 calls and a base-16 string conversion each. This
  * expression walks the array once in JVM code: unigrams then on-the-fly
  * bigrams, two raw MessageDigest MD5s per feature, bucket/weight
  * extracted from the digest BYTES (first 3 / first 4 hex nibbles)
  * without ever materializing hex strings. Bit-identical to the column
  * chain (asserted element-for-element in ClassifierSpec).
  *
  * MessageDigest is not thread-safe and expression instances can be
  * shared across local-mode task threads → per-thread instance. */
case class ClassifierScore(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[GraftBridge.AbstractType] = Seq(GraftBridge.stringArray)

  override def dataType: DataType = LongType

  @transient private lazy val mdTL =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val FPrefix = "f:".getBytes("UTF-8")
  private val WPrefix = "w:".getBytes("UTF-8")

  /** weight(bucket(feature)) exactly as the column chain computes it:
    * bucket = first 3 hex nibbles of md5("f:"+f); weight = first 4 hex
    * nibbles of md5("w:"+bucket) − 32768. */
  private def featWeight(f: Array[Byte], off: Int, len: Int): Long = {
    val md = mdTL.get()
    md.reset()
    md.update(FPrefix)
    md.update(f, off, len)
    val d1 = md.digest()
    val bucket = ((d1(0) & 0xFF) << 4) | ((d1(1) & 0xFF) >>> 4)
    md.reset()
    md.update(WPrefix)
    md.update(String.valueOf(bucket).getBytes("UTF-8"))
    val d2 = md.digest()
    ((((d2(0) & 0xFF) << 8) | (d2(1) & 0xFF)) - 32768).toLong
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { bytes(i) = arr.getUTF8String(i).getBytes; i += 1 }
    var s = 0L
    i = 0
    while (i < n) { s += featWeight(bytes(i), 0, bytes(i).length); i += 1 }
    i = 0
    while (i < n - 1) { // bigram "a b", built once in a scratch buffer
      val a = bytes(i); val b = bytes(i + 1)
      val f = new Array[Byte](a.length + 1 + b.length)
      System.arraycopy(a, 0, f, 0, a.length)
      f(a.length) = ' '
      System.arraycopy(b, 0, f, a.length + 1, b.length)
      s += featWeight(f, 0, f.length)
      i += 1
    }
    s
  }

  override protected def withNewChildInternal(newChild: Expression): ClassifierScore =
    copy(child = newChild)
}

object ClassifierScore {
  def score(tokens: Column): Column =
    GraftBridge.column(ClassifierScore(GraftBridge.expression(tokens)))
}
