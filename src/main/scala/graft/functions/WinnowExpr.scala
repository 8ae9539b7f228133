package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Robust winnowing (the MOSS document-fingerprinting scheme: Schleimer,
  * Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
  * Fingerprinting", SIGMOD 2003) in ONE primitive pass per document.
  *
  * From each window of `w` consecutive `k`-char-gram hashes, select the
  * minimum hash (ties → the RIGHTMOST); the distinct selected (pos, hash)
  * set is the document's fingerprint sketch. The scheme's guarantee: any
  * substring match of length ≥ w + k − 1 between two documents produces at
  * least one shared fingerprint, while per-document sketch density is
  * ~2/(w+1) — position-local, content-addressed sampling that survives
  * insertions and deletions (unlike modulo-sampling of gram hashes).
  *
  * Engine-portable hashing: each gram hashes to the FIRST 4 BYTES of the
  * md5 of its UTF-8 bytes, rendered as 8 lowercase hex chars — exactly
  * `substring(md5(substring(t, i, k)), 1, 8)` in DuckDB/Spark SQL, so the
  * whole sketch is value-checkable by an oracle. Comparing the 4 bytes as
  * an unsigned int is order-identical to comparing the hex strings.
  *
  * Why a custom expression (SURVEY §7.3): the SQL formulation explodes one
  * row per gram PER WINDOW (w× the corpus character count) through a
  * (doc, window)-keyed shuffle and a per-window row_number. This pass is
  * the O(n) monotonic-deque sliding minimum — no explode, no shuffle, no
  * sort; fingerprinting stays map-side and only the (doc, hash) sketch
  * rows (density ~2/(w+1) per char) ever reach an exchange.
  *
  * Windows shorter than `w` (documents with fewer than w grams but at
  * least one) winnow as a single whole-document window. Code-point (not
  * UTF-16 unit) gram boundaries match SQL character semantics.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(k >= 1 && w >= 1)

  override def inputTypes: Seq[GraftBridge.AbstractType] = Seq(GraftBridge.string)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("h", StringType, nullable = false))),
    containsNull = false)

  private val HexDigits = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val cps = text.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val g = n - k + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    // encode ONCE; per-gram digests run over byte slices via the
    // per-code-point byte-offset index (no per-gram String/encode churn)
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val offs = new Array[Int](n + 1)
    var ci = 0
    var bi = 0
    while (ci < n) {
      offs(ci) = bi
      val cp = cps(ci)
      bi += (if (cp < 0x80) 1 else if (cp < 0x800) 2
             else if (cp < 0x10000) 3 else 4)
      ci += 1
    }
    offs(n) = bi
    val hash = new Array[Long](g) // first 4 md5 bytes, unsigned
    var i = 0
    while (i < g) {
      md.update(bytes, offs(i), offs(i + k) - offs(i))
      val d = md.digest()
      hash(i) = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      i += 1
    }
    // sliding-window minimum, rightmost-min tie-break: the deque keeps
    // candidate indices with strictly increasing hashes; pushing pops every
    // back with hash >= the entrant, so among equals the rightmost survives
    val deque = new Array[Int](g)
    var head = 0
    var tail = 0 // exclusive
    val selPos = new scala.collection.mutable.ArrayBuffer[Int]()
    var lastSel = -1
    i = 0
    while (i < g) {
      while (tail > head && hash(deque(tail - 1)) >= hash(i)) tail -= 1
      deque(tail) = i
      tail += 1
      val winStart = i - w + 1
      if (winStart >= 0) {
        while (deque(head) < winStart) head += 1
        val sel = deque(head)
        if (sel != lastSel) { selPos += sel; lastSel = sel }
      }
      i += 1
    }
    if (g < w) {
      // fewer grams than the window: one whole-document window
      selPos += deque(head)
    }
    val out = new Array[Any](selPos.length)
    var j = 0
    while (j < selPos.length) {
      val p = selPos(j)
      val v = hash(p)
      val hex = new Array[Char](8)
      var b = 0
      while (b < 8) {
        hex(b) = HexDigits(((v >>> ((7 - b) * 4)) & 0xF).toInt)
        b += 1
      }
      out(j) = new GenericInternalRow(Array[Any](p + 1,
        UTF8String.fromString(new String(hex)))): InternalRow
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowExpr {
  /** Column wrapper: winnowed (pos, hash) fingerprints of a (normalized)
    * text column. */
  def winnowOf(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowFingerprints(GraftBridge.expression(text), k, w))
}
