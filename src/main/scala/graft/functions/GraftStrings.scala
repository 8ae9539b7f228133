package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass native implementations of the corpus-wide normalize /
  * tokenize hot path, exposed as codegen'd Catalyst expressions via
  * `StaticInvoke` (the `DateTimeUtils` pattern: a static call compiled
  * straight into whole-stage codegen — no UDF boxing, no regex engine).
  *
  * The composable form — `trim(regexp_replace(lower(c), "\\s+", " "))`
  * then `split(normText, " ")` — runs TWO regex passes and materializes
  * an intermediate string per row. On the 100 TB text scan that regex
  * machinery is the single largest CPU line of the whole suite (the
  * tokenize→score scan fronts q139/q143/q144/q162/q164/q172 and every
  * dedup/retrieval family). Here it is one byte scan over the lowercased
  * UTF-8 payload: multi-byte UTF-8 continuation bytes have the high bit
  * set, so the ASCII whitespace test (`\s` = space/tab/LF/VT/FF/CR —
  * Java regex `\s` without UNICODE_CHARACTER_CLASS matches exactly
  * these) can split on raw bytes without decoding, and tokens are
  * zero-copy slices of the lowercased byte array.
  *
  * Semantics are EXACTLY the regex forms' (parity property-pinned in
  * GraftStringsSpec, and the regex forms are kept as `*Regex` twins for
  * the A/B): `lower` delegates to the same `UTF8String.toLowerCase`
  * Spark's `Lower` uses, so Unicode case folding is bit-identical.
  */
object GraftStrings {

  /** Java-regex `\s`: the six ASCII whitespace bytes. */
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  /** tokens = maximal non-whitespace runs of the lowercased text; the
    * fused equivalent of `split(trim(regexp_replace(lower(s), "\\s+",
    * " ")), " ")` with the empty-string → empty-array guard. */
  def normalizeTokens(s: UTF8String): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val n = bytes.length
    var count = 0
    var i = 0
    while (i < n) { // first pass: count tokens (exact-size output array)
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) { count += 1; while (i < n && !isWs(bytes(i))) i += 1 }
    }
    val out = new Array[AnyRef](count)
    var t = 0
    i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        out(t) = UTF8String.fromBytes(bytes, start, i - start)
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Canonical form: lowercase, whitespace runs collapsed to single
    * spaces, ends trimmed — the fused `trim(regexp_replace(lower(s),
    * "\\s+", " "))`. */
  def normalizeText(s: UTF8String): UTF8String = {
    val bytes = s.toLowerCase.getBytes
    val n = bytes.length
    val buf = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (isWs(b)) pendingSpace = o > 0 // leading ws never emits
      else {
        if (pendingSpace) { buf(o) = 0x20; o += 1; pendingSpace = false }
        buf(o) = b
        o += 1
      }
      i += 1
    }
    UTF8String.fromBytes(buf, 0, o)
  }

  /** BPE pre-tokenizer: alphanumeric runs and SINGLE other non-ws
    * characters, over the lowercased text — the fused
    * `regexp_extract_all(normalize(s), "[a-z0-9]+|[^a-z0-9\\s]", 0)`.
    * The char-class branch matches one CHARACTER, so multi-byte UTF-8
    * steps by the lead byte's sequence length. */
  def subwordTokens(s: UTF8String): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val n = bytes.length
    @inline def isAlnum(b: Byte): Boolean =
      (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
    @inline def charLen(b: Byte): Int = {
      val u = b & 0xFF
      if (u < 0x80) 1 else if (u < 0xE0) 2 else if (u < 0xF0) 3 else 4
    }
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (isWs(b)) i += 1
      else if (isAlnum(b)) {
        val start = i
        while (i < n && isAlnum(bytes(i))) i += 1
        out.add(UTF8String.fromBytes(bytes, start, i - start))
      } else {
        val len = math.min(charLen(b), n - i)
        out.add(UTF8String.fromBytes(bytes, i, len))
        i += len
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Count of tokens equal to ANY of the comma-separated `members` —
    * the fused form of Σ_members (size(toks) − size(array_remove(toks,
    * m))), which ran 2·|members| array passes and allocated a fresh
    * array per `array_remove` on every row. One pass, zero allocation
    * (the member list is a handful of short literals; parsing it per
    * row is noise next to scanning the token array). */
  def countTokensIn(toks: ArrayData, members: UTF8String): Long = {
    val ms = members.split(UTF8String.fromString(","), -1)
    val n = toks.numElements()
    var count = 0L
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      var j = 0
      while (j < ms.length) {
        if (t != null && t.equals(ms(j))) { count += 1; j = ms.length }
        else j += 1
      }
      i += 1
    }
    count
  }

  /** Column form of [[countTokensIn]] over a token-array column. */
  def countTokensInCol(toks: Column, members: Seq[String]): Column =
    GraftBridge.column(StaticInvoke(
      classOf[GraftStrings.type], LongType, "countTokensIn",
      Seq(GraftBridge.expression(toks),
        GraftBridge.expression(org.apache.spark.sql.functions.lit(
          members.mkString(",")))),
      Seq(GraftBridge.stringArray, GraftBridge.string),
      propagateNull = true, returnNullable = false))

  private def invoke(method: String, dt: DataType, c: Column): Column =
    GraftBridge.column(StaticInvoke(
      classOf[GraftStrings.type], dt, method,
      Seq(GraftBridge.expression(c)), Seq(GraftBridge.string),
      propagateNull = true, returnNullable = false))

  /** `Array[String]` tokens of raw text — one fused codegen'd call. */
  def tokensCol(c: Column): Column =
    invoke("normalizeTokens", ArrayType(StringType, containsNull = false), c)

  /** Normalized text — one fused codegen'd call. */
  def normalizeCol(c: Column): Column =
    invoke("normalizeText", StringType, c)

  /** BPE pre-tokenizer subword tokens — one fused codegen'd call. */
  def subwordTokensCol(c: Column): Column =
    invoke("subwordTokens", ArrayType(StringType, containsNull = false), c)
}
