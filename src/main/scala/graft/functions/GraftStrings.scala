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

  /** Mojibake (double-encoded UTF-8) scan shared by detect and repair.
    *
    * Corruption model: valid UTF-8 bytes mis-read as Latin-1 and
    * re-encoded as UTF-8 — the classic cross-system ingest bug ("é" →
    * "Ã©", "…" → "â¦"). Under that model an original n-byte char
    * (n = 2..4) becomes its n single Latin-1 chars: a LEAD char
    * U+00C2–U+00F4 followed by n−1 CONTINUATION chars U+0080–U+00BF.
    * In the corrupted byte stream the lead is `C3 8x/Ax/Bx` and each
    * continuation is `C2 xx` — and because UTF-8 byte values equal the
    * Latin-1 codepoints they encode, the repair is just emitting the
    * codepoints back as bytes. Repair applies only where the recovered
    * sequence is WELL-FORMED UTF-8 (overlong/surrogate/above-U+10FFFF
    * candidates are left untouched), so `fix(corrupt(s)) == s` for
    * every valid string `s` — property-pinned in GraftStringsSpec.
    * Like any mojibake heuristic it would also rewrite a LEGITIMATE
    * "Ã©"-style sequence: by construction those are exactly the
    * sequences the corruption produces, so they are indistinguishable.
    *
    * @return repaired bytes written to `out` and the repair count; when
    *   `out` is null only counts. */
  private def mojibakeScan(b: Array[Byte], out: Array[Byte]): (Int, Long) = {
    val n = b.length
    var i = 0
    var o = 0
    var repairs = 0L
    // Latin-1 continuation char (U+0080–U+00BF) at byte offset j —
    // encoded C2 80..C2 BF; returns its codepoint or -1
    def cont(j: Int): Int =
      if (j + 1 < n && b(j) == 0xC2.toByte && (b(j + 1) & 0xC0) == 0x80)
        b(j + 1) & 0xFF
      else -1
    while (i < n) {
      var skip = 0
      if (i + 1 < n && b(i) == 0xC3.toByte && (b(i + 1) & 0xC0) == 0x80) {
        val lead = 0xC0 | (b(i + 1) & 0x3F) // the Latin-1 lead codepoint
        if (lead >= 0xC2 && lead <= 0xDF) { // 2-byte original (C0/C1 = overlong, never produced)
          val x1 = cont(i + 2)
          if (x1 >= 0) {
            if (out != null) { out(o) = lead.toByte; out(o + 1) = x1.toByte }
            o += 2; skip = 4
          }
        } else if (lead <= 0xEF) { // 3-byte original (E0..EF)
          val x1 = cont(i + 2)
          val x2 = if (x1 >= 0) cont(i + 4) else -1
          if (x2 >= 0 &&
              (lead != 0xE0 || x1 >= 0xA0) && // overlong
              (lead != 0xED || x1 <= 0x9F)) { // surrogates
            if (out != null) {
              out(o) = lead.toByte; out(o + 1) = x1.toByte; out(o + 2) = x2.toByte
            }
            o += 3; skip = 6
          }
        } else if (lead <= 0xF4) { // 4-byte original (F0..F4)
          val x1 = cont(i + 2)
          val x2 = if (x1 >= 0) cont(i + 4) else -1
          val x3 = if (x2 >= 0) cont(i + 6) else -1
          if (x3 >= 0 &&
              (lead != 0xF0 || x1 >= 0x90) && // overlong
              (lead != 0xF4 || x1 <= 0x8F)) { // > U+10FFFF
            if (out != null) {
              out(o) = lead.toByte; out(o + 1) = x1.toByte
              out(o + 2) = x2.toByte; out(o + 3) = x3.toByte
            }
            o += 4; skip = 8
          }
        }
      }
      if (skip > 0) { repairs += 1; i += skip }
      else { if (out != null) out(o) = b(i); o += 1; i += 1 }
    }
    (o, repairs)
  }

  /** Number of repairable double-encoded sequences in `s`. */
  def mojibakeCount(s: UTF8String): Long = mojibakeScan(s.getBytes, null)._2

  /** `s` with every repairable double-encoded sequence collapsed back
    * to the original char; non-matching bytes copied verbatim. */
  def fixMojibake(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val out = new Array[Byte](b.length)
    val (o, _) = mojibakeScan(b, out)
    UTF8String.fromBytes(out, 0, o)
  }

  /** Codegen'd mojibake-sequence count of a string column. */
  def mojibakeCountCol(c: Column): Column = invoke("mojibakeCount", LongType, c)

  /** Codegen'd mojibake repair of a string column. */
  def fixMojibakeCol(c: Column): Column = invoke("fixMojibake", StringType, c)

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
