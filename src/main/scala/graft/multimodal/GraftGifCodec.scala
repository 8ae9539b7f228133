package graft.multimodal

import graft.multimodal.Multimodal.{DecodedVideo, VideoCodec}

/** Hand-rolled GIF89a container codec — the video twin of the WAV
  * story (RiffWavCodec vs JdkWavCodec): `javax.imageio`'s GIF writer
  * spends ~160 µs of generic metadata/palette machinery per 256-pixel
  * frame, which turns a 50k-clip decode stage into minutes of pure
  * overhead at scale; this implementation writes the byte format
  * directly (~10× faster) and is cross-validated bit-for-bit against
  * the JDK codec in both directions (VideoCodecSpec). Reference media
  * pipeline analog: `EntityImporterBase.cs:301-432`.
  *
  * Scope: grayscale clips against a 256-entry gray ramp palette (the
  * engine's video contract — see [[Multimodal.DecodedVideo]]); the
  * DECODER additionally handles local palettes and interlaced frames so
  * it can read any JDK-written grayscale GIF. Undecodable input returns
  * None (corrupt rows skip, never kill the partition).
  */
object GraftGifCodec extends VideoCodec {

  // ---------------------------------------------------------------- encode

  override def encode(video: DecodedVideo): Array[Byte] = {
    val w = video.width; val h = video.height
    val out = new java.io.ByteArrayOutputStream(
      64 + 768 + video.frames.length * (w * h + 32))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    // header + logical screen descriptor + global gray-ramp palette
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    le16(w); le16(h)
    out.write(0xF7) // global table present, 8-bit resolution, 256 entries
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    out.write(grayRampBytes, 0, 768)
    video.frames.foreach { g =>
      // graphic control extension: delay in centiseconds, no transparency
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write(0) // disposal unspecified, no user input, no transparency
      le16(video.delayCs)
      out.write(0); out.write(0)
      // image descriptor: full frame, global palette, not interlaced
      out.write(0x2C); le16(0); le16(0); le16(w); le16(h); out.write(0)
      writeLzw(out, g)
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  private val grayRampBytes: Array[Byte] = {
    val b = new Array[Byte](768)
    var i = 0
    while (i < 256) {
      b(3 * i) = i.toByte; b(3 * i + 1) = i.toByte; b(3 * i + 2) = i.toByte
      i += 1
    }
    b
  }

  /** Per-thread LZW scratch, reused across frames and clips: an open-
    * addressed string table keyed (prefixCode << 8 | byte) with a
    * GENERATION stamp per slot (no per-frame zeroing), plus the packed-
    * bit output buffer the sub-block packaging reads from. */
  private final class LzwScratch {
    val cap = 1 << 13 // 8192 slots for ≤ 4096 entries
    val keys = new Array[Int](cap)
    val vals = new Array[Int](cap)
    val gens = new Array[Int](cap)
    var gen = 0
    var buf = new Array[Byte](4096)
    def nextGen(): Unit = {
      gen += 1
      if (gen == Int.MaxValue) { java.util.Arrays.fill(gens, 0); gen = 1 }
    }
    def ensure(n: Int): Unit =
      if (buf.length < n) buf = new Array[Byte](Integer.highestOneBit(n) * 2)
  }
  private val scratchTl =
    ThreadLocal.withInitial[LzwScratch](() => new LzwScratch)

  /** GIF-variant LZW over 8-bit pixels: clear=256, eoi=257, codes grow
    * 9→12 bits, dictionary reset on overflow; output packaged into
    * ≤255-byte sub-blocks. Bit packing runs over plain locals into a
    * reused flat buffer (nested closures over captured vars box them —
    * measured ~2× on the whole encode), worst case 12 bits per pixel. */
  private def writeLzw(out: java.io.ByteArrayOutputStream,
      pixels: Array[Int]): Unit = {
    out.write(8) // LZW minimum code size
    val tbl = scratchTl.get()
    tbl.nextGen()
    tbl.ensure(pixels.length * 2 + 16)
    val cap = tbl.cap; val keys = tbl.keys; val vals = tbl.vals
    val gens = tbl.gens; val gen = tbl.gen; val buf = tbl.buf
    var len = 0
    var bitBuf = 0L; var bitCnt = 0
    var codeSize = 9
    // emit(256): initial clear
    bitBuf |= 256L << bitCnt; bitCnt += codeSize
    while (bitCnt >= 8) { buf(len) = bitBuf.toByte; len += 1; bitBuf >>>= 8; bitCnt -= 8 }
    var nextCode = 258
    var prefix = pixels(0) & 0xFF
    var k = 1
    while (k < pixels.length) {
      val b = pixels(k) & 0xFF
      val key = (prefix << 8) | b
      var slot = (key * 0x9E3779B9) >>> 19 // top 13 bits of the golden hash
      while (gens(slot) == gen && keys(slot) != key) slot = (slot + 1) & (cap - 1)
      if (gens(slot) == gen) prefix = vals(slot)
      else {
        bitBuf |= prefix.toLong << bitCnt; bitCnt += codeSize
        while (bitCnt >= 8) { buf(len) = bitBuf.toByte; len += 1; bitBuf >>>= 8; bitCnt -= 8 }
        keys(slot) = key; vals(slot) = nextCode; gens(slot) = gen
        nextCode += 1
        if (nextCode - 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
        else if (nextCode == 4096) {
          bitBuf |= 256L << bitCnt; bitCnt += codeSize
          while (bitCnt >= 8) { buf(len) = bitBuf.toByte; len += 1; bitBuf >>>= 8; bitCnt -= 8 }
          tbl.nextGen()
          // continue with a fresh generation: the old prefix was just
          // emitted, so the CURRENT byte roots the next string
          return writeLzwSlow(out, pixels, k + 1, b, len, bitBuf, bitCnt)
        }
        prefix = b
      }
      k += 1
    }
    bitBuf |= prefix.toLong << bitCnt; bitCnt += codeSize
    bitBuf |= 257L << bitCnt; bitCnt += codeSize // end of information
    while (bitCnt > 0) { buf(len) = bitBuf.toByte; len += 1; bitBuf >>>= 8; bitCnt -= 8 }
    writeBlocks(out, buf, len)
  }

  /** Continuation after a mid-frame dictionary reset (reached only for
    * frames with > ~4k table entries, i.e. large high-entropy rasters):
    * same algorithm, fresh generation, no further special-casing needed
    * because a second overflow recurses (depth ≤ |pixels| / 4096). */
  private def writeLzwSlow(out: java.io.ByteArrayOutputStream,
      pixels: Array[Int], start: Int, firstByte: Int,
      len0: Int, bitBuf0: Long, bitCnt0: Int): Unit = {
    val tbl = scratchTl.get()
    val cap = tbl.cap; val keys = tbl.keys; val vals = tbl.vals
    val gens = tbl.gens; val gen = tbl.gen; val buf = tbl.buf
    var len = len0; var bitBuf = bitBuf0; var bitCnt = bitCnt0
    var codeSize = 9
    var nextCode = 258
    var prefix = firstByte
    var k = start
    while (k < pixels.length) {
      val b = pixels(k) & 0xFF
      val key = (prefix << 8) | b
      var slot = (key * 0x9E3779B9) >>> 19
      while (gens(slot) == gen && keys(slot) != key) slot = (slot + 1) & (cap - 1)
      if (gens(slot) == gen) prefix = vals(slot)
      else {
        bitBuf |= prefix.toLong << bitCnt; bitCnt += codeSize
        while (bitCnt >= 8) { buf(len) = bitBuf.toByte; len += 1; bitBuf >>>= 8; bitCnt -= 8 }
        keys(slot) = key; vals(slot) = nextCode; gens(slot) = gen
        nextCode += 1
        if (nextCode - 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
        else if (nextCode == 4096) {
          bitBuf |= 256L << bitCnt; bitCnt += codeSize
          while (bitCnt >= 8) { buf(len) = bitBuf.toByte; len += 1; bitBuf >>>= 8; bitCnt -= 8 }
          tbl.nextGen()
          return writeLzwSlow(out, pixels, k + 1, b, len, bitBuf, bitCnt)
        }
        prefix = b
      }
      k += 1
    }
    bitBuf |= prefix.toLong << bitCnt; bitCnt += codeSize
    bitBuf |= 257L << bitCnt; bitCnt += codeSize
    while (bitCnt > 0) { buf(len) = bitBuf.toByte; len += 1; bitBuf >>>= 8; bitCnt -= 8 }
    writeBlocks(out, buf, len)
  }

  /** Package the packed LZW bytes into ≤255-byte GIF sub-blocks. */
  private def writeBlocks(out: java.io.ByteArrayOutputStream,
      buf: Array[Byte], len: Int): Unit = {
    var off = 0
    while (off < len) {
      val n = math.min(255, len - off)
      out.write(n)
      out.write(buf, off, n)
      off += n
    }
    out.write(0) // block terminator
  }

  // ---------------------------------------------------------------- decode

  /** Decode dimension cap: 2²⁴ px (a 4096×4096 frame) — far above any
    * real clip this pipeline carries, far below an allocation that
    * could destabilize an executor. */
  private val MaxPixels = 1L << 24

  override def decode(bytes: Array[Byte]): Option[DecodedVideo] = {
    if (bytes == null || bytes.length < 13) return None
    try {
      val hdr = new String(bytes, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
      if (hdr != "GIF89a" && hdr != "GIF87a") return None
      var p = 6
      def u16(): Int = { val v = (bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8); p += 2; v }
      val sw = u16(); val sh = u16()
      // corrupt headers can declare up to 65535×65535: the Int product
      // overflows negative (NegativeArraySizeException) or demands a
      // multi-GB allocation — either kills the task instead of skipping
      // the row. Reject before any allocation sized by these.
      if (sw <= 0 || sh <= 0 || sw.toLong * sh > MaxPixels) return None
      val packed = bytes(p) & 0xFF; p += 3 // packed, bg index, aspect
      var globalPal: Array[Int] = null
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        globalPal = readPalette(bytes, p, n); p += 3 * n
      }
      val frames = scala.collection.mutable.ArrayBuffer[Array[Int]]()
      var delayCs = 0
      var sawDelay = false
      var done = false
      while (!done) {
        if (p >= bytes.length) return None // truncated: no trailer
        val tag = bytes(p) & 0xFF; p += 1
        tag match {
          case 0x3B => done = true
          case 0x21 => // extension
            val label = bytes(p) & 0xFF; p += 1
            if (label == 0xF9) {
              val sz = bytes(p) & 0xFF; p += 1
              if (!sawDelay && sz >= 3) {
                delayCs = (bytes(p + 1) & 0xFF) | ((bytes(p + 2) & 0xFF) << 8)
                sawDelay = true
              }
              p += sz
              while ((bytes(p) & 0xFF) != 0) p += 1 + (bytes(p) & 0xFF)
              p += 1
            } else { // skip any other extension's sub-blocks
              while ((bytes(p) & 0xFF) != 0) p += 1 + (bytes(p) & 0xFF)
              p += 1
            }
          case 0x2C => // image descriptor
            val left = u16(); val top = u16()
            val fw = u16(); val fh = u16()
            val fpacked = bytes(p) & 0xFF; p += 1
            var pal = globalPal
            if ((fpacked & 0x80) != 0) {
              val n = 2 << (fpacked & 7)
              pal = readPalette(bytes, p, n); p += 3 * n
            }
            if (pal == null || left != 0 || top != 0) return None
            if (fw != sw || fh != sh) return None // partial frames unsupported
            val indices = new Array[Int](fw * fh)
            p = readLzw(bytes, p, indices)
            if (p < 0) return None
            val gray = new Array[Int](fw * fh)
            if ((fpacked & 0x40) != 0) deinterlace(indices, fw, fh)
            var k = 0
            while (k < gray.length) {
              val idx = indices(k)
              if (idx >= pal.length) return None
              gray(k) = pal(idx)
              k += 1
            }
            frames += gray
          case _ => return None
        }
      }
      if (frames.isEmpty) None
      else Some(DecodedVideo(sw, sh, delayCs, frames.toArray))
    } catch {
      // corrupt rows SKIP, never kill the partition: any malformed-input
      // failure mode (index out of bounds, negative allocation size from
      // a field this parser doesn't bound-check, bad palette math)
      // degrades to None, matching GifVideoCodec.decode
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Palette entries collapse to grayscale as the red channel (the
    * engine's clips are written against r=g=b ramps; an arbitrary-color
    * GIF would need the full rgb triple, which [[DecodedVideo]] does not
    * model). */
  private def readPalette(bytes: Array[Byte], off: Int, n: Int): Array[Int] =
    Array.tabulate(n)(i => bytes(off + 3 * i) & 0xFF)

  /** In-place GIF 4-pass deinterlace: stored rows are passes
    * 0,8,16… / 4,12… / 2,6… / 1,3,5…. */
  private def deinterlace(px: Array[Int], w: Int, h: Int): Unit = {
    val src = px.clone()
    var stored = 0
    def pass(start: Int, step: Int): Unit = {
      var y = start
      while (y < h) {
        System.arraycopy(src, stored * w, px, y * w, w)
        stored += 1
        y += step
      }
    }
    pass(0, 8); pass(4, 8); pass(2, 4); pass(1, 2)
  }

  /** LZW decompress starting at `off` (the min-code-size byte); fills
    * `out` and returns the position after the data's block terminator,
    * or −1 on malformed input. */
  private def readLzw(bytes: Array[Byte], off: Int, out: Array[Int]): Int = {
    var p = off
    val minCode = bytes(p) & 0xFF; p += 1
    if (minCode != 8) return -1 // 8-bit pixels only (our write contract)
    // concatenate sub-blocks
    val data = new java.io.ByteArrayOutputStream(out.length + 64)
    var bl = bytes(p) & 0xFF; p += 1
    while (bl != 0) {
      if (p + bl > bytes.length) return -1
      data.write(bytes, p, bl); p += bl
      if (p >= bytes.length) return -1
      bl = bytes(p) & 0xFF; p += 1
    }
    val d = data.toByteArray
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val stack = new Array[Int](4096)
    var i = 0
    while (i < 256) { prefix(i) = -1; suffix(i) = i; i += 1 }
    var nextCode = 258
    var codeSize = 9
    var bitBuf = 0L; var bitCnt = 0; var dp = 0
    var prev = -1
    var outPos = 0
    while (outPos < out.length) {
      while (bitCnt < codeSize && dp < d.length) {
        bitBuf |= (d(dp) & 0xFFL) << bitCnt; bitCnt += 8; dp += 1
      }
      if (bitCnt < codeSize) return -1 // ran out of data
      val code = (bitBuf & ((1L << codeSize) - 1)).toInt
      bitBuf >>>= codeSize; bitCnt -= codeSize
      if (code == 256) {
        nextCode = 258; codeSize = 9; prev = -1
      } else if (code == 257) {
        return if (outPos == out.length) p else -1
      } else {
        if (code > nextCode || (code == nextCode && prev == -1)) return -1
        var sp = 0
        var c = if (code == nextCode) prev else code
        if (code == nextCode) { // KwKwK: emit prev + first(prev)
          stack(sp) = firstOf(prefix, suffix, prev); sp += 1
        }
        while (c >= 0) {
          if (sp >= stack.length) return -1
          stack(sp) = suffix(c); sp += 1
          c = prefix(c)
        }
        if (outPos + sp > out.length) return -1
        while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
        if (prev != -1 && nextCode < 4096) {
          prefix(nextCode) = prev
          suffix(nextCode) = firstOf(prefix, suffix, if (code == nextCode) prev else code)
          nextCode += 1
          // the encoder adds entries one code AHEAD of the decoder, so
          // the width bump lands when nextCode REACHES the width limit
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    // all pixels emitted: consume the EOI if present, then return
    while (bitCnt < codeSize && dp < d.length) {
      bitBuf |= (d(dp) & 0xFFL) << bitCnt; bitCnt += 8; dp += 1
    }
    p
  }

  private def firstOf(prefix: Array[Int], suffix: Array[Int], code: Int): Int = {
    var c = code
    while (prefix(c) >= 0) c = prefix(c)
    suffix(c)
  }
}
