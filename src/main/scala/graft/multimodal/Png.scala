package graft.multimodal

/** Dependency-free PNG decoder (RFC 2083 / ISO 15948) backing
  * [[BinaryPipeline.decodePng]] — the most common real-corpus image
  * format the pipeline could not previously open. Built from the public
  * spec only; DEFLATE comes from `java.util.zip.Inflater` (already in
  * the JRE — the same library `TextMetrics.deflateSize` uses), so like
  * the JPEG/BMP/PPM kernels this adds no dependency.
  *
  * Scope (the honesty contract of the other codecs): non-interlaced
  * 8-bit-per-channel images in the four non-palette color types —
  * greyscale (0), truecolor (2), greyscale+alpha (4), truecolor+alpha
  * (6) — with all five row filters (None/Sub/Up/Average/Paeth, the
  * filter-method-0 set every conformant PNG uses). Quarantined (None):
  * Adam7 interlace, 16-bit channels, palette (color type 3), malformed
  * or truncated streams. Alpha is DROPPED, not composited: the pipeline
  * consumers (channel means, resize, dHash, near-dup) operate on color
  * content, and compositing against an arbitrary background would make
  * the same pixels hash differently by decoder configuration.
  *
  * Emits row-major top-down RGB — exactly [[BinaryPipeline.decodePpm]]'s
  * convention — so every consumer composes unchanged.
  *
  * Structure: 8-byte signature → chunk walk (length/type/payload/CRC;
  * CRCs are NOT verified — truncation and structural damage surface as
  * inflate/bounds failures, and a flipped payload bit yields wrong
  * pixels exactly as it would from a CRC-ignoring fast path; the walk
  * validates lengths so it can never read outside the buffer) → IHDR
  * gate → concatenated IDAT inflate (one zlib stream may span many IDAT
  * chunks) → per-row unfilter over `bpp`-strided predictors → channel
  * drop/replicate to RGB.
  *
  * Throws on malformed input by design — the caller catches and
  * quarantines (the [[Jpeg]] contract, keeping the hot loops free of
  * Option plumbing).
  */
private[multimodal] object Png {

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  def decode(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (payload.length < Signature.length + 12) return None
    var i = 0
    while (i < Signature.length) {
      if (payload(i) != Signature(i)) return None
      i += 1
    }
    def u32(o: Int): Long =
      ((payload(o) & 0xffL) << 24) | ((payload(o + 1) & 0xffL) << 16) |
        ((payload(o + 2) & 0xffL) << 8) | (payload(o + 3) & 0xffL)
    // chunk walk: collect IHDR fields + IDAT extents (zero-copy until inflate)
    var w = 0; var h = 0; var bitDepth = -1; var colorType = -1
    var sawIhdr = false; var sawIend = false
    val idat = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (off, len)
    var p = Signature.length
    while (!sawIend) {
      if (p + 8 > payload.length) return None
      val len = u32(p)
      if (len > Int.MaxValue - 12 || p + 12 + len > payload.length) return None
      val typ = new String(payload, p + 4, 4, "US-ASCII")
      val dataOff = p + 8
      typ match {
        case "IHDR" =>
          if (sawIhdr || len != 13) return None
          sawIhdr = true
          val ww = u32(dataOff); val hh = u32(dataOff + 4)
          if (ww < 1 || hh < 1 || ww > (1 << 20) || hh > (1 << 20)) return None
          // total-pixel budget in LONG math before any allocation: the
          // per-axis caps alone admit 2^40 px, and h*(stride+1) / w*h*3
          // overflow Int or force multi-GB arrays from a 25-byte header —
          // OutOfMemoryError is an Error, so the decodePng catch-Exception
          // quarantine would NOT absorb it (memory-DoS on hostile corpora).
          // 2^26 px (64 Mpx ≈ 340 MB raw at RGBA) bounds the worst cell at
          // a sane executor-task budget; larger images quarantine.
          if (ww * hh > (1L << 26)) return None
          w = ww.toInt; h = hh.toInt
          bitDepth = payload(dataOff + 8) & 0xff
          colorType = payload(dataOff + 9) & 0xff
          val compression = payload(dataOff + 10) & 0xff
          val filterMethod = payload(dataOff + 11) & 0xff
          val interlace = payload(dataOff + 12) & 0xff
          // the quarantine gate: 8-bit, non-palette, non-interlaced only
          if (bitDepth != 8 || compression != 0 || filterMethod != 0 ||
            interlace != 0) return None
          if (colorType != 0 && colorType != 2 && colorType != 4 && colorType != 6)
            return None
        case "IDAT" =>
          if (!sawIhdr) return None
          idat += ((dataOff, len.toInt))
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks (and PLTE on non-palette images) skip
      }
      p = dataOff + len.toInt + 4 // payload + CRC
    }
    if (!sawIhdr || idat.isEmpty) return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
    }
    val stride = w * channels           // filtered-row payload bytes
    val raw = new Array[Byte](h * (stride + 1)) // +1 filter byte per row
    // one zlib stream across all IDAT chunks
    val inf = new java.util.zip.Inflater()
    try {
      var out = 0
      var ci = 0
      while (out < raw.length && !inf.finished()) {
        if (inf.needsInput()) {
          if (ci >= idat.length) return None // truncated stream
          val (o, l) = idat(ci); ci += 1
          inf.setInput(payload, o, l)
        }
        val n = inf.inflate(raw, out, raw.length - out)
        if (n == 0 && inf.needsDictionary()) return None
        out += n
      }
      if (out < raw.length) return None // short output = truncated image
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // unfilter in place over the channel-strided predictors (spec §6):
    // a = left, b = up, c = up-left, all 0 outside the image
    val bpp = channels
    val row = new Array[Byte](stride)   // current unfiltered row
    val prev = new Array[Byte](stride)  // previous unfiltered row (zeros at y=0)
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val base = y * (stride + 1)
      val filter = raw(base) & 0xff
      if (filter > 4) return None
      var x = 0
      while (x < stride) {
        val v = raw(base + 1 + x) & 0xff
        val a = if (x >= bpp) row(x - bpp) & 0xff else 0
        val b = prev(x) & 0xff
        val c = if (x >= bpp) prev(x - bpp) & 0xff else 0
        val rec = filter match {
          case 0 => v
          case 1 => v + a
          case 2 => v + b
          case 3 => v + ((a + b) >> 1)
          case 4 => // Paeth predictor
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            v + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        row(x) = (rec & 0xff).toByte
        x += 1
      }
      // emit RGB: replicate grey, drop alpha
      var px = 0
      while (px < w) {
        val d = (y * w + px) * 3
        colorType match {
          case 0 => val g = row(px); rgb(d) = g; rgb(d + 1) = g; rgb(d + 2) = g
          case 4 => val g = row(px * 2); rgb(d) = g; rgb(d + 1) = g; rgb(d + 2) = g
          case 2 =>
            val s = px * 3
            rgb(d) = row(s); rgb(d + 1) = row(s + 1); rgb(d + 2) = row(s + 2)
          case 6 =>
            val s = px * 4
            rgb(d) = row(s); rgb(d + 1) = row(s + 1); rgb(d + 2) = row(s + 2)
        }
        px += 1
      }
      System.arraycopy(row, 0, prev, 0, stride)
      y += 1
    }
    Some((w, h, rgb))
  }
}
