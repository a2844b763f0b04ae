package graft.multimodal

/** Dependency-free BASELINE JPEG decoder (ITU-T T.81 sequential DCT,
  * Huffman entropy coding, 8-bit precision) backing
  * [[BinaryPipeline.decodeJpeg]]. Built from the public spec only; the
  * scope is the container real image corpora actually use — anything
  * outside it (progressive, arithmetic, 12-bit, CMYK, hierarchical)
  * returns None and rides the pipeline's quarantine flag.
  *
  * Structure: a marker walk collects quantization tables (DQT), Huffman
  * tables (DHT, canonical code construction per Annex C), the frame
  * header (SOF0 only), and the restart interval (DRI); the single
  * interleaved scan (SOS) then drives an MCU loop — per component
  * h×v blocks of: DC predictor + SSSS-magnitude diff, AC run-length
  * (ZRL/EOB) coefficients, dequantize in zigzag order, separable 8×8
  * double-precision IDCT, +128 level shift. Chroma planes upsample by
  * sample replication and convert via the JFIF YCbCr→RGB matrix.
  *
  * Throws on malformed input by design — the caller catches and
  * quarantines (keeping this file free of Option plumbing in the hot
  * loops).
  */
private[multimodal] object Jpeg {

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // cos((2x+1)·u·π/16) · C(u)/2 — the separable IDCT basis, built once
  private val IdctCos: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) math.sqrt(0.5) else 1.0
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = cu / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }

  /** Canonical Huffman table (Annex C): decode via the standard
    * mincode/maxcode/valptr walk.
    */
  private final class HuffTable(counts: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = code - 1
        if (counts(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var l = 1
      while (l < 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | br.bit()
        l += 1
      }
      if (maxCode(l) < 0 || code > maxCode(l))
        throw new IllegalArgumentException("bad huffman code")
      vals(valPtr(l) + code - minCode(l)) & 0xff
    }
  }

  /** Entropy-segment bit reader with FF00 unstuffing; any other FF-marker
    * ends the data (reads past it yield 0 bits, which a truncated stream
    * turns into a decode error upstream). Restart markers are consumed
    * explicitly via [[restart]].
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    private var ended = false
    /** Bits served past the end of the entropy data. A valid stream needs
      * at most 7 (the final byte-alignment padding); more means the
      * payload was TRUNCATED and the decode so far is garbage — the
      * caller rejects it (quarantine, never a silently wrong raster).
      */
    var padBits = 0
    private var padding = false
    def bit(): Int = {
      if (nbits == 0) {
        if (ended || pos >= data.length) { cur = 0; nbits = 8; padding = true } // pad (T.81 F.2.2.5)
        else {
          val b = data(pos) & 0xff
          pos += 1
          if (b == 0xff) {
            val b2 = if (pos < data.length) data(pos) & 0xff else 0xd9
            if (b2 == 0x00) { pos += 1; cur = 0xff; nbits = 8 }
            else { ended = true; pos -= 1; cur = 0; nbits = 8; padding = true } // marker: stop
          } else { cur = b; nbits = 8 }
        }
      }
      nbits -= 1
      if (padding) padBits += 1
      (cur >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume the expected RSTn marker. */
    def restart(): Unit = {
      nbits = 0
      ended = false
      padding = false
      if (pos + 1 < data.length && (data(pos) & 0xff) == 0xff &&
        (data(pos + 1) & 0xff) >= 0xd0 && (data(pos + 1) & 0xff) <= 0xd7) pos += 2
      else throw new IllegalArgumentException("missing restart marker")
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int)

  def decode(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val qt = new Array[Array[Int]](4) // zigzag order, as stored
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    def u16(o: Int): Int = ((payload(o) & 0xff) << 8) | (payload(o + 1) & 0xff)

    var pos = 2 // past SOI
    var scanStart = -1
    var scanMap: Array[(HuffTable, HuffTable)] = null
    while (scanStart < 0) {
      if (pos + 4 > payload.length) return None
      if ((payload(pos) & 0xff) != 0xff) return None
      while ((payload(pos + 1) & 0xff) == 0xff) { // 0xFF fill bytes (B.1.1.2)
        pos += 1
        if (pos + 4 > payload.length) return None
      }
      val marker = payload(pos + 1) & 0xff
      val len = u16(pos + 2)
      val body = pos + 4
      if (body + len - 2 > payload.length) return None
      marker match {
        case 0xc0 => // SOF0 baseline
          if ((payload(body) & 0xff) != 8) return None // 12-bit: quarantine
          height = u16(body + 1)
          width = u16(body + 3)
          val nc = payload(body + 5) & 0xff
          if (width <= 0 || height <= 0 || (nc != 1 && nc != 3)) return None
          comps = Array.tabulate(nc) { i =>
            val o = body + 6 + i * 3
            val hv = payload(o + 1) & 0xff
            Component(payload(o) & 0xff, hv >> 4, hv & 0xf, payload(o + 2) & 0xff)
          }
          if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 || c.tq > 3))
            return None
          // single-component frames: sampling factors are ratios between
          // components, so with one component they are meaningless — and a
          // single-component scan is non-interleaved (T.81 A.2.2: MCU = one
          // block). Normalizing to 1×1 makes the MCU loop exactly that.
          if (nc == 1) comps(0) = comps(0).copy(h = 1, v = 1)
        case m if m == 0xc1 || m == 0xc2 || m == 0xc3 || (m >= 0xc5 && m <= 0xc7) ||
          (m >= 0xc9 && m <= 0xcb) || (m >= 0xcd && m <= 0xcf) =>
          return None // progressive / extended / arithmetic / lossless: quarantine
        case 0xc4 => // DHT — possibly several tables in one segment
          var o = body
          while (o < body + len - 2) {
            val tc = (payload(o) & 0xff) >> 4
            val th = payload(o) & 0x0f
            if (tc > 1 || th > 3) return None
            val counts = Array.tabulate(16)(i => payload(o + 1 + i) & 0xff)
            val n = counts.sum
            if (n == 0 || n > 256 || o + 17 + n > body + len - 2) return None
            val vals = java.util.Arrays.copyOfRange(payload, o + 17, o + 17 + n)
            val tab = new HuffTable(counts, vals)
            if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
            o += 17 + n
          }
        case 0xdb => // DQT — possibly several tables, 8- or 16-bit entries
          var o = body
          while (o < body + len - 2) {
            val pq = (payload(o) & 0xff) >> 4
            val tq = payload(o) & 0x0f
            if (pq > 1 || tq > 3) return None
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              t(i) = if (pq == 0) payload(o + 1 + i) & 0xff else u16(o + 1 + i * 2)
              i += 1
            }
            qt(tq) = t
            o += 1 + (if (pq == 0) 64 else 128)
          }
        case 0xdd => restartInterval = u16(body)
        case 0xda => // SOS
          if (comps == null) return None
          val ns = payload(body) & 0xff
          if (ns != comps.length) return None // non-interleaved multi-scan: quarantine
          scanMap = new Array[(HuffTable, HuffTable)](ns)
          var i = 0
          while (i < ns) {
            val cs = payload(body + 1 + i * 2) & 0xff
            val tt = payload(body + 2 + i * 2) & 0xff
            val ci = comps.indexWhere(_.id == cs)
            if (ci < 0) return None
            val dc = dcTabs(tt >> 4)
            val ac = acTabs(tt & 0xf)
            if (dc == null || ac == null) return None
            scanMap(ci) = (dc, ac)
            i += 1
          }
          scanStart = body + len - 2
        case 0xd9 => return None // EOI before any scan
        case _ => // APPn, COM, others: skip
      }
      pos = body + len - 2
    }
    if (comps.exists(c => qt(c.tq) == null)) return None

    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // per-component plane at its own resolution, MCU-padded
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = Array.tabulate(comps.length)(i => new Array[Byte](planeW(i) * planeH(i)))
    // guard absurd headers before allocating further (decompression bomb /
    // corrupt-dims valve, same spirit as decodeBmp's 2^20 cap)
    if (width > (1 << 16) || height > (1 << 16) ||
      planes.map(_.length.toLong).sum > (64L << 20)) return None

    val br = new BitReader(payload, scanStart)
    val pred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    val blk = new Array[Double](64)

    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart()
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qt(c.tq)
        val (dcTab, acTab) = scanMap(ci)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            // ---- entropy decode one 8×8 block into natural-order coef ----
            java.util.Arrays.fill(coef, 0)
            val t = dcTab.decode(br)
            if (t > 11) throw new IllegalArgumentException("bad DC SSSS")
            pred(ci) += extend(br.receive(t), t)
            coef(0) = pred(ci) * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = acTab.decode(br)
              val r = rs >> 4
              val s = rs & 0xf
              if (s == 0) {
                if (r == 15) k += 16 else eob = true // ZRL / EOB
              } else {
                k += r
                if (k > 63) throw new IllegalArgumentException("AC overrun")
                coef(Zigzag(k)) = extend(br.receive(s), s) * q(k)
                k += 1
              }
            }
            // ---- separable IDCT: columns then rows ----
            var x = 0
            while (x < 8) {
              var y = 0
              while (y < 8) {
                var acc = 0.0
                var u = 0
                while (u < 8) { acc += IdctCos(u * 8 + y) * coef(u * 8 + x); u += 1 }
                tmp(y * 8 + x) = acc
                y += 1
              }
              x += 1
            }
            var y = 0
            while (y < 8) {
              var x2 = 0
              while (x2 < 8) {
                var acc = 0.0
                var u = 0
                while (u < 8) { acc += IdctCos(u * 8 + x2) * tmp(y * 8 + u); u += 1 }
                blk(y * 8 + x2) = acc
                x2 += 1
              }
              y += 1
            }
            // ---- level shift + clamp into the component plane ----
            val ox = (mx * c.h + bx) * 8
            val oy = (my * c.v + by) * 8
            val pw = planeW(ci)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                val v = math.round(blk(yy * 8 + xx) + 128.0).toInt
                planes(ci)((oy + yy) * pw + ox + xx) =
                  (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // a valid stream byte-aligns with ≤7 padding bits; needing more means
    // the entropy data was truncated — the raster is garbage, reject it
    if (br.padBits > 7) return None

    // ---- upsample (replicate) + color convert, top-down row-major RGB ----
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val d = (y * width + x) * 3
        if (comps.length == 1) {
          val g = planes(0)(y * planeW(0) + x)
          out(d) = g; out(d + 1) = g; out(d + 2) = g
        } else {
          def samp(ci: Int): Int = {
            val c = comps(ci)
            planes(ci)((y * c.v / vMax) * planeW(ci) + (x * c.h / hMax)) & 0xff
          }
          val yv = samp(0)
          val cb = samp(1) - 128
          val cr = samp(2) - 128
          def clamp(v: Double): Byte = {
            val i = math.round(v).toInt
            (if (i < 0) 0 else if (i > 255) 255 else i).toByte
          }
          out(d) = clamp(yv + 1.402 * cr)
          out(d + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
          out(d + 2) = clamp(yv + 1.772 * cb)
        }
        x += 1
      }
      y += 1
    }
    Some((width, height, out))
  }
}
