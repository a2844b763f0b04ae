package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, batched decode/feature-extract over partitions.
  *
  * The Spark-side contract is real and tested — schema, partition-batched
  * execution, deterministic output. The IMAGE path has REAL decoders for
  * the PPM P6 container ([[decodePpm]] — dependency-free: ASCII header +
  * raw RGB), uncompressed 24-bpp BMP ([[decodeBmp]] — LE header walk,
  * row padding, both row orders), and BASELINE JPEG ([[decodeJpeg]] —
  * dependency-free T.81 sequential-DCT pipeline, see [[Jpeg]]); the AUDIO
  * path a REAL decoder for RIFF/WAVE PCM ([[decodeWav]] — chunk walk +
  * sample normalization); the VIDEO path a REAL RIFF/AVI container parser
  * ([[decodeAviFrames]]) whose MJPEG frames decode through the engine's
  * own JPEG kernel ([[videoFrames]]/[[decodeVideos]]) — all exercised
  * end-to-end over genuine payloads (the JPEG path cross-checked against
  * `javax.imageio` in the spec, the AVI path over spec-built MJPEG
  * containers); remaining formats (progressive jpeg, mp3, non-AVI /
  * non-MJPEG video — this environment ships no codec libraries) fall back
  * to a deterministic STUB (`fakeDecode`) with a visible
  * `real_decode = false` quarantine flag. Swapping in a full codec (e.g.
  * javacpp-ffmpeg) changes no plumbing.
  *
  * Scale notes: decode runs via `mapPartitions` (the Scala analogue of
  * `mapInPandas` batch UDFs) so per-partition setup (codec init) amortizes;
  * binary payloads never pass through a shuffle — only extracted features
  * do. Partitioning by (modality) up front keeps homogeneous batches so a
  * codec pool per executor stays warm.
  */
object BinaryPipeline {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("payload", BinaryType, nullable = false)
  ))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)
  ))

  /** Deterministic stand-in for a media decoder: 8 pseudo-"channel means"
    * derived from payload bytes. Replace with a real codec in production.
    */
  def fakeDecode(payload: Array[Byte], dims: Int = 8): Array[Double] = {
    val acc = new Array[Long](dims)
    var i = 0
    while (i < payload.length) {
      acc(i % dims) += (payload(i) & 0xff)
      i += 1
    }
    acc.map(a => if (payload.isEmpty) 0.0 else a.toDouble / payload.length)
  }

  /** REAL decoder for the PPM P6 container (ASCII header + raw RGB) — the
    * one raster format that needs no codec library, so the image path is
    * genuinely exercised end-to-end: header parse (whitespace + '#'
    * comments), dimension/maxval validation, payload-length check.
    * Malformed or truncated payloads → None; callers fall back to
    * [[fakeDecode]] — the quarantine path a production decode stage needs
    * anyway. Other formats stay stubbed (no codec libs in this
    * environment); swapping in a real codec changes no plumbing.
    */
  def decodePpm(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (payload.length < 2 || payload(0) != 'P'.toByte || payload(1) != '6'.toByte) return None
    var i = 2
    def skipWs(): Unit = {
      var in = true
      while (in && i < payload.length) {
        val c = payload(i).toChar
        if (c == '#') { while (i < payload.length && payload(i) != '\n'.toByte) i += 1 }
        else if (c.isWhitespace) i += 1
        else in = false
      }
    }
    def int(): Option[Int] = {
      skipWs()
      val s = i
      while (i < payload.length && payload(i) >= '0'.toByte && payload(i) <= '9'.toByte) i += 1
      if (i == s || i - s > 9) None else Some(new String(payload, s, i - s).toInt)
    }
    for {
      w <- int(); h <- int(); maxv <- int()
      if w > 0 && h > 0 && maxv == 255
      if i + 1 + w.toLong * h * 3 <= payload.length
    } yield {
      i += 1 // the single whitespace byte after maxval
      (w, h, java.util.Arrays.copyOfRange(payload, i, i + w * h * 3))
    }
  }

  /** REAL decoder for uncompressed 24-bpp BMP (BITMAPINFOHEADER, BI_RGB)
    * — the second raster container that needs no codec library. Handles
    * bottom-up (positive height) and top-down (negative height) row
    * order and the 4-byte row padding; emits row-major top-down RGB,
    * exactly [[decodePpm]]'s convention, so every consumer (channel
    * means, resize, dHash) works on either container unchanged.
    * Palette/compressed/≠24-bpp variants → None (quarantine — the same
    * honesty contract as the other codecs).
    */
  def decodeBmp(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    def u16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def i32(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
      ((payload(o + 2) & 0xff) << 16) | ((payload(o + 3) & 0xff) << 24)
    if (payload.length < 54 || payload(0) != 'B'.toByte || payload(1) != 'M'.toByte)
      return None
    val dataOff = i32(10)
    if (i32(14) < 40) return None // pre-BITMAPINFOHEADER variants
    val w = i32(18)
    val hRaw = i32(22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return None
    if (u16(26) != 1 || u16(28) != 24 || i32(30) != 0) return None
    val rowBytes = ((w * 3 + 3) / 4) * 4
    if (dataOff < 54 || dataOff.toLong + rowBytes.toLong * h > payload.length)
      return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val src = dataOff + (if (topDown) y else h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        val s = src + x * 3
        val d = (y * w + x) * 3
        out(d) = payload(s + 2)     // BMP stores BGR
        out(d + 1) = payload(s + 1)
        out(d + 2) = payload(s)
        x += 1
      }
      y += 1
    }
    Some((w, h, out))
  }

  /** REAL decoder for BASELINE JPEG/JFIF (ITU-T T.81 sequential DCT,
    * Huffman, 8-bit) — what actual image corpora are made of, and the one
    * raster format here that needs a genuine entropy-coded pipeline:
    * marker walk → DQT/DHT table builds → per-MCU Huffman decode
    * (DC diff + AC run-length) → dequantize → inverse zigzag → 8×8 IDCT →
    * level shift → chroma upsample (replicate) → YCbCr→RGB. Emits
    * row-major top-down RGB, exactly [[decodePpm]]'s convention, so every
    * consumer (channel means, resize, dHash, near-dup pairs) composes
    * unchanged.
    *
    * Supported: SOF0 baseline, 1 or 3 components, sampling factors 1–2
    * (4:4:4 / 4:2:2 / 4:2:0 and grayscale), restart intervals, byte
    * stuffing, 16-bit DQT entries. Quarantined (None, the honesty
    * contract): progressive (SOF2) and every other SOF flavor
    * (extended/arithmetic/lossless/hierarchical), 4-component CMYK,
    * non-interleaved multi-scan streams, truncated or malformed payloads.
    */
  def decodeJpeg(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (payload.length < 4 ||
      (payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8) return None
    // malformed streams surface as index/arithmetic errors mid-decode —
    // quarantine is a None, never a throw (the decodePpm contract)
    try Jpeg.decode(payload) catch { case _: Exception => None }
  }

  /** REAL decoder for non-interlaced 8-bit PNG (grey/RGB/grey+alpha/RGBA,
    * all five row filters; DEFLATE via the JRE's `java.util.zip.Inflater`
    * — no new dependency). Alpha drops, grey replicates; emits row-major
    * top-down RGB, exactly [[decodePpm]]'s convention. Quarantined
    * (None): Adam7 interlace, 16-bit channels, palette, malformed or
    * truncated streams — see [[Png]].
    */
  def decodePng(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (payload.length < 8 || (payload(0) & 0xff) != 0x89 ||
      payload(1) != 'P'.toByte) return None
    // malformed streams surface as bounds/format errors mid-decode —
    // quarantine is a None, never a throw (the decodePpm contract)
    try Png.decode(payload) catch { case _: Exception => None }
  }

  /** The raster front door: PPM first (cheap magic check), then BMP, then
    * PNG, then baseline JPEG — one decode entry for every consumer,
    * quarantine when all four miss.
    */
  def decodeRaster(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodePpm(payload).orElse(decodeBmp(payload)).orElse(decodePng(payload))
      .orElse(decodeJpeg(payload))

  /** Image decode stage: REAL per-channel means for PPM/BMP payloads,
    * stub features + `real_decode = false` for everything else
    * (quarantine semantics: nothing throws, undecodable rows are visibly
    * flagged).
    */
  def decodeImages(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channel_means", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("real_decode", BooleanType, nullable = false))))
    media.where(col("modality") === "image").mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]]("payload")
        decodeRaster(p) match {
          case Some((w, h, rgb)) =>
            val sums = new Array[Double](3)
            var i = 0
            while (i < rgb.length) { sums(i % 3) += (rgb(i) & 0xff); i += 1 }
            Row(r.getAs[Long]("media_id"), w, h, sums.map(_ / (w * h)), true)
          case None =>
            Row(r.getAs[Long]("media_id"), null, null, fakeDecode(p, 3), false)
        }
      }
    }(enc)
  }

  /** REAL decoder for RIFF/WAVE PCM (the audio analogue of [[decodePpm]] —
    * the one audio container that needs no codec library): RIFF header,
    * word-aligned chunk walk, `fmt ` (PCM only, 8/16-bit) + `data`.
    * Returns (sample_rate, channels, per-channel samples in [−1, 1)).
    * Malformed/truncated/compressed payloads → None (quarantine).
    */
  def decodeWav(payload: Array[Byte]): Option[(Int, Int, Array[Array[Double]])] = {
    def tag(o: Int, s: String): Boolean =
      o + 4 <= payload.length && new String(payload, o, 4, "US-ASCII") == s
    def u16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
      ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var data: Option[(Int, Int)] = None     // offset, length
    while (i + 8 <= payload.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(payload, i, 4, "US-ASCII")
      val sz = u32(i + 4)
      val body = i + 8
      if (body + sz > payload.length) return None // truncated chunk
      id match {
        case "fmt " if sz >= 16 =>
          if (u16(body) != 1) return None // PCM only; no codec libs here
          fmt = Some((u16(body + 2), u32(body + 4).toInt, u16(body + 14)))
        case "data" => data = Some((body, sz.toInt))
        case _ => // skip unknown chunks (LIST, cue, …)
      }
      i = body + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    for {
      (ch, rate, bits) <- fmt
      (off, len) <- data
      if ch > 0 && rate > 0 && (bits == 8 || bits == 16)
    } yield {
      val bytesPer = bits / 8
      val frames = len / (bytesPer * ch)
      val out = Array.fill(ch)(new Array[Double](frames))
      var f = 0
      while (f < frames) {
        var c = 0
        while (c < ch) {
          val o = off + (f * ch + c) * bytesPer
          out(c)(f) =
            if (bits == 8) ((payload(o) & 0xff) - 128) / 128.0 // unsigned PCM8
            else ((payload(o) & 0xff) | (payload(o + 1) << 8)).toShort / 32768.0
          c += 1
        }
        f += 1
      }
      (rate, ch, out)
    }
  }

  /** Audio decode stage: REAL duration/per-channel RMS/peak for WAV PCM
    * payloads, stub features + `real_decode = false` otherwise — the same
    * quarantine contract as [[decodeImages]].
    */
  def decodeAudio(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("duration_s", DoubleType, nullable = true),
      StructField("rms", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("peak", DoubleType, nullable = true),
      StructField("real_decode", BooleanType, nullable = false))))
    media.where(col("modality") === "audio").mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]]("payload")
        decodeWav(p) match {
          case Some((rate, ch, chans)) =>
            val rms = chans.map { s =>
              var acc = 0.0; s.foreach(x => acc += x * x)
              math.sqrt(acc / math.max(s.length, 1))
            }
            val peak = chans.iterator.flatMap(_.iterator).map(math.abs)
              .foldLeft(0.0)(math.max)
            val dur = chans.headOption.map(_.length).getOrElse(0).toDouble / rate
            Row(r.getAs[Long]("media_id"), rate, ch, dur, rms, peak, true)
          case None =>
            Row(r.getAs[Long]("media_id"), null, null, null, fakeDecode(p, 2), null, false)
        }
      }
    }(enc)
  }

  /** WINDOWED audio features over the real WAV decode: per fixed-length
    * window of the FIRST channel, RMS energy, zero-crossing rate (the
    * crossings/sample proxy for dominant frequency — a 440 Hz tone at
    * 8 kHz crosses ~0.11/sample; silence crosses 0) and peak — the
    * signal-level triage a speech/music curation stage runs (silence
    * trimming, clipping detection, activity segmentation) before any
    * model touches the audio. 1→N rows per clip, short tail window kept
    * (`n_samples` carries its true length); undecodable payloads yield
    * NO rows here — [[decodeAudio]] is the quarantine surface.
    */
  def audioWindowFeatures(media: DataFrame, windowMs: Int = 250): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("win_idx", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("rms", DoubleType, nullable = false),
      StructField("zcr", DoubleType, nullable = false),
      StructField("peak", DoubleType, nullable = false))))
    media.where(col("modality") === "audio").mapPartitions { rows =>
      rows.flatMap { r =>
        decodeWav(r.getAs[Array[Byte]]("payload")) match {
          case Some((rate, _, chans)) if chans.nonEmpty =>
            val s = chans(0)
            val win = math.max(1, rate * windowMs / 1000)
            (0 until s.length by win).iterator.zipWithIndex.map { case (o, wi) =>
              val end = math.min(o + win, s.length)
              var acc = 0.0; var peak = 0.0; var zc = 0
              var i = o
              while (i < end) {
                val x = s(i)
                acc += x * x
                if (math.abs(x) > peak) peak = math.abs(x)
                if (i > o && (x >= 0.0) != (s(i - 1) >= 0.0)) zc += 1
                i += 1
              }
              val n = end - o
              Row(r.getAs[Long]("media_id"), wi, n,
                math.sqrt(acc / n), zc.toDouble / n, peak)
            }
          case _ => Iterator.empty
        }
      }
    }(enc)
  }

  private def checksum(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
    h
  }

  /** Batched decode+feature-extract: binary in, features out, one codec
    * "session" per partition.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media
      .repartition(col("modality")) // homogeneous batches per codec
      .mapPartitions { rows =>
        // per-partition codec init would live here
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(
            r.getAs[Long]("media_id"),
            r.getAs[String]("modality"),
            payload.length,
            checksum(payload),
            fakeDecode(payload)
          )
        }
      }(enc)
  }

  /** Image resize stage: REAL nearest-neighbor luma downscale for PPM
    * payloads (decode → sample the actual pixel grid), deterministic stub
    * grid for undecodable ones. Contract either way: binary in,
    * outW×outH float grid in [0,1] out, map-only, codec-per-partition.
    */
  def resizeImages(media: DataFrame, outW: Int = 4, outH: Int = 4): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("pixels", ArrayType(DoubleType, containsNull = false), nullable = false))))
    media.where(col("modality") === "image").mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]]("payload")
        val px = decodeRaster(p) match {
          case Some((w, h, rgb)) =>
            Array.tabulate(outW * outH) { i =>
              val (ox, oy) = (i % outW, i / outW)
              val (sx, sy) = (ox * w / outW, oy * h / outH) // nearest neighbor
              val o = (sy * w + sx) * 3
              // ITU-R 601 luma of the sampled pixel, normalized
              (0.299 * (rgb(o) & 0xff) + 0.587 * (rgb(o + 1) & 0xff) +
                0.114 * (rgb(o + 2) & 0xff)) / 255.0
            }
          case None =>
            Array.tabulate(outW * outH) { i =>
              if (p.isEmpty) 0.0 else (p(i % p.length) & 0xff) / 255.0
            }
        }
        Row(r.getAs[Long]("media_id"), px)
      }
    }(enc)
  }

  /** Perceptual image hash (dHash): decode → 9×8 nearest-neighbor luma
    * grid → one bit per horizontal gradient (luma[x+1] > luma[x]) → a
    * 64-bit fingerprint that survives re-encoding, mild noise, and
    * resizing — the image analogue of the text SimHash (near-identical
    * images differ in a few bits; unrelated ones in ~32). Undecodable
    * payloads get a NULL hash + `real_decode = false` (the quarantine
    * contract — a byte-derived hash would cluster by container framing,
    * not content).
    *
    * Map-only, codec-per-partition like every decode stage; the hash is
    * the only thing that leaves the stage (8 B/row — payloads never
    * shuffle).
    */
  def imageHashes(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = true),
      StructField("real_decode", BooleanType, nullable = false))))
    media.where(col("modality") === "image").mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]]("payload")
        decodeRaster(p) match {
          case Some((w, h, rgb)) =>
            Row(r.getAs[Long]("media_id"), dhashOf(w, h, rgb), true)
          case None => Row(r.getAs[Long]("media_id"), null, false)
        }
      }
    }(enc)
  }

  /** The 64-bit dHash kernel shared by [[imageHashes]] and
    * [[videoFrames]]: 9×8 luma grid, each bit = "right neighbor
    * brighter".
    */
  private def dhashOf(w: Int, h: Int, rgb: Array[Byte]): Long = {
    val (gw, gh) = (9, 8)
    val luma = Array.tabulate(gw * gh) { i =>
      val (sx, sy) = ((i % gw) * w / gw, (i / gw) * h / gh)
      val o = (sy * w + sx) * 3
      0.299 * (rgb(o) & 0xff) + 0.587 * (rgb(o + 1) & 0xff) +
        0.114 * (rgb(o + 2) & 0xff)
    }
    var hash = 0L
    var y = 0
    while (y < gh) {
      var x = 0
      while (x < gw - 1) {
        if (luma(y * gw + x + 1) > luma(y * gw + x))
          hash |= 1L << (y * (gw - 1) + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Near-duplicate images: pairs of decodable images whose dHashes are
    * within `maxHamming` bits — the multimodal leg of the dedup family
    * (the corpus-curation story needs image dedup exactly like text
    * dedup; CC-style pipelines dedup by perceptual hash before training).
    *
    * Scale shape is the SimHash pigeonhole ([[graft.operators.Dedup
    * .simhashDedup]] precedent): 8 chunks of 8 bits — two hashes within
    * hamming ≤ 7 agree on at least one full chunk — so candidates come
    * from an equi-join on (chunk idx, chunk bits), never all pairs; the
    * join shuffles (media_id, sig, chunk) longs only and exact hamming
    * verifies via codegen'd bit_count(xor). Quarantined rows drop out
    * (no hash, no pair).
    */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int = 6): DataFrame = {
    require(maxHamming <= 7, "8x8-bit pigeonhole is sound up to hamming 7")
    val sigs = imageHashes(media)
      .where(col("real_decode")).select(col("media_id"), col("dhash").as("sig"))
    val chunks = sigs.select(col("media_id"), col("sig"),
      explode(array((0 until 8).map { c =>
        concat_ws(":", lit(c), shiftright(col("sig"), c * 8).bitwiseAND(lit(0xffL)))
      }: _*)).as("chunk_key"))
    chunks.as("a")
      .join(chunks.as("b"), col("a.chunk_key") === col("b.chunk_key") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .orderBy("media_a", "media_b")
  }

  /** Band frequencies of the audio fingerprint: 5 octave-spaced centers
    * giving 4 band-energy differences per time cell. Chosen in the
    * speech/music energy range; a center at or above Nyquist simply
    * measures (near-)zero energy and its bits go quiet — coarse but
    * total for low sample rates.
    */
  private val FpBandsHz = Array(200.0, 400.0, 800.0, 1600.0, 3200.0)

  /** 64-bit per-window AUDIO fingerprint over the real WAV decode — the
    * Haitsma–Kalker construction (ISMIR'02, the classic robust audio
    * hash): the window splits into 17 equal time cells, each cell's
    * energy lands in 5 octave-spaced frequency bands (per-cell GOERTZEL
    * filters — a 3-multiply recurrence per (sample, band), no FFT
    * library needed), and bit (t, b) = sign of the TIME-DIFFERENCE of
    * the BAND-DIFFERENCE: (E(t,b)−E(t,b+1)) − (E(t−1,b)−E(t−1,b+1)) > 0
    * — 16 time steps × 4 band pairs = 64 bits. The double difference is
    * what buys robustness: gain scales every energy alike (sign
    * preserved EXACTLY), requantization noise rides far below the
    * coarse-cell band energies (PCM16→PCM8 flips ~0 bits, spec-pinned),
    * and equal-ENVELOPE different-CARRIER takes separate because the
    * band axis sees the carrier (the envelope-only variant collided on
    * those — measured in the 2048-clip probe). NOT shift-invariant —
    * the near-dup contract is re-encoded/requantized copies of the same
    * take, the same trade the video path's frame dHash makes. Windows
    * shorter than 17 samples emit nothing; undecodable payloads yield
    * NO rows — [[decodeAudio]] is the quarantine surface. Map-only;
    * payloads never shuffle (an 8-byte print per window leaves the
    * stage).
    */
  def audioFingerprints(media: DataFrame, windowMs: Int = 250): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("win_idx", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))))
    media.where(col("modality") === "audio").mapPartitions { rows =>
      rows.flatMap { r =>
        decodeWav(r.getAs[Array[Byte]]("payload")) match {
          case Some((rate, _, chans)) if chans.nonEmpty =>
            val s = chans(0)
            val win = math.max(1, rate * windowMs / 1000)
            val coeffs = FpBandsHz.map(f => 2.0 * math.cos(2.0 * math.Pi * f / rate))
            (0 until s.length by win).iterator.zipWithIndex.flatMap { case (o, wi) =>
              val end = math.min(o + win, s.length)
              val n = end - o
              if (n < 17) Iterator.empty
              else {
                val cell = n / 17
                // e(t)(b): Goertzel power of band b in time cell t
                val e = Array.ofDim[Double](17, FpBandsHz.length)
                var t = 0
                while (t < 17) {
                  var b = 0
                  while (b < FpBandsHz.length) {
                    val k = coeffs(b)
                    var s1 = 0.0; var s2 = 0.0
                    var i = o + t * cell
                    val ce = o + (t + 1) * cell
                    while (i < ce) {
                      val s0 = s(i) + k * s1 - s2
                      s2 = s1; s1 = s0
                      i += 1
                    }
                    e(t)(b) = s1 * s1 + s2 * s2 - k * s1 * s2
                    b += 1
                  }
                  t += 1
                }
                var fp = 0L
                var bit = 0
                t = 1
                while (t < 17) {
                  var b = 0
                  while (b < FpBandsHz.length - 1) {
                    val d = (e(t)(b) - e(t)(b + 1)) - (e(t - 1)(b) - e(t - 1)(b + 1))
                    if (d > 0.0) fp |= (1L << bit)
                    bit += 1
                    b += 1
                  }
                  t += 1
                }
                Iterator.single(Row(r.getAs[Long]("media_id"), wi, fp))
              }
            }
          case _ => Iterator.empty
        }
      }
    }(enc)
  }

  /** AUDIO near-dup pairs — the clip analogue of [[videoNearDupPairs]]
    * (a requantized / gain-changed copy of the same take shares most
    * per-window envelope fingerprints even when no byte matches):
    * candidate window pairs come from the same 8×8-bit fingerprint
    * pigeonhole (hamming ≤ 7 ⟹ one full chunk agrees — an equi-join,
    * never all-pairs), a clip pair qualifies when ≥ `minShared` DISTINCT
    * windows of the earlier clip near-match some window of the later one
    * (distinct-windows, not window-pairs: a silence-heavy clip would
    * otherwise fabricate matches from one flat envelope). Output:
    * (media_a, media_b, shared_windows).
    */
  def audioNearDupPairs(media: DataFrame, windowMs: Int = 250,
                        maxHamming: Int = 6, minShared: Int = 2): DataFrame = {
    require(maxHamming <= 7, "8x8-bit pigeonhole is sound up to hamming 7")
    require(minShared >= 1, s"minShared < 1: $minShared")
    val sigs = audioFingerprints(media, windowMs)
      .select(col("media_id"), col("win_idx"), col("fp").as("sig"))
    val chunks = sigs.select(col("media_id"), col("win_idx"), col("sig"),
      explode(array((0 until 8).map { c =>
        concat_ws(":", lit(c), shiftright(col("sig"), c * 8).bitwiseAND(lit(0xffL)))
      }: _*)).as("chunk_key"))
    chunks.as("a")
      .join(chunks.as("b"), col("a.chunk_key") === col("b.chunk_key") &&
        col("a.media_id") < col("b.media_id"))
      .where(bit_count(col("a.sig").bitwiseXOR(col("b.sig"))) <= maxHamming)
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        col("a.win_idx").as("wa"))
      .distinct() // one vote per (pair, earlier-clip window)
      .groupBy("media_a", "media_b")
      .agg(count(lit(1)).as("shared_windows"))
      .where(col("shared_windows") >= minShared)
      .orderBy("media_a", "media_b")
  }

  /** REAL container parse for RIFF/AVI — the video analogue of
    * [[decodeWav]]'s RIFF walk: header `RIFF…AVI `, then a word-aligned
    * chunk walk that recurses into `LIST` chunks (the `movi` list — and
    * its optional `rec ` sub-lists — hold the frames) and collects every
    * `##dc`/`##db` stream chunk in order: for an MJPEG AVI each such
    * chunk IS a baseline JPEG the engine's own [[decodeJpeg]] kernel
    * opens; for a DIB AVI it's a raster [[decodeRaster]] may or may not
    * know. Codec-agnostic at THIS layer by design: container parse and
    * frame decode are separate quarantine surfaces. Malformed/truncated
    * containers → None.
    */
  def decodeAviFrames(payload: Array[Byte]): Option[Vector[Array[Byte]]] = {
    def u32(o: Int): Long = (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
      ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    def fourcc(o: Int): String = new String(payload, o, 4, "US-ASCII")
    try {
      if (payload.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
        return None
      val riffEnd = math.min(payload.length.toLong, 8L + u32(4)).toInt
      val frames = Vector.newBuilder[Array[Byte]]
      def walk(start: Int, end: Int): Unit = {
        var o = start
        var ok = true
        while (ok && o + 8 <= end) {
          val id = fourcc(o)
          val sz = u32(o + 4)
          val chunkEnd = o + 8 + sz
          if (id == "LIST") {
            // a truncated LIST still yields its intact prefix: recurse
            // clamped to the bytes that exist, then stop if it ran short
            if (sz >= 4 && o + 12 <= end)
              walk(o + 12, math.min(chunkEnd, end.toLong).toInt)
            if (chunkEnd > end) ok = false
            else o = (chunkEnd + (sz & 1)).toInt // chunks are word-aligned
          } else if (chunkEnd > end) ok = false // truncated data chunk: stop
          else {
            if (id(0).isDigit && id(1).isDigit &&
              id(2) == 'd' && (id(3) == 'c' || id(3) == 'b') && sz > 0) {
              frames += java.util.Arrays.copyOfRange(payload, o + 8, chunkEnd.toInt)
            }
            o = (chunkEnd + (sz & 1)).toInt
          }
        }
      }
      walk(12, riffEnd)
      val fs = frames.result()
      if (fs.isEmpty) None else Some(fs)
    } catch { case _: Exception => None }
  }

  /** Container-level video decode summary — the quarantine surface for the
    * video modality ([[videoFrames]] is the per-frame explode): n_frames
    * from the REAL AVI chunk walk, dimensions from the first frame the
    * raster kernels open. `real_decode = false` when the container parses
    * but no frame codec is ours (or the container isn't AVI) — nothing
    * throws, undecodable rows stay visible.
    */
  def decodeVideos(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("real_decode", BooleanType, nullable = false))))
    media.where(col("modality") === "video").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getAs[Long]("media_id")
        decodeAviFrames(r.getAs[Array[Byte]]("payload")) match {
          case Some(fs) =>
            fs.iterator.map(decodeRaster).collectFirst { case Some(x) => x } match {
              case Some((w, h, _)) => Row(id, fs.size, w, h, true)
              case None => Row(id, fs.size, null, null, false)
            }
          case None => Row(id, null, null, null, false)
        }
      }
    }(enc)
  }

  /** Per-frame video decode + sampling: every `every`-th frame of each
    * AVI, opened by the raster kernels (MJPEG frames → [[decodeJpeg]]),
    * emitting per-frame channel means and the [[dhashOf]] perceptual hash
    * — the 1→N stage video near-dup and scene analysis build on (two
    * videos sharing sampled-frame dHashes are the same footage; the
    * text-side analogue is the winnowing fingerprint set). Frames the
    * codecs can't open emit nothing — [[decodeVideos]] is the quarantine
    * surface that makes those visible. Map-only; payloads never shuffle
    * (only means + an 8-byte hash leave the stage).
    */
  def videoFrames(media: DataFrame, every: Int = 1): DataFrame = {
    require(every >= 1, s"every < 1: $every")
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channel_means", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("dhash", LongType, nullable = false))))
    media.where(col("modality") === "video").flatMap { r =>
      val id = r.getAs[Long]("media_id")
      decodeAviFrames(r.getAs[Array[Byte]]("payload")).toSeq.flatMap { fs =>
        fs.zipWithIndex
          .filter { case (_, i) => i % every == 0 }
          .flatMap { case (f, i) =>
            decodeRaster(f).map { case (w, h, rgb) =>
              val sums = new Array[Double](3)
              var k = 0
              while (k < rgb.length) { sums(k % 3) += (rgb(k) & 0xff); k += 1 }
              Row(id, i, w, h, sums.map(_ / (w * h)), dhashOf(w, h, rgb))
            }
          }
      }
    }(enc)
  }

  /** VIDEO near-dup pairs — the footage analogue of [[imageNearDupPairs]]
    * (re-encoded / re-containered / trimmed copies of the same clip share
    * most sampled-frame perceptual hashes even when no byte matches):
    * candidate frame pairs come from the same 8×8-bit dHash pigeonhole
    * (hamming ≤ 7 ⟹ one full chunk agrees — an equi-join, never
    * all-pairs), a video pair qualifies when ≥ `minShared` DISTINCT
    * frames of the earlier video near-match some frame of the later one
    * (distinct-frames, not frame-pairs: a still logo repeated 100×
    * would otherwise fabricate 10 000 matches from one visual). Output:
    * (media_a, media_b, shared_frames). Payloads never shuffle — the
    * join carries (media_id, frame_idx, sig) rows only.
    */
  def videoNearDupPairs(media: DataFrame, every: Int = 1, maxHamming: Int = 6,
                        minShared: Int = 2): DataFrame = {
    require(maxHamming <= 7, "8x8-bit pigeonhole is sound up to hamming 7")
    require(minShared >= 1, s"minShared < 1: $minShared")
    val sigs = videoFrames(media, every)
      .select(col("media_id"), col("frame_idx"), col("dhash").as("sig"))
    val chunks = sigs.select(col("media_id"), col("frame_idx"), col("sig"),
      explode(array((0 until 8).map { c =>
        concat_ws(":", lit(c), shiftright(col("sig"), c * 8).bitwiseAND(lit(0xffL)))
      }: _*)).as("chunk_key"))
    chunks.as("a")
      .join(chunks.as("b"), col("a.chunk_key") === col("b.chunk_key") &&
        col("a.media_id") < col("b.media_id"))
      .where(bit_count(col("a.sig").bitwiseXOR(col("b.sig"))) <= maxHamming)
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        col("a.frame_idx").as("fa"))
      .distinct() // one vote per (pair, earlier-video frame)
      .groupBy("media_a", "media_b")
      .agg(count(lit(1)).as("shared_frames"))
      .where(col("shared_frames") >= minShared)
      .orderBy("media_a", "media_b")
  }

  /** Video frame-sampling stage (STUB decode): emits every `stride`-th
    * fixed-size chunk of the payload as a "frame" (1→N explode shape — the
    * real sampler yields decoded frames at the same cardinality;
    * [[videoFrames]] IS that sampler for AVI containers — this stub stays
    * for opaque/unknown-container payloads).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 16, stride: Int = 2): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false))))
    media.where(col("modality") === "video").flatMap { r =>
      val p = r.getAs[Array[Byte]]("payload")
      val nFrames = p.length / frameBytes
      (0 until nFrames by stride).map { i =>
        Row(r.getAs[Long]("media_id"), i, p.slice(i * frameBytes, (i + 1) * frameBytes))
      }
    }(enc)
  }

  /** Synthetic media table for tests/demos: image rows carry REAL PPM
    * payloads (deterministic 8×6 RGB, decodable by [[decodePpm]]), audio
    * rows REAL mono PCM16 WAVs (deterministic samples, decodable by
    * [[decodeWav]]); video payloads stay opaque deterministic bytes.
    */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val modality = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val payload =
        if (modality == "image") {
          val (w, h) = (8, 6)
          "P6\n8 6\n255\n".getBytes("US-ASCII") ++
            Array.tabulate[Byte](w * h * 3)(i => ((id * 131 + i * 7) % 251).toByte)
        } else if (modality == "audio") {
          val frames = 32 + (id % 16).toInt
          val bb = java.nio.ByteBuffer.allocate(44 + frames * 2)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + frames * 2)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(1).putInt(16000).putInt(32000).putShort(2).putShort(16)
            .put("data".getBytes("US-ASCII")).putInt(frames * 2)
          (0 until frames).foreach { k =>
            bb.putShort((((id * 131 + k * 7) % 251 - 125) * 100).toShort)
          }
          bb.array()
        } else
          Array.tabulate[Byte](64 + (id % 32).toInt)(i => ((id * 131 + i * 7) % 251).toByte)
      Row(id, modality,
        if (modality == "image") Integer.valueOf(8) else null,
        if (modality == "image") Integer.valueOf(6) else null,
        if (modality == "audio") Integer.valueOf(16000) else null,
        payload)
    }(enc)
  }
}
