package graft

/** Shared REAL-media builders for the multimodal specs: javax.imageio
  * MJPEG frames wrapped in a minimal RIFF/AVI container, plus the
  * deterministic gradient frame the near-dup cases encode at two
  * qualities (re-encoded copy ⇒ different bytes, same footage).
  */
/** Top-level so Spark can build its encoder without an outer-class scope. */
case class Media(media_id: Long, modality: String, payload: Array[Byte],
                 ingest_ts: java.sql.Timestamp)

object TestMedia {

  def jpegBytes(img: java.awt.image.BufferedImage, quality: Float,
                progressive: Boolean = false): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
    val w = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  /** Minimal RIFF/AVI writer: hdrl LIST (ignored by the parser) + movi
    * LIST of 00dc frame chunks, word-aligned; `nest` wraps each frame in
    * a `rec ` sub-list as interleaved AVIs do.
    */
  def aviBytes(frames: Seq[Array[Byte]], nest: Boolean = false): Array[Byte] = {
    def cc(x: String) = x.getBytes("US-ASCII")
    def u32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val movi = new java.io.ByteArrayOutputStream()
    movi.write(cc("movi"))
    frames.foreach { f =>
      if (nest) {
        val rec = new java.io.ByteArrayOutputStream()
        rec.write(cc("rec ")); rec.write(cc("00dc")); rec.write(u32(f.length)); rec.write(f)
        if (f.length % 2 == 1) rec.write(0)
        movi.write(cc("LIST")); movi.write(u32(rec.size())); movi.write(rec.toByteArray)
      } else {
        movi.write(cc("00dc")); movi.write(u32(f.length)); movi.write(f)
        if (f.length % 2 == 1) movi.write(0)
      }
    }
    val hdrl = cc("hdrl") ++ cc("avih") ++ u32(4) ++ u32(frames.size)
    val body = new java.io.ByteArrayOutputStream()
    body.write(cc("AVI "))
    body.write(cc("LIST")); body.write(u32(hdrl.length)); body.write(hdrl)
    body.write(cc("LIST")); body.write(u32(movi.size())); body.write(movi.toByteArray)
    val out = new java.io.ByteArrayOutputStream()
    out.write(cc("RIFF")); out.write(u32(body.size())); out.write(body.toByteArray)
    out.toByteArray
  }

  /** Deterministic horizontal-gradient frame keyed by `seed` — distinct
    * seeds give dHash-distinguishable frames, the same seed re-encoded at
    * another quality stays within the near-dup hamming band.
    */
  def frame(seed: Int, w: Int = 24, h: Int = 16): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 10 + seed * 40) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  /** An MJPEG AVI of gradient frames `seeds`, each encoded at `quality`. */
  def mjpegAvi(seeds: Seq[Int], quality: Float): Array[Byte] =
    aviBytes(seeds.map(s => jpegBytes(frame(s), quality)))

  /** Mono PCM16 WAV of the given samples (the BinaryPipelineSpec writer,
    * factored for reuse). */
  def wav16(samples: Seq[Short], rate: Int = 8000): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate)
      .putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Mono unsigned-PCM8 WAV — the REQUANTIZED twin of [[wav16]] for the
    * audio near-dup cases (same take, different bytes). */
  def wav8(samples: Seq[Short], rate: Int = 8000): Array[Byte] = {
    val bytes = samples.map(s => ((s / 256) + 128).toByte)
    val bb = java.nio.ByteBuffer.allocate(44 + bytes.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + bytes.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate)
      .putInt(rate).putShort(1).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(bytes.length)
    bytes.foreach(bb.put)
    bb.array()
  }

  /** A deterministic multi-tone test take: `seconds` of samples at `rate`,
    * amplitude-modulated sums of two sines keyed by `seed` — enough
    * envelope structure for the fingerprint bits to be non-degenerate.
    */
  def toneTake(seed: Int, seconds: Double = 1.0, rate: Int = 8000,
               gain: Double = 0.8): Seq[Short] = {
    val n = (seconds * rate).toInt
    (0 until n).map { i =>
      val t = i.toDouble / rate
      val f1 = 200.0 + 37.0 * seed
      val f2 = 450.0 + 53.0 * seed
      val envelope = 0.4 + 0.6 * math.abs(math.sin(2 * math.Pi * (1.3 + 0.7 * seed) * t))
      val x = envelope * (0.6 * math.sin(2 * math.Pi * f1 * t) +
        0.4 * math.sin(2 * math.Pi * f2 * t))
      (gain * x * 32767).toShort
    }
  }
}
