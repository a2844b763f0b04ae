package graft

import graft.multimodal.BinaryPipeline

class BinaryPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("binary media pipeline: schema, determinism, batch shape") {
    val media = BinaryPipeline.syntheticMedia(spark, 30)
    val feats = BinaryPipeline.extractFeatures(media)

    assert(feats.schema == BinaryPipeline.featureSchema)
    val rows = feats.collect()
    assert(rows.length == 30)
    // deterministic: re-running produces identical checksums
    val again = BinaryPipeline.extractFeatures(media)
      .select("media_id", "checksum").as[(Long, Long)].collect().toMap
    rows.foreach { r =>
      assert(again(r.getAs[Long]("media_id")) == r.getAs[Long]("checksum"))
    }
    // feature vector has fixed dims and is payload-derived (non-constant)
    val f = rows.map(_.getAs[scala.collection.Seq[Double]]("feature"))
    assert(f.forall(_.length == 8))
    assert(f.distinct.length > 1)
  }

  test("fakeDecode stub: empty payload yields zero vector") {
    assert(BinaryPipeline.fakeDecode(Array.emptyByteArray).forall(_ == 0.0))
  }

  test("resize stage: images only, fixed grid, values normalized") {
    val media = BinaryPipeline.syntheticMedia(spark, 30)
    val resized = BinaryPipeline.resizeImages(media, outW = 4, outH = 4).collect()
    assert(resized.length == 10) // ids ≡ 0 mod 3
    resized.foreach { r =>
      val px = r.getAs[scala.collection.Seq[Double]]("pixels")
      assert(px.length == 16 && px.forall(p => p >= 0.0 && p <= 1.0))
    }
  }

  test("ppm decode: exact channel means, comment headers, truncation → quarantine") {
    // 2×2 image with known pixels: red, green, blue, white
    val rgb = Array[Int](255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255).map(_.toByte)
    val ppm = "P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++ rgb
    val Some((w, h, px)) = BinaryPipeline.decodePpm(ppm)
    assert(w == 2 && h == 2 && px.length == 12)
    val media = Seq((1L, ppm), (2L, ppm.dropRight(3)), (3L, "nonsense".getBytes))
      .toDF("media_id", "payload").withColumn("modality", org.apache.spark.sql.functions.lit("image"))
    val d = BinaryPipeline.decodeImages(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    // mean of each channel over {red, green, blue, white}: (255+255)/4 = 127.5
    val means = d(1L).getAs[scala.collection.Seq[Double]]("channel_means")
    assert(d(1L).getAs[Boolean]("real_decode"))
    assert(means == Seq(127.5, 127.5, 127.5))
    assert(d(1L).getAs[Int]("width") == 2 && d(1L).getAs[Int]("height") == 2)
    // truncated and garbage payloads are quarantined, never thrown
    assert(!d(2L).getAs[Boolean]("real_decode") && !d(3L).getAs[Boolean]("real_decode"))
  }

  test("ppm resize: nearest-neighbor samples the true pixel grid") {
    // 2×2: black, white / white, black — downscale 2×2 → identity luma
    val rgb = Array[Int](0, 0, 0, 255, 255, 255, 255, 255, 255, 0, 0, 0).map(_.toByte)
    val ppm = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ rgb
    val media = Seq((1L, ppm)).toDF("media_id", "payload")
      .withColumn("modality", org.apache.spark.sql.functions.lit("image"))
    val px = BinaryPipeline.resizeImages(media, outW = 2, outH = 2).collect()
      .head.getAs[scala.collection.Seq[Double]]("pixels")
    assert(px == Seq(0.0, 1.0, 1.0, 0.0))
    // synthetic image rows are REAL PPMs: every one decodes
    val synth = BinaryPipeline.decodeImages(BinaryPipeline.syntheticMedia(spark, 30)).collect()
    assert(synth.length == 10 && synth.forall(_.getAs[Boolean]("real_decode")))
  }

  test("wav decode: exact samples, rms and duration; truncation → quarantine") {
    // mono PCM16 @ 4 Hz, 4 known samples: 0, max, min, half
    def wav(samples: Seq[Short], channels: Short = 1, rate: Int = 4): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length * 2)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels).putInt(rate)
        .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
      samples.foreach(bb.putShort)
      bb.array()
    }
    val p = wav(Seq[Short](0, 32767, -32768, 16384))
    val Some((rate, ch, chans)) = BinaryPipeline.decodeWav(p)
    assert(rate == 4 && ch == 1)
    assert(chans(0).toSeq == Seq(0.0, 32767.0 / 32768, -1.0, 0.5))
    // stereo de-interleaves: L = (0, max), R = (min, half)
    val Some((_, 2, st)) = BinaryPipeline.decodeWav(
      wav(Seq[Short](0, -32768, 32767, 16384), channels = 2))
    assert(st(0).toSeq == Seq(0.0, 32767.0 / 32768) && st(1).toSeq == Seq(-1.0, 0.5))
    // truncated data chunk and non-PCM format both quarantine
    assert(BinaryPipeline.decodeWav(p.dropRight(3)).isEmpty)
    val nonPcm = p.clone(); nonPcm(20) = 3 // IEEE float format tag
    assert(BinaryPipeline.decodeWav(nonPcm).isEmpty)

    val media = Seq((1L, p)).toDF("media_id", "payload")
      .withColumn("modality", org.apache.spark.sql.functions.lit("audio"))
    val r = BinaryPipeline.decodeAudio(media).collect().head
    assert(r.getAs[Boolean]("real_decode") && r.getAs[Int]("sample_rate") == 4)
    assert(r.getAs[Double]("duration_s") == 1.0) // 4 frames at 4 Hz
    val wantRms = math.sqrt((0.0 + math.pow(32767.0 / 32768, 2) + 1.0 + 0.25) / 4)
    assert(math.abs(r.getAs[scala.collection.Seq[Double]]("rms").head - wantRms) < 1e-12)
    assert(r.getAs[Double]("peak") == 1.0)
  }

  test("synthetic audio rows are real WAVs; garbage stays quarantined") {
    val synth = BinaryPipeline.decodeAudio(BinaryPipeline.syntheticMedia(spark, 30)).collect()
    assert(synth.length == 10 && synth.forall(_.getAs[Boolean]("real_decode")))
    assert(synth.forall(_.getAs[Int]("sample_rate") == 16000))
    val junk = Seq((1L, Array.tabulate[Byte](50)(_.toByte))).toDF("media_id", "payload")
      .withColumn("modality", org.apache.spark.sql.functions.lit("audio"))
    val q = BinaryPipeline.decodeAudio(junk).collect().head
    assert(!q.getAs[Boolean]("real_decode") && q.isNullAt(q.fieldIndex("duration_s")))
  }

  test("frame sampling: 1→N explode with stride") {
    val media = BinaryPipeline.syntheticMedia(spark, 30)
    val frames = BinaryPipeline.sampleFrames(media, frameBytes = 16, stride = 2)
    val byId = frames.collect().groupBy(_.getAs[Long]("media_id"))
    assert(byId.nonEmpty)
    byId.foreach { case (_, fs) =>
      val idxs = fs.map(_.getAs[Int]("frame_idx")).sorted.toSeq
      assert(idxs == idxs.distinct && idxs.forall(_ % 2 == 0)) // stride respected
      assert(fs.forall(_.getAs[Array[Byte]]("frame").length == 16))
    }
  }

  // grayscale 9×8 PPM from a per-(x,y) luma function: r=g=b=v → luma = v
  private def gray98(v: (Int, Int) => Int): Array[Byte] =
    "P6\n9 8\n255\n".getBytes("US-ASCII") ++
      Array.tabulate[Byte](9 * 8 * 3) { i =>
        val px = i / 3; v(px % 9, px / 9).toByte
      }

  test("dhash: gradient extremes, quarantine, noise invariance") {
    val up = gray98((x, _) => x * 20)        // luma rises with x → all bits 1
    val flat = gray98((_, _) => 7)           // no gradients → hash 0
    val noisy = gray98((x, y) => x * 20 + ((x + y) % 2)) // ±1 on a 20-step ramp
    val media = Seq((1L, up), (2L, flat), (3L, noisy),
      (4L, "garbage".getBytes("US-ASCII")))
      .toDF("media_id", "payload")
      .withColumn("modality", org.apache.spark.sql.functions.lit("image"))
    val h = BinaryPipeline.imageHashes(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(h(1L).getAs[Long]("dhash") == -1L) // 64 rising gradients
    assert(h(2L).getAs[Long]("dhash") == 0L)
    assert(h(3L).getAs[Long]("dhash") == -1L) // ±1 noise can't flip a 20-step ramp
    assert(h(4L).isNullAt(h(4L).fieldIndex("dhash")) && !h(4L).getAs[Boolean]("real_decode"))
  }

  test("image near-dup: noisy copy pairs, opposite gradient doesn't, quarantined absent") {
    val up = gray98((x, _) => x * 20)
    val noisy = gray98((x, y) => x * 20 + ((x + y) % 2))
    val oneFlip = gray98((x, y) => if (y == 0 && x == 1) 25 else x * 20) // 25>20, 25>40 fails → flips bits
    val down = gray98((x, _) => (8 - x) * 20)
    val media = Seq((1L, up), (2L, noisy), (3L, oneFlip), (4L, down),
      (5L, "garbage".getBytes("US-ASCII")))
      .toDF("media_id", "payload")
      .withColumn("modality", org.apache.spark.sql.functions.lit("image"))
    val pairs = BinaryPipeline.imageNearDupPairs(media, maxHamming = 6)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)).contains((1L, 2L)))
    assert(pairs.find(p => (p._1, p._2) == (1L, 2L)).get._3 == 0)
    assert(pairs.map(p => (p._1, p._2)).contains((1L, 3L))) // few-bit flip
    assert(pairs.forall(p => p._1 != 4L && p._2 != 4L)) // opposite: hamming 64
    assert(pairs.forall(p => p._1 != 5L && p._2 != 5L)) // quarantined excluded
  }

  test("image near-dup pigeonhole matches brute-force hamming") {
    // 12 strong-ramp bases, each with a ±1-noise variant → 12 planted pairs
    val imgs = (0 until 12).flatMap { b =>
      val base = gray98((x, y) => ((x * (20 + b) + y * 7 * b) % 13) * 19)
      val variant = gray98((x, y) => ((x * (20 + b) + y * 7 * b) % 13) * 19 + ((x + y + b) % 2))
      Seq((b * 2L, base), (b * 2L + 1, variant))
    }
    val media = imgs.toDF("media_id", "payload")
      .withColumn("modality", org.apache.spark.sql.functions.lit("image"))
    val sigs = BinaryPipeline.imageHashes(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("dhash")).toMap
    val want = (for {
      a <- sigs.keys; b <- sigs.keys
      if a < b && java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 6
    } yield (a, b)).toSet
    val got = BinaryPipeline.imageNearDupPairs(media, maxHamming = 6)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2)).toSet
    assert(got == want && want.nonEmpty)
  }

  test("audioWindowFeatures: silence/tone/tail windows, quarantine emits nothing") {
    def wav(samples: Seq[Short], rate: Int): Array[Byte] = {
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
    // 1 kHz rate, 250 ms windows → 250 samples/window: silence window,
    // ±8192 square-wave window, constant-16384 tail of 100 samples
    val samples = Seq.fill[Short](250)(0) ++
      (0 until 250).map(i => (if (i % 2 == 0) 8192 else -8192).toShort) ++
      Seq.fill[Short](100)(16384)
    val media = Seq(
      (1L, "audio", wav(samples, 1000)),
      (2L, "audio", "not audio at all".getBytes) // quarantine → no rows
    ).toDF("media_id", "modality", "payload")
    val r = BinaryPipeline.audioWindowFeatures(media)
      .orderBy("media_id", "win_idx").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getInt(2),
        x.getDouble(3), x.getDouble(4), x.getDouble(5)))
    assert(r.length == 3 && r.forall(_._1 == 1L))
    val Seq(w0, w1, w2) = r.toSeq
    assert(w0 == ((1L, 0, 250, 0.0, 0.0, 0.0)))                  // silence
    assert(w1._3 == 250 && w1._4 == 8192.0 / 32768 &&            // square rms = amp
      w1._5 == 249.0 / 250 && w1._6 == 8192.0 / 32768)           // crossing each step
    assert(w2._3 == 100 && w2._4 == 0.5 && w2._5 == 0.0 && w2._6 == 0.5)
    assert(BinaryPipeline.audioWindowFeatures(media.limit(0)).count() == 0)
  }

  private def bmpBytes(w: Int, h: Int, rgb: Array[Byte],
                       topDown: Boolean = false): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val buf = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * h)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(if (topDown) -h else h)
      .putShort(1).putShort(24).putInt(0).putInt(rowBytes * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (y <- 0 until h) {
      val srcY = if (topDown) y else h - 1 - y
      for (x <- 0 until w) {
        val o = (srcY * w + x) * 3
        buf.put(rgb(o + 2)).put(rgb(o + 1)).put(rgb(o)) // file stores BGR
      }
      (w * 3 until rowBytes).foreach(_ => buf.put(0.toByte))
    }
    buf.array()
  }

  test("decodeBmp: both row orders, row padding, quarantine, PPM parity") {
    // 3×2 pattern — width 3 forces a 9→12-byte padded row
    val rgb = Array[Int](
      255, 0, 0,   0, 255, 0,   0, 0, 255,
      10, 20, 30,  40, 50, 60,  70, 80, 90).map(_.toByte)
    val up = BinaryPipeline.decodeBmp(bmpBytes(3, 2, rgb))
    val down = BinaryPipeline.decodeBmp(bmpBytes(3, 2, rgb, topDown = true))
    assert(up.exists { case (w, h, px) => w == 3 && h == 2 && px.toSeq == rgb.toSeq })
    assert(down.exists { case (w, h, px) => w == 3 && h == 2 && px.toSeq == rgb.toSeq })
    // non-24-bpp / compressed / truncated → quarantine
    val bad8 = bmpBytes(3, 2, rgb); bad8(28) = 8
    assert(BinaryPipeline.decodeBmp(bad8).isEmpty)
    assert(BinaryPipeline.decodeBmp(bmpBytes(3, 2, rgb).dropRight(5)).isEmpty)
    assert(BinaryPipeline.decodeBmp("BMnot a real bmp".getBytes).isEmpty)
    // the same pixels through PPM and BMP decode identically via the
    // shared raster front door → identical downstream features/hashes
    val ppm = "P6\n3 2\n255\n".getBytes("US-ASCII") ++ rgb
    assert(BinaryPipeline.decodeRaster(ppm).map(_._3.toSeq) ==
      BinaryPipeline.decodeRaster(bmpBytes(3, 2, rgb)).map(_._3.toSeq))
    // end-to-end: a BMP row real-decodes in the image stage
    val media = Seq((1L, "image", bmpBytes(3, 2, rgb))).toDF("media_id", "modality", "payload")
    val r = BinaryPipeline.decodeImages(media).collect().head
    assert(r.getAs[Boolean]("real_decode") && r.getAs[Int]("width") == 3)
  }

  // ---- baseline JPEG ------------------------------------------------------

  /** Encode via the JDK's own (IJG-derived) writer — the independent
    * reference implementation the kernel is checked against.
    */
  private def jpegBytes(img: java.awt.image.BufferedImage, quality: Float,
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

  // hand-built PNG: pixels RGB row-major, ONE chosen filter applied
  // forward per row — exercises each unfilter branch deterministically
  // (ImageIO's encoder picks filters adaptively, so it can't guarantee
  // coverage); real CRCs via java.util.zip.CRC32
  private def pngBytes(w: Int, h: Int, rgb: Array[Byte],
                       filterOf: Int => Int,
                       colorType: Int = 2,
                       interlace: Int = 0,
                       bitDepth: Int = 8): Array[Byte] = {
    val channels = colorType match { case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4 }
    val stride = w * channels
    def toRow(y: Int): Array[Byte] = {
      val r = new Array[Byte](stride)
      for (x <- 0 until w) {
        val s = (y * w + x) * 3
        colorType match {
          case 0 => r(x) = rgb(s)
          case 4 => r(x * 2) = rgb(s); r(x * 2 + 1) = 0xff.toByte
          case 2 => r(x * 3) = rgb(s); r(x * 3 + 1) = rgb(s + 1); r(x * 3 + 2) = rgb(s + 2)
          case 6 => r(x * 4) = rgb(s); r(x * 4 + 1) = rgb(s + 1)
            r(x * 4 + 2) = rgb(s + 2); r(x * 4 + 3) = 0xff.toByte
        }
      }
      r
    }
    val raw = new java.io.ByteArrayOutputStream()
    var prev = new Array[Byte](stride)
    for (y <- 0 until h) {
      val row = toRow(y)
      val f = filterOf(y)
      raw.write(f)
      for (x <- 0 until stride) {
        val v = row(x) & 0xff
        val a = if (x >= channels) row(x - channels) & 0xff else 0
        val b = prev(x) & 0xff
        val c = if (x >= channels) prev(x - channels) & 0xff else 0
        val enc = f match {
          case 0 => v
          case 1 => v - a
          case 2 => v - b
          case 3 => v - ((a + b) >> 1)
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            v - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw.write(enc & 0xff)
      }
      prev = row
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw.toByteArray); d.finish()
      val buf = new Array[Byte](raw.size() + 64)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(bitDepth.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte)
      .put(interlace.toByte).array()
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n') ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", deflated) ++ chunk("IEND", Array.empty)
  }

  test("decodePng: known-pixel parity with javax.imageio (RGB, gray, RGBA alpha-drop)") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def pngOf(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", bos); bos.toByteArray
    }
    // RGB gradient — PNG is LOSSLESS, so parity is exact equality
    val rgbImg = new BufferedImage(33, 21, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 21; x <- 0 until 33)
      rgbImg.setRGB(x, y, ((x * 7 % 256) << 16) | ((y * 11 % 256) << 8) | ((x ^ y) % 256))
    val Some((w, h, px)) = BinaryPipeline.decodePng(pngOf(rgbImg))
    assert(w == 33 && h == 21)
    for (y <- 0 until 21; x <- 0 until 33; c <- 0 until 3)
      assert(((rgbImg.getRGB(x, y) >> ((2 - c) * 8)) & 0xff) == (px((y * 33 + x) * 3 + c) & 0xff),
        s"rgb pixel ($x,$y,$c)")
    // grayscale: raw raster samples, replicated to RGB
    val gray = new BufferedImage(16, 9, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 9; x <- 0 until 16) gray.getRaster.setSample(x, y, 0, (x * 16 + y) % 256)
    val Some((gw, gh, gPx)) = BinaryPipeline.decodePng(pngOf(gray))
    assert(gw == 16 && gh == 9)
    for (y <- 0 until 9; x <- 0 until 16) {
      val o = (y * 16 + x) * 3
      assert(gray.getRaster.getSample(x, y, 0) == (gPx(o) & 0xff), s"gray pixel ($x,$y)")
      assert(gPx(o) == gPx(o + 1) && gPx(o) == gPx(o + 2))
    }
    // RGBA: alpha DROPS (documented), color channels exact
    val argb = new BufferedImage(8, 5, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 5; x <- 0 until 8)
      argb.setRGB(x, y, (((x * 30) % 256) << 24) | ((x * 31 % 256) << 16) |
        ((y * 51 % 256) << 8) | ((x * y) % 256))
    val Some((aw, ah, aPx)) = BinaryPipeline.decodePng(pngOf(argb))
    assert(aw == 8 && ah == 5)
    for (y <- 0 until 5; x <- 0 until 8; c <- 0 until 3)
      assert(((argb.getRGB(x, y) >> ((2 - c) * 8)) & 0xff) == (aPx((y * 8 + x) * 3 + c) & 0xff),
        s"rgba pixel ($x,$y,$c)")
  }

  test("decodePng: every filter type unfilters exactly; quarantine gates") {
    val w = 13; val h = 10
    val rgb = Array.tabulate[Byte](w * h * 3)(i => ((i * 37 + (i * i) % 97) % 256).toByte)
    // rows cycle through all five filters — exact round-trip required
    val all5 = pngBytes(w, h, rgb, y => y % 5)
    assert(BinaryPipeline.decodePng(all5).contains((w, h, rgb.toSeq)).||(
      BinaryPipeline.decodePng(all5).exists { case (dw, dh, px) =>
        dw == w && dh == h && px.sameElements(rgb) }),
      "all-filters round-trip")
    // each filter alone, and on the alpha/gray layouts (different bpp strides)
    for (f <- 0 to 4) {
      assert(BinaryPipeline.decodePng(pngBytes(w, h, rgb, _ => f))
        .exists(_._3.sameElements(rgb)), s"filter $f rgb")
      assert(BinaryPipeline.decodePng(pngBytes(w, h, rgb, _ => f, colorType = 6))
        .exists(_._3.sameElements(rgb)), s"filter $f rgba")
    }
    // gray layouts replicate channel 0
    val grayExpected = Array.tabulate[Byte](w * h * 3)(i => rgb(i / 3 * 3))
    assert(BinaryPipeline.decodePng(pngBytes(w, h, rgb, _ => 4, colorType = 0))
      .exists(_._3.sameElements(grayExpected)), "gray paeth")
    assert(BinaryPipeline.decodePng(pngBytes(w, h, rgb, _ => 1, colorType = 4))
      .exists(_._3.sameElements(grayExpected)), "gray+alpha sub")
    // quarantine: interlaced, 16-bit, truncated, garbage — None, never wrong pixels
    assert(BinaryPipeline.decodePng(pngBytes(w, h, rgb, _ => 0, interlace = 1)).isEmpty)
    assert(BinaryPipeline.decodePng(pngBytes(w, h, rgb, _ => 0, bitDepth = 16)).isEmpty)
    val ok = pngBytes(w, h, rgb, _ => 0)
    assert(BinaryPipeline.decodePng(ok.dropRight(ok.length / 2)).isEmpty)
    assert(BinaryPipeline.decodePng(Array.tabulate[Byte](64)(i => (i * 3).toByte)).isEmpty)
    // palette PNGs (color type 3) quarantine — ImageIO writes one from an
    // indexed image
    val idx = new java.awt.image.BufferedImage(6, 4,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 4; x <- 0 until 6) idx.setRGB(x, y, (x * 40 << 16) | (y * 60 << 8))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(idx, "png", bos)
    assert(BinaryPipeline.decodePng(bos.toByteArray).isEmpty, "palette quarantines")
  }

  test("decodePng: total-pixel budget quarantines hostile huge-dimension headers") {
    // a 25-byte IHDR claiming 1048576×450 RGBA would force a ~1.9 GB raw
    // allocation (and Int overflow in h*(stride+1)) before any pixel data
    // exists — OutOfMemoryError is an Error, NOT caught by the
    // catch-Exception quarantine, so the budget must reject at the header
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] =
      be32(data.length.toLong) ++ typ.getBytes("US-ASCII") ++ data ++ be32(0L)
    val sig = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    def hostile(w: Long, h: Long): Array[Byte] =
      sig ++ chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 6, 0, 0, 0)) ++
        chunk("IDAT", Array[Byte](0)) ++ chunk("IEND", Array.emptyByteArray)
    assert(BinaryPipeline.decodePng(hostile(1L << 20, 450L)).isEmpty,
      "450 Mpx RGBA quarantines at the header, before allocation")
    assert(BinaryPipeline.decodePng(hostile(1L << 20, 1L << 20)).isEmpty,
      "per-axis-cap-passing 2^40 px quarantines")
    // within-budget dimensions pass the gate (and then quarantine on the
    // garbage stream instead — proving the gate itself is the boundary)
    assert(BinaryPipeline.decodePng(hostile(256L, 256L)).isEmpty)
  }

  test("decodePng: dhash equals the lossless PPM twin; pairs with the JPEG re-encode") {
    import spark.implicits._
    val w = 64; val h = 48
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 255 / (w - 1)) << 16) | ((y * 255 / (h - 1)) << 8) |
        ((x + y) * 255 / (w + h - 2)))
    val rgb = Array.tabulate[Byte](w * h * 3) { i =>
      ((img.getRGB((i / 3) % w, (i / 3) / w) >> ((2 - i % 3) * 8)) & 0xff).toByte
    }
    val ppm = (s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb)
    val png = pngBytes(w, h, rgb, y => y % 5)
    val jpg = jpegBytes(img, 0.9f)
    val media = Seq((1L, "image", ppm), (2L, "image", png), (3L, "image", jpg))
      .toDF("media_id", "modality", "payload")
    val hashes = BinaryPipeline.imageHashes(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("dhash")).toMap
    // PNG is lossless: identical raster ⇒ identical dHash to the PPM twin
    assert(hashes(1L) == hashes(2L), "png dhash must equal the ppm twin")
    // and the lossy JPEG twin stays within the near-dup band
    val pairs = BinaryPipeline.imageNearDupPairs(media).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)),
      s"png should pair with both twins: $pairs")
  }

  test("decodeJpeg: known-pixel parity with javax.imageio (gray + flat-chroma color)") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    // grayscale: single-component scan (non-interleaved MCU = one block);
    // raw raster samples compared (getRGB on gray applies a nonlinear
    // colorspace transform — not the decoded values)
    val gray = new BufferedImage(32, 24, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 24; x <- 0 until 32)
      gray.getRaster.setSample(x, y, 0, (x * 8 + y) % 256)
    val gBytes = jpegBytes(gray, 0.85f)
    val gRef = ImageIO.read(new java.io.ByteArrayInputStream(gBytes))
    val Some((gw, gh, gPx)) = BinaryPipeline.decodeJpeg(gBytes)
    assert(gw == 32 && gh == 24)
    for (y <- 0 until 24; x <- 0 until 32) {
      val o = (y * 32 + x) * 3
      assert(math.abs(gRef.getRaster.getSample(x, y, 0) - (gPx(o) & 0xff)) <= 2,
        s"gray pixel ($x,$y)")
      assert(gPx(o) == gPx(o + 1) && gPx(o) == gPx(o + 2), "gray must replicate to RGB")
    }
    // color with CONSTANT chroma (R=G=B): the 4:2:0 chroma planes are flat,
    // so replicate-vs-interpolated upsampling cannot differ — this pins the
    // full 3-component path (interleaved MCUs, dequant, IDCT, YCbCr) to
    // the reference decoder within IDCT rounding
    val flat = new BufferedImage(17, 13, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 13; x <- 0 until 17) {
      val v = (x * 13 + y * 5) % 256
      flat.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val fBytes = jpegBytes(flat, 0.85f)
    val fRef = ImageIO.read(new java.io.ByteArrayInputStream(fBytes))
    val Some((fw, fh, fPx)) = BinaryPipeline.decodeJpeg(fBytes)
    assert(fw == 17 && fh == 13) // odd dims: partial edge MCUs crop right
    for (y <- 0 until 13; x <- 0 until 17; c <- 0 until 3) {
      val ref = (fRef.getRGB(x, y) >> ((2 - c) * 8)) & 0xff
      assert(math.abs(ref - (fPx((y * 17 + x) * 3 + c) & 0xff)) <= 2,
        s"flat-chroma pixel ($x,$y,$c)")
    }
  }

  test("decodeJpeg: full-color gradient round-trips close to the source pixels") {
    import java.awt.image.BufferedImage
    val w = 64; val h = 48
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 255 / (w - 1)) << 16) | ((y * 255 / (h - 1)) << 8) |
        ((x + y) * 255 / (w + h - 2)))
    val Some((dw, dh, px)) = BinaryPipeline.decodeJpeg(jpegBytes(img, 0.9f))
    assert(dw == w && dh == h)
    var sum = 0L; var maxD = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val ref = (img.getRGB(x, y) >> ((2 - c) * 8)) & 0xff
      val d = math.abs(ref - (px((y * w + x) * 3 + c) & 0xff))
      sum += d; if (d > maxD) maxD = d
    }
    val mean = sum.toDouble / (w * h * 3)
    // lossy + replicate chroma upsampling: tight enough that a channel
    // swap, transpose, shift, or dequant bug all fail loudly
    assert(mean <= 3.0, s"mean abs error $mean")
    assert(maxD <= 40, s"max abs error $maxD")
  }

  test("decodeJpeg: progressive / truncated / garbage quarantine; stage flags") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64)
      img.setRGB(x, y, (x * 4 << 16) | (y * 5 << 8) | 99)
    val base = jpegBytes(img, 0.85f)
    assert(BinaryPipeline.decodeJpeg(base).isDefined)
    // progressive (SOF2) is out of scope: quarantine, never a wrong raster
    assert(BinaryPipeline.decodeJpeg(jpegBytes(img, 0.85f, progressive = true)).isEmpty)
    // entropy-data truncation: the padding valve must reject the garbage
    assert(BinaryPipeline.decodeJpeg(base.dropRight(base.length / 3)).isEmpty)
    // header truncation + non-JPEG bytes
    assert(BinaryPipeline.decodeJpeg(base.take(20)).isEmpty)
    assert(BinaryPipeline.decodeJpeg(Array[Byte](0xff.toByte, 0xd8.toByte, 1, 2)).isEmpty)
    // end-to-end: a JPEG row real-decodes through the image stage, the
    // progressive twin rides the quarantine flag
    val media = Seq((1L, "image", base),
      (2L, "image", jpegBytes(img, 0.85f, progressive = true)))
      .toDF("media_id", "modality", "payload")
    val rows = BinaryPipeline.decodeImages(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Boolean]("real_decode")).toMap
    assert(rows(1L) && !rows(2L))
  }

  test("dhash survives a JPEG re-encode: PPM original pairs with its JPEG twin") {
    import java.awt.image.BufferedImage
    // textured-but-smooth pattern: dHash gradients have real margins, so
    // the lossy re-encode flips at most a few of the 64 bits
    val w = 64; val h = 48
    def lum(x: Int, y: Int): Int =
      (128 + 90 * math.sin(x / 6.0) * math.cos(y / 5.0)).toInt.max(0).min(255)
    val ppm = s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++
      Array.tabulate[Byte](w * h * 3)(i => lum((i / 3) % w, i / 3 / w).toByte)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = lum(x, y)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val media = Seq((1L, "image", ppm), (2L, "image", jpegBytes(img, 0.85f)))
      .toDF("media_id", "modality", "payload")
    val hashes = BinaryPipeline.imageHashes(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("dhash")).toMap
    val hamming = java.lang.Long.bitCount(hashes(1L) ^ hashes(2L))
    assert(hamming <= 4, s"dhash drifted $hamming bits across the JPEG re-encode")
    // and the near-dup pairing finds exactly that pair
    val pairs = BinaryPipeline.imageNearDupPairs(media).collect()
    assert(pairs.length == 1 &&
      pairs.head.getAs[Long]("media_a") == 1L && pairs.head.getAs[Long]("media_b") == 2L)
  }

  // ---- AVI / MJPEG video path ----

  /** Minimal RIFF/AVI writer for the specs: hdrl LIST (ignored by the
    * parser) + movi LIST of 00dc frame chunks, word-aligned. */
  private def aviBytes(frames: Seq[Array[Byte]], nest: Boolean = false): Array[Byte] = {
    def cc(x: String) = x.getBytes("US-ASCII")
    def u32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val movi = new java.io.ByteArrayOutputStream()
    movi.write(cc("movi"))
    frames.foreach { f =>
      if (nest) {
        // wrap each frame in a `rec ` sub-list, as interleaved AVIs do
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

  test("decodeAviFrames: chunk walk round-trip, rec nesting, padding, quarantine") {
    val f1 = Array.tabulate[Byte](33)(_.toByte) // odd length -> pad byte
    val f2 = Array.tabulate[Byte](20)(i => (i * 3).toByte)
    val flat = BinaryPipeline.decodeAviFrames(aviBytes(Seq(f1, f2)))
    assert(flat.exists(fs => fs.size == 2 &&
      fs(0).sameElements(f1) && fs(1).sameElements(f2)))
    // interleaved `rec ` sub-lists are recursed into
    val nested = BinaryPipeline.decodeAviFrames(aviBytes(Seq(f1, f2), nest = true))
    assert(nested.exists(fs => fs.size == 2 && fs(0).sameElements(f1)))
    // garbage / wrong magic / truncated container
    assert(BinaryPipeline.decodeAviFrames(Array.tabulate[Byte](64)(_.toByte)).isEmpty)
    assert(BinaryPipeline.decodeAviFrames("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    val whole = aviBytes(Seq(f1, f2))
    // cutting into the SECOND frame chunk keeps the first (walk stops at
    // the truncated chunk, earlier frames stand)
    val cut = java.util.Arrays.copyOfRange(whole, 0, whole.length - 10)
    assert(BinaryPipeline.decodeAviFrames(cut).exists(fs =>
      fs.size == 1 && fs(0).sameElements(f1)))
  }

  test("videoFrames: MJPEG AVI decodes per sampled frame; dhash matches the image path") {
    import java.awt.image.BufferedImage
    // 4 frames: vertical gradients with distinct offsets (flat chroma)
    val jpegs = (0 until 4).map { k =>
      val img = new BufferedImage(24, 16, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 24) {
        val v = (x * 10 + k * 30) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      jpegBytes(img, 0.9f)
    }
    val media = Seq((7L, aviBytes(jpegs))).toDF("media_id", "payload")
      .withColumn("modality", org.apache.spark.sql.functions.lit("video"))
    val all = BinaryPipeline.videoFrames(media).collect()
    assert(all.map(_.getAs[Int]("frame_idx")).sorted.toSeq == Seq(0, 1, 2, 3))
    assert(all.forall(r => r.getAs[Int]("width") == 24 && r.getAs[Int]("height") == 16))
    val sampled = BinaryPipeline.videoFrames(media, every = 2).collect()
    assert(sampled.map(_.getAs[Int]("frame_idx")).sorted.toSeq == Seq(0, 2))
    // frame dhash must equal the IMAGE pipeline's dhash of the same JPEG
    val asImage = Seq((0L, jpegs(0))).toDF("media_id", "payload")
      .withColumn("modality", org.apache.spark.sql.functions.lit("image"))
    val imgHash = BinaryPipeline.imageHashes(asImage).collect().head.getAs[Long]("dhash")
    val frameHash = all.find(_.getAs[Int]("frame_idx") == 0).get.getAs[Long]("dhash")
    assert(frameHash == imgHash, "video frame dhash must match the image-path dhash")
    // container summary: real decode with dimensions
    val summary = BinaryPipeline.decodeVideos(media).collect().head
    assert(summary.getAs[Int]("n_frames") == 4 && summary.getAs[Boolean]("real_decode")
      && summary.getAs[Int]("width") == 24)
  }

  test("video quarantine: unknown codec parses the container but flags; frames emit nothing") {
    val junkFrames = Seq(Array.tabulate[Byte](40)(i => (i * 7).toByte))
    val media = Seq(
      (1L, aviBytes(junkFrames)),                       // AVI, alien codec
      (2L, Array.tabulate[Byte](50)(_.toByte))          // not an AVI at all
    ).toDF("media_id", "payload")
      .withColumn("modality", org.apache.spark.sql.functions.lit("video"))
    val sums = BinaryPipeline.decodeVideos(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(sums(1L).getAs[Int]("n_frames") == 1 && !sums(1L).getAs[Boolean]("real_decode"))
    assert(sums(2L).isNullAt(sums(2L).fieldIndex("n_frames"))
      && !sums(2L).getAs[Boolean]("real_decode"))
    assert(BinaryPipeline.videoFrames(media).count() == 0)
  }

  test("videoNearDupPairs: re-encoded copy pairs, disjoint footage doesn't, still-logo counts once per frame") {
    import java.awt.image.BufferedImage
    def frame(seed: Int): BufferedImage = {
      val img = new BufferedImage(24, 16, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 24) {
        val v = (x * 10 + seed * 40) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    // video 1: frames A,B,C at q=0.9; video 2: the SAME frames re-encoded
    // at q=0.7 (near-dup, not byte-dup); video 3: unrelated frames
    val v1 = aviBytes((0 until 3).map(k => jpegBytes(frame(k), 0.9f)))
    val v2 = aviBytes((0 until 3).map(k => jpegBytes(frame(k), 0.7f)))
    val v3 = aviBytes((10 until 13).map(k => jpegBytes(frame(k), 0.9f)))
    val media = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("media_id", "payload")
      .withColumn("modality", org.apache.spark.sql.functions.lit("video"))
    val pairs = BinaryPipeline.videoNearDupPairs(media, minShared = 2).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b")) ->
        r.getAs[Long]("shared_frames")).toMap
    assert(pairs.contains((1L, 2L)), s"re-encoded copy must pair, got $pairs")
    assert(pairs((1L, 2L)) >= 2L)
    assert(!pairs.keySet.exists(k => k._2 == 3L || k._1 == 3L),
      s"unrelated footage must not pair: $pairs")
    // a still logo repeated 4x in A vs once in B: shared_frames counts
    // DISTINCT A-frames that match (4), not 4x1 frame-pairs inflated
    val logoA = aviBytes(Seq.fill(4)(jpegBytes(frame(5), 0.9f)))
    val logoB = aviBytes(Seq(jpegBytes(frame(5), 0.7f)))
    val logos = Seq((1L, logoA), (2L, logoB)).toDF("media_id", "payload")
      .withColumn("modality", org.apache.spark.sql.functions.lit("video"))
    val lp = BinaryPipeline.videoNearDupPairs(logos, minShared = 1).collect()
    assert(lp.length == 1 && lp.head.getAs[Long]("shared_frames") == 4L)
  }

  test("audioFingerprints: gain-invariant, window-deterministic, short/undecodable yield nothing") {
    val take = TestMedia.toneTake(seed = 1, seconds = 1.0)
    val loud = TestMedia.wav16(take)
    val quiet = TestMedia.wav16(take.map(s => (s / 4).toShort))
    val media = Seq((1L, loud), (2L, quiet)).toDF("media_id", "payload")
      .withColumn("modality", org.apache.spark.sql.functions.lit("audio"))
    val fps = BinaryPipeline.audioFingerprints(media)
      .as[(Long, Int, Long)].collect().groupBy(_._1)
      .map { case (id, rs) => id -> rs.sortBy(_._2).map(_._3).toSeq }
    // 1s @8kHz / 250ms windows = 4 windows each
    assert(fps(1L).size == 4 && fps(2L).size == 4)
    // the envelope-sign print is GAIN-invariant up to quantization noise:
    // a 4x quieter copy keeps (nearly) every bit of every window
    fps(1L).zip(fps(2L)).foreach { case (a, b) =>
      assert(java.lang.Long.bitCount(a ^ b) <= 3, s"gain changed the print: $a vs $b") }
    // windows shorter than the 17-cell grid emit nothing; garbage
    // payloads decode to nothing (decodeAudio is the quarantine surface)
    val tiny = Seq((3L, TestMedia.wav16(TestMedia.toneTake(1).take(12))),
      (4L, Array.tabulate[Byte](50)(_.toByte)))
      .toDF("media_id", "payload")
      .withColumn("modality", org.apache.spark.sql.functions.lit("audio"))
    assert(BinaryPipeline.audioFingerprints(tiny).count() == 0)
  }

  test("audioNearDupPairs: requantized copy pairs, disjoint takes don't, silence counts once per window") {
    val takeA = TestMedia.toneTake(seed = 1, seconds = 1.0)
    val takeB = TestMedia.toneTake(seed = 4, seconds = 1.0)
    val media = Seq(
      (1L, TestMedia.wav16(takeA)),             // original PCM16
      (2L, TestMedia.wav8(takeA)),              // SAME take requantized to PCM8
      (3L, TestMedia.wav16(takeB)))             // unrelated take
      .toDF("media_id", "payload")
      .withColumn("modality", org.apache.spark.sql.functions.lit("audio"))
    val pairs = BinaryPipeline.audioNearDupPairs(media, minShared = 2).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b")) ->
        r.getAs[Long]("shared_windows")).toMap
    assert(pairs.contains((1L, 2L)), s"requantized copy must pair, got $pairs")
    assert(pairs((1L, 2L)) >= 2L)
    assert(!pairs.keySet.exists(k => k._1 == 3L || k._2 == 3L),
      s"unrelated takes must not pair: $pairs")
    // a flat-silence clip: every window prints 0, but distinct-window
    // voting counts each earlier-clip window once (4 windows -> 4 votes,
    // not 4x4 window-pairs)
    val silence = Seq.fill(8000)(0.toShort)
    val sm = Seq((1L, TestMedia.wav16(silence)), (2L, TestMedia.wav16(silence ++ silence)))
      .toDF("media_id", "payload")
      .withColumn("modality", org.apache.spark.sql.functions.lit("audio"))
    val sp = BinaryPipeline.audioNearDupPairs(sm, minShared = 1).collect()
    assert(sp.length == 1 && sp.head.getAs[Long]("shared_windows") == 4L)
  }
}
