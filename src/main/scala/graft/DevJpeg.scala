package graft

import java.awt.image.BufferedImage
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Dev experiment: cross-check the dependency-free baseline JPEG decoder
  * against javax.imageio on synthetic images at several qualities and
  * sampling modes. Not part of the driver contract.
  */
object DevJpeg {
  def encode(img: BufferedImage, quality: Float, progressive: Boolean): Array[Byte] = {
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

  def gradient(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = x * 255 / math.max(w - 1, 1)
      val g = y * 255 / math.max(h - 1, 1)
      val b = (x + y) * 255 / math.max(w + h - 2, 1)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  def compare(name: String, bytes: Array[Byte]): Unit = {
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    graft.multimodal.BinaryPipeline.decodeJpeg(bytes) match {
      case None => println(s"[jpeg] $name: QUARANTINED (w=${if (ref == null) -1 else ref.getWidth})")
      case Some((w, h, rgb)) =>
        if (ref == null || w != ref.getWidth || h != ref.getHeight) {
          println(s"[jpeg] $name: DIM MISMATCH got ${w}x$h"); return
        }
        val gray = ref.getRaster.getNumBands == 1
        var maxD = 0; var sumD = 0L
        for (y <- 0 until h; x <- 0 until w) {
          val o = (y * w + x) * 3
          if (gray) {
            // getRGB on TYPE_BYTE_GRAY applies a nonlinear colorspace
            // transform; the raw raster sample is the decoded value
            val d = math.abs(ref.getRaster.getSample(x, y, 0) - (rgb(o) & 0xff))
            if (d > maxD) maxD = d
            sumD += d * 3
          } else {
            val p = ref.getRGB(x, y)
            for ((rc, sh) <- Seq(0 -> 16, 1 -> 8, 2 -> 0)) {
              val d = math.abs(((p >> sh) & 0xff) - (rgb(o + rc) & 0xff))
              if (d > maxD) maxD = d
              sumD += d
            }
          }
        }
        println(f"[jpeg] $name%-28s ${w}x$h maxDiff=$maxD meanDiff=${sumD.toDouble / (w * h * 3)}%.3f")
    }
  }

  def main(args: Array[String]): Unit = {
    for (q <- Seq(0.95f, 0.85f, 0.6f, 0.3f); (w, h) <- Seq((64, 48), (17, 13), (8, 8)))
      compare(s"grad-${w}x$h-q$q", encode(gradient(w, h), q, progressive = false))
    compare("progressive-q85", encode(gradient(64, 48), 0.85f, progressive = true))
    // constant-chroma RGB (R=G=B): chroma planes are flat 128, so the
    // upsampling-method difference vanishes — isolates the decode itself
    val flat = new BufferedImage(17, 13, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 13; x <- 0 until 17) {
      val v = (x * 13 + y * 5) % 256
      flat.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    compare("flatchroma-17x13-q85", encode(flat, 0.85f, progressive = false))
    // grayscale
    val gray = new BufferedImage(32, 24, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 24; x <- 0 until 32) {
      val v = (x * 8 + y) % 256
      gray.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    compare("gray-32x24-q85", encode(gray, 0.85f, progressive = false))
  }
}
