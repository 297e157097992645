package graft

import graft.operators.Multimodal

/** Pins the REAL javax.imageio JPEG codec path (round 13): the
  * block-gray q=1.0 synthesis family survives the lossy encoder→decoder
  * round-trip EXACTLY (the DC-only/gray/all-ones-quant argument in
  * encodeJpegGray's doc), corrupt payloads degrade to the sentinel, and
  * a deliberately NON-block-constant image shows the exactness is a
  * property of the family, not of the codec.
  */
class JpegDecodeSpec extends SparkSpec {

  test("encodeJpegGray emits a parseable JPEG with SOI/JFIF magic + dims") {
    val bytes = Multimodal.encodeJpegGray(42L, 32, 24)
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "SOI")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 32 && img.getHeight == 24)
  }

  test("decode(encode) is bit-exact across the block-gray family") {
    for (id <- Seq(0L, 4L, 100L, 4884L)) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        Multimodal.encodeJpegGray(id, 32, 24)))
      for (y <- 0 until 24; x <- 0 until 32) {
        val v = ((7 * id + 11 * (x / 8) + 13 * (y / 8)) % 256).toInt
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == v && ((rgb >> 8) & 0xff) == v &&
          (rgb & 0xff) == v, s"id=$id px($x,$y)")
      }
    }
  }

  test("decodeJpegStats matches an independent reference on 32x24") {
    val id = 164L
    val st = Multimodal.decodeJpegStats(id, Multimodal.encodeJpegGray(id, 32, 24))
    var (vs, pm) = (0L, 0L)
    for (y <- 0 until 24; x <- 0 until 32) {
      val v = (7 * id + 11 * (x / 8) + 13 * (y / 8)) % 256
      vs += v
      pm += (x + 1).toLong * (y + 1) * v
    }
    assert(st == Multimodal.PngPixelStats(id, 32, 24, vs, vs, vs, pm))
  }

  test("corrupt payload degrades to the sentinel row, not an exception") {
    val st = Multimodal.decodeJpegStats(7L, Array[Byte](1, 2, 3, 4))
    assert(st == Multimodal.PngPixelStats(7L, -1, -1, 0L, 0L, 0L, 0L))
    // truncated-but-SOI-valid jpeg must not throw either
    val trunc = Multimodal.encodeJpegGray(7L, 16, 16).take(24)
    val st2 = Multimodal.decodeJpegStats(7L, trunc)
    assert(st2.width == -1)
  }

  test("within-block variation does NOT round-trip - the family boundary") {
    // same writer, same quality, but pixels vary inside the 8x8 block:
    // the AC coefficients are nonzero and the integer DCT is lossy, so
    // at least one pixel must differ - proving the graded exactness is
    // the synthesis family's property, not a codec accident the oracle
    // could silently over-trust.
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    def noise(x: Int, y: Int): Int = (x * 37 + y * 91 + x * y * 53) % 256
    for (y <- 0 until 16; x <- 0 until 16) {
      val v = noise(x, y)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    javax.imageio.ImageIO.setUseCache(false)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      wr.setOutput(ios)
      val p = wr.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(1.0f)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { wr.dispose(); ios.close() }
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val diffs = (for (y <- 0 until 16; x <- 0 until 16) yield {
      if ((back.getRGB(x, y) & 0xff) != noise(x, y)) 1 else 0
    }).sum
    assert(diffs > 0, "in-block-varying pixels unexpectedly exact")
  }
}
