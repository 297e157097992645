package graft.tools

/** Dev probe: is a block-aligned constant-GRAY image exact through the
  * JVM's real JPEG encoder/decoder at quality 1.0? (Gray pixels make
  * the RGB<->YCbCr fixed-point transform exact; 8x8-aligned constant
  * blocks are DC-only; q=1.0 quant tables are all ones -> the DCT
  * roundtrip should be lossless for THIS family.) Feeds mm_decode_jpeg.
  */
object JpegProbe {
  def main(a: Array[String]): Unit = {
    javax.imageio.ImageIO.setUseCache(false)
    var allExact = true
    for (id <- Seq(0L, 16L, 48L, 999L, 123456L)) {
      val (w, h) = (32, 24)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((7 * id + 11 * (x / 8) + 13 * (y / 8)) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      wr.setOutput(ios)
      val p = wr.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(1.0f)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      wr.dispose(); ios.close()
      val bytes = bos.toByteArray
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      var maxd = 0; var mism = 0
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((7 * id + 11 * (x / 8) + 13 * (y / 8)) % 256).toInt
        val rgb = back.getRGB(x, y)
        for (c <- Seq((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)) {
          val dd = math.abs(c - v); if (dd > maxd) maxd = dd
          if (dd != 0) mism += 1
        }
      }
      println(s"[jpeg-probe] id=$id bytes=${bytes.length} maxDiff=$maxd mismatches=$mism")
      if (maxd != 0) allExact = false
    }
    println(s"[jpeg-probe] allExact=$allExact")
  }
}
