package graft

import graft.operators.Multimodal

/** Pins the REAL javax.imageio PNG codec path (round 11): golden pixel
  * bytes survive the encoder→decoder round-trip exactly, corrupt
  * payloads degrade instead of throwing, and the graded query's stats
  * match the pixel formula computed independently in plain Scala.
  */
class PngDecodeSpec extends SparkSpec {

  test("encodePng emits a parseable PNG with the declared magic + dims") {
    val bytes = Multimodal.encodePng(42L, 7, 5)
    // golden prefix: PNG signature + IHDR length/type (public layout)
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    assert(bytes.take(8).sameElements(sig), "PNG signature")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 7 && img.getHeight == 5)
  }

  test("decode(encode(px)) is bit-exact: golden pixels for doc 3") {
    val bytes = Multimodal.encodePng(3L, 4, 3)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until 3; x <- 0 until 4) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == ((7 * 3 + 3 * x + 5 * y) % 256), s"r($x,$y)")
      assert(((rgb >> 8) & 0xff) == ((11 * 3 + x * y) % 256), s"g($x,$y)")
      assert((rgb & 0xff) == ((13 * 3 + 2 * x + y * y) % 256), s"b($x,$y)")
    }
  }

  test("decodePngStats matches an independent reference on a 16x16 image") {
    val id = 160L
    val st = Multimodal.decodePngStats(id, Multimodal.encodePng(id, 16, 16))
    var (rs, gs, bs, pm) = (0L, 0L, 0L, 0L)
    for (y <- 0 until 16; x <- 0 until 16) {
      val r = (7 * id + 3 * x + 5 * y) % 256
      rs += r
      gs += (11 * id + x.toLong * y) % 256
      bs += (13 * id + 2 * x + y.toLong * y) % 256
      pm += (x + 1).toLong * (y + 1) * r
    }
    assert(st == Multimodal.PngPixelStats(id, 16, 16, rs, gs, bs, pm))
  }

  test("corrupt payload degrades to the sentinel row, not an exception") {
    val st = Multimodal.decodePngStats(7L, Array[Byte](1, 2, 3, 4))
    assert(st == Multimodal.PngPixelStats(7L, -1, -1, 0L, 0L, 0L, 0L))
    // a TRUNCATED but signature-valid png must not throw either
    val trunc = Multimodal.encodePng(7L, 8, 8).take(20)
    val st2 = Multimodal.decodePngStats(7L, trunc)
    assert(st2.width == -1 && st2.r_sum == 0L)
  }

  test("mm_decode_px runs distributed and every row decodes") {
    val out = Queries.byName("mm_decode_px").fn(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Int]("width") == 16), "a payload failed decode")
    // spot-check one row against the formula
    val r0 = out.find(_.getAs[Long]("doc_id") == 16L)
    r0.foreach { row =>
      var rs = 0L
      for (y <- 0 until 16; x <- 0 until 16) rs += (7 * 16 + 3 * x + 5 * y) % 256
      assert(row.getAs[Long]("r_sum") == rs)
    }
  }
}
