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

/** Audio sibling: pins the javax.sound WAV codec path (round 11). */
class WavDecodeSpec extends SparkSpec {

  test("encodeWav emits a RIFF/WAVE container the codec accepts") {
    val bytes = graft.operators.Multimodal.encodeWav(5L, 16, 16000)
    assert(new String(bytes.take(4)) == "RIFF")
    assert(new String(bytes.slice(8, 12)) == "WAVE")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    assert(ais.getFormat.getSampleRate == 16000f)
    assert(ais.getFormat.getChannels == 1)
  }

  test("decode(encode(pcm)) is bit-exact: golden stats for doc 33") {
    val id = 33L
    val st = graft.operators.Multimodal.decodeWavStats(
      id, graft.operators.Multimodal.encodeWav(id, 64, 26640))
    var (dc, pk, en) = (0L, 0L, 0L)
    for (i <- 0 until 64) {
      val u = ((31 * id + 7L * i * i) % 65536).toInt
      val s = if (u >= 32768) u - 65536 else u
      dc += s; pk = math.max(pk, math.abs(s).toLong); en += s.toLong * s
    }
    assert(st == graft.operators.Multimodal.WavSampleStats(
      id, 26640, 64L, dc, pk, en))
  }

  test("corrupt and wrong-format payloads degrade to the sentinel") {
    import graft.operators.Multimodal
    assert(Multimodal.decodeWavStats(1L, Array[Byte](9, 9, 9)).sample_rate == -1)
    // a truncated but RIFF-prefixed payload must not throw
    val trunc = Multimodal.encodeWav(1L, 32, 8000).take(16)
    assert(Multimodal.decodeWavStats(1L, trunc).sample_rate == -1)
  }

  test("mm_decode_audio runs distributed and every row decodes") {
    val out = Queries.byName("mm_decode_audio")
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("n_samples") == 64L))
    assert(out.forall(_.getAs[Int]("sample_rate") >= 8000))
  }
}

/** Resize + frame-sample kernels (round 11): the remaining two verbs of
  * the brief's decode/feature-extract/resize/frame-sample list, now real.
  */
class ResizeFrameSpec extends SparkSpec {
  import graft.operators.Multimodal

  test("resizePng nearest-neighbor: resized pixel (x,y) == source (2x,2y)") {
    val id = 7L
    val resized = Multimodal.resizePng(Multimodal.encodePng(id, 16, 16), 8, 8)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(img.getWidth == 8 && img.getHeight == 8)
    for (y <- 0 until 8; x <- 0 until 8) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == ((7 * id + 3 * (2 * x) + 5 * (2 * y)) % 256),
        s"r($x,$y)")
    }
  }

  test("resizePng on corrupt input returns null, never throws") {
    assert(Multimodal.resizePng(Array[Byte](1, 2, 3), 8, 8) == null)
  }

  test("packFrames + sampleDecodeFrames: counts, sums, truncation, sentinel") {
    val id = 11L
    val frames = (0 until 6).map(f => Multimodal.encodePng(id * 8 + f, 16, 16))
    val full = Multimodal.sampleDecodeFrames(id, Multimodal.packFrames(frames), 2)
    assert(full.n_frames == 6 && full.n_sampled == 3)
    var rs = 0L
    for (f <- Seq(0, 2, 4); y <- 0 until 16; x <- 0 until 16)
      rs += (7 * (id * 8 + f) + 3 * x + 5 * y) % 256
    assert(full.r_sum == rs)
    // truncated container: walk stops cleanly at the last whole frame
    val packed = Multimodal.packFrames(frames)
    val trunc = Multimodal.sampleDecodeFrames(id, packed.dropRight(40), 2)
    assert(trunc.n_frames == 5 && trunc.n_sampled == 3)
    // a corrupt SAMPLED frame yields the sentinel
    val bad = Multimodal.packFrames(Seq(Array[Byte](1, 2, 3)))
    assert(Multimodal.sampleDecodeFrames(id, bad, 1).n_frames == -1)
  }
}
