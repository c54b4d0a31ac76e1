package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sources.AssetCodecs

/** Progressive JPEG (SOF2, T.81 Annex G) decode laws.
  *
  * The load-bearing invariant: progressive transmission is a PERMUTATION
  * of the quantized coefficients — a baseline and a progressive encode of
  * the same content at the same tables must decode to bit-identical
  * planes. The ImageIO tests pin that against an independent encoder
  * (the JDK's IJG-derived writer, whose progression script uses spectral
  * selection AND successive approximation, i.e. the full scan grammar);
  * the in-house tests pin the DC-only exactness path the m16 gate rides.
  */
class JpegProgressiveSpec extends AnyFunSuite with Matchers {

  /** Deterministic pseudo-random RGB image (no java.util.Random — fixed
    * closed form keeps the fixture replayable).
    */
  private def rgbImage(w: Int, h: Int, seed: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 37 + y * 11 + seed * 53) % 256
      val g = (x * 13 + y * 71 + seed * 29) % 256
      val b = (x * 97 + y * 41 + seed * 17) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def imageioJpeg(img: java.awt.image.BufferedImage, quality: Float,
                          progressive: Boolean): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    if (progressive)
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    baos.toByteArray
  }

  private def sofOf(bytes: Array[Byte]): Int = {
    var pos = 2
    while (true) {
      val m = bytes(pos + 1) & 0xff
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) return m
      pos += 2 + (((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff))
    }
    -1
  }

  test("ImageIO cross-check: progressive and baseline encodes of the same image decode to identical planes") {
    for ((w, h, q) <- Seq((37, 23, 0.8f), (64, 48, 0.5f), (17, 31, 0.92f))) {
      val img = rgbImage(w, h, w + h)
      val base = imageioJpeg(img, q, progressive = false)
      val prog = imageioJpeg(img, q, progressive = true)
      sofOf(base) shouldBe 0xc0 // the JDK writer really emitted baseline
      sofOf(prog) shouldBe 0xc2 // ... and a true progressive frame
      val db = AssetCodecs.decodeJpegYccAuto(base)
      val dp = AssetCodecs.decodeJpegYccAuto(prog)
      (dp.w, dp.h, dp.hSamp, dp.vSamp) shouldBe ((db.w, db.h, db.hSamp, db.vSamp))
      for (y <- 0 until h; x <- 0 until w) {
        withClue(s"($x,$y) of ${w}x$h q=$q: ") {
          dp.y(y)(x) shouldBe db.y(y)(x)
          dp.cb(y)(x) shouldBe db.cb(y)(x)
          dp.cr(y)(x) shouldBe db.cr(y)(x)
        }
      }
    }
  }

  test("ImageIO cross-check: my progressive planes match ImageIO's own pixel decode at tile interiors") {
    // independent DECODER agreement, not just self-consistency. ImageIO
    // up-samples chroma by interpolation (mine replicates), so agreement
    // is only expected away from tile boundaries — the same discipline as
    // the baseline ImageIO cross-check: a 16x16-tile-constant image,
    // compared at tile INTERIOR pixels, tolerance ±2 for the differing
    // IDCT/rounding pipelines
    val w = 48; val h = 32
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val tx = x / 16; val ty = y / 16
      val r = (tx * 67 + ty * 31 + 40) % 256
      val g = (tx * 29 + ty * 83 + 90) % 256
      val b = (tx * 53 + ty * 17 + 140) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val prog = imageioJpeg(img, 0.9f, progressive = true)
    sofOf(prog) shouldBe 0xc2
    val mine = AssetCodecs.decodeJpegYccAuto(prog)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(prog))
    var maxDelta = 0
    for (ty <- 0 until h / 16; tx <- 0 until w / 16;
         y <- ty * 16 + 4 until ty * 16 + 12; x <- tx * 16 + 4 until tx * 16 + 12) {
      val (mr, mg, mb) = AssetCodecs.ycbcrToRgb(mine.y(y)(x), mine.cb(y)(x), mine.cr(y)(x))
      val rp = ref.getRGB(x, y)
      maxDelta = math.max(maxDelta, math.abs(mr - ((rp >> 16) & 0xff))
        .max(math.abs(mg - ((rp >> 8) & 0xff))).max(math.abs(mb - (rp & 0xff))))
    }
    maxDelta should be <= 2
  }

  test("in-house progressive encode of DC-only content decodes bit-identically to the baseline encode") {
    for (d <- Seq(0L, 1L, 5L, 42L)) {
      val w = (17 + d % 32).toInt
      val h = (17 + (3 * d) % 24).toInt
      val (hs, vs) = if (d % 2 == 0) (2, 2) else (2, 1)
      val yF = (x: Int, y: Int) => ((17 * (x / 16) + 29 * (y / 16) + 31 * (d % 89)) % 256).toInt
      val cbF = (x: Int, y: Int) => ((23 * (x / 16) + 13 * (y / 16) + 7 * (d % 83)) % 256).toInt
      val crF = (x: Int, y: Int) => ((11 * (x / 16) + 19 * (y / 16) + 5 * (d % 79)) % 256).toInt
      val prog = AssetCodecs.encodeJpegYccProgressive(w, h, yF, cbF, crF, hs, vs)
      sofOf(prog) shouldBe 0xc2
      val dp = AssetCodecs.decodeJpegYccAuto(prog)
      val db = AssetCodecs.decodeJpegYcc(
        AssetCodecs.encodeJpegYcc(w, h, yF, cbF, crF, hs, vs))
      (dp.w, dp.h) shouldBe ((w, h))
      for (y <- 0 until h; x <- 0 until w) {
        withClue(s"doc $d ($x,$y): ") {
          dp.y(y)(x) shouldBe db.y(y)(x)
          dp.cb(y)(x) shouldBe db.cb(y)(x)
          dp.cr(y)(x) shouldBe db.cr(y)(x)
        }
      }
    }
  }

  test("progressive encoder refuses non-constant (AC-bearing) blocks loudly") {
    val e = intercept[IllegalArgumentException](
      AssetCodecs.encodeJpegYccProgressive(16, 16,
        (x, y) => (x * 16 + y) % 256, (_, _) => 128, (_, _) => 128))
    e.getMessage should include("nonzero AC coefficient")
  }

  test("decodeJpegYccAuto: loud reject narrowed to arithmetic-coded and lossless frames") {
    // hand-built header up to an SOF9 (arithmetic sequential) marker
    def fakeSof(sof: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(0xff); out.write(0xd8)
      out.write(0xff); out.write(sof)
      out.write(0); out.write(11) // len
      out.write(8); out.write(0); out.write(16); out.write(0); out.write(16)
      out.write(1); out.write(1); out.write(0x11); out.write(0)
      out.toByteArray
    }
    val e = intercept[RuntimeException](AssetCodecs.decodeJpegYccAuto(fakeSof(0xc9)))
    e.getMessage should include("SOF9")
    e.getMessage should include("arithmetic")
    val e2 = intercept[RuntimeException](AssetCodecs.decodeJpegYccAuto(fakeSof(0xc3)))
    e2.getMessage should include("SOF3")
  }
}
