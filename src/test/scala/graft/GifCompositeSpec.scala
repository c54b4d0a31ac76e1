package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sources.AssetCodecs
import graft.sources.AssetCodecs.GifFrameSpec
import graft.operators.Multimodal

/** GIF89a disposal-compositing laws (gate m17).
  *
  * The ImageIO cross-check is genuinely independent where it matters:
  * the JDK reader does its own LZW + rect + transparency decode, and the
  * SPEC composites those raw frames per the documented disposal
  * protocol in RGB space — my decoder does everything in index space.
  * Agreement means the rect placement, transparency masking, and all
  * three disposal restores match an external implementation.
  */
class GifCompositeSpec extends AnyFunSuite with Matchers {

  /** Composite ImageIO's raw frames per the GIF89a disposal protocol —
    * the reference implementation the decoder is compared against.
    */
  private def imageioComposite(bytes: Array[Byte]): (Int, Int, Vector[Array[Int]]) = {
    val rdr = javax.imageio.ImageIO.getImageReadersBySuffix("gif").next()
    rdr.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    val sm = rdr.getStreamMetadata.getAsTree("javax_imageio_gif_stream_1.0")
      .asInstanceOf[org.w3c.dom.Element]
    def attr(e: org.w3c.dom.Element, tag: String, a: String): String = {
      val nodes = e.getElementsByTagName(tag)
      if (nodes.getLength == 0) "" else
        nodes.item(0).asInstanceOf[org.w3c.dom.Element].getAttribute(a)
    }
    val w = attr(sm, "LogicalScreenDescriptor", "logicalScreenWidth").toInt
    val h = attr(sm, "LogicalScreenDescriptor", "logicalScreenHeight").toInt
    val bgIdx = attr(sm, "GlobalColorTable", "backgroundColorIndex").toInt
    val bgRgb = bgIdx * 0x010101 // identity greyscale palette
    val n = rdr.getNumImages(true)
    val canvas = Array.fill(w * h)(bgRgb)
    val out = Vector.newBuilder[Array[Int]]
    for (i <- 0 until n) {
      val img = rdr.read(i)
      val im = rdr.getImageMetadata(i).getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val left = attr(im, "ImageDescriptor", "imageLeftPosition").toInt
      val top = attr(im, "ImageDescriptor", "imageTopPosition").toInt
      val disposal = attr(im, "GraphicControlExtension", "disposalMethod")
      val before =
        if (disposal == "restoreToPrevious") canvas.clone else null
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val argb = img.getRGB(x, y)
        if ((argb >>> 24) != 0) // transparent pixels show through
          canvas((top + y) * w + (left + x)) = argb & 0xffffff
      }
      out += canvas.clone
      disposal match {
        case "restoreToBackgroundColor" =>
          for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
            canvas((top + y) * w + (left + x)) = bgRgb
        case "restoreToPrevious" =>
          for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
            canvas((top + y) * w + (left + x)) =
              before((top + y) * w + (left + x))
        case _ => ()
      }
    }
    rdr.dispose()
    (w, h, out.result())
  }

  test("ImageIO frame-equality cross-check on the m17 fixture (all disposal methods + transparency)") {
    for (d <- Seq(0L, 1L, 2L, 3L, 7L, 13L, 42L)) {
      val bytes = Multimodal.gifCompositeFor(d)
      val (w, h, _, mine) = AssetCodecs.decodeGifFrames(bytes)
      val (rw, rh, ref) = imageioComposite(bytes)
      (w, h, mine.size) shouldBe ((rw, rh, ref.size))
      for (f <- mine.indices; y <- 0 until h; x <- 0 until w) {
        withClue(s"doc $d frame $f ($x,$y): ") {
          // identity palette: index v displays as grey (v,v,v)
          (mine(f)(y * w + x) & 0xff) * 0x010101 shouldBe ref(f)(y * w + x)
        }
      }
    }
  }

  test("hand-computed chain: draw, restore-to-background, restore-to-previous, transparency") {
    // 4x3 canvas, background 0
    val bytes = AssetCodecs.encodeGifAnimComposite(4, 3, 0, Seq(
      GifFrameSpec(0, 0, 4, 3, 1, -1, (x, y) => 10 + x + 4 * y), // keep
      GifFrameSpec(1, 1, 2, 1, 2, -1, (_, _) => 99),             // then clear rect to bg
      GifFrameSpec(0, 0, 2, 2, 3, -1, (_, _) => 77),             // then restore previous
      GifFrameSpec(2, 0, 2, 2, 0, 255,                            // transparency punchthrough
        (fx, fy) => if (fx == fy) 255 else 50)))
    val (w, h, _, fs) = AssetCodecs.decodeGifFrames(bytes)
    (w, h, fs.size) shouldBe ((4, 3, 4))
    def grid(f: Int): Seq[Int] = fs(f).map(_ & 0xff).toSeq
    val base = Seq(10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21)
    grid(0) shouldBe base
    grid(1) shouldBe Seq(10, 11, 12, 13, 14, 99, 99, 17, 18, 19, 20, 21)
    // frame 1's disposal=2 cleared its rect to 0 BEFORE frame 2 drew
    grid(2) shouldBe Seq(77, 77, 12, 13, 77, 77, 0, 17, 18, 19, 20, 21)
    // frame 2's disposal=3 restored the pre-frame-2 canvas (base with
    // (1,1)-(2,1) cleared to 0); frame 3's diagonal transparent pixels
    // show that canvas through: 12 at (2,0), 17 at (3,1)
    grid(3) shouldBe Seq(10, 11, 12, 50, 14, 0, 50, 17, 18, 19, 20, 21)
  }

  test("full-canvas no-GCE streams compose to exactly the per-frame images (m15 invariant)") {
    val pix = (f: Int, x: Int, y: Int) => (x * 5 + y * 11 + f * 19) % 256
    val (w, h, _, frames) = AssetCodecs.decodeGifFrames(
      AssetCodecs.encodeGifAnim(13, 7, 3, pix))
    for (f <- 0 until 3; y <- 0 until h; x <- 0 until w)
      (frames(f)(y * w + x) & 0xff) shouldBe pix(f, x, y)
  }

  test("frame rect outside the canvas rejects loudly") {
    val ok = AssetCodecs.encodeGifAnimComposite(8, 8, 0, Seq(
      GifFrameSpec(0, 0, 8, 8, 0, -1, (x, y) => x + y),
      GifFrameSpec(5, 5, 3, 3, 0, -1, (_, _) => 1)))
    AssetCodecs.decodeGifFrames(ok)._4.size shouldBe 2
    // patch the second frame's left position past the edge: walk to its
    // descriptor and bump the LE16 left from 5 to 6 (6+3 > 8)
    val patched = ok.clone
    var pos = 13 + 768
    var imgs = 0
    var target = -1
    while (target < 0) {
      (patched(pos) & 0xff) match {
        case 0x21 =>
          pos += 2
          while ((patched(pos) & 0xff) != 0) pos += 1 + (patched(pos) & 0xff)
          pos += 1
        case 0x2c =>
          imgs += 1
          if (imgs == 2) target = pos
          else {
            pos += 11
            while ((patched(pos) & 0xff) != 0) pos += 1 + (patched(pos) & 0xff)
            pos += 1
          }
        case b => fail(f"unexpected block 0x$b%02x")
      }
    }
    patched(target + 1) = 6
    val e = intercept[IllegalArgumentException](AssetCodecs.decodeGifFrames(patched))
    e.getMessage should include("outside")
  }
}
