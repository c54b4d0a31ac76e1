package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sources.Jpeg2000

/** Lossless JPEG2000 codec laws (GRIB2 template 5.40, gate r16):
  * encode→decode must be the IDENTITY — that is what "reversible 5/3 +
  * no quantization + full Tier-1 passes" means — across shapes that
  * exercise every structural path: odd dims (asymmetric wavelet
  * splits), multiple code-blocks per subband (real tag trees), deep and
  * shallow decompositions, constant and adversarial fields. Pure JVM.
  */
class Jpeg2000Spec extends AnyFunSuite with Matchers {

  private def roundTrip(w: Int, h: Int, nbits: Int, levels: Int, cb: Int,
                        f: (Int, Int) => Int): Unit = {
    val src = Array.tabulate(w * h)(i => f(i % w, i / w) & ((1 << nbits) - 1))
    val bytes = Jpeg2000.encodeLossless(w, h, src, nbits, levels, cb)
    val (dw, dh, out) = Jpeg2000.decode(bytes)
    withClue(s"${w}x$h nbits=$nbits levels=$levels cb=$cb: ") {
      (dw, dh) shouldBe ((w, h))
      out.toSeq shouldBe src.toSeq
    }
  }

  test("round-trip: GRIB-shaped fields (29x13, 11 bits) across levels") {
    for (levels <- 0 to 3)
      roundTrip(29, 13, 11, levels, 32,
        (i, j) => (i * i * 3 + j * 17 + 41) % 1100)
  }

  test("round-trip: odd/degenerate dims exercise asymmetric wavelet splits") {
    for ((w, h) <- Seq((1, 1), (1, 7), (7, 1), (2, 2), (5, 5), (17, 3), (3, 17)))
      roundTrip(w, h, 8, math.min(2, math.max(0, math.min(w, h) - 1)), 16,
        (i, j) => (i * 37 + j * 91 + i * j) % 256)
  }

  test("round-trip: multiple code-blocks per subband (real tag trees)") {
    // 70x50 with cb=16: LL of a 1-level decomposition is 35x25 -> 3x2
    // code-block grid; detail bands similar — inclusion and zero-bitplane
    // tag trees have real internal nodes
    roundTrip(70, 50, 10, 1, 16, (i, j) => (i * 13 + j * j * 7 + 5) % 1024)
    roundTrip(70, 50, 10, 2, 16, (i, j) => (i * 13 + j * j * 7 + 5) % 1024)
  }

  test("round-trip: constant, zero, and extreme-value fields") {
    roundTrip(20, 20, 8, 2, 32, (_, _) => 0)       // all-zero: empty packets
    roundTrip(20, 20, 8, 2, 32, (_, _) => 255)     // full-scale constant
    roundTrip(20, 20, 8, 2, 32, (_, _) => 128)     // DC-shift boundary
    roundTrip(16, 16, 12, 2, 32,
      (i, j) => if ((i + j) % 2 == 0) 0 else 4095) // checkerboard extremes
  }

  test("round-trip: random fields, many seeds (MQ/context stress)") {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val w = 10 + rnd.nextInt(50); val h = 10 + rnd.nextInt(40)
      val nbits = 4 + rnd.nextInt(12)
      val levels = rnd.nextInt(4)
      roundTrip(w, h, nbits, levels, 32, (_, _) => rnd.nextInt(1 << nbits))
    }
  }

  test("round-trip: sparse fields (run-mode heavy) and single-spike fields") {
    roundTrip(40, 40, 10, 2, 32,
      (i, j) => if (i == 17 && j == 23) 1000 else 0)
    val rnd = new scala.util.Random(7)
    roundTrip(48, 36, 10, 2, 32,
      (_, _) => if (rnd.nextInt(50) == 0) rnd.nextInt(1024) else 0)
  }

  test("9/7 lifting identities (T.800 F.4.8.2): perfect reconstruction, vanishing moments, DC gain 1") {
    // perfect reconstruction within float noise on arbitrary signals,
    // odd and even lengths including the degenerate ones
    for (n <- Seq(1, 2, 3, 8, 13, 29)) {
      val x = Array.tabulate(n)(i => math.sin(i * 2.3 + n) * 500)
      val (l, h) = Jpeg2000.fwd97(x)
      val back = Jpeg2000.inv97(l, h)
      for (i <- 0 until n) back(i) shouldBe x(i) +- 1e-9
    }
    // constants: high-pass annihilates, low-pass DC gain exactly 1 (the
    // K = 1.230174104914001 normalization) — the all-zero-residual law
    // the r26 fixture exactness rests on
    val (lc, hc) = Jpeg2000.fwd97(Array.fill(17)(123.0))
    hc.foreach(_ shouldBe 0.0 +- 1e-9)
    lc.foreach(_ shouldBe 123.0 +- 1e-9)
    // linear ramps: the second vanishing moment kills interior details
    val (_, hr) = Jpeg2000.fwd97(Array.tabulate(32)(i => 3.0 * i + 7))
    hr.slice(2, hr.length - 2).foreach(_ shouldBe 0.0 +- 1e-9)
  }

  test("9/7 unquantized round-trip: constant fields EXACT, general fields within the rounding envelope") {
    // all-zero-residual: constants survive the lossy path bit-exactly
    for ((w, h, c, levels) <- Seq((29, 13, 170, 2), (8, 8, 3, 1), (31, 17, 200, 3), (1, 9, 40, 2))) {
      val src = Array.fill(w * h)(c)
      val (dw, dh, out) = Jpeg2000.decode(Jpeg2000.encodeLossy97(w, h, src, 8, levels))
      (dw, dh) shouldBe ((w, h))
      out.toSeq shouldBe src.toSeq
    }
    // arbitrary content: the only loss is coefficient rounding (Δ=1);
    // reconstruction stays within a small envelope of the source
    val src = Array.tabulate(40 * 30)(i => (i * 37 + (i * i) % 89) % 256)
    val (_, _, out) = Jpeg2000.decode(Jpeg2000.encodeLossy97(40, 30, src, 8, 2))
    val maxErr = out.zip(src).map { case (a, b) => math.abs(a - b) }.max
    maxErr should be <= 3
  }

  test("scalar-quantized subbands are rejected loudly; unknown transforms too") {
    val ok = Jpeg2000.encodeLossy97(8, 8, Array.fill(64)(5), 8, 1, 16)
    def markerAt(m: Int): Int = {
      var i = 0
      while (!((ok(i) & 0xff) == 0xFF && (ok(i + 1) & 0xff) == m)) i += 1
      i
    }
    // Sqcd style 2 (scalar expounded — NCEP's rate-targeted lossy mode)
    val quant = ok.clone()
    quant(markerAt(0x5C) + 4) = ((2 << 5) | 2).toByte
    val e = intercept[IllegalArgumentException](Jpeg2000.decode(quant))
    e.getMessage should include("Sqcd style")
    // an undefined transform byte rejects; 0 and 1 both decode
    val badX = ok.clone()
    badX(markerAt(0x52) + 2 + 12 - 1) = 2
    val e2 = intercept[IllegalArgumentException](Jpeg2000.decode(badX))
    e2.getMessage should include("transform")
  }

  test("fuzz: corrupted and truncated codestreams terminate (reject or decode), never hang") {
    // every decode path has a bounded loop or a loud require: single-bit
    // corruptions and truncations must finish promptly with SOME outcome
    // — an exception or a (possibly wrong-pixel) decode — never a spin
    // or an implausible allocation
    val base = Jpeg2000.encodeLossless(40, 30, Array.tabulate(1200)(i => (i * 37) % 1024), 10, 2, 16)
    val rnd = new scala.util.Random(11)
    var decoded = 0; var rejected = 0
    for (_ <- 1 to 300) {
      val mut = base.clone()
      val i = rnd.nextInt(mut.length)
      mut(i) = (mut(i) ^ (1 << rnd.nextInt(8))).toByte
      try { Jpeg2000.decode(mut); decoded += 1 }
      catch { case _: Exception | _: AssertionError => rejected += 1 }
    }
    for (cut <- Seq(3, 10, 45, 100, base.length / 2, base.length - 3)) {
      try { Jpeg2000.decode(base.take(cut)); decoded += 1 }
      catch { case _: Exception => rejected += 1 }
    }
    (decoded + rejected) shouldBe 306
    rejected should be >= 1 // the guards genuinely fire
  }

  test("multi-component and multi-tile codestreams are rejected") {
    val ok = Jpeg2000.encodeLossless(8, 8, Array.fill(64)(5), 8, 1, 16)
    // Csiz lives at fixed offset inside SIZ: SOC(2) + marker(2) + Lsiz(2)
    // + Rsiz(2) + 8 u32 = 40 -> Csiz at byte 40
    val multi = ok.clone()
    multi(41) = 3
    an[Exception] should be thrownBy Jpeg2000.decode(multi)
  }
}
