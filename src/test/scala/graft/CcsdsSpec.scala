package graft

import graft.sources.Ccsds

/** CCSDS 121.0-B (AEC/Rice) codec: hand-built bitstream pins for every
  * option (zero-block run, ROS, split-sample, uncompressed, second
  * extension), round-trips over adversarial sample shapes, and the
  * reject battery. The wire pins decode byte arrays written out by hand
  * from the recommendation, so a matched encoder/decoder bug cannot
  * hide behind a round-trip.
  */
class CcsdsSpec extends SparkSpec {

  private val F = Ccsds.GribFlags

  test("wire pin: constant field encodes as ref + zero-block runs, exact bytes") {
    // n=8 blockSize=8 rsi=2, 32 samples of 77: two intervals, each
    // [ID=000][ref=01001101][selector 0][FS(run-1=1)=01]
    val enc = Ccsds.encode(Array.fill(32)(77), 8, 8, 2)
    enc shouldBe Array(0x09, 0xA4, 0x26, 0x90).map(_.toByte)
    Ccsds.decode(enc, 32, 8, 8, 2, F, "t") shouldBe Array.fill(32)(77)
  }

  test("wire pin: hand-built uncompressed block decodes") {
    // n=8 rsi=1 J=8: ID=111, ref=100, then 7 mapped deltas d=2 (Δ=+1)
    val bits = "111" + "01100100" + "00000010" * 7
    val bytes = bits.padTo((bits.length + 7) / 8 * 8, '0')
      .grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    Ccsds.decode(bytes, 8, 8, 8, 1, F, "t") shouldBe (100 to 107).toArray
  }

  test("wire pin: hand-built split k=1 block decodes") {
    // ID=010 (k=1), ref=100, 7 FS parts of d>>1=1 ('01'), then 7 LSBs '0'
    val bits = "010" + "01100100" + "01" * 7 + "0" * 7
    val bytes = bits.padTo((bits.length + 7) / 8 * 8, '0')
      .grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    Ccsds.decode(bytes, 8, 8, 8, 1, F, "t") shouldBe (100 to 107).toArray
  }

  test("wire pin: hand-built second-extension block decodes (ref slot discarded)") {
    // ID=000, ref=100, selector=1; positions 1..7 all d=2:
    // odd start pair codes m = b(b+1)/2 + b = 5; full pairs (2,2):
    // g=4, m = 10 + 2 = 12
    val bits = "000" + "01100100" + "1" +
      "000001" + ("0000000000001" * 3) // FS(5), then 3x FS(12)
    val bytes = bits.padTo((bits.length + 7) / 8 * 8, '0')
      .grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    Ccsds.decode(bytes, 8, 8, 8, 1, F, "t") shouldBe (100 to 107).toArray
  }

  test("wire pin: ROS zero-run (z=4) zeroes the rest of the segment") {
    // 48 samples, rsi=64: one interval of 6 blocks; ID=000, ref=50,
    // selector 0, FS(4) = 00001 -> rest-of-segment = all 6 blocks
    val bits = "000" + "00110010" + "0" + "00001"
    val bytes = bits.padTo((bits.length + 7) / 8 * 8, '0')
      .grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    Ccsds.decode(bytes, 48, 8, 8, 64, F, "t") shouldBe Array.fill(48)(50)
  }

  test("round-trips: constants, ramps, noise, spikes, full-range, ragged tails") {
    val r = new scala.util.Random(7)
    def data(n: Int, count: Int, kind: Int): Array[Int] = {
      val xmax = (1 << n) - 1
      kind match {
        case 0 => Array.fill(count)(xmax / 3)
        case 1 => Array.tabulate(count)(k => k % (xmax + 1))
        case 2 => Array.tabulate(count)(k => // smooth walk, clamped
          math.max(0, math.min(xmax, xmax / 2 + (k % 7) - 3 + (k / 13) % 5)))
        case 3 => Array.fill(count)(r.nextInt(xmax + 1))
        case 4 => Array.tabulate(count)(k => if (k % 97 == 13) xmax else 2)
      }
    }
    for (n <- Seq(8, 12, 16, 24); bs <- Seq(8, 16, 64); rsi <- Seq(1, 2, 128);
         count <- Seq(1, 7, 64, 1450); kind <- 0 to 4) {
      val xs = data(n, count, kind)
      val enc = Ccsds.encode(xs, n, bs, rsi)
      withClue(s"n=$n bs=$bs rsi=$rsi count=$count kind=$kind: ") {
        Ccsds.decode(enc, count, n, bs, rsi, F, "t") shouldBe xs
      }
    }
  }

  test("smooth fields compress well below the raw width") {
    val xs = Array.tabulate(4096)(k => 5000 + (k % 11) - 5) // 16-bit range
    val enc = Ccsds.encode(xs, 16, 32, 128)
    enc.length.toDouble should be < (4096 * 16 / 8 * 0.35)
    Ccsds.decode(enc, 4096, 16, 32, 128, F, "t") shouldBe xs
  }

  test("second extension is chosen and survives when deltas are sparse ±1") {
    // mapped deltas mostly 0 with occasional 1: SE beats split k=0
    val xs = Array.tabulate(512)(k => 40 + (if (k % 9 == 4) 1 else 0))
    val enc = Ccsds.encode(xs, 8, 8, 64)
    Ccsds.decode(enc, 512, 8, 8, 64, F, "t") shouldBe xs
    enc.length.toDouble should be < (512.0 / 4) // far below 1 bit/sample x4
  }

  test("corruption fuzz: every mutated stream rejects loudly or decodes — never tears") {
    // decode sees untrusted archive bytes: random single/double byte
    // flips must surface as IllegalArgumentException (the loud-reject
    // contract), never as index tears, wild allocations, or hangs
    val xs = Array.tabulate(1450)(k => (k * 37 + k / 7) % 4000)
    val enc = Ccsds.encode(xs, 12, 16, 64)
    val r = new scala.util.Random(41)
    var rejected = 0
    for (_ <- 0 until 300) {
      val c = enc.clone()
      val flips = 1 + r.nextInt(2)
      for (_ <- 0 until flips)
        c(r.nextInt(c.length)) = (c(r.nextInt(c.length)) ^ (1 << r.nextInt(8))).toByte
      try {
        val out = Ccsds.decode(c, xs.length, 12, 16, 64, F, "fuzz")
        out.length shouldBe xs.length // decoded (possibly wrong values) — fine
      } catch {
        case _: IllegalArgumentException => rejected += 1 // the loud contract
      }
    }
    (rejected > 0) shouldBe true // the fuzz actually exercised rejects
  }

  test("loud rejects: flags, widths, block sizes, truncation, range tears") {
    val xs = Array.tabulate(64)(k => k * 3 % 200)
    val enc = Ccsds.encode(xs, 8, 8, 2)
    def bad(f: => Any, frag: String): Unit =
      intercept[IllegalArgumentException](f).getMessage should include(frag)
    bad(Ccsds.decode(enc, 64, 8, 8, 2, F | Ccsds.FlagSigned, "t"), "signed")
    bad(Ccsds.decode(enc, 64, 8, 8, 2, F & ~Ccsds.FlagPreprocess, "t"), "unpreprocessed")
    bad(Ccsds.decode(enc, 64, 8, 8, 2, F & ~Ccsds.FlagMsb, "t"), "LSB")
    bad(Ccsds.decode(enc, 64, 28, 8, 2, F, "t"), "out of scope")
    bad(Ccsds.decode(enc, 64, 8, 12, 2, F, "t"), "block size")
    bad(Ccsds.encode(Array(300), 8, 8, 2), "outside")
    bad(Ccsds.decode(enc.take(2), 64, 8, 8, 2, F, "t"), "ccsds:")
    // a zero-run crossing the reference interval rejects
    val bits = "000" + "00110010" + "0" + "0000001" // z=6 -> 6 blocks, rsi=2
    val bytes = bits.padTo((bits.length + 7) / 8 * 8, '0').grouped(8)
      .map(s => Integer.parseInt(s, 2).toByte).toArray
    bad(Ccsds.decode(bytes, 48, 8, 8, 2, F, "t"), "crosses")
  }
}
