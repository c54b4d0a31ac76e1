package graft

import java.time.LocalDateTime

import graft.sources.Grib2

/** S6 at the byte level: the native GRIB2 codec (WMO FM-92 edition 2,
  * templates 3.0/4.0/5.0) — the reference's `wgrib2 -match -limit`
  * boundary (src/file-conversions.js:76-95) decoded in-engine.
  */
class Grib2Spec extends SparkSpec {

  private def field(cat: Int = 0, num: Int = 0, masked: Boolean = false,
                    d: Int = 1, base: Int = 0, scan: Int = 0x00): Grib2.Field = {
    val (la1, dj) = if (scan == 0x40) (40000000L - 4L * 2000000L, 2000000L)
                    else (40000000L, 2000000L)
    Grib2.Field(0, cat, num, LocalDateTime.of(2003, 6, 15, 12, 0),
      ni = 7, nj = 5, la1Micro = la1, lo1Micro = -25000000L,
      diMicro = 1500000L, djMicro = dj, decimalScale = d,
      Array.tabulate(35) { k =>
        val j = k / 7; val i = k % 7
        if (masked && (i + j) % 4 == 0) None else Some(base + i * 3 + j * 11)
      }, scanMode = scan)
  }

  private def write(fs: Grib2.Field*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    fs.foreach(f => out.write(Grib2.encodeMessage(f)))
    out.toByteArray
  }

  test("message framing: magic, edition 2, 64-bit total length, 7777 tail") {
    val bytes = write(field())
    new String(bytes.take(4), "US-ASCII") shouldBe "GRIB"
    (bytes(6) & 0xff) shouldBe 0  // discipline
    (bytes(7) & 0xff) shouldBe 2  // edition
    var total = 0L
    for (k <- 8 until 16) total = (total << 8) | (bytes(k) & 0xff)
    total shouldBe bytes.length.toLong
    new String(bytes.takeRight(4), "US-ASCII") shouldBe "7777"
  }

  test("round-trip: values, microdegree georeferencing, bitmap holes, names") {
    val recs = Grib2.parseMessages(write(field(), field(cat = 1, num = 7, masked = true)))
    recs should have length 2
    val Seq(tmp, prate) = recs
    tmp.variable shouldBe "TMP"
    prate.variable shouldBe "PRATE"
    tmp.time shouldBe LocalDateTime.of(2003, 6, 15, 12, 0)
    (tmp.ni, tmp.nj) shouldBe (7, 5)
    (tmp.la1Micro, tmp.lo1Micro, tmp.diMicro, tmp.djMicro) shouldBe
      ((40000000L, -25000000L, 1500000L, 2000000L))
    for (k <- 0 until 35) {
      val j = k / 7; val i = k % 7
      tmp.values(k) shouldBe (i * 3 + j * 11) / 10.0
      if ((i + j) % 4 == 0) prate.values(k).isNaN shouldBe true
      else prate.values(k) shouldBe (i * 3 + j * 11) / 10.0
    }
  }

  test("signed sign-magnitude fields: negative la1/lo1 and negative decimal scale") {
    // la2 derives from la1 in the encoder, so the corners stay consistent
    val recs = Grib2.parseMessages(
      write(field().copy(la1Micro = -10000000L, decimalScale = -1)))
    recs.head.la1Micro shouldBe -10000000L
    // D = −1 → value = x · 10
    recs.head.values(8) shouldBe (1 * 3 + 1 * 11) * 10.0
  }

  test("non-zero reference value (IEEE binary32) round-trips exactly") {
    val recs = Grib2.parseMessages(write(field(base = 5000)))
    recs.head.values(0) shouldBe 5000 / 10.0
    recs.head.values(34) shouldBe (5000 + 6 * 3 + 4 * 11) / 10.0
  }

  test("constant field packs nbits=0 and decodes to the reference value") {
    val f = field().copy(scaled = Array.fill(35)(Some(42)))
    Grib2.parseMessages(write(f)).head.values.toSeq shouldBe Seq.fill(35)(4.2)
  }

  test("scan mode 0x40 (south-to-north rows) georeferences correctly") {
    val recs = Grib2.parseMessages(write(field(scan = 0x40)))
    val r = recs.head
    r.scanJPositive shouldBe true
    val cells = Grib2.cells(r).toSeq
    // row j lives at la1 + j·dj going NORTH
    cells.head.lat shouldBe (40000000L - 4L * 2000000L) / 1e6
    cells.last.lat shouldBe 40.0
  }

  test("unsupported templates and scan modes are rejected loudly") {
    val bytes = write(field())
    // grid template octets 13-14 of section 3 (starts at 16 + 21)
    val s3 = 16 + 21
    val tpl = bytes.clone(); tpl(s3 + 13) = 1 // template 3.1
    an[Exception] should be thrownBy Grib2.parseMessages(tpl)
    val scan = bytes.clone(); scan(s3 + 71) = 0x20.toByte // j-fastest
    an[Exception] should be thrownBy Grib2.parseMessages(scan)
    val ed1 = bytes.clone(); ed1(7) = 1
    an[Exception] should be thrownBy Grib2.parseMessages(ed1)
  }

  test("corrupt structure rejected: bad total length, truncation, missing 7777") {
    val bytes = write(field())
    an[Exception] should be thrownBy Grib2.parseMessages(bytes.dropRight(6))
    val zeroLen = bytes.clone()
    for (k <- 8 until 16) zeroLen(k) = 0
    an[Exception] should be thrownBy Grib2.parseMessages(zeroLen)
  }

  // ---- complex packing (templates 5.2 / 5.3) ----

  /** Non-monotone field: sign-alternating jumps exercise negative
    * differences, a negative overall minimum, and per-group spreads that
    * vary enough to give distinct group widths.
    */
  private def bumpy(cat: Int = 0, num: Int = 0, masked: Boolean = false,
                    template: Int = 2, order: Int = 2,
                    groupLen: Int = 20): Grib2.Field = {
    Grib2.Field(0, cat, num, LocalDateTime.of(2003, 6, 15, 12, 0),
      ni = 13, nj = 9, la1Micro = 40000000L, lo1Micro = -25000000L,
      diMicro = 1500000L, djMicro = 2000000L, decimalScale = 1,
      Array.tabulate(117) { k =>
        if (masked && k % 6 == 5) None
        else Some(((k * k * 37 + k * 101) % 997 + (if (k % 3 == 0) 400 else 0)))
      }, template = template, sdOrder = order, groupLen = groupLen)
  }

  private def vals(f: Grib2.Field): Seq[Double] =
    Grib2.parseMessages(write(f)).head.values.toSeq

  test("template 5.2 complex packing decodes bit-identically to 5.0 simple packing") {
    vals(bumpy(template = 2)) shouldBe vals(bumpy(template = 0))
    // masked variant: bitmap interplay identical too (NaN-position-wise)
    val m2 = vals(bumpy(template = 2, masked = true))
    val m0 = vals(bumpy(template = 0, masked = true))
    m2.zip(m0).foreach { case (a, b) =>
      if (b.isNaN) a.isNaN shouldBe true else a shouldBe b
    }
  }

  test("template 5.3 spatial differencing (orders 1 and 2) reconstructs exactly") {
    vals(bumpy(template = 3, order = 1)) shouldBe vals(bumpy(template = 0))
    vals(bumpy(template = 3, order = 2)) shouldBe vals(bumpy(template = 0))
    // ragged last group + group length that doesn't divide the point count
    vals(bumpy(template = 3, order = 2, groupLen = 7)) shouldBe vals(bumpy(template = 0))
    // masked: differencing runs over PRESENT points only
    val m3 = vals(bumpy(template = 3, order = 2, masked = true))
    val m0 = vals(bumpy(template = 0, masked = true))
    m3.zip(m0).foreach { case (a, b) =>
      if (b.isNaN) a.isNaN shouldBe true else a shouldBe b
    }
  }

  test("complex packing: constant field gives width-0 groups and still round-trips") {
    def const(template: Int) = Grib2.Field(0, 0, 0,
      LocalDateTime.of(2003, 6, 15, 12, 0),
      ni = 7, nj = 5, la1Micro = 40000000L, lo1Micro = -25000000L,
      diMicro = 1500000L, djMicro = 2000000L, decimalScale = 1,
      Array.fill(35)(Some(420): Option[Int]), template = template)
    vals(const(2)) shouldBe Seq.fill(35)(42.0)
    vals(const(3)) shouldBe Seq.fill(35)(42.0)
  }

  test("complex packing rejects unsupported missing-value management loudly") {
    val bytes = write(bumpy(template = 2))
    // walk sections to find section 5, flip its missing-mgmt octet (23)
    var pos = 16
    def u32(i: Int) = ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
      ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
    while ((bytes(pos + 4) & 0xff) != 5) pos += u32(pos)
    val bad = bytes.clone(); bad(pos + 22) = 1 // primary missing values
    val e = intercept[IllegalArgumentException](Grib2.parseMessages(bad))
    e.getMessage should include("missing-value management")
  }

  test("template 5.40 JPEG2000 lossless decodes bit-identically to 5.0 simple packing") {
    // the full J2K path — 5/3 wavelet, MQ bitplane coding, tag-tree
    // packet headers — must reproduce exactly what simple packing stores
    vals(bumpy(template = 40)) shouldBe vals(bumpy(template = 0))
    // negative decimal scale and nonzero base through the 5.40 path too
    val f = field(d = -1, base = 100).copy(template = 40)
    Grib2.parseMessages(write(f)).head.values.toSeq shouldBe
      Grib2.parseMessages(write(field(d = -1, base = 100))).head.values.toSeq
  }

  test("template 5.40 at multi-code-block grid size (96x64) reconstructs exactly") {
    // a grid whose subbands span SEVERAL 32x32 code-blocks exercises the
    // real tag trees and per-block packet-header fields through the GRIB
    // integration, not just the codec spec
    val f = Grib2.Field(0, 0, 0, LocalDateTime.of(2004, 3, 1, 0, 0),
      ni = 96, nj = 64, la1Micro = 40000000L, lo1Micro = -25000000L,
      diMicro = 500000L, djMicro = 500000L, decimalScale = 1,
      Array.tabulate(96 * 64) { k =>
        val j = k / 96; val i = k % 96
        Some((i * i * 3 + j * 17 + 7) % 1100)
      }, template = 40)
    val g = f.copy(template = 0)
    Grib2.parseMessages(write(f)).head.values.toSeq shouldBe
      Grib2.parseMessages(write(g)).head.values.toSeq
  }

  test("template 5.40 lossy (type 1, 9/7): constants decode bit-identically to simple packing; scope rejects") {
    // the writer refuses masked 5.40 fields (image geometry is ambiguous)
    an[IllegalArgumentException] should be thrownBy
      write(bumpy(template = 40, masked = true))
    an[IllegalArgumentException] should be thrownBy
      write(bumpy(template = 140, masked = true))
    // all-zero-residual law: a constant field survives the 9/7 Δ=1
    // lossy path EXACTLY, so template-140 messages equal their
    // simple-packed twins value for value
    def const(c: Int, template: Int) =
      Grib2.Field(0, 0, 0, LocalDateTime.of(2003, 6, 15, 12, 0),
        ni = 13, nj = 9, la1Micro = 40000000L, lo1Micro = -25000000L,
        diMicro = 1500000L, djMicro = 2000000L, decimalScale = 1,
        Array.fill(117)(Some(c)), template = template)
    for (c <- Seq(3, 170, 999)) {
      Grib2.parseMessages(write(const(c, 140))).head.values.toSeq shouldBe
        Grib2.parseMessages(write(const(c, 0))).head.values.toSeq
    }
    // ... and the emitted compression-type octet really says 1 (lossy)
    val bytes = write(const(170, 140))
    def u32(i: Int): Int =
      ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
        ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
    var pos = 16
    while ((bytes(pos + 4) & 0xff) != 5) pos += u32(pos)
    (bytes(pos + 21) & 0xff) shouldBe 1
    // an unknown compression-type octet still rejects with a pointer
    val bad = bytes.clone(); bad(pos + 21) = 7
    val e = intercept[IllegalArgumentException](Grib2.parseMessages(bad))
    e.getMessage should include("compression type")
    // general (non-constant) content through the lossy path stays within
    // the coefficient-rounding envelope of its lossless twin
    val lossyVals = Grib2.parseMessages(write(bumpy(template = 140))).head.values
    val exactVals = Grib2.parseMessages(write(bumpy(template = 40))).head.values
    lossyVals.zip(exactVals).foreach { case (a, b) =>
      math.abs(a - b) should be <= 0.4 // 3 int steps at decimalScale 1
    }
  }

  test("template 5.41 PNG packing decodes bit-identically to 5.0; scope rejects loudly") {
    // values bounded < 256: the 8-bit greyscale PNG scope
    def small(template: Int, masked: Boolean = false) =
      Grib2.Field(0, 0, 0, LocalDateTime.of(2003, 6, 15, 12, 0),
        ni = 13, nj = 9, la1Micro = 40000000L, lo1Micro = -25000000L,
        diMicro = 1500000L, djMicro = 2000000L, decimalScale = 1,
        Array.tabulate(117) { k =>
          if (masked && k % 6 == 5) None else Some((k * 37 + 11) % 251)
        }, template = template)
    Grib2.parseMessages(write(small(41))).head.values.toSeq shouldBe
      Grib2.parseMessages(write(small(0))).head.values.toSeq
    // negative decimal scale through the PNG path too
    val f = field(d = -1, base = 100).copy(template = 41)
    Grib2.parseMessages(write(f)).head.values.toSeq shouldBe
      Grib2.parseMessages(write(field(d = -1, base = 100))).head.values.toSeq
    // a wider-than-8-bit field packs as 16-BIT greyscale (wgrib2's
    // depth ladder) and still decodes bit-identically to simple packing
    Grib2.parseMessages(write(bumpy(template = 41))).head.values.toSeq shouldBe
      Grib2.parseMessages(write(bumpy(template = 0))).head.values.toSeq
    // ... and the section-7 payload really is a 16-bit PNG (IHDR depth)
    val b41 = write(bumpy(template = 41))
    def u32(i: Int) =
      ((b41(i) & 0xff) << 24) | ((b41(i + 1) & 0xff) << 16) |
        ((b41(i + 2) & 0xff) << 8) | (b41(i + 3) & 0xff)
    var pos = 16
    while ((b41(pos + 4) & 0xff) != 7) pos += u32(pos)
    new String(b41, pos + 5 + 1, 3, "US-ASCII") shouldBe "PNG"
    (b41(pos + 5 + 24) & 0xff) shouldBe 16 // IHDR bit depth octet
    // a >16-bit field rejects loudly rather than truncating
    val wide = small(41).copy(scaled = Array.tabulate(117)(k =>
      Some(if (k == 0) 70000 else (k * 37 + 11) % 251)))
    an[IllegalArgumentException] should be thrownBy write(wide)
    // masked 5.41 rejects (dense fields only, like 5.40)
    an[IllegalArgumentException] should be thrownBy
      write(small(41, masked = true))
  }

  test("template 5.42 CCSDS decodes bit-identically to 5.0; bitmap composes; octet pins") {
    // dense, masked (5.42 packs present cells only — unlike the image
    // templates a bitmap composes), and a larger bumpy field
    Grib2.parseMessages(write(bumpy(template = 42))).head.values.toSeq shouldBe
      Grib2.parseMessages(write(bumpy(template = 0))).head.values.toSeq
    val mask42 = Grib2.parseMessages(write(bumpy(masked = true, template = 42))).head.values
    val mask0 = Grib2.parseMessages(write(bumpy(masked = true, template = 0))).head.values
    mask42.length shouldBe mask0.length
    mask42.zip(mask0).foreach { case (a, b) =>
      if (b.isNaN) a.isNaN shouldBe true else a shouldBe b
    }
    // negative decimal scale too
    Grib2.parseMessages(write(field(d = -1, base = 100).copy(template = 42)))
      .head.values.toSeq shouldBe
      Grib2.parseMessages(write(field(d = -1, base = 100))).head.values.toSeq
    // constant field: nbits = 0, empty section 7, values = R/10^D
    val const = bumpy(template = 42).copy(scaled = Array.fill(117)(Some(120)))
    Grib2.parseMessages(write(const)).head.values.foreach(_ shouldBe 12.0)
    // section-5 octet pins: template 42, eccodes' flags/block/RSI
    val bytes = write(bumpy(template = 42))
    def u32(i: Int) = ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
      ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
    var pos = 16
    while ((bytes(pos + 4) & 0xff) != 5) pos += u32(pos)
    ((bytes(pos + 9) & 0xff) << 8 | (bytes(pos + 10) & 0xff)) shouldBe 42
    (bytes(pos + 21) & 0xff) shouldBe 12 // AEC_DATA_MSB | AEC_DATA_PREPROCESS
    (bytes(pos + 22) & 0xff) shouldBe 32 // block size
    ((bytes(pos + 23) & 0xff) << 8 | (bytes(pos + 24) & 0xff)) shouldBe 128 // RSI
    // a signed-flag stream rejects loudly rather than mis-decoding
    val bad = bytes.clone(); bad(pos + 21) = (12 | 1).toByte
    intercept[IllegalArgumentException](Grib2.parseMessages(bad))
      .getMessage should include("signed")
    // >24-bit fields reject loudly
    val wide = bumpy(template = 42).copy(scaled = Array.tabulate(117)(k =>
      Some(if (k == 0) (1 << 25) else k)))
    an[IllegalArgumentException] should be thrownBy write(wide)
  }

  test("ensemble templates 4.1/4.11: octet pins, per-record member state") {
    val m1 = field(cat = 0, num = 0).copy(ensMember = 3, ensSize = 10)
    val m2 = field(cat = 1, num = 7).copy(ensMember = 7, ensSize = 10,
      statProcess = 1, intervalHours = 24)
    val det = field(cat = 2, num = 2)
    val bytes = write(m1, m2, det)
    val recs = Grib2.parseMessages(bytes)
    recs.map(_.ensMember) shouldBe Seq(3, 7, -1)
    recs.map(_.ensSize) shouldBe Seq(10, 10, 0)
    recs(1).statProcess shouldBe 1 // 4.11 keeps the statistical tail
    recs(1).rangeHours shouldBe 24
    // octet pins on the first message's product section: pdt=1 at
    // octets 8-9, member/size at octets 36/37
    def u32(i: Int) = ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
      ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
    var pos = 16
    while ((bytes(pos + 4) & 0xff) != 4) pos += u32(pos)
    ((bytes(pos + 7) & 0xff) << 8 | (bytes(pos + 8) & 0xff)) shouldBe 1
    (bytes(pos + 35) & 0xff) shouldBe 3 // member
    (bytes(pos + 36) & 0xff) shouldBe 10 // ensemble size
    // values decode identically to the deterministic twin
    recs(0).values.toSeq shouldBe
      Grib2.parseMessages(write(field(cat = 0, num = 0))).head.values.toSeq
    // malformed member (> size) refuses at write
    an[IllegalArgumentException] should be thrownBy
      write(field().copy(ensMember = 11, ensSize = 10))
    // derived products (4.2 / 4.12): type + count octets, stat tail shift
    val dm = field(cat = 0, num = 0).copy(derivedType = 0, ensSize = 10)
    val ds = field(cat = 1, num = 8).copy(derivedType = 4, ensSize = 10,
      statProcess = 1, intervalHours = 24)
    val drecs = Grib2.parseMessages(write(dm, ds))
    drecs.map(_.derivedType) shouldBe Seq(0, 4)
    drecs.map(r => Grib2.derivedNameOf(r.derivedType)) shouldBe Seq("mean", "spread")
    drecs.map(_.ensSize) shouldBe Seq(10, 10)
    drecs.map(_.ensMember) shouldBe Seq(-1, -1)
    drecs(1).statProcess shouldBe 1 // 4.12's 2-octet-shifted tail parses
    drecs(1).rangeHours shouldBe 24
    val db = write(dm)
    var dpos = 16
    def du32(i: Int) = ((db(i) & 0xff) << 24) | ((db(i + 1) & 0xff) << 16) |
      ((db(i + 2) & 0xff) << 8) | (db(i + 3) & 0xff)
    while ((db(dpos + 4) & 0xff) != 4) dpos += du32(dpos)
    ((db(dpos + 7) & 0xff) << 8 | (db(dpos + 8) & 0xff)) shouldBe 2 // pdt 4.2
    (db(dpos + 34) & 0xff) shouldBe 0 // derived type (octet 35)
    (db(dpos + 35) & 0xff) shouldBe 10 // forecast count (octet 36)
    // a field cannot be both a member and a derived product
    an[IllegalArgumentException] should be thrownBy
      write(field().copy(ensMember = 1, ensSize = 4, derivedType = 0))
  }

  test("probability/percentile templates 4.5/4.9/4.10: octet pins, limits, tail shift") {
    val pAbove = field(cat = 0, num = 0).copy(probType = 1, probNumber = 1,
      probTotal = 3, probLowerScale = -127, probLowerScaled = -0x7fffffffL,
      probUpperScale = 2, probUpperScaled = 27315) // 273.15
    val pBetween = field(cat = 1, num = 7).copy(probType = 2, probNumber = 2,
      probTotal = 3, probLowerScale = 1, probLowerScaled = 5,
      probUpperScale = 0, probUpperScaled = -12, // negative limit: -12.0
      statProcess = 1, intervalHours = 24)
    val pct = field(cat = 2, num = 2).copy(percentile = 90,
      statProcess = 0, intervalHours = 6)
    val det = field(cat = 2, num = 3)
    val bytes = write(pAbove, pBetween, pct, det)
    val recs = Grib2.parseMessages(bytes)
    recs.map(_.probType) shouldBe Seq(1, 2, -1, -1)
    recs.map(_.probNumber) shouldBe Seq(1, 2, -1, -1)
    recs.map(_.probTotal) shouldBe Seq(3, 3, 0, 0)
    recs(0).probLower.isNaN shouldBe true // all-ones wire pattern = unused
    recs(0).probUpper shouldBe 273.15
    recs(1).probLower shouldBe 0.5
    recs(1).probUpper shouldBe -12.0 // sign-magnitude scaled value
    recs(1).statProcess shouldBe 1 // 4.9's 13-octet-shifted tail parses
    recs(1).rangeHours shouldBe 24
    recs.map(_.percentile) shouldBe Seq(-1, -1, 90, -1)
    recs(2).statProcess shouldBe 0 // 4.10's 1-octet-shifted tail parses
    recs(2).rangeHours shouldBe 6
    Grib2.probNameOf(recs(0).probType) shouldBe "above_upper"
    Grib2.probNameOf(recs(1).probType) shouldBe "between"
    // octet pins on the first message's product section: pdt=5 at
    // octets 8-9; number/total/type at 35/36/37; the lower limit's
    // scale+value all-ones; the upper limit's scale 2, value 27315
    def u32(i: Int) = ((bytes(i) & 0xff).toLong << 24) | ((bytes(i + 1) & 0xff) << 16) |
      ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
    var pos = 16
    while ((bytes(pos + 4) & 0xff) != 4) pos += u32(pos).toInt
    ((bytes(pos + 7) & 0xff) << 8 | (bytes(pos + 8) & 0xff)) shouldBe 5
    (bytes(pos + 34) & 0xff) shouldBe 1 // probability number
    (bytes(pos + 35) & 0xff) shouldBe 3 // total probabilities
    (bytes(pos + 36) & 0xff) shouldBe 1 // Code Table 4.9 type
    (bytes(pos + 37) & 0xff) shouldBe 0xff // lower scale: all-ones
    u32(pos + 38) shouldBe 0xffffffffL // lower value: all-ones
    (bytes(pos + 42) & 0xff) shouldBe 2 // upper scale
    u32(pos + 43) shouldBe 27315L // upper scaled value
    // 4.9 pins (own message): pdt 9; negative upper limit sign-magnitude
    val b2 = write(pBetween)
    def v32(i: Int) = ((b2(i) & 0xff).toLong << 24) | ((b2(i + 1) & 0xff) << 16) |
      ((b2(i + 2) & 0xff) << 8) | (b2(i + 3) & 0xff)
    var p2 = 16
    while ((b2(p2 + 4) & 0xff) != 4) p2 += v32(p2).toInt
    ((b2(p2 + 7) & 0xff) << 8 | (b2(p2 + 8) & 0xff)) shouldBe 9
    (b2(p2 + 42) & 0xff) shouldBe 0 // upper scale 0
    v32(p2 + 43) shouldBe 0x8000000cL // sign-magnitude -12
    (b2(p2 + 54) & 0xff) shouldBe 1 // one time-range spec (octet 55 = 42+13)
    // values decode identically to the deterministic twin
    recs(0).values.toSeq shouldBe det.scaled.flatten.map(_ / 10.0).toSeq
    // write-side validation refuses malformed products
    an[IllegalArgumentException] should be thrownBy
      write(field().copy(probType = 5, probTotal = 1))
    an[IllegalArgumentException] should be thrownBy
      write(field().copy(percentile = 101))
    an[IllegalArgumentException] should be thrownBy
      write(field().copy(probType = 1, probTotal = 1, percentile = 50))
  }

  test("grid template 3.30 Lambert conformal: octet pins, inverse round-trip, rejects") {
    val lcc = Grib2.LambertGrid(latin1Micro = 25000000L, latin2Micro = 25000000L,
      lovMicro = 265000000L, ladMicro = 25000000L,
      dxMilli = 12000000L, dyMilli = 12000000L) // tangent cone (n = sin 25)
    val f = Grib2.Field(0, 0, 0, LocalDateTime.of(2008, 3, 1, 0, 0),
      ni = 6, nj = 4, la1Micro = 30000000L, lo1Micro = 260000000L,
      diMicro = 0L, djMicro = 0L, decimalScale = 1,
      Array.tabulate(24)(k => Some(k * 5 % 90)), scanMode = 0x40, lambert = lcc)
    val bytes = write(f)
    def u32(i: Int) = ((bytes(i) & 0xff).toLong << 24) | ((bytes(i + 1) & 0xff) << 16) |
      ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
    var pos = 16
    while ((bytes(pos + 4) & 0xff) != 3) pos += u32(pos).toInt
    ((bytes(pos + 12) & 0xff) << 8 | (bytes(pos + 13) & 0xff)) shouldBe 30 // template
    (bytes(pos + 14) & 0xff) shouldBe 6 // earth shape: sphere 6371229 m
    u32(pos + 30) shouldBe 6L // Nx
    u32(pos + 34) shouldBe 4L // Ny
    u32(pos + 38) shouldBe 30000000L // La1
    u32(pos + 42) shouldBe 260000000L // Lo1
    u32(pos + 47) shouldBe 25000000L // LaD (octets 48-51)
    u32(pos + 51) shouldBe 265000000L // LoV
    u32(pos + 55) shouldBe 12000000L // Dx mm
    (bytes(pos + 63) & 0xff) shouldBe 0 // projection centre: north pole
    (bytes(pos + 64) & 0xff) shouldBe 0x40 // scan
    u32(pos + 65) shouldBe 25000000L // Latin1
    u32(pos + 69) shouldBe 25000000L // Latin2
    val rec = Grib2.parseMessages(bytes).head
    rec.cellLats should not be null
    val cs = Grib2.cells(rec).toSeq
    cs.size shouldBe 24
    // the first grid point's inverse reproduces (La1, Lo1) to sub-µdeg
    cs.head.lat shouldBe 30.0 +- 1e-7
    cs.head.lon shouldBe 260.0 +- 1e-7
    // +x along the first row moves east; +y toward the pole moves north
    (cs(1).lon > cs.head.lon) shouldBe true
    (cs(6).lat > cs.head.lat) shouldBe true
    cs.map(_.value) shouldBe (0 until 24).map(k => (k * 5 % 90) / 10.0)
    // secant cone decodes through the general n formula too
    val sec = Grib2.parseMessages(write(f.copy(lambert =
      lcc.copy(latin1Micro = 20000000L, latin2Micro = 40000000L)))).head
    Grib2.cells(sec).next().lat shouldBe 30.0 +- 1e-7
    // rejects: south-pole centre flag, bad earth shape, bogus scan
    val bad1 = bytes.clone(); bad1(pos + 63) = 0x80.toByte
    intercept[IllegalArgumentException](Grib2.parseMessages(bad1))
      .getMessage should include("projection centre")
    val bad2 = bytes.clone(); bad2(pos + 14) = 2
    intercept[IllegalArgumentException](Grib2.parseMessages(bad2))
      .getMessage should include("earth shape")
    // writer refuses a Lambert + Gaussian hybrid and zero steps
    an[IllegalArgumentException] should be thrownBy
      write(f.copy(gaussianN = 2))
    an[IllegalArgumentException] should be thrownBy
      write(f.copy(lambert = lcc.copy(dxMilli = 0)))
  }

  test("grid template 3.1 rotated lat/lon: COSMO-EU anchors, octet pins, angle reject") {
    // the COSMO-EU rotation: southern pole (-40, 10) = rotated north
    // pole (40, -170); anchors computed independently (spherical
    // trig by hand): rotated (0,0) -> (50N, 10E); rotated (0,10) ->
    // (48.9740N, 25.3402E) — a cell EAST of the rotated origin lands
    // EAST in true coordinates (the orientation a mirrored oracle
    // could not catch)
    val rot = Grib2.RotatedGrid(spLatMicro = -40000000L, spLonMicro = 10000000L)
    val f = Grib2.Field(0, 0, 0, LocalDateTime.of(2008, 6, 1, 0, 0),
      ni = 3, nj = 2, la1Micro = 0L, lo1Micro = 0L,
      diMicro = 10000000L, djMicro = 10000000L, decimalScale = 1,
      Array.tabulate(6)(k => Some(k * 9 % 50)), scanMode = 0x40, rotated = rot)
    val bytes = write(f)
    def u32(i: Int) = ((bytes(i) & 0xff).toLong << 24) | ((bytes(i + 1) & 0xff) << 16) |
      ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
    var pos = 16
    while ((bytes(pos + 4) & 0xff) != 3) pos += u32(pos).toInt
    ((bytes(pos + 12) & 0xff) << 8 | (bytes(pos + 13) & 0xff)) shouldBe 1 // template
    u32(pos + 72) shouldBe (0x80000000L | 40000000L) // southern pole lat -40
    u32(pos + 76) shouldBe 10000000L // southern pole lon
    u32(pos + 80) shouldBe 0L // rotation angle
    val cs = Grib2.cells(Grib2.parseMessages(bytes).head).toSeq
    cs.size shouldBe 6
    cs.head.lat shouldBe 50.0 +- 1e-9 // rotated origin -> COSMO-EU center
    cs.head.lon shouldBe 10.0 +- 1e-9
    cs(1).lat shouldBe 48.9735386 +- 1e-6 // rotated (0,10), independent trig
    cs(1).lon shouldBe 25.3398145 +- 1e-6
    (cs(1).lon > cs.head.lon) shouldBe true // east stays east
    (cs(3).lat > cs.head.lat) shouldBe true // rotated north goes north
    cs.map(_.value) shouldBe (0 until 6).map(k => (k * 9 % 50) / 10.0)
    // non-zero rotation angle rejects loudly
    val bad = bytes.clone(); bad(pos + 83) = 1
    intercept[IllegalArgumentException](Grib2.parseMessages(bad))
      .getMessage should include("rotation angle")
  }

  test("grid template 3.10 Mercator: octet pins, inverse round-trip, rotation reject") {
    val mc = Grib2.MercatorGrid(ladMicro = 0L, diMilli = 50000000L,
      djMilli = 50000000L) // true scale at the equator
    val f = Grib2.Field(0, 0, 0, LocalDateTime.of(2008, 5, 1, 0, 0),
      ni = 6, nj = 5, la1Micro = -10000000L, lo1Micro = 120000000L,
      diMicro = 0L, djMicro = 0L, decimalScale = 1,
      Array.tabulate(30)(k => Some(k * 3 % 70)), scanMode = 0x40, mercator = mc)
    val bytes = write(f)
    def u32(i: Int) = ((bytes(i) & 0xff).toLong << 24) | ((bytes(i + 1) & 0xff) << 16) |
      ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
    var pos = 16
    while ((bytes(pos + 4) & 0xff) != 3) pos += u32(pos).toInt
    ((bytes(pos + 12) & 0xff) << 8 | (bytes(pos + 13) & 0xff)) shouldBe 10
    u32(pos + 38) shouldBe (0x80000000L | 10000000L) // La1 = -10 sign-magnitude
    u32(pos + 42) shouldBe 120000000L // Lo1
    u32(pos + 47) shouldBe 0L // LaD
    (bytes(pos + 59) & 0xff) shouldBe 0x40 // scan
    u32(pos + 60) shouldBe 0L // orientation
    u32(pos + 64) shouldBe 50000000L // Di mm
    val rec = Grib2.parseMessages(bytes).head
    val cs = Grib2.cells(rec).toSeq
    cs.size shouldBe 30
    cs.head.lat shouldBe -10.0 +- 1e-7
    cs.head.lon shouldBe 120.0 +- 1e-7
    // equatorial true scale: one 50 km x-step ~ 0.44966 degrees of lon
    cs(1).lon - cs.head.lon shouldBe (50000.0 / 6371229.0).toDegrees +- 1e-9
    (cs(6).lat > cs.head.lat) shouldBe true // +y northward
    cs.map(_.value) shouldBe (0 until 30).map(k => (k * 3 % 70) / 10.0)
    // rotated Mercator rejects loudly (orientation octets 61-64)
    val bad = bytes.clone(); bad(pos + 62) = 1
    intercept[IllegalArgumentException](Grib2.parseMessages(bad))
      .getMessage should include("rotated Mercator")
  }

  test("grid template 3.20 polar stereographic: octet pins, inverse round-trip, rejects") {
    val ps = Grib2.PolarGrid(lovMicro = 210000000L, ladMicro = 60000000L,
      dxMilli = 47500000L, dyMilli = 47500000L)
    val f = Grib2.Field(0, 0, 0, LocalDateTime.of(2008, 4, 1, 0, 0),
      ni = 5, nj = 4, la1Micro = 45000000L, lo1Micro = 200000000L,
      diMicro = 0L, djMicro = 0L, decimalScale = 1,
      Array.tabulate(20)(k => Some(k * 7 % 80)), scanMode = 0x40, polar = ps)
    val bytes = write(f)
    def u32(i: Int) = ((bytes(i) & 0xff).toLong << 24) | ((bytes(i + 1) & 0xff) << 16) |
      ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
    var pos = 16
    while ((bytes(pos + 4) & 0xff) != 3) pos += u32(pos).toInt
    ((bytes(pos + 12) & 0xff) << 8 | (bytes(pos + 13) & 0xff)) shouldBe 20
    u32(pos + 30) shouldBe 5L // Nx
    u32(pos + 38) shouldBe 45000000L // La1
    u32(pos + 47) shouldBe 60000000L // LaD
    u32(pos + 51) shouldBe 210000000L // LoV
    u32(pos + 55) shouldBe 47500000L // Dx mm
    (bytes(pos + 63) & 0xff) shouldBe 0 // north-pole centre
    (bytes(pos + 64) & 0xff) shouldBe 0x40
    val rec = Grib2.parseMessages(bytes).head
    val cs = Grib2.cells(rec).toSeq
    cs.size shouldBe 20
    cs.head.lat shouldBe 45.0 +- 1e-7 // first point inverts exactly
    cs.head.lon shouldBe 200.0 +- 1e-7
    (cs(5).lat > cs.head.lat) shouldBe true // +y runs toward the pole
    cs.map(_.value) shouldBe (0 until 20).map(k => (k * 7 % 80) / 10.0)
    // south-pole centre rejects loudly
    val bad = bytes.clone(); bad(pos + 63) = 0x80.toByte
    intercept[IllegalArgumentException](Grib2.parseMessages(bad))
      .getMessage should include("projection centre")
    // a field cannot be polar AND Lambert
    an[IllegalArgumentException] should be thrownBy
      f.copy(lambert = Grib2.LambertGrid(1, 1, 1, 1, 1, 1))
  }

  test("reduced Gaussian grid: missing-ni + row list octet pins, ragged cells") {
    // N=8 (16 rows), realistic pole-shrunk row counts, all dividing
    // 360e6 so row longitudes are exact micro-degrees
    val rows = Seq(8, 10, 12, 15, 16, 18, 20, 20, 20, 20, 18, 16, 15, 12, 10, 8)
    val offs = rows.scanLeft(0)(_ + _)
    def cellVal(j: Int, i: Int): Int = (i * 7 + j * 31) % 900
    val f = Grib2.Field(0, 0, 0, LocalDateTime.of(2005, 9, 1, 0, 0),
      ni = 20, nj = 16, la1Micro = 0L, lo1Micro = 0L,
      diMicro = 0L, djMicro = 0L, decimalScale = 1,
      Array.tabulate(rows.sum) { k =>
        val j = offs.lastIndexWhere(_ <= k) min 15
        Some(cellVal(j, k - offs(j)))
      }, gaussianN = 8, reducedNi = rows)
    val bytes = write(f)
    // wire pins: walk to section 3 — ni octets 31-34 all-ones, octet 11
    // (list width) = 2, octet 12 (interpretation) = 1, list after octet 72
    def u32(i: Int) = ((bytes(i) & 0xff).toLong << 24) | ((bytes(i + 1) & 0xff) << 16) |
      ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
    var pos = 16
    while ((bytes(pos + 4) & 0xff) != 3) pos += u32(pos).toInt
    (bytes(pos + 10) & 0xff) shouldBe 2
    (bytes(pos + 11) & 0xff) shouldBe 1
    u32(pos + 30) shouldBe 0xffffffffL // ni missing
    u32(pos + 6) shouldBe rows.sum.toLong // point total = row-list sum
    ((bytes(pos + 72) & 0xff) << 8 | (bytes(pos + 73) & 0xff)) shouldBe 8 // row 0 count
    ((bytes(pos + 72 + 2 * 15) & 0xff) << 8 | (bytes(pos + 73 + 2 * 15) & 0xff)) shouldBe 8
    // parse: ragged cells, full-circle rows at 360/nij spacing
    val rec = Grib2.parseMessages(bytes).head
    rec.rowNi.toSeq shouldBe rows
    val cs = Grib2.cells(rec).toSeq
    cs.size shouldBe rows.sum
    // row 0 (lat = first Gaussian abscissa) has 8 points at 45-degree steps
    val northLat = cs.map(_.lat).max
    val row0 = cs.filter(_.lat == northLat).sortBy(_.lon)
    row0.map(_.lon) shouldBe (0 until 8).map(_ * 45.0)
    row0.map(_.value) shouldBe (0 until 8).map(i => cellVal(0, i) / 10.0)
    // a corrupted point total rejects loudly
    val bad = bytes.clone(); bad(pos + 9) = (bad(pos + 9) ^ 1).toByte
    intercept[IllegalArgumentException](Grib2.parseMessages(bad))
      .getMessage should include("disagrees with the row list")
  }

  test("product template 4.8: octet pins, stat state per record, 4.0 interleave") {
    val acc = field(cat = 1, num = 8).copy(statProcess = 1, intervalHours = 24)
    val bytes = Grib2.encodeMessage(acc)
    // walk to section 4 and pin the statistical octets against the spec
    var pos = 16
    def u(i: Int) = bytes(i) & 0xff
    def u16(i: Int) = (u(i) << 8) | u(i + 1)
    def u32(i: Int) = (u16(i).toLong << 16) | u16(i + 2)
    while (u(pos + 4) != 4) pos += u32(pos).toInt
    u32(pos) shouldBe 58L                 // 4.8 with one range spec = 58 octets
    u16(pos + 7) shouldBe 8               // product definition template 4.8
    u16(pos + 34) shouldBe 2003           // end-of-interval year (octets 35-36)
    (u(pos + 36), u(pos + 37)) shouldBe ((6, 16))  // month, day: +24 h
    u(pos + 38) shouldBe 12               // hour
    u(pos + 41) shouldBe 1                // one time-range specification
    u(pos + 46) shouldBe 1                // stat process 1 = accumulation
    u(pos + 48) shouldBe 1                // range unit = hour
    u32(pos + 49) shouldBe 24L            // range length
    // decode: stat columns per record; a 4.0 record in the same stream
    // stays instantaneous
    val recs = Grib2.parseMessages(write(acc, field(cat = 2, num = 2)))
    recs should have length 2
    recs(0).statProcess shouldBe 1
    recs(0).intervalEnd shouldBe LocalDateTime.of(2003, 6, 16, 12, 0)
    recs(0).rangeHours shouldBe 24
    recs(0).variable shouldBe "APCP"
    recs(0).time shouldBe LocalDateTime.of(2003, 6, 15, 12, 0) // interval start
    recs(1).statProcess shouldBe -1
    recs(1).intervalEnd shouldBe null
    // values decode identically to the 4.0 twin (PDT is metadata-only)
    recs(0).values shouldBe recs(1).values
  }

  test("grid template 3.40: Gaussian abscissas computed, not tabled; round-trip") {
    // N32 first row vs ECMWF's published value (87.8638 deg)
    val n32 = Grib2.gaussianLatitudesMicro(64)
    n32(0) shouldBe 87863799L +- 1L
    // full N8 set vs an independent Gauss-Legendre computation (numpy
    // leggauss, microdegree-rounded) — symmetric by construction
    val n8 = Grib2.gaussianLatitudesMicro(16)
    n8 shouldBe Array(81650591L, 70834640L, 59954859L, 49060719L,
      38161212L, 27259208L, 16355933L, 5452040L, -5452040L, -16355933L,
      -27259208L, -38161212L, -49060719L, -59954859L, -70834640L, -81650591L)
    // writer emits 3.40 with N in octets 68-71 and the outermost rows as
    // corners; the decoder recomputes and agrees
    val f = Grib2.Field(0, 0, 0, LocalDateTime.of(2003, 6, 15, 12, 0),
      ni = 6, nj = 16, la1Micro = 0L, lo1Micro = 0L,
      diMicro = 60000000L, djMicro = 0L, decimalScale = 1,
      Array.tabulate(96)(k => Some(k % 50)), gaussianN = 8)
    val bytes = Grib2.encodeMessage(f)
    var pos = 16
    def u(i: Int) = bytes(i) & 0xff
    def u16(i: Int) = (u(i) << 8) | u(i + 1)
    def u32(i: Int) = (u16(i).toLong << 16) | u16(i + 2)
    while (u(pos + 4) != 3) pos += u32(pos).toInt
    u16(pos + 12) shouldBe 40             // grid definition template 3.40
    u32(pos + 67) shouldBe 8L             // N, where 3.0 carries Dj
    u32(pos + 46) shouldBe 81650591L      // la1 = northernmost Gaussian row
    val recs = Grib2.parseMessages(bytes)
    recs.head.latsMicro shouldBe n8
    val lats = Grib2.cells(recs.head).map(_.lat).toSeq.distinct
    lats shouldBe n8.map(_ / 1e6).toSeq
    // degenerate scope: nj != 2N rejects loudly
    val bad = java.util.Arrays.copyOf(bytes, bytes.length)
    an[Exception] should be thrownBy {
      // patch N to 7 (octets 68-71 of section 3) and re-parse
      bad(pos + 70) = 7.toByte
      Grib2.parseMessages(bad)
    }
  }

  test("readRecords: -match regex and -limit record selection, distributed") {
    val dir = java.nio.file.Files.createTempDirectory("grib2spec")
    val p = Grib2.writeFile(dir.resolve("t.grib2"),
      Seq(field(), field(cat = 1, num = 7), field(cat = 2, num = 2)))
    val all = Grib2.readRecords(spark, Seq(p.toString)).collect()
    all.length shouldBe 3 * 35
    val matched = Grib2.readRecords(spark, Seq(p.toString), matchRe = "TMP|PRATE")
      .select("variable").distinct().collect().map(_.getString(0)).sorted
    matched shouldBe Array("PRATE", "TMP")
    val limited = Grib2.readRecords(spark, Seq(p.toString), limit = 1)
      .select("variable").distinct().collect().map(_.getString(0))
    limited shouldBe Array("TMP")
  }
}
