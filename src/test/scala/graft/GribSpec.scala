package graft

import java.nio.file.Files
import java.time.LocalDateTime

import graft.sources.Grib1

/** S5 at the byte level: the native GRIB1 codec (WMO FM-92 edition 1,
  * simple packing) — the reference's real input boundary
  * (src/file-conversions.js:114-135 shells `wgrib -d N`).
  */
class GribSpec extends SparkSpec {

  private def field(param: Int = 11, masked: Boolean = false,
                    d: Int = 1, base: Int = 0): Grib1.Field =
    Grib1.Field(param, LocalDateTime.of(1998, 3, 1, 0, 0),
      ni = 7, nj = 5, la1Milli = 37000, lo1Milli = -21000,
      diMilli = 2000, djMilli = 2000, decimalScale = d,
      Array.tabulate(35) { k =>
        val j = k / 7; val i = k % 7
        if (masked && (i + j) % 4 == 0) None else Some(base + i * 3 + j * 11)
      })

  test("IBM-360 float: public known vectors and integer round-trip") {
    // −118.625 = 0xC276A000 (the classic worked example of the format)
    Grib1.ibmFloat(0xC2, 0x76, 0xA0, 0x00) shouldBe -118.625
    Grib1.ibmFloat(0x42, 0x76, 0xA0, 0x00) shouldBe 118.625
    Grib1.ibmFloat(0, 0, 0, 0) shouldBe 0.0
    for (v <- Seq(0.0, 1.0, 37.0, 999.0, -500.0, 0.15625)) {
      val b = Grib1.ibmFloatBytes(v)
      Grib1.ibmFloat(b(0) & 0xff, b(1) & 0xff, b(2) & 0xff, b(3) & 0xff) shouldBe v
    }
  }

  test("writer emits well-formed messages: magic, edition, length, 7777 tail") {
    val bytes = Grib1.write(Seq(field(), field(param = 61, masked = true)))
    new String(bytes.take(4), "US-ASCII") shouldBe "GRIB"
    (bytes(7) & 0xff) shouldBe 1
    val len1 = ((bytes(4) & 0xff) << 16) | ((bytes(5) & 0xff) << 8) | (bytes(6) & 0xff)
    new String(bytes.slice(len1 - 4, len1), "US-ASCII") shouldBe "7777"
    new String(bytes.slice(len1, len1 + 4), "US-ASCII") shouldBe "GRIB"
    new String(bytes.takeRight(4), "US-ASCII") shouldBe "7777"
    // sections are even-length by construction → total is even
    len1 % 2 shouldBe 0
  }

  test("round-trip: values, georeferencing, bitmap holes, param names") {
    val recs = Grib1.parseMessages(Grib1.write(Seq(field(), field(param = 61, masked = true))))
    recs should have length 2
    val Seq(tmp, prate) = recs
    tmp.variable shouldBe "TMP"
    prate.variable shouldBe "PRATE"
    tmp.time shouldBe LocalDateTime.of(1998, 3, 1, 0, 0)
    (tmp.ni, tmp.nj) shouldBe (7, 5)
    (tmp.la1Milli, tmp.lo1Milli, tmp.diMilli, tmp.djMilli) shouldBe (37000, -21000, 2000, 2000)
    for (k <- 0 until 35) {
      val j = k / 7; val i = k % 7
      tmp.values(k) shouldBe (i * 3 + j * 11) / 10.0
      if ((i + j) % 4 == 0) prate.values(k).isNaN shouldBe true
      else prate.values(k) shouldBe (i * 3 + j * 11) / 10.0
    }
  }

  test("decimal scale is signed; negative scale multiplies") {
    // D = −1 → value = x · 10
    val recs = Grib1.parseMessages(Grib1.write(Seq(field(d = -1))))
    recs.head.values(8) shouldBe (1 * 3 + 1 * 11) * 10.0
  }

  test("non-zero reference value: offset field round-trips exactly") {
    // base 500 → min 500, packed deltas; R = IBM(500) decoded exactly
    val recs = Grib1.parseMessages(Grib1.write(Seq(field(base = 500))))
    recs.head.values(0) shouldBe 500 / 10.0
    recs.head.values(34) shouldBe (500 + 6 * 3 + 4 * 11) / 10.0
  }

  test("constant field packs with nbits = 0 and decodes to the reference value") {
    val f = Grib1.Field(11, LocalDateTime.of(1999, 1, 1, 0, 0), 3, 2,
      1000, 2000, 1000, 1000, 0, Array.fill(6)(Some(42)))
    val bytes = Grib1.write(Seq(f))
    val recs = Grib1.parseMessages(bytes)
    recs.head.values.toSeq shouldBe Seq.fill(6)(42.0)
  }

  test("unsupported inputs are rejected loudly, not mis-decoded") {
    val bytes = Grib1.write(Seq(field()))
    val ed2 = bytes.clone(); ed2(7) = 2
    an[IllegalArgumentException] should be thrownBy Grib1.parseMessages(ed2)
    // GDS scan-mode octet 28 (offset: 8 IS + 28 PDS + 27): 0x20 = j varies
    // fastest — would transpose the grid if decoded naively
    val scan = bytes.clone(); scan(8 + 28 + 27) = 0x20.toByte
    an[IllegalArgumentException] should be thrownBy Grib1.parseMessages(scan)
    val notGrib = "NOPE".getBytes("US-ASCII") ++ bytes.drop(4)
    an[IllegalArgumentException] should be thrownBy Grib1.parseMessages(notGrib)
  }

  test("corrupt structure is rejected: zero total-length, truncation, short BMS, BDS extensions") {
    val bytes = Grib1.write(Seq(field()))
    // total length zero would loop forever re-parsing offset 0
    val zeroLen = bytes.clone(); zeroLen(4) = 0; zeroLen(5) = 0; zeroLen(6) = 0
    an[IllegalArgumentException] should be thrownBy Grib1.parseMessages(zeroLen)
    // truncated file: total length points past EOF
    an[IllegalArgumentException] should be thrownBy
      Grib1.parseMessages(bytes.dropRight(10))
    // BDS octet-14 extension flag (bit 1 of the high nibble): data would
    // not start at octet 12 — must reject, not mis-decode
    val bds = 8 + 28 + 32 // IS + PDS + GDS (no BMS in the plain field)
    val ext = bytes.clone(); ext(bds + 3) = (ext(bds + 3) | 0x10).toByte
    an[IllegalArgumentException] should be thrownBy Grib1.parseMessages(ext)
    // short BMS: bitmap length below ceil(ni*nj/8)
    val masked = Grib1.write(Seq(field(param = 61, masked = true)))
    val bms = 8 + 28 + 32
    val short = masked.clone(); short(bms + 2) = 6 // 24-bit len low byte → 6 (header only)
    short(bms + 1) = 0; short(bms) = 0
    an[IllegalArgumentException] should be thrownBy Grib1.parseMessages(short)
  }

  test("scan mode 0x40 (south-to-north rows) georeferences correctly") {
    val f0 = field()
    val up = f0.copy(la1Milli = f0.la1Milli - (f0.nj - 1) * f0.djMilli, scanMode = 0x40)
    val rec = Grib1.parseMessages(Grib1.write(Seq(up))).head
    rec.scanJPositive shouldBe true
    // same values, row j georeferenced upward from the southern corner
    val north = Grib1.cells(Grib1.parseMessages(Grib1.write(Seq(f0))).head).toSeq
    val south = Grib1.cells(rec).toSeq
    // both cover the same lat set; a fixed (lat, lon) carries a DIFFERENT
    // value (row order differs), but the lat/lon domain is identical
    north.map(c => (c.lat, c.lon)).toSet shouldBe south.map(c => (c.lat, c.lon)).toSet
    // row 0 of the 0x40 record is the southern edge
    south.take(7).foreach(_.lat shouldBe (37.0 - 4 * 2.0))
  }

  test("codec property sweep: random grids round-trip exactly (both scan modes)") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 0 until 40) {
      val ni = 2 + rnd.nextInt(7); val nj = 2 + rnd.nextInt(6)
      val d = rnd.nextInt(5) - 2 // decimal scale in [-2, 2]
      val masked = rnd.nextBoolean()
      val scan = if (rnd.nextBoolean()) 0x40 else 0x00
      val scaled = Array.tabulate(ni * nj) { _ =>
        if (masked && rnd.nextInt(5) == 0) None
        else Some(rnd.nextInt(100000) - 20000) // negative references too
      }
      if (scaled.exists(_.isDefined)) {
        val f = Grib1.Field(11, LocalDateTime.of(1996 + rnd.nextInt(8), 1 + rnd.nextInt(12), 1, 0, 0),
          ni, nj, la1Milli = rnd.nextInt(60000) - 30000, lo1Milli = rnd.nextInt(300000) - 150000,
          diMilli = 500 + rnd.nextInt(2000), djMilli = 500 + rnd.nextInt(2000),
          decimalScale = d, scaled = scaled, scanMode = scan)
        val rec = Grib1.parseMessages(Grib1.write(Seq(f))).head
        withClue(s"trial $trial (ni=$ni nj=$nj d=$d scan=$scan): ") {
          rec.time shouldBe f.time
          for (k <- 0 until ni * nj) scaled(k) match {
            case None => rec.values(k).isNaN shouldBe true
            case Some(x) => rec.values(k) shouldBe x / math.pow(10.0, d)
          }
        }
      }
    }
  }

  test("landToGrid: GRIB dir -> partitioned grid store, pruned reads, idempotent") {
    val in = Files.createTempDirectory("graft-grib-land-in")
    val out = Files.createTempDirectory("graft-grib-land-out").resolve("grid").toString
    val mar = field() // 1998-03
    val apr = mar.copy(time = LocalDateTime.of(1998, 4, 1, 0, 0))
    Grib1.writeFile(in.resolve("a.grib"), Seq(mar))
    Grib1.writeFile(in.resolve("sub").resolve("b.grb"), Seq(apr, apr.copy(param = 61)))
    Grib1.writeFile(in.resolve("ignore.txt.tmp"), Seq(mar)) // not a grib extension
    Grib1.landToGrid(spark, in.toString, out) shouldBe 2

    import org.apache.spark.sql.functions._
    val grid = spark.read.parquet(out)
    grid.count() shouldBe 3 * 35
    // partition layout: variable/year/month directories exist
    new java.io.File(s"$out/variable=TMP/year=1998/month=3").exists() shouldBe true
    new java.io.File(s"$out/variable=PRATE/year=1998/month=4").exists() shouldBe true
    // pruned read returns exactly one layer
    grid.where(col("variable") === "TMP" && col("month") === 4).count() shouldBe 35
    // idempotent: re-landing the same files overwrites, not duplicates
    Grib1.landToGrid(spark, in.toString, out) shouldBe 2
    spark.read.parquet(out).count() shouldBe 3 * 35
  }

  test("full ERA5-shaped grid (1440x721, 0.25 deg) round-trips through the codec") {
    // the reference's declared grid (era5monthly.js:27-32): global 0.25°,
    // ~1M cells — proves the bitstream/packing path at realistic layer size
    val (ni, nj) = (1440, 721)
    val f = Grib1.Field(11, LocalDateTime.of(1998, 3, 1, 0, 0), ni, nj,
      la1Milli = 90000, lo1Milli = 0, diMilli = 250, djMilli = 250,
      decimalScale = 1,
      Array.tabulate(nj * ni)(k => Some((k * 31 + k / ni * 7) % 4000)))
    val bytes = Grib1.write(Seq(f))
    bytes.length should be < (ni * nj * 2 + 1024) // ≤12-bit packing
    val rec = Grib1.parseMessages(bytes).head
    (rec.ni, rec.nj) shouldBe (ni, nj)
    // spot-check corners + center against the closed form
    for (k <- Seq(0, ni - 1, ni * nj / 2, ni * nj - 1))
      rec.values(k) shouldBe ((k * 31 + k / ni * 7) % 4000) / 10.0
  }

  test("readRecords lands files distributed as the long-format grid") {
    val dir = Files.createTempDirectory("graft-grib-spec")
    val p1 = dir.resolve("a.grib"); val p2 = dir.resolve("b.grib")
    Grib1.writeFile(p1, Seq(field(), field(param = 61, masked = true)))
    Grib1.writeFile(p2, Seq(field(param = 33)))
    val df = Grib1.readRecords(spark, Seq(p1.toString, p2.toString))
    df.columns.toSeq shouldBe Seq("variable", "time", "lat", "lon", "value")
    import org.apache.spark.sql.functions._
    val byVar = df.groupBy("variable").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byVar("TMP") shouldBe 35
    byVar("UGRD") shouldBe 35
    byVar("PRATE") shouldBe (35 - (0 until 35).count(k => (k / 7 + k % 7) % 4 == 0))
    // spot-check one cell end-to-end: i=2, j=1 → lat 35.0, lon −17.0
    val v = df.where(col("variable") === "TMP" && col("lat") === 35.0 && col("lon") === -17.0)
      .select("value").head().getDouble(0)
    v shouldBe (2 * 3 + 1 * 11) / 10.0
  }
}
