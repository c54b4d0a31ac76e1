package graft

import java.time.LocalDateTime

import graft.sources.Netcdf

/** NetCDF classic (CDF-1) codec: header walk, record interleaving,
  * attribute typing, _FillValue semantics, loud scope rejects. Encoder
  * and decoder are independent spec walks; the wire pins below read
  * bytes at hand-computed offsets so a matched encode/decode bug cannot
  * hide.
  */
class NetcdfSpec extends SparkSpec {

  private val t0 = LocalDateTime.of(2004, 7, 10, 6, 0)
  private val t1 = LocalDateTime.of(2004, 7, 10, 18, 0)

  private def field(v: String, t: LocalDateTime, bump: Int,
                    mask: (Int, Int) => Boolean = (_, _) => false) =
    Netcdf.Field(v, t, ni = 5, nj = 3,
      la1Micro = 40000000L, lo1Micro = -10000000L,
      diMicro = 2000000L, djMicro = 1500000L, decimalScale = 1,
      Array.tabulate(15) { k =>
        val j = k / 5; val i = k % 5
        if (mask(i, j)) None else Some(100 + 7 * i + 11 * j + bump)
      })

  private def write(fields: Seq[Netcdf.Field]): Array[Byte] = {
    val p = java.nio.file.Files.createTempFile("graft-nc", ".nc")
    Netcdf.writeFile(p, fields)
    val b = java.nio.file.Files.readAllBytes(p)
    java.nio.file.Files.delete(p)
    b
  }

  test("round-trip: two record steps, two variables, fill cells dropped") {
    val bytes = write(Seq(
      field("TMP", t0, 0), field("PRATE", t0, 500, (i, j) => (i + j) % 4 == 1),
      field("TMP", t1, 13), field("PRATE", t1, 513, (i, j) => (i + j) % 4 == 1)))
    val rows = Netcdf.records(bytes).toSeq
    // every present cell, exact /10 presentation, masked PRATE cells gone
    val expected = for {
      (t, m) <- Seq(t0 -> 0, t1 -> 13)
      (v, bump) <- Seq("TMP" -> 0, "PRATE" -> 500)
      j <- 0 until 3; i <- 0 until 5
      if !(v == "PRATE" && (i + j) % 4 == 1)
    } yield Netcdf.GridRow(v, t,
      (40000000L - j * 1500000L) / 1e6, (-10000000L + i * 2000000L) / 1e6,
      (100 + 7 * i + 11 * j + bump + m) / 10.0)
    rows.toSet shouldBe expected.toSet
    rows.size shouldBe expected.size
  }

  test("header walk exposes dims, typed attributes, and variable metadata") {
    val nc = Netcdf.parse(write(Seq(field("TMP", t0, 0))))
    nc.numrecs shouldBe 1
    nc.dims.map(d => (d.name, d.len)) shouldBe
      Seq(("time", 0), ("lat", 3), ("lon", 5))
    nc.gatts("Conventions") shouldBe "graft-1"
    val tmp = nc.vars.find(_.name == "TMP").get
    tmp.dimids shouldBe Seq(0, 1, 2)
    tmp.atts("units") shouldBe "K"
    tmp.atts("decimal_scale") shouldBe 1
    tmp.atts("_FillValue") shouldBe Netcdf.FillInt
    nc.vars.find(_.name == "time").get.atts("units") shouldBe
      "hours since 1970-01-01 00:00:00"
  }

  test("wire pins: begin offsets, record interleaving, big-endian payloads") {
    val bytes = write(Seq(
      field("TMP", t0, 0), field("VGRD", t0, 40),
      field("TMP", t1, 1), field("VGRD", t1, 41)))
    val nc = Netcdf.parse(bytes)
    def i32(p0: Long): Int = { val p = p0.toInt
      ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff) }
    def f64(p0: Long): Double = { val p = p0.toInt
      var b = 0L; for (k <- 0 until 8) b = (b << 8) | (bytes(p + k) & 0xffL)
      java.lang.Double.longBitsToDouble(b)
    }
    val lat = nc.vars.find(_.name == "lat").get
    val lon = nc.vars.find(_.name == "lon").get
    val time = nc.vars.find(_.name == "time").get
    val tmp = nc.vars.find(_.name == "TMP").get
    val vgrd = nc.vars.find(_.name == "VGRD").get
    // fixed data sits immediately after the header, contiguously
    lon.begin shouldBe lat.begin + 8 * 3
    time.begin shouldBe lon.begin + 8 * 5
    // lat[1] = (40000000 - 1*1500000)/1e6, read straight off the wire
    f64(lat.begin + 8) shouldBe 38.5
    // record layout: time slab then data slabs, recSize = 4 + 2*4*15
    val recSize = 4 + 2 * 60
    tmp.begin shouldBe time.begin + 4
    vgrd.begin shouldBe tmp.begin + 60
    // record 1's time value lives exactly one recSize later
    i32(time.begin) shouldBe java.time.Duration.between(
      LocalDateTime.of(1970, 1, 1, 0, 0), t0).toHours.toInt
    i32(time.begin + recSize) shouldBe java.time.Duration.between(
      LocalDateTime.of(1970, 1, 1, 0, 0), t1).toHours.toInt
    // TMP cell (i=2, j=1) of record 1: begin + recSize + 4*(1*5+2)
    i32(tmp.begin + recSize + 4 * 7) shouldBe 100 + 7 * 2 + 11 * 1 + 1
    // file length accounts for exactly two records
    bytes.length.toLong shouldBe time.begin + 2 * recSize
  }

  test("CDF-2: begins widen to INT64 on the wire, decode matches CDF-1 twin") {
    val p = java.nio.file.Files.createTempFile("graft-nc2", ".nc")
    val fields = Seq(field("TMP", t0, 0), field("TMP", t1, 13))
    Netcdf.writeFile(p, fields, version = 2)
    val bytes = java.nio.file.Files.readAllBytes(p)
    java.nio.file.Files.delete(p)
    bytes(3) shouldBe 2
    val nc = Netcdf.parse(bytes)
    // the v1 twin's begins sit 4 bytes earlier per preceding var entry:
    // CDF-2's only delta is the 8-byte begin field
    val v1 = Netcdf.parse(write(fields))
    nc.vars.map(_.name) shouldBe v1.vars.map(_.name)
    nc.vars.zip(v1.vars).foreach { case (a, b) =>
      (a.begin - b.begin) shouldBe 4L * nc.vars.size } // 4 extra bytes x nvars in header
    Netcdf.records(bytes).toSet shouldBe Netcdf.records(write(fields)).toSet
  }

  test("CDF-5 double and CDF-2 float payloads round-trip exactly") {
    def bytesFor(version: Int, payload: Int): Array[Byte] = {
      val p = java.nio.file.Files.createTempFile("graft-nc5", ".nc")
      val mk =
        if (payload == Netcdf.NcFloat)
          Seq(field("TMP", t0, 0).copy(decimalScale = 0),
            field("TMP", t1, 13).copy(decimalScale = 0))
        else Seq(field("TMP", t0, 0), field("TMP", t1, 13))
      Netcdf.writeFile(p, mk, version = version, payloadType = payload)
      val b = java.nio.file.Files.readAllBytes(p)
      java.nio.file.Files.delete(p); b
    }
    val v5 = bytesFor(5, Netcdf.NcDouble)
    v5(3) shouldBe 5
    val rows5 = Netcdf.records(v5).toSeq
    rows5.size shouldBe 30
    // NcDouble stores scaled/10^D via one IEEE divide — exact vs the spec's
    rows5.map(r => r.variable -> (r.lat, r.lon, r.value)).toSet shouldBe
      Netcdf.records(write(Seq(field("TMP", t0, 0), field("TMP", t1, 13))))
        .map(r => r.variable -> (r.lat, r.lon, r.value)).toSet
    val v2f = bytesFor(2, Netcdf.NcFloat)
    val rowsF = Netcdf.records(v2f).toSeq
    rowsF.size shouldBe 30
    // float convention: stored = scaled/4 (dyadic, exact in binary32)
    rowsF.find(r => r.time == t0 && r.lat == 40.0 && r.lon == -10.0)
      .get.value shouldBe 100.0 / 4.0
  }

  test("NC_SHORT + CF scale_factor/add_offset packing round-trips exactly") {
    // odd ni*nj (5x3=15) forces the 2-byte slab tail pad per record
    val p = java.nio.file.Files.createTempFile("graft-ncs", ".nc")
    val fields = Seq(
      field("TMP", t0, 0).copy(decimalScale = 0),
      field("TMP", t1, 13).copy(decimalScale = 0,
        scaled = Array.tabulate(15)(k => if (k == 7) None else Some(100 + k))))
    Netcdf.writeFile(p, fields, payloadType = Netcdf.NcShort)
    val bytes = java.nio.file.Files.readAllBytes(p)
    java.nio.file.Files.delete(p)
    val nc = Netcdf.parse(bytes)
    val tmp = nc.vars.find(_.name == "TMP").get
    tmp.tpe shouldBe 3 // NC_SHORT on the wire
    tmp.vsize shouldBe 32 // 15 shorts + 2 pad bytes, 4-aligned
    tmp.atts("scale_factor") shouldBe 0.25
    tmp.atts("add_offset") shouldBe 300.0
    tmp.atts("_FillValue") shouldBe Netcdf.FillShort
    val rows = Netcdf.records(bytes).toSeq
    rows.size shouldBe 15 + 14 // one masked cell in record 1
    // value = packed * 0.25 + 300 — exact dyadic arithmetic
    rows.find(r => r.time == t0 && r.lat == 40.0 && r.lon == -10.0)
      .get.value shouldBe (100 * 0.25 + 300.0)
    rows.filter(_.time == t1).map(_.value).min shouldBe (100 * 0.25 + 300.0)
    // a packed value colliding with NC_FILL_SHORT refuses at write
    an[IllegalArgumentException] should be thrownBy Netcdf.writeFile(
      java.nio.file.Files.createTempFile("graft-ncs2", ".nc"),
      Seq(field("TMP", t0, 0).copy(decimalScale = 0,
        scaled = Array.fill(15)(Some(-32767)))), payloadType = Netcdf.NcShort)
  }

  test("CHAR label record variables round-trip beside the numeric grid") {
    val fields = Seq(field("TMP", t0, 0), field("TMP", t1, 40))
    val p = java.nio.file.Files.createTempFile("graft-ncc", ".nc")
    Netcdf.writeFile(p, fields,
      labels = Seq("qc_flag" -> Seq("pass", "warn-x"),
        "source" -> Seq("era5", "era5rt")))
    val bytes = java.nio.file.Files.readAllBytes(p)
    // labels decode NUL-trimmed, one per (variable, record)
    Netcdf.labelRecords(bytes).toSeq.map(r => (r.variable, r.label)) shouldBe
      Seq(("qc_flag", "pass"), ("qc_flag", "warn-x"),
        ("source", "era5"), ("source", "era5rt"))
    // the numeric grid is untouched by the extra record slabs
    val rows = Netcdf.records(bytes).toSeq
    rows.size shouldBe 2 * 15
    rows.map(_.value).sum shouldBe
      fields.flatMap(_.scaled.toSeq.flatten).sum / 10.0
    // the strlen dimension appears in the header; char vars have 2 dims
    val nc = Netcdf.parse(bytes)
    nc.dims.map(_.name) shouldBe Seq("time", "lat", "lon", "strlen")
    nc.dims.last.len shouldBe 6 // longest label
    nc.vars.find(_.name == "qc_flag").get.dimids shouldBe Seq(0, 3)
    // label/time-step count mismatch refuses at write
    an[IllegalArgumentException] should be thrownBy
      Netcdf.writeFile(java.nio.file.Files.createTempFile("graft-ncc", ".nc"),
        fields, labels = Seq("qc" -> Seq("only-one")))
  }

  test("scope rejects loudly: netCDF-4 magic, streaming numrecs, bad value collision") {
    val ok = write(Seq(field("TMP", t0, 0)))
    val v2 = ok.clone(); v2(3) = 4
    val e = intercept[IllegalArgumentException](Netcdf.parse(v2))
    e.getMessage should include("out of scope")
    val stream = ok.clone()
    for (k <- 4 to 7) stream(k) = 0xff.toByte
    val e2 = intercept[IllegalArgumentException](Netcdf.parse(stream))
    e2.getMessage should include("STREAMING")
    // a payload equal to _FillValue would silently vanish — the writer
    // refuses it instead
    val bad = Netcdf.Field("TMP", t0, 1, 1, 0L, 0L, 1000000L, 1000000L, 0,
      Array(Some(Netcdf.FillInt)))
    an[IllegalArgumentException] should be thrownBy write(Seq(bad))
    // inconsistent grids across fields refuse too
    an[IllegalArgumentException] should be thrownBy
      write(Seq(field("TMP", t0, 0),
        field("PRATE", t0, 0).copy(ni = 4, scaled = Array.fill(12)(Some(1)))))
  }

  test("hostile sizes reject before allocation (slab/name/attr caps)") {
    val bytes = write(Seq(field("TMP", t0, 0)))
    val nc = Netcdf.parse(bytes)
    val lat = nc.vars.find(_.name == "lat").get
    // crafted vsize/begin must fail loudly, never size an allocation
    intercept[IllegalArgumentException](
      nc.doubles(lat.copy(vsize = Int.MaxValue))).getMessage should include("exceeds")
    intercept[IllegalArgumentException](
      nc.doubles(lat.copy(begin = Int.MaxValue))).getMessage should include("exceeds")
    val tmp = nc.vars.find(_.name == "TMP").get
    intercept[IllegalArgumentException](
      nc.intRecord(tmp.copy(vsize = Int.MaxValue), 0, 8)).getMessage should include("exceeds")
    // record base arithmetic is Long — an Int-overflowing r*recSize is a
    // loud range reject, not a wrapped negative slab offset
    intercept[IllegalArgumentException](
      nc.intRecord(tmp, Int.MaxValue, Int.MaxValue)).getMessage should include("exceeds")
    // first dim name length lives at offset 16 (magic+numrecs+tag+count):
    // a huge declared length rejects against the remaining bytes
    val hostile = bytes.clone()
    hostile(16) = 0x7f.toByte; hostile(17) = 0xff.toByte
    hostile(18) = 0xff.toByte; hostile(19) = 0xff.toByte
    intercept[IllegalArgumentException](
      Netcdf.parse(hostile)).getMessage should include("name length")
  }

  test("distributed scan filters variables before flattening") {
    val p = java.nio.file.Files.createTempDirectory("graft-ncdir")
    Netcdf.writeFile(p.resolve("a.nc"), Seq(
      field("TMP", t0, 0), field("PRATE", t0, 500), field("VGRD", t0, 40)))
    val out = Netcdf.readRecords(spark, Seq(p.resolve("a.nc").toString),
      matchRe = "TMP|PRATE").collect()
    out.map(_.getString(0)).toSet shouldBe Set("TMP", "PRATE")
    out.length shouldBe 30 // 2 vars x 15 cells, nothing masked
  }
}
