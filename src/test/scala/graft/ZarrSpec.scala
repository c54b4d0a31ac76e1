package graft

import java.time.LocalDateTime

import graft.sources.Zarr

/** Zarr v2 store codec: metadata walk, chunk tiling + edge padding,
  * zlib + endianness handling, fill semantics, variable pruning before
  * chunk read, loud scope rejects. Encoder and decoder are independent
  * walks of the public v2 storage spec; the wire pins read chunk bytes
  * by hand so a matched encode/decode bug cannot hide.
  */
class ZarrSpec extends SparkSpec {

  private val t0 = LocalDateTime.of(2004, 9, 10, 6, 0)
  private val t1 = LocalDateTime.of(2004, 9, 10, 18, 0)

  private def field(v: String, t: LocalDateTime, bump: Int,
                    mask: (Int, Int) => Boolean = (_, _) => false) =
    Zarr.Field(v, t, ni = 5, nj = 3,
      la1Micro = 40000000L, lo1Micro = -10000000L,
      diMicro = 2000000L, djMicro = 1500000L, decimalScale = 1,
      Array.tabulate(15) { k =>
        val j = k / 5; val i = k % 5
        if (mask(i, j)) None else Some(100 + 7 * i + 11 * j + bump)
      })

  private def store(fields: Seq[Zarr.Field], chunkJ: Int = 2, chunkI: Int = 3)
  : java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft-zarr")
    Zarr.writeStore(root.resolve("s.zarr"), fields, chunkJ, chunkI)
  }

  test("round-trip: two time steps, two variables, edge chunks, fill dropped") {
    // 3x5 grid, chunks [1,2,3]: 2x2 chunk grid with BOTH axes ragged
    val root = store(Seq(
      field("TMP", t0, 0), field("PRATE", t0, 500, (i, j) => (i + j) % 4 == 1),
      field("TMP", t1, 13), field("PRATE", t1, 513, (i, j) => (i + j) % 4 == 1)))
    val rows = Zarr.readRecords(spark, root.toString).collect()
    val expected = for {
      (t, m) <- Seq(t0 -> 0, t1 -> 13)
      (v, bump) <- Seq("TMP" -> 0, "PRATE" -> 500)
      j <- 0 until 3; i <- 0 until 5
      if !(v == "PRATE" && (i + j) % 4 == 1)
    } yield (v, java.sql.Timestamp.valueOf(t),
      (40000000L - j * 1500000L) / 1e6, (-10000000L + i * 2000000L) / 1e6,
      (100 + 7 * i + 11 * j + bump + m) / 10.0)
    val got = rows.map(r => (r.getString(0), java.sql.Timestamp.valueOf(
      r.getAs[LocalDateTime](1)), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    got.toSet shouldBe expected.toSet
    got.length shouldBe expected.size
  }

  test("float32 data round-trips v2+v3 (dyadic /4, float-space fill, wire pin)") {
    import graft.sources.Netcdf
    val fields = Seq(
      field("TMP", t0, 0).copy(decimalScale = 0),
      field("PRATE", t0, 500, (i, j) => (i + j) % 4 == 1).copy(decimalScale = 0))
    val expected = (for {
      (v, bump) <- Seq("TMP" -> 0, "PRATE" -> 500)
      j <- 0 until 3; i <- 0 until 5
      if !(v == "PRATE" && (i + j) % 4 == 1)
    } yield (v, (40000000L - j * 1500000L) / 1e6,
      (-10000000L + i * 2000000L) / 1e6,
      (100 + 7 * i + 11 * j + bump) / 4.0)).toSet
    val rootDir = java.nio.file.Files.createTempDirectory("graft-zarr-f4")
    // v2 + zlib, v3 + gzip, and blosc with typesize 4 (shuffle over f4)
    val v2 = Zarr.writeStore(rootDir.resolve("v2.zarr"), fields, 2, 3,
      payloadType = Netcdf.NcFloat)
    val v3 = Zarr.writeStoreV3(rootDir.resolve("v3.zarr"), fields, 2, 3,
      payloadType = Netcdf.NcFloat)
    val v2b = Zarr.writeStore(rootDir.resolve("v2b.zarr"), fields, 2, 3,
      compressor = "blosc-lz4", payloadType = Netcdf.NcFloat)
    for (root <- Seq(v2, v3, v2b)) {
      val got = Zarr.readRecords(spark, root.toString).collect()
        .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
      got shouldBe expected
    }
    // wire pin: the v2 .zarray declares <f4 and the float fill literal
    val za = new String(java.nio.file.Files.readAllBytes(
      v2.resolve("TMP/.zarray")), "UTF-8")
    za should include(""""dtype":"<f4"""")
    za should include("9.96921E36")
    // the raw chunk's first cell is scaled(0)/4 as LE binary32
    val inf = new java.util.zip.Inflater()
    inf.setInput(java.nio.file.Files.readAllBytes(v2.resolve("TMP/0.0.0")))
    val chunk = new Array[Byte](2 * 3 * 4)
    inf.inflate(chunk) shouldBe 2 * 3 * 4
    val bits = (chunk(0) & 0xff) | ((chunk(1) & 0xff) << 8) |
      ((chunk(2) & 0xff) << 16) | ((chunk(3) & 0xff) << 24)
    java.lang.Float.intBitsToFloat(bits) shouldBe 100 / 4.0f
    // SHARDED float32 — the ARCO-ERA5 store shape: shard = whole grid,
    // 3x1 inner chunks, missing (all-fill) inner chunks as all-ones
    // index entries, crc32c-checked; and transposed float32
    val v3s = Zarr.writeStoreV3(rootDir.resolve("v3s.zarr"), fields, 3, 5,
      innerJ = 1, innerI = 5, payloadType = Netcdf.NcFloat)
    Zarr.readRecords(spark, v3s.toString).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toSet shouldBe expected
    val v3t = Zarr.writeStoreV3(rootDir.resolve("v3t.zarr"), fields, 2, 3,
      transpose = Seq(2, 0, 1), payloadType = Netcdf.NcFloat)
    Zarr.readRecords(spark, v3t.toString).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toSet shouldBe expected
  }

  test("int16 CF data round-trips v2+v3 (packed*0.25+300, packed-space fill)") {
    import graft.sources.Netcdf
    val fields = Seq(
      field("TMP", t0, 0).copy(decimalScale = 0),
      field("PRATE", t0, -400, (i, j) => (i + j) % 4 == 1).copy(decimalScale = 0))
    val expected = (for {
      (v, bump) <- Seq("TMP" -> 0, "PRATE" -> -400)
      j <- 0 until 3; i <- 0 until 5
      if !(v == "PRATE" && (i + j) % 4 == 1)
    } yield (v, (100 + 7 * i + 11 * j + bump) * 0.25 + 300.0)).toSet
    val rootDir = java.nio.file.Files.createTempDirectory("graft-zarr-i2")
    val v2 = Zarr.writeStore(rootDir.resolve("v2.zarr"), fields, 2, 3,
      compressor = "blosc-lz4", payloadType = Netcdf.NcShort)
    val v3 = Zarr.writeStoreV3(rootDir.resolve("v3.zarr"), fields, 2, 3,
      compressor = "blosc-lz4", payloadType = Netcdf.NcShort)
    for (root <- Seq(v2, v3)) {
      val got = Zarr.readRecords(spark, root.toString).collect()
        .map(r => (r.getString(0), r.getDouble(4))).toSet
      got shouldBe expected
    }
    // metadata pin: CF attributes + packed fill on the wire
    val za = new String(java.nio.file.Files.readAllBytes(
      v2.resolve("TMP/.zarray")), "UTF-8")
    za should include(""""dtype":"<i2"""")
    za should include(""""fill_value":-32767""")
    val attrs = new String(java.nio.file.Files.readAllBytes(
      v2.resolve("TMP/.zattrs")), "UTF-8")
    attrs should include(""""scale_factor":0.25""")
    attrs should include(""""add_offset":300.0""")
    // sharding composes with int16: one shard holding 2x3 inner chunks
    // of i2 cells round-trips identically (typesize-2 blosc inside)
    val v3s = Zarr.writeStoreV3(rootDir.resolve("v3s.zarr"), fields, 2, 3,
      compressor = "blosc-lz4", innerJ = 1, innerI = 3,
      payloadType = Netcdf.NcShort)
    Zarr.readRecords(spark, v3s.toString).collect()
      .map(r => (r.getString(0), r.getDouble(4))).toSet shouldBe expected
    // and transpose composes with int16 (byte-level element permute)
    val v3t = Zarr.writeStoreV3(rootDir.resolve("v3t.zarr"), fields, 2, 3,
      transpose = Seq(2, 0, 1), payloadType = Netcdf.NcShort)
    Zarr.readRecords(spark, v3t.toString).collect()
      .map(r => (r.getString(0), r.getDouble(4))).toSet shouldBe expected
  }

  test("v2 nested '/' dimension separator: chunks in directories, declared in .zarray") {
    val fields = Seq(
      field("TMP", t0, 0), field("PRATE", t0, 500, (i, j) => (i + j) % 4 == 1))
    val root = java.nio.file.Files.createTempDirectory("graft-zarr-sep")
      .resolve("s.zarr")
    Zarr.writeStore(root, fields, 2, 3, sep = "/")
    // nested layout on disk: TMP/0/0/0 exists, flat TMP/0.0.0 does not
    java.nio.file.Files.exists(root.resolve("TMP/0/0/0")) shouldBe true
    java.nio.file.Files.exists(root.resolve("TMP/0.0.0")) shouldBe false
    new String(java.nio.file.Files.readAllBytes(root.resolve("TMP/.zarray")),
      "UTF-8") should include(""""dimension_separator":"/"""")
    val expected = (for {
      (v, bump) <- Seq("TMP" -> 0, "PRATE" -> 500)
      j <- 0 until 3; i <- 0 until 5
      if !(v == "PRATE" && (i + j) % 4 == 1)
    } yield (v, (100 + 7 * i + 11 * j + bump) / 10.0)).toSet
    Zarr.readRecords(spark, root.toString).collect()
      .map(r => (r.getString(0), r.getDouble(4))).toSet shouldBe expected
  }

  test("consolidated .zmetadata store opens with per-array metadata files ABSENT") {
    val fields = Seq(
      field("TMP", t0, 0), field("PRATE", t0, 500, (i, j) => (i + j) % 4 == 1))
    val root = java.nio.file.Files.createTempDirectory("graft-zarr-cm")
      .resolve("s.zarr")
    Zarr.writeStore(root, fields, 2, 3, consolidated = true)
    // the proof: no .zarray/.zattrs anywhere below root — a reader
    // walking per-array files would see an empty store
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.walk(root).iterator().asScala
      .map(_.getFileName.toString).toSet
    files should contain(".zmetadata")
    files should not contain ".zarray"
    files should not contain ".zattrs"
    val rows = Zarr.readRecords(spark, root.toString).collect()
    val expected = (for {
      (v, bump) <- Seq("TMP" -> 0, "PRATE" -> 500)
      j <- 0 until 3; i <- 0 until 5
      if !(v == "PRATE" && (i + j) % 4 == 1)
    } yield (v, (100 + 7 * i + 11 * j + bump) / 10.0)).toSet
    rows.map(r => (r.getString(0), r.getDouble(4))).toSet shouldBe expected
    // a nested-group key rejects loudly
    val zm = new String(java.nio.file.Files.readAllBytes(
      root.resolve(".zmetadata")), "UTF-8")
    java.nio.file.Files.write(root.resolve(".zmetadata"),
      zm.replace(""""TMP/.zarray"""", """"grp/TMP/.zarray"""").getBytes("UTF-8"))
    (the[Exception] thrownBy Zarr.readRecords(spark, root.toString).collect())
      .getMessage should include("groups beyond root")
  }

  test("v3 consolidated_metadata store opens with per-array zarr.json ABSENT") {
    val fields = Seq(
      field("TMP", t0, 0), field("PRATE", t0, 500, (i, j) => (i + j) % 4 == 1))
    val root = java.nio.file.Files.createTempDirectory("graft-zarr-cm3")
      .resolve("s.zarr")
    Zarr.writeStoreV3(root, fields, 2, 3, consolidated = true)
    // the proof: the ONLY zarr.json in the store is the root document —
    // a reader walking per-array files would see an empty store
    import scala.jdk.CollectionConverters._
    val metaFiles = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.getFileName.toString == "zarr.json").toSeq
    metaFiles should have size 1
    metaFiles.head.getParent shouldBe root
    val rows = Zarr.readRecords(spark, root.toString).collect()
    val expected = (for {
      (v, bump) <- Seq("TMP" -> 0, "PRATE" -> 500)
      j <- 0 until 3; i <- 0 until 5
      if !(v == "PRATE" && (i + j) % 4 == 1)
    } yield (v, (100 + 7 * i + 11 * j + bump) / 10.0)).toSet
    rows.map(r => (r.getString(0), r.getDouble(4))).toSet shouldBe expected
    // a nested-group key rejects loudly; an unknown kind rejects loudly
    val zj = new String(java.nio.file.Files.readAllBytes(
      root.resolve("zarr.json")), "UTF-8")
    java.nio.file.Files.write(root.resolve("zarr.json"),
      zj.replace(""""TMP":""", """"grp/TMP":""").getBytes("UTF-8"))
    (the[Exception] thrownBy Zarr.readRecords(spark, root.toString).collect())
      .getMessage should include("groups beyond root")
    java.nio.file.Files.write(root.resolve("zarr.json"),
      zj.replace(""""kind":"inline"""", """"kind":"refs"""").getBytes("UTF-8"))
    (the[Exception] thrownBy Zarr.readRecords(spark, root.toString).collect())
      .getMessage should include("out of scope")
  }

  test("wire pins: chunk key layout, full-size edge padding, zlib payload") {
    val root = store(Seq(field("TMP", t0, 0)))
    // chunk grid for shape [1,3,5] / chunks [1,2,3]: keys 0.{0,1}.{0,1}
    val dir = root.resolve("TMP")
    val keys = java.nio.file.Files.list(dir).toArray.map(_.toString.split('/').last)
      .filterNot(_.startsWith(".")).sorted
    keys shouldBe Array("0.0.0", "0.0.1", "0.1.0", "0.1.1")
    // inflate chunk 0.1.1 by hand: rows j=2 (plus a padded j=3),
    // cols i=3,4 (plus padded i=5) — 2*3 cells, little-endian i4
    val comp = java.nio.file.Files.readAllBytes(dir.resolve("0.1.1"))
    val inf = new java.util.zip.Inflater()
    inf.setInput(comp)
    val raw = new Array[Byte](24)
    inf.inflate(raw) shouldBe 24
    def le(p: Int): Int = (raw(p) & 0xff) | ((raw(p + 1) & 0xff) << 8) |
      ((raw(p + 2) & 0xff) << 16) | ((raw(p + 3) & 0xff) << 24)
    le(0) shouldBe 100 + 7 * 3 + 11 * 2 // (i=3, j=2)
    le(4) shouldBe 100 + 7 * 4 + 11 * 2 // (i=4, j=2)
    le(8) shouldBe Zarr.FillInt // i=5: out of bounds, padded
    le(12) shouldBe Zarr.FillInt // j=3 row: all padding
    le(16) shouldBe Zarr.FillInt
    le(20) shouldBe Zarr.FillInt
    // metadata says exactly what the writer claims
    val meta = Zarr.parseZarray(
      new String(java.nio.file.Files.readAllBytes(dir.resolve(".zarray")), "UTF-8"),
      Some(new String(java.nio.file.Files.readAllBytes(dir.resolve(".zattrs")), "UTF-8")),
      "TMP")
    meta.shape shouldBe Seq(1, 3, 5)
    meta.chunks shouldBe Seq(1, 2, 3)
    meta.dtype shouldBe "<i4"
    meta.comp shouldBe "zlib"
    meta.fillValue shouldBe Some(Zarr.FillInt)
    meta.decimalScale shouldBe 1
  }

  test("big-endian dtype decodes identically") {
    val root = store(Seq(field("TMP", t0, 0)))
    val dir = root.resolve("TMP")
    // rewrite .zarray to >i4 and byte-swap every chunk by re-encoding
    val za = new String(java.nio.file.Files.readAllBytes(dir.resolve(".zarray")), "UTF-8")
    java.nio.file.Files.write(dir.resolve(".zarray"),
      za.replace("\"<i4\"", "\">i4\"").getBytes("UTF-8"))
    for (key <- Seq("0.0.0", "0.0.1", "0.1.0", "0.1.1")) {
      val comp = java.nio.file.Files.readAllBytes(dir.resolve(key))
      val inf = new java.util.zip.Inflater(); inf.setInput(comp)
      val raw = new Array[Byte](24); inf.inflate(raw) shouldBe 24
      val swapped = raw.grouped(4).flatMap(_.reverse).toArray
      val d = new java.util.zip.Deflater(); d.setInput(swapped); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      java.nio.file.Files.write(dir.resolve(key), out.toByteArray)
    }
    val rows = Zarr.readRecords(spark, root.toString, matchRe = "TMP").collect()
    rows.length shouldBe 15
    rows.map(_.getDouble(4)).sum shouldBe
      (0 until 15).map(k => (100 + 7 * (k % 5) + 11 * (k / 5)) / 10.0).sum
  }

  test("variable regex prunes arrays before any chunk read") {
    val root = store(Seq(
      field("TMP", t0, 0), field("PRATE", t0, 500), field("VGRD", t0, 40)))
    // corrupt every VGRD chunk: pruning means they are never opened
    val vdir = root.resolve("VGRD")
    for (key <- Seq("0.0.0", "0.0.1", "0.1.0", "0.1.1"))
      java.nio.file.Files.write(vdir.resolve(key), Array[Byte](1, 2, 3))
    val out = Zarr.readRecords(spark, root.toString, matchRe = "TMP|PRATE").collect()
    out.map(_.getString(0)).toSet shouldBe Set("TMP", "PRATE")
    out.length shouldBe 30
    // and reading VGRD does fail — the corruption is real
    an[Exception] should be thrownBy
      Zarr.readRecords(spark, root.toString, matchRe = "VGRD").collect()
  }

  test("scope rejects loudly: v3, F order, filters, blosc, '/' separator, fill collision") {
    val root = store(Seq(field("TMP", t0, 0)))
    val dir = root.resolve("TMP")
    val za = new String(java.nio.file.Files.readAllBytes(dir.resolve(".zarray")), "UTF-8")
    def mutated(f: String => String): IllegalArgumentException = {
      java.nio.file.Files.write(dir.resolve(".zarray"), f(za).getBytes("UTF-8"))
      val e = intercept[Exception](
        Zarr.readRecords(spark, root.toString, matchRe = "TMP").collect())
      java.nio.file.Files.write(dir.resolve(".zarray"), za.getBytes("UTF-8"))
      // spark wraps executor-side requires; surface either form
      e match {
        case i: IllegalArgumentException => i
        case other =>
          var c: Throwable = other
          while (c.getCause != null && !c.isInstanceOf[IllegalArgumentException])
            c = c.getCause
          c.asInstanceOf[IllegalArgumentException]
      }
    }
    mutated(_.replace("\"zarr_format\":2", "\"zarr_format\":3"))
      .getMessage should include("v2")
    mutated(_.replace("\"order\":\"C\"", "\"order\":\"F\""))
      .getMessage should include("C-order")
    mutated(_.replace("\"filters\":null", "\"filters\":[{\"id\":\"delta\"}]"))
      .getMessage should include("filters")
    // blosc with no cname means blosclz (c-blosc's default) — rejected;
    // only the lz4 block format is implemented
    mutated(_.replace("\"id\":\"zlib\"", "\"id\":\"blosc\""))
      .getMessage should include("blosclz")
    mutated(_.replace("\"id\":\"zlib\"", "\"id\":\"blosc\",\"cname\":\"snappy\""))
      .getMessage should include("out of scope")
    mutated(_.replace("\"id\":\"zlib\"", "\"id\":\"lzma\""))
      .getMessage should include("out of scope")
    // an unknown separator rejects at parse; declaring '/' over a
    // flat-keyed store rejects at the chunk-key parse (keys disagree)
    mutated(_.replace("\"order\":\"C\"", "\"order\":\"C\",\"dimension_separator\":\"-\""))
      .getMessage should include("separator")
    mutated(_.replace("\"order\":\"C\"", "\"order\":\"C\",\"dimension_separator\":\"/\""))
      .getMessage should include("chunk key")
    // a payload equal to fill_value would silently vanish — writer refuses
    an[IllegalArgumentException] should be thrownBy store(Seq(
      Zarr.Field("TMP", t0, 1, 1, 0L, 0L, 1000000L, 1000000L, 0,
        Array(Some(Zarr.FillInt)))))
    // a non-group root refuses
    an[IllegalArgumentException] should be thrownBy
      Zarr.readRecords(spark,
        java.nio.file.Files.createTempDirectory("notzarr").toString).collect()
  }

  test("v3 transpose codec: permutation inverse, stored-layout pin, parse rejects") {
    // encode/decode are inverses for a non-trivial order
    val cells = Array.tabulate(2 * 3 * 4)(identity)
    val enc = Zarr.permuteCells(cells, Seq(2, 3, 4), Seq(2, 0, 1), encode = true)
    Zarr.permuteCells(enc, Seq(2, 3, 4), Seq(2, 0, 1), encode = false) shouldBe cells
    // layout pin: order [2,0,1] stores C-order over (dim2, dim0, dim1),
    // so stored (i, t, j) holds original (t, j, i)
    for (t <- 0 until 2; j <- 0 until 3; i <- 0 until 4)
      enc((i * 2 + t) * 3 + j) shouldBe cells((t * 3 + j) * 4 + i)
    val base =
      """{"zarr_format":3,"node_type":"array","shape":[2,10,16],
         "data_type":"int32","chunk_grid":{"name":"regular",
         "configuration":{"chunk_shape":[1,5,8]}},
         "chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
         "fill_value":-2147483647,
         "codecs":[{"name":"transpose","configuration":{"order":[2,0,1]}},
                   {"name":"bytes","configuration":{"endian":"little"}}],
         "attributes":{}}"""
    Zarr.parseZarrayV3(base, "t").transposeOrder shouldBe Seq(2, 0, 1)
    intercept[IllegalArgumentException](
      Zarr.parseZarrayV3(base.replace("[2,0,1]", "[2,2,1]"), "t"))
      .getMessage should include("permutation")
    intercept[IllegalArgumentException](
      Zarr.parseZarrayV3(base.replace("[2,0,1]", "[1,0]"), "t"))
      .getMessage should include("rank")
    // transpose now composes with every dtype (byte-level permute):
    // a float64 transpose parses, carrying the order through
    Zarr.parseZarrayV3(base.replace("\"int32\"", "\"float64\""), "t")
      .transposeOrder shouldBe Seq(2, 0, 1)
    // the writer refuses transpose composed with sharding (out of scope)
    an[IllegalArgumentException] should be thrownBy
      Zarr.writeStoreV3(java.nio.file.Files.createTempDirectory("ztr"),
        Seq(field("TMP", t0, 0)), chunkJ = 5, chunkI = 8,
        innerJ = 5, innerI = 4, transpose = Seq(2, 0, 1))
  }

  test("hostile metadata rejects before any allocation (dimension caps)") {
    def meta(shape: String, chunks: String): Zarr.ArrayMeta =
      Zarr.parseZarray(
        s"""{"zarr_format":2,"shape":$shape,"chunks":$chunks,"dtype":"<i4",
            "compressor":{"id":"zlib","level":6},"fill_value":null,
            "order":"C","filters":null}""", None, "hostile")
    // a chunk whose cell product would size a multi-GB inflate buffer
    intercept[IllegalArgumentException](
      meta("[1,65536,65536]", "[1,65536,65536]"))
      .getMessage should include("2^26 cap")
    // Int-overflow products must reject, not wrap to small positives
    intercept[IllegalArgumentException](
      meta("[1,4294967296,2]", "[1,1,1]"))
      .getMessage should include("out of range")
    // zero-extent chunks would divide by zero downstream
    intercept[IllegalArgumentException](meta("[1,2,2]", "[1,0,2]"))
      .getMessage should include("zero-extent")
    // rank mismatch
    intercept[IllegalArgumentException](meta("[1,2,2]", "[1,2]"))
      .getMessage should include("rank mismatch")
    // a coordinate array above the driver-side cap refuses at readCoord:
    // craft a store then inflate the lat coordinate's declared length
    val root = store(Seq(field("TMP", t0, 0)))
    val latDir = root.resolve("lat")
    val za = new String(java.nio.file.Files.readAllBytes(latDir.resolve(".zarray")), "UTF-8")
    val nj = field("TMP", t0, 0).nj
    java.nio.file.Files.write(latDir.resolve(".zarray"),
      za.replace(s"[$nj]", "[999999999]").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](
      Zarr.readRecords(spark, root.toString, matchRe = "TMP").collect())
    e.getMessage should (include("cap") or include("entries"))
  }
}
