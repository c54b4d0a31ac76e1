package graft

import graft.sources.{BloscLz4, Zarr}

/** Blosc-1 container + LZ4 block codec: round-trips over adversarial
  * payload shapes, wire pins on the 16-byte header and bstarts walk,
  * shuffle transpose inverse, and loud rejects. The encoder and decoder
  * are independent walks of the public formats; the hand-built frame in
  * the wire-pin test keeps a matched encode/decode bug from hiding.
  */
class BloscLz4Spec extends SparkSpec {

  private def payload(n: Int, seed: Int): Array[Byte] = {
    val r = new scala.util.Random(seed)
    Array.tabulate(n) { k =>
      // mix of runs (RLE → overlapping matches), periodic structure
      // (long-distance matches), and noise (incompressible stretches)
      if (k % 977 < 300) 7.toByte
      else if (k % 977 < 700) ((k % 53) + 1).toByte
      else r.nextInt(256).toByte
    }
  }

  test("lz4 block round-trips runs, periodic data, noise, and tiny inputs") {
    for (n <- Seq(0, 1, 4, 11, 12, 13, 64, 255, 256, 4096, 70000);
         seed <- Seq(1, 2)) {
      val raw = payload(n, seed)
      val comp = BloscLz4.lz4Compress(raw)
      BloscLz4.lz4Decompress(comp, 0, comp.length, n, "t") shouldBe raw
    }
  }

  test("lz4 overlapping-match (RLE) self-feeds; long runs compress hard") {
    val raw = Array.fill[Byte](100000)(42)
    val comp = BloscLz4.lz4Compress(raw)
    comp.length should be < 500 // 255-run extensions carry the length
    BloscLz4.lz4Decompress(comp, 0, comp.length, raw.length, "t") shouldBe raw
  }

  test("byte-shuffle transposes the aligned prefix and is its own inverse") {
    val raw = Array.tabulate[Byte](4 * 5 + 3)(k => k.toByte) // unaligned tail of 3
    val sh = BloscLz4.shuffle(raw, 4)
    // plane j holds byte j of each element: element e byte 0 at sh[e]
    sh.take(5) shouldBe Array[Byte](0, 4, 8, 12, 16)
    sh.slice(5, 10) shouldBe Array[Byte](1, 5, 9, 13, 17)
    sh.takeRight(3) shouldBe raw.takeRight(3) // tail rides untransposed
    BloscLz4.unshuffle(sh, 4) shouldBe raw
  }

  test("frame round-trips: shuffled multi-block i4, typesize 1, big buffers") {
    // ints with structure so shuffle pays (high bytes constant)
    val ints = Array.tabulate(40000)(k => (k % 911) + ((k / 911) % 7) * 100000)
    val raw = ints.flatMap(v => Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, (v >>> 24).toByte))
    for (block <- Seq(512, 4096, 1 << 14, 1 << 20)) { // multi-block and single
      val frame = BloscLz4.compress(raw, typesize = 4, blocksizeReq = block)
      frame.length should be < raw.length
      BloscLz4.decompress(frame, raw.length, "t") shouldBe raw
    }
    val bytes = payload(10000, 3)
    val f1 = BloscLz4.compress(bytes, typesize = 1, blocksizeReq = 2048)
    BloscLz4.decompress(f1, bytes.length, "t") shouldBe bytes
  }

  test("incompressible data falls back to a memcpy frame, still decodes") {
    val r = new scala.util.Random(9)
    val raw = Array.fill[Byte](5000)(r.nextInt(256).toByte)
    val frame = BloscLz4.compress(raw, typesize = 4)
    frame.length shouldBe raw.length + 16
    (frame(2) & 0x2) shouldBe 0x2 // memcpy flag
    BloscLz4.decompress(frame, raw.length, "t") shouldBe raw
  }

  test("wire pins: header fields, bstarts point at length-prefixed streams") {
    val ints = Array.tabulate(2048)(k => k % 257)
    val raw = ints.flatMap(v => Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, (v >>> 24).toByte)) // 8192 bytes
    val frame = BloscLz4.compress(raw, typesize = 4, blocksizeReq = 4096)
    def le(p: Int): Int = (frame(p) & 0xff) | ((frame(p + 1) & 0xff) << 8) |
      ((frame(p + 2) & 0xff) << 16) | ((frame(p + 3) & 0xff) << 24)
    frame(0) shouldBe 2 // container version
    (frame(2) & 0x1) shouldBe 0x1 // byte-shuffle on for typesize 4
    (frame(2) >>> 5) shouldBe 1 // compressor code LZ4
    frame(3) shouldBe 4 // typesize
    le(4) shouldBe 8192 // nbytes
    le(8) shouldBe 4096 // blocksize
    le(12) shouldBe frame.length // cbytes spans the whole frame
    // two blocks → two bstarts after the header; first points just past them
    le(16) shouldBe 16 + 8
    val b1 = le(20)
    (b1 > le(16)) shouldBe true
    // each full block splits into typesize=4 streams of 1024 shuffled
    // bytes; walk block 0's four length-prefixed streams to block 1
    var sp = le(16)
    for (_ <- 0 until 4) { val cs = le(sp); (cs > 0 && cs <= 1024) shouldBe true; sp += 4 + cs }
    sp shouldBe b1
  }

  test("corruption fuzz: mutated frames reject loudly or decode — never tear") {
    val ints = Array.tabulate(8192)(k => (k % 787) + (k / 787) * 1000)
    val raw = ints.flatMap(v => Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, (v >>> 24).toByte))
    val frame = BloscLz4.compress(raw, typesize = 4, blocksizeReq = 4096)
    val r = new scala.util.Random(43)
    var rejected = 0
    for (_ <- 0 until 300) {
      val c = frame.clone()
      for (_ <- 0 to r.nextInt(2))
        c(r.nextInt(c.length)) = (c(r.nextInt(c.length)) ^ (1 << r.nextInt(8))).toByte
      try {
        BloscLz4.decompress(c, raw.length, "fuzz").length shouldBe raw.length
      } catch {
        case _: IllegalArgumentException => rejected += 1
      }
    }
    (rejected > 0) shouldBe true
  }

  test("loud rejects: bit-shuffle, foreign compcode, size lies, truncation") {
    val raw = Array.tabulate[Byte](4096)(k => (k % 31).toByte)
    val frame = BloscLz4.compress(raw, typesize = 4)
    def mut(f: Array[Byte] => Unit): IllegalArgumentException = {
      val c = frame.clone(); f(c)
      intercept[IllegalArgumentException](BloscLz4.decompress(c, raw.length, "t"))
    }
    mut(c => c(2) = (c(2) | 0x4).toByte).getMessage should include("bit-shuffle")
    mut(c => c(2) = ((c(2) & 0x1f) | (4 << 5)).toByte) // zlib-in-blosc code
      .getMessage should include("out of scope")
    mut(c => c(4) = (c(4) ^ 1).toByte).getMessage should include("expects")
    intercept[IllegalArgumentException](
      BloscLz4.decompress(frame.take(frame.length - 3), raw.length, "t"))
    intercept[IllegalArgumentException](
      BloscLz4.decompress(frame.take(10), raw.length, "t"))
  }

  test("zstd frames (compcode 5): round-trip, header pins, corruption fuzz") {
    val ints = Array.tabulate(20000)(k => (k % 613) + ((k / 613) % 5) * 50000)
    val raw = ints.flatMap(v => Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, (v >>> 24).toByte))
    val frame = BloscLz4.compress(raw, typesize = 4, blocksizeReq = 4096,
      cname = "zstd")
    frame.length should be < raw.length
    ((frame(2) & 0xff) >>> 5) shouldBe 5 // compressor code zstd
    (frame(2) & 0x10) shouldBe 0x10 // zstd never splits (FORWARD_COMPAT)
    (frame(2) & 0x1) shouldBe 0x1 // byte-shuffle still on for typesize 4
    BloscLz4.decompress(frame, raw.length, "t") shouldBe raw
    // typesize-1 (no shuffle) zstd frame
    val bytes = payload(9000, 11)
    val f1 = BloscLz4.compress(bytes, typesize = 1, cname = "zstd")
    BloscLz4.decompress(f1, bytes.length, "t") shouldBe bytes
    // corruption fuzz: mutated zstd frames reject loudly or decode
    val r = new scala.util.Random(77)
    var rejected = 0
    for (_ <- 0 until 300) {
      val c = frame.clone()
      for (_ <- 0 to r.nextInt(2))
        c(r.nextInt(c.length)) = (c(r.nextInt(c.length)) ^ (1 << r.nextInt(8))).toByte
      try BloscLz4.decompress(c, raw.length, "fuzz").length shouldBe raw.length
      catch { case _: IllegalArgumentException => rejected += 1 }
    }
    (rejected > 0) shouldBe true
  }

  test("split rule honors flags bit 4 and is shuffle-independent (c-blosc >= 1.14 wire)") {
    // Hand-build the two third-party frame shapes the old rule broke:
    // (a) a NO-shuffle LZ4 frame whose full blocks ARE split (numcodecs
    // Blosc shuffle=NOSHUFFLE, legacy split rule: codec-based, not
    // shuffle-based); (b) a shuffled frame with bit 4 SET and unsplit
    // streams (BLOSC_SPLITMODE_NEVER).
    def i32le(v: Int): Array[Byte] = Array((v & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, ((v >>> 16) & 0xff).toByte, (v >>> 24).toByte)
    val ints = Array.tabulate(2048)(k => (k % 401) * 3)
    val raw = ints.flatMap(v => i32le(v)) // 8192 bytes → two 4096 blocks
    def build(flags: Int, streamsOf: Array[Byte] => Seq[Array[Byte]]): Array[Byte] = {
      val body = new java.io.ByteArrayOutputStream()
      val bstarts = new Array[Int](2)
      for (b <- 0 until 2) {
        bstarts(b) = 16 + 8 + body.size()
        val block = java.util.Arrays.copyOfRange(raw, b * 4096, (b + 1) * 4096)
        for (part <- streamsOf(block)) {
          val comp = BloscLz4.lz4Compress(part)
          if (comp.length < part.length) { body.write(i32le(comp.length)); body.write(comp) }
          else { body.write(i32le(part.length)); body.write(part) }
        }
      }
      val out = new java.io.ByteArrayOutputStream()
      out.write(2); out.write(1); out.write(flags); out.write(4)
      out.write(i32le(8192)); out.write(i32le(4096))
      out.write(i32le(16 + 8 + body.size()))
      bstarts.foreach(v => out.write(i32le(v)))
      body.writeTo(out)
      out.toByteArray
    }
    // (a) no shuffle, bit4 clear, blocks split into 4 raw-order streams
    val noShufSplit = build(1 << 5,
      block => (0 until 4).map(s => java.util.Arrays.copyOfRange(block, s * 1024, (s + 1) * 1024)))
    BloscLz4.decompress(noShufSplit, raw.length, "t") shouldBe raw
    // (b) shuffle on, bit4 SET, one stream per block
    val shufNoSplit = build(0x1 | 0x10 | (1 << 5),
      block => Seq(BloscLz4.shuffle(block, 4)))
    BloscLz4.decompress(shufNoSplit, raw.length, "t") shouldBe raw
  }

  test("zarr V3 store (zarr.json, c/ keys, gzip + blosc codecs) scans like its v2 twin") {
    import java.time.LocalDateTime
    val t0 = LocalDateTime.of(2004, 9, 10, 6, 0)
    val t1 = LocalDateTime.of(2004, 10, 10, 18, 0)
    def fields = for ((t, m) <- Seq(t0 -> 0, t1 -> 1); (v, pidx) <- Seq("TMP" -> 0, "VGRD" -> 1))
      yield Zarr.Field(v, t, 29, 13, 40000000L, -10000000L, 2000000L, 1500000L, 1,
        Array.tabulate(29 * 13)(k =>
          if (pidx == 1 && k % 7 == 2) None else Some((k * 11 + m * 3 + pidx * 100) % 600)))
    val r2 = java.nio.file.Files.createTempDirectory("graft-z2")
    val r3g = java.nio.file.Files.createTempDirectory("graft-z3g")
    val r3b = java.nio.file.Files.createTempDirectory("graft-z3b")
    Zarr.writeStore(r2.resolve("s.zarr"), fields, 5, 8)
    Zarr.writeStoreV3(r3g.resolve("s.zarr"), fields, 5, 8, compressor = "gzip")
    Zarr.writeStoreV3(r3b.resolve("s.zarr"), fields, 5, 8, compressor = "blosc-lz4")
    val v2 = Zarr.readRecords(spark, r2.resolve("s.zarr").toString).collect().toSet
    Zarr.readRecords(spark, r3g.resolve("s.zarr").toString).collect().toSet shouldBe v2
    Zarr.readRecords(spark, r3b.resolve("s.zarr").toString).collect().toSet shouldBe v2
    // layout pins: group + array zarr.json, nested c/<t>/<j>/<i> chunks
    val tmpDir = r3g.resolve("s.zarr/TMP")
    java.nio.file.Files.exists(r3g.resolve("s.zarr/zarr.json")) shouldBe true
    java.nio.file.Files.exists(tmpDir.resolve("zarr.json")) shouldBe true
    java.nio.file.Files.exists(tmpDir.resolve("c/1/2/3")) shouldBe true
    val zj = new String(java.nio.file.Files.readAllBytes(tmpDir.resolve("zarr.json")), "UTF-8")
    zj should include(""""node_type":"array"""")
    zj should include(""""name":"gzip"""")
    // v3 metadata walk parses directly too
    val meta = Zarr.parseZarrayV3(zj, "TMP")
    meta.v3 shouldBe true
    meta.comp shouldBe "gzip"
    meta.shape shouldBe Seq(2, 13, 29)
    // scope rejects: sharding codec, weird key encoding
    intercept[IllegalArgumentException](Zarr.parseZarrayV3(
      zj.replace(""""name":"gzip"""", """"name":"sharding_indexed""""), "TMP"))
      .getMessage should include("out of scope")
    intercept[IllegalArgumentException](Zarr.parseZarrayV3(
      zj.replace(""""name":"default"""", """"name":"v2""""), "TMP"))
      .getMessage should include("out of scope")
  }

  test("zarr V3 sharding_indexed: crc32c index, missing inner chunks, scan parity") {
    import java.time.LocalDateTime
    val t0 = LocalDateTime.of(2004, 9, 10, 6, 0)
    val t1 = LocalDateTime.of(2004, 10, 10, 18, 0)
    // PRATE's mask leaves whole inner-chunk regions empty -> MISSING
    // index entries on the wire
    def fields = for ((t, m) <- Seq(t0 -> 0, t1 -> 1); (v, pidx) <- Seq("TMP" -> 0, "PRATE" -> 1))
      yield Zarr.Field(v, t, 29, 13, 40000000L, -10000000L, 2000000L, 1500000L, 1,
        Array.tabulate(29 * 13) { k =>
          val j = k / 29; val i = k % 29
          if (pidx == 1 && j < 3 && i < 8) None // kills inner chunk (0,0) entirely
          else if (pidx == 1 && (i + j + m) % 7 == 2) None
          else Some((k * 13 + m * 7 + pidx * 50) % 800)
        })
    val rP = java.nio.file.Files.createTempDirectory("graft-z3p") // plain chunks
    val rS = java.nio.file.Files.createTempDirectory("graft-z3s") // sharded
    Zarr.writeStoreV3(rP.resolve("s.zarr"), fields, 3, 8, compressor = "gzip")
    // shards of [1,6,16] with inner [1,3,8]: 2x2 inner grid per shard
    Zarr.writeStoreV3(rS.resolve("s.zarr"), fields, 6, 16, compressor = "gzip",
      innerJ = 3, innerI = 8)
    val plain = Zarr.readRecords(spark, rP.resolve("s.zarr").toString).collect().toSet
    Zarr.readRecords(spark, rS.resolve("s.zarr").toString).collect().toSet shouldBe plain
    // wire pins on shard 0/0/0 of PRATE: 4 index entries of 16 bytes +
    // crc32c at the end; entry 0 (inner chunk 0,0) is MISSING (all-ones)
    val shard = java.nio.file.Files.readAllBytes(
      rS.resolve("s.zarr/PRATE/c/0/0/0"))
    val idxOff = shard.length - (16 * 4 + 4)
    (0 until 16).forall(k => shard(idxOff + k) == -1) shouldBe true // missing pair
    val crc = new java.util.zip.CRC32C()
    crc.update(shard, idxOff, 64)
    val stored = (0 until 4).map(k =>
      (shard(idxOff + 64 + k) & 0xffL) << (8 * k)).sum
    crc.getValue shouldBe stored
    // a flipped crc byte rejects loudly
    shard(idxOff + 64) = (shard(idxOff + 64) ^ 0x5a).toByte
    java.nio.file.Files.write(rS.resolve("s.zarr/PRATE/c/0/0/0"), shard)
    val e = intercept[org.apache.spark.SparkException](
      Zarr.readRecords(spark, rS.resolve("s.zarr").toString).collect())
    e.getMessage should include("crc32c")
    // metadata parse exposes the sharding shape
    val zj = new String(java.nio.file.Files.readAllBytes(
      rS.resolve("s.zarr/TMP/zarr.json")), "UTF-8")
    val meta = Zarr.parseZarrayV3(zj, "TMP")
    meta.chunks shouldBe Seq(1, 6, 16)
    meta.innerChunks shouldBe Seq(1, 3, 8)
    meta.innerComp shouldBe "gzip"
    meta.indexCrc shouldBe true
    // inner shape not dividing the shard rejects
    intercept[IllegalArgumentException](Zarr.parseZarrayV3(
      zj.replace(""""chunk_shape":[1,3,8]""", """"chunk_shape":[1,4,8]"""), "TMP"))
      .getMessage should include("divide")
  }

  test("zarr store with blosc-lz4 chunks scans identically to its zlib twin") {
    import java.time.LocalDateTime
    val t0 = LocalDateTime.of(2004, 9, 10, 6, 0)
    def fields = Seq(
      Zarr.Field("TMP", t0, 29, 13, 40000000L, -10000000L, 2000000L, 1500000L, 1,
        Array.tabulate(29 * 13)(k => if (k % 11 == 3) None else Some(k * 7 % 500))))
    val rootA = java.nio.file.Files.createTempDirectory("graft-zb")
    val rootB = java.nio.file.Files.createTempDirectory("graft-zz")
    Zarr.writeStore(rootA.resolve("s.zarr"), fields, 5, 8, compressor = "blosc-lz4")
    Zarr.writeStore(rootB.resolve("s.zarr"), fields, 5, 8, compressor = "zlib")
    val a = Zarr.readRecords(spark, rootA.resolve("s.zarr").toString).collect()
    val b = Zarr.readRecords(spark, rootB.resolve("s.zarr").toString).collect()
    a.toSet shouldBe b.toSet
    a.length shouldBe (29 * 13 - fields.head.scaled.count(_.isEmpty))
    // the .zarray advertises the numcodecs blosc codec shape
    val za = new String(java.nio.file.Files.readAllBytes(
      rootA.resolve("s.zarr/TMP/.zarray")), "UTF-8")
    za should include(""""id":"blosc"""")
    za should include(""""cname":"lz4"""")
  }
}
