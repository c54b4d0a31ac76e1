package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal binary-column plumbing: schema'd payloads, codegen'd frame
  * sampling, and the mapPartitions decode pipeline (stub decoder — the
  * Spark-side batch shape is what's under test).
  */
class MultimodalSpec extends SparkSpec {
  import graft.implicits._

  test("withPayload carries bytes + typed metadata") {
    val p = Multimodal.withPayload(table("documents"))
    p.schema("payload").dataType.typeName shouldBe "binary"
    val row = p.where($"doc_id" === 0).select($"meta.n_bytes", $"payload").head()
    row.getLong(0) shouldBe row.getAs[Array[Byte]](1).length.toLong
  }

  test("frame sampling covers the payload head at the declared stride") {
    val f = Multimodal.frameSample(table("documents"), frameChars = 64, maxFrames = 4)
    // every doc emits ≥1 frame, ≤4 frames, frame_nos contiguous from 0
    val perDoc = f.groupBy($"doc_id")
      .agg(count(lit(1)).as("n"), min($"frame_no").as("mn"), max($"frame_no").as("mx"))
    perDoc.where($"mn" =!= 0 || $"mx" =!= $"n" - 1 || $"n" > 4).count() shouldBe 0
    val docs = table("documents").count()
    perDoc.count() shouldBe docs
    // a 64+-char doc's first frame is exactly 64 chars of UTF-8 bytes
    val first = f.join(table("documents"), "doc_id")
      .where(expr("length(text) >= 64") && $"frame_no" === 0)
    first.where($"frame_bytes" < 64).count() shouldBe 0
  }

  test("decodeFeatures runs the stub decoder distributed with a typed schema") {
    val feats = Multimodal.decodeFeatures(table("documents"))
    val n = table("documents").count()
    feats.count() shouldBe n
    val r = feats.filter(_.doc_id == 0L).head()
    // checksum agrees with the engine's own md5 of the payload
    val expected = table("documents").where($"doc_id" === 0)
      .select(md5($"text".cast("binary"))).head().getString(0)
    r.checksum shouldBe expected
    r.width should be >= 16
    r.height should be >= 16
    r.mean_luma should (be >= 0.0 and be <= 1.0)
  }

  test("imagePhash: 8x8 image (1-pixel blocks) reduces aHash to pixel-vs-mean, verified directly") {
    // doc_id 0 -> w = 8, h = 8: every block is one pixel, so the hash is
    // exactly "pixel > integer-scaled global mean" over the raw formula
    val out = Multimodal.imagePhash(spark.range(0, 1).toDF("doc_id")).collect().head
    out.width shouldBe 8L
    out.height shouldBe 8L
    val px = for (k <- 0 until 64) yield (7 * (k % 8) + 13 * (k / 8)) % 256
    val m = px.map(_ * 27720L)
    val tot = m.sum
    var hi = 0L; var lo = 0L
    for (k <- 0 until 64 if m(k) * 64 > tot)
      if (k < 32) lo |= (1L << k) else hi |= (1L << (k - 32))
    out.hash_hi shouldBe hi
    out.hash_lo shouldBe lo
    out.n_set shouldBe java.lang.Long.bitCount(hi) + java.lang.Long.bitCount(lo)
  }

  test("imagePhash: only the PNG third of the corpus hashes; bits are never degenerate") {
    val ids = spark.range(0, 60).toDF("doc_id")
    val out = Multimodal.imagePhash(ids).collect()
    out.map(_.doc_id).toSeq shouldBe (0L until 60L by 3L).toSeq
    // the gradient field always has above- and below-mean blocks
    all(out.map(_.n_set)) should (be > 0L and be < 64L)
  }

  test("jpegPhash: bits recovered through the full baseline decode equal the formula-direct hash") {
    val ids = spark.range(0, 40).toDF("doc_id")
    val out = Multimodal.jpegPhash(ids).collect()
    out.map(_.doc_id).toSeq shouldBe (0L until 40L).toSeq
    out.foreach { r =>
      // regenerate the hash straight from the closed-form pixel field —
      // agreement means Huffman + dequant + IDCT were all lossless here
      val d = r.doc_id
      val (w, h) = ((9 + d % 24).toInt, (9 + (3 * d) % 16).toInt)
      (r.width, r.height) shouldBe ((w.toLong, h.toLong))
      val s = Array.ofDim[Long](8, 8); val c = Array.ofDim[Long](8, 8)
      for (y <- 0 until h; x <- 0 until w) {
        s(y * 8 / h)(x * 8 / w) += (19 * (x / 8) + 23 * (y / 8) + 29 * (d % 97)) % 256
        c(y * 8 / h)(x * 8 / w) += 1
      }
      val m = Array.tabulate(64)(k => s(k / 8)(k % 8) * (Multimodal.PhashScale / c(k / 8)(k % 8)))
      val tot = m.sum
      var hi = 0L; var lo = 0L
      for (k <- 0 until 64 if m(k) * 64 > tot)
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      (r.hash_hi, r.hash_lo) shouldBe ((hi, lo))
    }
  }

  test("audioFrames: features recovered from WAV bytes equal the formula-direct values") {
    val ids = spark.range(0, 30).toDF("doc_id")
    val out = Multimodal.audioFrames(ids).collect()
    // only the WAV third of the fixture, every frame accounted for
    out.map(_.getLong(0)).distinct.toSeq shouldBe (2L until 30L by 3L).toSeq
    out.foreach { r =>
      val d = r.getLong(0)
      val n = (64 + d % 193).toInt
      val f = r.getLong(2).toInt
      r.getLong(1) shouldBe 8000 + (d % 5) * 4000
      val xs = (f * 32 until math.min(f * 32 + 32, n))
        .map(k => (31L * k + 7 * d) % 2048 - 1024)
      r.getLong(3) shouldBe xs.size.toLong            // n_samples
      r.getLong(4) shouldBe xs.sum                    // sum_amp
      r.getLong(5) shouldBe xs.map(x => x * x).sum    // energy
      r.getLong(6) shouldBe xs.map(math.abs).max      // peak
      r.getLong(7) shouldBe xs.sliding(2).count(p =>  // zero_crossings
        p.size == 2 && (p(0) >= 0) != (p(1) >= 0))
    }
    // last frame of a non-multiple-of-32 stream is partial, not padded
    val d2 = out.filter(_.getLong(0) == 2L)
    d2.map(_.getLong(3)).sum shouldBe 64 + 2 % 193
  }

  test("imageResize: floor-mean box filter agrees with a direct recomputation from the decoder") {
    val docs = spark.range(0, 30).select($"id".as("doc_id"))
    val out = Multimodal.imageResize(docs.toDF(), 4, 4).collect()
    out.map(_.getLong(0)).distinct.toSeq shouldBe (0L until 30L by 3L).toSeq
    out.groupBy(_.getLong(0)).foreach { case (_, rows) => rows.length shouldBe 16 }
    out.foreach { r =>
      val (id, oy, ox) = (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt)
      val (w, h, img) = graft.sources.AssetCodecs.decodePngImage(Multimodal.assetFor(id))
      val cells = for {
        y <- 0 until h if y * 4 / h == oy
        x <- 0 until w if x * 4 / w == ox
      } yield (img(y)(x) & 0xff).toLong
      r.getLong(4) shouldBe cells.sum                    // s
      r.getLong(5) shouldBe cells.size.toLong            // c
      r.getLong(3) shouldBe cells.sum / cells.size       // pix = floor mean
    }
  }

  test("imageNearDups: banded join equals brute force over the decoded hashes") {
    val docs = spark.range(0, 120).select($"id".as("doc_id")).toDF()
    val hashes = Multimodal.imagePhash(docs).collect()
      .map(p => p.doc_id -> ((p.hash_hi << 32) | p.hash_lo)).toMap
    def brute(t: Int) = (for {
      (a, sa) <- hashes.toSeq; (b, sb) <- hashes.toSeq if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= t
    } yield (a, b, h.toLong)).toSet
    for (t <- Seq(1, 3, 7)) {
      Multimodal.imageNearDups(docs, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet shouldBe brute(t)
    }
    brute(7) should not be empty // the fixture genuinely holds near-dups
    // the hot-band cap only ever DROPS pairs (bounded-join mode), and a
    // generous cap changes nothing on this corpus
    val capped = Multimodal.imageNearDups(docs, 3, maxBandFreq = Some(2)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    capped.subsetOf(brute(3)) shouldBe true
    Multimodal.imageNearDups(docs, 3, maxBandFreq = Some(1000)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet shouldBe brute(3)
    // band widths that don't tile 64 bits refuse loudly
    an[IllegalArgumentException] should be thrownBy
      Multimodal.imageNearDups(docs, 2)
  }

  test("audioResample: every output sample matches a scalar replay; endpoints exact") {
    val docs = spark.range(0, 30).select($"id".as("doc_id")).toDF()
    val out = Multimodal.audioResample(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val perDoc = out.keys.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    for (d <- 0L until 30L if d % 3 == 2) {
      val xs = graft.sources.AssetCodecs
        .decodeWavSamples(Multimodal.silenceWavFor(d))._2.map(_.toInt)
      val nOut = (xs.length - 1) * 3 / 2 + 1
      perDoc(d) shouldBe (nOut - 1).toLong
      for (j <- 0 until nOut) {
        val t = j * 2; val i = t / 3; val f = t % 3
        val xi1 = if (i + 1 < xs.length) xs(i + 1) else 0
        val expect = ((3 - f) * (xs(i) + 1024) + f * (xi1 + 1024)) / 3 - 1024
        out((d, j.toLong)) shouldBe expect.toLong
      }
      // L/M=3/2 interleave: every third output is an exact input sample
      for (j <- 0 until nOut if j % 3 == 0) out((d, j.toLong)) shouldBe xs(j * 2 / 3).toLong
    }
    an[IllegalArgumentException] should be thrownBy
      Multimodal.audioResample(docs, l = 0, m = 2)
  }

  test("audioMixdown: scalar replay of decode, biased floor mixdown, and milli-gain") {
    val docs = spark.range(0, 30).select($"id".as("doc_id")).toDF()
    val out = Multimodal.audioMixdown(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    out.keySet shouldBe (0L until 30L).filter(_ % 3 == 2).toSet
    for (d <- out.keys) {
      val (rate, ch, inter) = graft.sources.AssetCodecs
        .decodeWavPcm(Multimodal.stereoAssetFor(d))
      ch shouldBe 2
      val mono = inter.grouped(2).map { case Array(l, r) =>
        (l.toLong + r + 4096L >> 1) - 2048L }.toArray
      val peak = mono.map(math.abs).max
      val gain = 32000000L / math.max(peak, 1L)
      val norm = mono.map(x => Math.floorDiv(x * gain + 65536000000L, 1000L) - 65536000L)
      val r0 = out(d)
      r0.getLong(1) shouldBe rate.toLong
      r0.getLong(2) shouldBe mono.length.toLong
      r0.getLong(3) shouldBe peak
      r0.getLong(4) shouldBe gain
      r0.getLong(5) shouldBe norm.map(math.abs).max
      r0.getLong(6) shouldBe norm.sum
      r0.getLong(7) shouldBe norm.map(y => y * y).sum
      // normalization actually lands near the -0.2 dBFS-ish target
      r0.getLong(5) should be <= 32050L
      r0.getLong(5) should be >= 31000L
    }
  }

  test("WAV multi-channel codec: stereo round-trip, mono compat, scope rejects") {
    val inter = Array.tabulate[Short](10)(i => (i * 37 - 100).toShort)
    val bytes = graft.sources.AssetCodecs.encodeWavMulti(22050, 2, inter)
    val (rate, ch, back) = graft.sources.AssetCodecs.decodeWavPcm(bytes)
    (rate, ch) shouldBe ((22050, 2))
    back shouldBe inter
    // the mono decoder refuses multi-channel loudly
    an[IllegalArgumentException] should be thrownBy
      graft.sources.AssetCodecs.decodeWavSamples(bytes)
    // mono payloads decode identically through both entry points
    val m = graft.sources.AssetCodecs.encodeWav(8000, inter)
    graft.sources.AssetCodecs.decodeWavPcm(m)._3 shouldBe
      graft.sources.AssetCodecs.decodeWavSamples(m)._2
    an[IllegalArgumentException] should be thrownBy
      graft.sources.AssetCodecs.encodeWavMulti(8000, 2, Array[Short](1, 2, 3))
    an[IllegalArgumentException] should be thrownBy
      graft.sources.AssetCodecs.encodeWavMulti(8000, 9, new Array[Short](9))
  }

  test("silenceSegments: islands match a brute-force scan of the decoded PCM") {
    val docs = spark.range(0, 41).select($"id".as("doc_id")).toDF()
    val out = Multimodal.silenceSegments(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val expected = (0L until 41L).filter(_ % 3 == 2).flatMap { d =>
      val (_, samples) =
        graft.sources.AssetCodecs.decodeWavSamples(Multimodal.silenceWavFor(d))
      val xs = samples.map(_.toInt)
      val segs = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Long)]()
      var i = 0
      while (i < xs.length) {
        if (math.abs(xs(i)) < 256) {
          var j = i
          while (j + 1 < xs.length && math.abs(xs(j + 1)) < 256) j += 1
          if (j - i + 1 >= 32)
            segs += ((d, i.toLong, j.toLong, (j - i + 1).toLong,
              xs.slice(i, j + 1).map(x => x.toLong * x).sum))
          i = j + 1
        } else i += 1
      }
      segs
    }
    out.toSeq shouldBe expected
    // non-vacuity: real segments exist, and at least one run extends past
    // its quiet 48-block because adjacent LOUD samples dipped under the
    // threshold (boundaries are data-driven, not block-aligned)
    expected.size should be > 10
    expected.exists { case (_, s, e, _, _) =>
      s % 48 != 0 || (e + 1) % 48 != 0 } shouldBe true
  }

  test("silenceSegments: threshold and minRun bound the emitted runs") {
    val docs = spark.range(0, 20).select($"id".as("doc_id")).toDF()
    // minRun 1 emits a superset of the default's segments
    val loose = Multimodal.silenceSegments(docs, minRun = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val strict = Multimodal.silenceSegments(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    strict.subsetOf(loose) shouldBe true
    strict.size should be < loose.size
    // a threshold of 1 can match nothing: |x| < 1 means x == 0 exactly,
    // and runs of literal zeros of length >= 32 don't occur on the lattice
    Multimodal.silenceSegments(docs, threshold = 1).count() shouldBe 0L
  }

  test("whtPhash: formula replay, DC always set, Parseval energy law") {
    val docs = spark.range(0, 90).select($"id".as("doc_id")).toDF()
    val rows = Multimodal.whtPhash(docs).collect()
    rows.length shouldBe 30 // the PNG third
    for (r <- rows) {
      val d = r.getLong(0)
      val w = (8 + d % 24).toInt; val h = (8 + (3 * d) % 16).toInt
      (r.getLong(1), r.getLong(2)) shouldBe ((w.toLong, h.toLong))
      // replay: pixels -> scaled block means -> WHT, independently
      val s = Array.ofDim[Long](8, 8); val c = Array.ofDim[Long](8, 8)
      for (y <- 0 until h; x <- 0 until w) {
        s(y * 8 / h)(x * 8 / w) += (7 * x + 13 * y + d) % 256
        c(y * 8 / h)(x * 8 / w) += 1
      }
      val m = Array.tabulate(8, 8)((by, bx) => s(by)(bx) * (27720L / c(by)(bx)))
      val coefs = for (u <- 0 until 8; v <- 0 until 8) yield
        (for (by <- 0 until 8; bx <- 0 until 8) yield
          m(by)(bx) * (if (((Integer.bitCount(by & u) + Integer.bitCount(bx & v)) & 1) == 1) -1 else 1)).sum
      var hi = 0L; var lo = 0L
      coefs.zipWithIndex.foreach { case (cf, k2) =>
        if (cf > 0) { if (k2 < 32) lo |= (1L << k2) else hi |= (1L << (k2 - 32)) }
      }
      (r.getLong(3), r.getLong(4)) shouldBe ((hi, lo))
      r.getLong(5) shouldBe coefs.count(_ > 0).toLong
      r.getLong(6) shouldBe coefs.head
      r.getLong(7) shouldBe coefs.map(math.abs).sum
      // DC = total mass, positive on any nonzero image -> bit 0 set
      (r.getLong(4) & 1L) shouldBe 1L
      r.getLong(6) shouldBe m.flatten.sum
      // Parseval for the unnormalized WHT: sum(coef^2) = 64 * sum(m^2);
      // the engine's energy/dc must be consistent with that identity
      coefs.map(cf => cf * cf).sum shouldBe 64L * m.flatten.map(x => x * x).sum
    }
  }

  test("sceneDetect: designed cuts flagged, within-scene drift not, SAD exact") {
    val docs = spark.range(0, 30).select($"id".as("doc_id")).toDF()
    val out = Multimodal.sceneDetect(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3))).toMap
    for (d <- 0L until 30L) {
      val w = 8 + d % 8; val h = 6 + (3 * d) % 6; val nf = 4 + d % 3
      def v(f: Long, x: Long, y: Long): Long = {
        val s = (if (f >= 2) 1 else 0) + (if (f >= 4) 1 else 0)
        (13 * x + 5 * y + 97 * s + f) % 251
      }
      for (f <- 1L until nf) {
        val sad = (for (x <- 0L until w; y <- 0L until h)
          yield math.abs(v(f, x, y) - v(f - 1, x, y))).sum
        out((d, f)) shouldBe ((sad, sad >= 30 * w * h))
        // the semantic claim, not just formula equality: cuts sit at
        // exactly f=2 and f=4
        out((d, f))._2 shouldBe (f == 2L || f == 4L)
      }
    }
  }

  test("blurDetect: Laplacian variance recomputes from the closed-form lattice") {
    import spark.implicits._
    val out = Multimodal.blurDetect(table("documents")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7))).toMap
    val ids = table("documents").select(col("doc_id")).as[Long].collect()
      .filter(_ % 3 == 0)
    out.keySet shouldBe ids.toSet
    for (id <- ids) {
      val w = (8 + id % 24).toInt; val h = (8 + (3 * id) % 16).toInt
      def p(y: Int, x: Int): Long = (7L * x + 13L * y + id) % 256
      var n = 0L; var s = 0L; var s2 = 0L
      for (y <- 1 until h - 1; x <- 1 until w - 1) {
        val d = 4 * p(y, x) - p(y - 1, x) - p(y + 1, x) - p(y, x - 1) - p(y, x + 1)
        n += 1; s += d; s2 += d * d
      }
      val varMilli = 1000L * (n * s2 - s * s) / (n * n)
      val band = if (varMilli < 18000000L) "blurry" else "sharp"
      out(id) shouldBe ((w.toLong, h.toLong, n, s, s2, varMilli, band))
      // population variance numerator is Cauchy–Schwarz nonnegative and
      // the interior count is exactly (w-2)(h-2)
      (n * s2 - s * s) should be >= 0L
      n shouldBe (w - 2).toLong * (h - 2)
    }
  }

  test("dominantColor: RGB444 histogram recomputes from the tile-constant lattice") {
    val out = Multimodal.dominantColor(table("documents")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    out should not be empty
    for ((id, (w, h, nColors, key, cnt, share)) <- out) {
      val wi = (17 + id % 16).toInt; val hi = (17 + (3 * id) % 8).toInt
      val counts = scala.collection.mutable.Map.empty[Long, Long]
      for (ty <- 0 until (hi + 15) / 16; tx <- 0 until (wi + 15) / 16) {
        val area = (math.min(16 * (tx + 1), wi) - 16 * tx).toLong *
          (math.min(16 * (ty + 1), hi) - 16 * ty)
        val yv = ((17 * tx + 29 * ty + 31 * (id % 89)) % 256).toInt
        val cb = ((23 * tx + 13 * ty + 7 * (id % 83)) % 256).toInt
        val cr = ((11 * tx + 19 * ty + 5 * (id % 79)) % 256).toInt
        val (r, g, b) = graft.sources.AssetCodecs.ycbcrToRgb(yv, cb, cr)
        val k = ((r >> 4) << 8 | (g >> 4) << 4 | (b >> 4)).toLong
        counts(k) = counts.getOrElse(k, 0L) + area
      }
      val (expKey, expCnt) = counts.toSeq.sortBy { case (k, c) => (-c, k) }.head
      (w, h) shouldBe ((wi.toLong, hi.toLong))
      nColors shouldBe counts.size.toLong
      (key, cnt) shouldBe ((expKey, expCnt))
      share shouldBe 1000L * expCnt / (wi.toLong * hi)
      // histogram closure: the modal cell never exceeds the pixel count
      cnt should be <= wi.toLong * hi
    }
  }

  test("sobelEdges: both kernels recompute from the lattice; edges are the wrap seams") {
    val out = Multimodal.sobelEdges(table("documents")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))).toMap
    out should not be empty
    for ((id, (w, h, n, edges, energy, density, band)) <- out) {
      val wi = (8 + id % 24).toInt; val hi = (8 + (3 * id) % 16).toInt
      def p(y: Int, x: Int): Long = (7L * x + 13L * y + id) % 256
      var en = 0L; var ec = 0L; var nn = 0L
      for (y <- 1 until hi - 1; x <- 1 until wi - 1) {
        val gx = (p(y - 1, x + 1) + 2 * p(y, x + 1) + p(y + 1, x + 1)) -
          (p(y - 1, x - 1) + 2 * p(y, x - 1) + p(y + 1, x - 1))
        val gy = (p(y + 1, x - 1) + 2 * p(y + 1, x) + p(y + 1, x + 1)) -
          (p(y - 1, x - 1) + 2 * p(y - 1, x) + p(y - 1, x + 1))
        val g2 = gx * gx + gy * gy
        nn += 1; en += g2; if (g2 >= 20000) ec += 1
        // lattice law: the plane's constant gradient is g² = 13952 and
        // any wrap displaces gx/gy by ±256 per term — g² never drops
        // below the plane value, so the threshold separates seams exactly
        g2 should be >= 13952L
        (g2 >= 20000) shouldBe (g2 != 13952L)
      }
      (w, h, n) shouldBe ((wi.toLong, hi.toLong, nn))
      edges shouldBe ec
      energy shouldBe en
      density shouldBe 1000L * ec / nn
      band shouldBe (if (density >= 250) "busy" else "clean")
    }
    // at least one image on each side of the band at the fixture sizes
    out.values.map(_._7).toSet shouldBe Set("busy", "clean")
  }

  test("histEqualize: CDF remap recomputes from the lattice; range stretches to [0, 255]") {
    val out = Multimodal.histEqualize(table("documents")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    out should not be empty
    for ((id, (w, h, nVals, outMin, outMax, chk)) <- out) {
      // independent recompute from the closed-form pixel lattice
      val wi = (8 + id % 24).toInt; val hi = (8 + (3 * id) % 16).toInt
      def p(y: Int, x: Int): Int = ((7L * x + 13L * y + id) % 256).toInt
      val n = wi.toLong * hi
      val hist = new Array[Long](256)
      for (y <- 0 until hi; x <- 0 until wi) hist(p(y, x)) += 1
      var run = 0L; var cdfMin = -1L
      val cdf = hist.map { c => run += c; if (c > 0 && cdfMin < 0) cdfMin = run; run }
      def outOf(v: Int): Long =
        if (n == cdfMin) 0L else (cdf(v) - cdfMin) * 255 / (n - cdfMin)
      var expChk = 0L
      for (y <- 0 until hi; x <- 0 until wi)
        expChk += outOf(p(y, x)) * (y.toLong * wi + x + 1)
      (w, h) shouldBe ((wi.toLong, hi.toLong))
      nVals shouldBe hist.count(_ > 0).toLong
      chk shouldBe expChk
      // equalization law: a non-constant image stretches to full range
      if (nVals >= 2) { outMin shouldBe 0L; outMax shouldBe 255L }
    }
  }

  test("clippingDetect: rails, first index, and flat-top run recompute exactly") {
    val out = Multimodal.clippingDetect(table("documents")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    out should not be empty
    for ((id, (n, nClip, clipMilli, maxRun, first)) <- out) {
      val len = (64 + id % 193).toInt
      val xs = Array.tabulate(len)(k => ((31L * k + 7 * id) % 2048) - 1024)
      val clip = xs.map(x => math.abs(x) >= 1000)
      val expClip = clip.count(identity).toLong
      var run = 0L; var expMax = 0L
      clip.foreach { c => if (c) { run += 1; expMax = expMax max run } else run = 0 }
      val expFirst = clip.indexWhere(identity) match {
        case -1 => -1L; case i => i.toLong
      }
      n shouldBe len.toLong
      nClip shouldBe expClip
      clipMilli shouldBe 1000L * expClip / len
      maxRun shouldBe expMax
      first shouldBe expFirst
      // the rail law: a clipped sample really sits within 24 LSB of a rail
      xs.zip(clip).foreach { case (x, c) =>
        if (c) (x >= 1000 || x <= -1000) shouldBe true
      }
    }
    // the fixture exercises real flat-tops somewhere: a run >= 2 exists
    out.values.map(_._4).max should be >= 2L
  }

  test("bitplaneComplexity: per-plane transitions recompute; low planes flip faster") {
    val out = Multimodal.bitplaneComplexity(table("documents")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    out should not be empty
    val ids = out.keySet.map(_._1)
    for (id <- ids) {
      val wi = (8 + id % 24).toInt; val hi = (8 + (3 * id) % 16).toInt
      def p(y: Int, x: Int): Int = ((7L * x + 13L * y + id) % 256).toInt
      for (b <- 0 to 7) {
        var n = 0L
        for (y <- 0 until hi; x <- 0 until wi - 1)
          if ((((p(y, x) ^ p(y, x + 1)) >> b) & 1) == 1) n += 1
        val (w, h, trans, density) = out((id, b.toLong))
        (w, h) shouldBe ((wi.toLong, hi.toLong))
        trans shouldBe n
        density shouldBe 1000L * n / (hi.toLong * (wi - 1))
      }
      // the +7 horizontal step flips bit 0 at every pixel: plane 0 is
      // saturated (density exactly 1000), and planes sum sensibly
      out((id, 0L))._4 shouldBe 1000L
    }
  }

  test("patchify: full 4x4 patches recompute; the remainder crop is exact") {
    val out = Multimodal.patchify(table("documents")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    out should not be empty
    val ids = out.keySet.map(_._1)
    for (id <- ids) {
      val wi = (8 + id % 24).toInt; val hi = (8 + (3 * id) % 16).toInt
      def p(y: Int, x: Int): Long = (7L * x + 13L * y + id) % 256
      val (pw, ph) = (wi / 4, hi / 4)
      out.keySet.count(_._1 == id) shouldBe pw * ph
      for (py <- 0 until ph; px <- 0 until pw) {
        var s = 0L; var q = 0L
        for (y <- py * 4 until py * 4 + 4; x <- px * 4 until px * 4 + 4) {
          val v = p(y, x); s += v; q += v * v
        }
        val (n, sv, sq, vn) = out((id, py.toLong, px.toLong))
        n shouldBe 16L
        sv shouldBe s
        sq shouldBe q
        vn shouldBe 16L * q - s * s
        vn should be >= 0L // Cauchy-Schwarz
      }
    }
  }

  test("grayWorld: channel gains and the corrected checksum recompute from tiles") {
    val out = Multimodal.grayWorld(table("documents")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))).toMap
    out should not be empty
    for ((id, (w, h, sr, sg, sb, gr, gb, chk)) <- out) {
      val wi = (17 + id % 16).toInt; val hi = (17 + (3 * id) % 8).toInt
      var esr = 0L; var esg = 0L; var esb = 0L
      val tiles = for (ty <- 0 until (hi + 15) / 16; tx <- 0 until (wi + 15) / 16)
        yield {
          val yv = ((17 * tx + 29 * ty + 31 * (id % 89)) % 256).toInt
          val cb = ((23 * tx + 13 * ty + 7 * (id % 83)) % 256).toInt
          val cr = ((11 * tx + 19 * ty + 5 * (id % 79)) % 256).toInt
          val (r, g, b) = graft.sources.AssetCodecs.ycbcrToRgb(yv, cb, cr)
          (tx, ty, r.toLong, g.toLong, b.toLong)
        }
      for ((tx, ty, r, g, b) <- tiles) {
        val area = (math.min(16 * (tx + 1), wi) - 16 * tx).toLong *
          (math.min(16 * (ty + 1), hi) - 16 * ty)
        esr += r * area; esg += g * area; esb += b * area
      }
      val egr = if (esr > 0) 1000L * esg / esr else 1000L
      val egb = if (esb > 0) 1000L * esg / esb else 1000L
      var echk = 0L
      for ((tx, ty, r, g, b) <- tiles) {
        val rc = math.min(255L, r * egr / 1000L)
        val bc = math.min(255L, b * egb / 1000L)
        for (y <- 16 * ty until math.min(16 * (ty + 1), hi);
             x <- 16 * tx until math.min(16 * (tx + 1), wi))
          echk += (rc + 2L * g + 3L * bc) * (y.toLong * wi + x + 1)
      }
      (w, h) shouldBe ((wi.toLong, hi.toLong))
      (sr, sg, sb) shouldBe ((esr, esg, esb))
      (gr, gb) shouldBe ((egr, egb))
      chk shouldBe echk
      // gray-world law: corrected channel sums move toward the G mean
      // (the gains are exactly the ratio, floored)
      gr shouldBe (if (esr > 0) 1000L * esg / esr else 1000L)
    }
  }

  test("histMatch: the quadratic-reference inverse lookup recomputes; map is monotone") {
    val out = Multimodal.histMatch(table("documents")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    out should not be empty
    for ((id, (w, h, nVals, outMin, outMax, chk)) <- out) {
      val wi = (8 + id % 24).toInt; val hi = (8 + (3 * id) % 16).toInt
      def p(y: Int, x: Int): Int = ((7L * x + 13L * y + id) % 256).toInt
      val n = wi.toLong * hi
      val hist = new Array[Long](256)
      for (y <- 0 until hi; x <- 0 until wi) hist(p(y, x)) += 1
      var run = 0L
      val cdf = hist.map { c => run += c; run }
      val outMap = Array.tabulate(256) { v =>
        var u = 0
        while ((u + 1).toLong * (u + 1) * n < 65536L * cdf(v)) u += 1
        u.toLong
      }
      var expChk = 0L
      for (y <- 0 until hi; x <- 0 until wi)
        expChk += outMap(p(y, x)) * (y.toLong * wi + x + 1)
      (w, h) shouldBe ((wi.toLong, hi.toLong))
      chk shouldBe expChk
      val present = (0 until 256).filter(hist(_) > 0)
      outMin shouldBe present.map(outMap).min
      outMax shouldBe present.map(outMap).max
      nVals shouldBe present.map(outMap).distinct.size.toLong
      // specification law: the remap is monotone and tops out at 255
      // (the full CDF maps the last present value to the reference max)
      present.sliding(2).foreach {
        case Seq(a, b) => outMap(a) should be <= outMap(b)
        case _ =>
      }
      outMap(present.last) shouldBe 255L
    }
  }

  test("onsetDetect: frame energies and 1.5x jumps recompute from the samples") {
    val out = Multimodal.onsetDetect(table("documents")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out should not be empty
    for ((id, (nf, onsets, first)) <- out) {
      val len = (64 + id % 193).toInt
      val xs = Array.tabulate(len)(k => ((31L * k + 7 * id) % 2048) - 1024)
      val expNf = (len + 31) / 32
      val e = new Array[Long](expNf)
      xs.zipWithIndex.foreach { case (x, k) => e(k / 32) += x * x }
      val hits = (1 until expNf).filter(f => 2 * e(f) > 3 * e(f - 1) && e(f) >= 1000)
      nf shouldBe expNf.toLong
      onsets shouldBe hits.size.toLong
      first shouldBe (if (hits.isEmpty) -1L else hits.head.toLong)
    }
  }

  test("audioFeatures: ZCR/energy/peak recompute from the closed-form samples") {
    val out = Multimodal.audioFeatures(table("documents")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    out should not be empty
    for ((id, (rate, n, zcr, energy, absSum, peak)) <- out) {
      val len = (64 + id % 193).toInt
      val xs = Array.tabulate(len)(k => ((31L * k + 7 * id) % 2048) - 1024)
      def sgn(x: Long) = if (x >= 0) 1 else -1
      val expZcr = (1 until len).count(k => sgn(xs(k)) != sgn(xs(k - 1))).toLong
      rate shouldBe 8000 + (id % 5) * 4000
      n shouldBe len.toLong
      zcr shouldBe expZcr
      energy shouldBe xs.map(x => x * x).sum
      absSum shouldBe xs.map(math.abs).sum
      peak shouldBe xs.map(math.abs).max
      // sample domain laws
      peak should be <= 1024L
      zcr should be <= n - 1
    }
  }
}
