package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.implicits._
import graft.sources.AssetCodecs

/** Decoded-asset feature row produced by [[Multimodal.decodeFeatures]]. */
case class AssetFeatures(doc_id: Long, n_bytes: Long, checksum: String,
                         width: Int, height: Int, mean_luma: Double)

/** Multimodal-column operators (north-star extension): image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata, and
  * per-asset kernels (decode, feature-extract, frame-sample) run as
  * distributed per-partition functions over the bytes.
  *
  * The reference's multimodal analog is its GRIB byte-stream handling —
  * opaque binary in, per-record kernels out (SURVEY.md §1.2 Binary,
  * src/download.js:58-94 byteranges reassembly) — and this module is the
  * Spark-native shape of that: schema'd binary + metadata columns,
  * codegen'd slicing for sampling, `mapPartitions` for the decoder.
  *
  * Decoding is REAL at the byte level for PNG/BMP/WAV via
  * [[graft.sources.AssetCodecs]] (gate m04 cross-checks every decoded
  * quantity against a closed-form oracle); [[Multimodal.stubDecode]]
  * remains only as the documented swap-point demonstrating how a heavy
  * external codec (ffmpeg, ImageIO) would slot into the same
  * `mapPartitions` plumbing (gate m03).
  */
object Multimodal {

  /** Attach the binary payload + metadata columns: the ingest boundary
    * where an asset table enters the engine. Payload here derives from the
    * fixture's text (UTF-8 bytes) since TESTDATA.md forbids synthesizing
    * independent inputs; a real corpus lands `binaryFile`-format columns
    * the same shape.
    */
  def withPayload(documents: DataFrame): DataFrame =
    documents.select(
      $"doc_id",
      $"text".cast("binary").as("payload"),
      struct(
        length($"text".cast("binary")).cast("long").as("n_bytes"),
        $"source".as("container"),
        lit("application/octet-stream").as("mime")).as("meta"))

  /** Byte-level payload statistics — pure codegen'd projection, no UDF:
    * size, content hash, head bytes. The every-asset pass that feeds
    * dedup/inventory without decoding anything.
    */
  def payloadStats(documents: DataFrame): DataFrame =
    documents
      .select(
        $"doc_id",
        length($"text".cast("binary")).cast("long").as("n_bytes"),
        md5($"text".cast("binary")).as("payload_md5"),
        // head sample is character-aligned (first 8 chars, UTF-8 encoded):
        // portable to the oracle engine, which cannot slice raw blobs
        hex(substring($"text", 1, 8).cast("binary")).as("head_hex"))
      .orderBy($"doc_id")

  /** Frame sampling: slice fixed-stride chunks ("frames") out of each
    * payload and fingerprint each — the video-keyframe / audio-window
    * access pattern as a lateral explode + codegen'd substring, one output
    * row per (asset, frame). Chunking is character-aligned so the oracle
    * (which cannot slice blobs) reproduces it exactly via text substring +
    * UTF-8 encode.
    */
  def frameSample(documents: DataFrame, frameChars: Int = 64, maxFrames: Int = 4): DataFrame =
    documents
      .select($"doc_id", $"text",
        explode(sequence(lit(0), greatest(least(
          floor((length($"text") - 1) / frameChars).cast("int"),
          lit(maxFrames - 1)), lit(0)))).as("frame_no"))
      .select(
        $"doc_id", $"text", $"frame_no".cast("long").as("frame_no"),
        ($"frame_no" * frameChars + 1).as("off"))
      .select(
        $"doc_id", $"frame_no",
        md5($"text".substr($"off", lit(frameChars)).cast("binary")).as("frame_md5"),
        length($"text".substr($"off", lit(frameChars)).cast("binary")).cast("long")
          .as("frame_bytes"))
      .orderBy($"doc_id", $"frame_no")

  /** STUB DECODER — deterministic fake standing in for a real image/audio
    * decode (libraries unavailable offline). Derives pseudo-dimensions and
    * a fake luminance from the bytes; a production build swaps only this
    * function for e.g. an ImageIO/ffmpeg call. Marked stub, never part of
    * any oracle check.
    */
  def stubDecode(payload: Array[Byte]): (Int, Int, Double) = {
    val n = payload.length
    val width = 16 + (if (n == 0) 0 else java.lang.Byte.toUnsignedInt(payload(0)) % 64)
    val height = 16 + (if (n < 2) 0 else java.lang.Byte.toUnsignedInt(payload(1)) % 64)
    val luma = if (n == 0) 0.0
      else payload.iterator.map(java.lang.Byte.toUnsignedInt(_).toDouble).sum / n / 255.0
    (width, height, luma)
  }

  /** Decoded-asset row produced by [[decodeAssets]] (gate m04): every
    * field recovered from the encoded bytes by [[graft.AssetCodecs]].
    */
  case class AssetDecoded(doc_id: Long, fmt: String, width: Long, height: Long,
                          channels: Long, bit_depth: Long, sample_rate: Long,
                          n_units: Long, value_sum: Long)

  /** m04 fixture: a REAL encoded asset per document, parameterized in
    * closed form from doc_id alone (same oracle discipline as the r09
    * GRIB fixture) — PNG/BMP/WAV rotating on doc_id mod 3. The DuckDB
    * oracle regenerates every decoded quantity (dimensions, channel
    * count, bit depth, sample rate, exact integer content sum) from
    * these formulas without touching the bytes, so a decode error
    * anywhere — zlib inflate, PNG row-filter reconstruction, BMP row
    * padding, RIFF chunk walk, sign extension — breaks the hash.
    */
  def assetFor(d: Long): Array[Byte] = (d % 3) match {
    case 0 => AssetCodecs.encodePng(
      (8 + d % 24).toInt, (8 + (3 * d) % 16).toInt,
      (x, y) => ((7 * x + 13 * y + d) % 256).toInt)
    case 1 => AssetCodecs.encodeBmp(
      (4 + d % 21).toInt, (4 + (5 * d) % 13).toInt,
      (x, y) => ((11 * x + 17 * y + d) % 256).toInt)
    case _ => AssetCodecs.encodeWav(
      (8000 + (d % 5) * 4000).toInt,
      Array.tabulate((64 + d % 193).toInt)(k =>
        (((31L * k + 7 * d) % 2048) - 1024).toShort))
  }

  /** m14 fixture: an indexed GIF87a per document, dims and pixel lattice
    * in closed form from doc_id (the m04 discipline — the oracle
    * regenerates every decoded quantity without touching the bytes).
    */
  def gifFor(d: Long): Array[Byte] =
    AssetCodecs.encodeGif((10 + d % 30).toInt, (6 + (5 * d) % 20).toInt,
      (x, y) => ((11 * x + 5 * y + d) % 256).toInt)

  /** GIF decode gate (m14): the full wire path — sub-block reassembly,
    * variable-width LSB-first LZW (dictionary growth, width changes,
    * table-full CLEAR resets on real data), palette lookup — recovered
    * per document from the BYTES and compared to the closed-form
    * lattice. Same `mapPartitions` plumbing as [[decodeAssets]].
    */
  def gifDecode(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val m = AssetCodecs.decodeGif(gifFor(id))
          (id, m.width, m.height, m.nUnits, m.valueSum)
        }
      }
      .toDF("doc_id", "width", "height", "n_pixels", "value_sum")
      .orderBy(col("doc_id"))
  }

  /** m15 fixture: an animated GIF per document — 2..5 full-canvas
    * frames, dims/frame-count/pixel lattice all closed-form from doc_id.
    */
  def gifAnimFor(d: Long): Array[Byte] =
    AssetCodecs.encodeGifAnim((8 + d % 16).toInt, (5 + (3 * d) % 12).toInt,
      (2 + d % 4).toInt,
      (f, x, y) => ((13 * x + 3 * y + 7 * f + d) % 256).toInt)

  /** Frame sampling over a REAL multi-frame container (m15): decode
    * every frame of each document's animated GIF from the bytes, keep
    * every `stride`-th frame, emit exact per-frame stats — the video
    * frame-sample shape ([[frameSample]]'s synthetic-spine twin) run
    * against an actual wire format. One row per KEPT frame; the decoder
    * sees only bytes, the oracle regenerates everything from closed
    * forms.
    */
  def gifFrameSample(documents: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"gifFrameSample: stride must be >= 1, got $stride")
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val (w, h, pal, frames) = AssetCodecs.decodeGifFrames(gifAnimFor(id))
          frames.zipWithIndex.collect { case (idx, f) if f % stride == 0 =>
            var s = 0L
            var i = 0
            while (i < idx.length) { s += pal(3 * (idx(i) & 0xff)) & 0xff; i += 1 }
            (id, f.toLong, frames.size.toLong, w.toLong, h.toLong, s)
          }
        }
      }
      .toDF("doc_id", "frame", "n_frames", "width", "height", "value_sum")
      .orderBy(col("doc_id"), col("frame"))
  }

  /** m19 fixture: an animated GIF per document with designed SCENE CUTS —
    * within a scene consecutive frames differ by a per-pixel drift of 1
    * (mod-wrap aside), at the cut frames (f=2 and f=4) the whole pattern
    * shifts by 97, so the inter-frame absolute difference separates
    * cleanly (mean ≈2 within scenes vs ≈100 at cuts). Everything is
    * closed-form from doc_id; the decoder sees only bytes.
    */
  def gifSceneFor(d: Long): Array[Byte] = {
    val w = (8 + d % 8).toInt
    val h = (6 + (3 * d) % 6).toInt
    val nf = (4 + d % 3).toInt // 4..6 frames; the f=4 cut exists only for nf>4
    AssetCodecs.encodeGifAnim(w, h, nf, (f, x, y) => {
      val s = (if (f >= 2) 1 else 0) + (if (f >= 4) 1 else 0)
      ((13 * x + 5 * y + 97 * s + f) % 251).toInt
    })
  }

  /** Scene-change detection (m19): the video shot-boundary pass every
    * crawl pipeline runs before frame sampling — per consecutive frame
    * pair, the sum of absolute luma differences (SAD), thresholded at a
    * mean per-pixel difference. Exact integers end to end, so the gate
    * hash-compares; the oracle replays the generating formula, so a
    * decode or differencing bug shifts a SAD. Same `mapPartitions`
    * byte-codec shape as m15: per-asset kernels over bytes, one row per
    * (asset, frame-pair), embarrassingly parallel at corpus scale.
    */
  def sceneDetect(documents: DataFrame, meanThreshold: Int = 30): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val (w, h, pal, frames) = AssetCodecs.decodeGifFrames(gifSceneFor(id))
          (1 until frames.size).map { f =>
            val a = frames(f - 1); val b = frames(f)
            var sad = 0L
            var i = 0
            while (i < a.length) {
              val va = pal(3 * (a(i) & 0xff)) & 0xff
              val vb = pal(3 * (b(i) & 0xff)) & 0xff
              sad += math.abs(va - vb); i += 1
            }
            (id, f.toLong, sad, sad >= meanThreshold.toLong * w * h)
          }
        }
      }
      .toDF("doc_id", "frame", "sad", "is_cut")
      .orderBy(col("doc_id"), col("frame"))
  }

  /** m17 fixture: a composited animated GIF per document — four frames
    * exercising every disposal method: a full-canvas base (disposal 1,
    * keep), a partial rect that restores to BACKGROUND after display
    * (disposal 2), a partial rect that restores to the PREVIOUS canvas
    * (disposal 3), and a partial rect with TRANSPARENT pixels showing
    * the underlying canvas through (disposal 0). Every rect offset and
    * pixel is closed-form from doc_id; values stay < 251 so index 255
    * is unambiguously the transparent sentinel.
    */
  def gifCompositeFor(d: Long): Array[Byte] = {
    val w = (10 + d % 14).toInt
    val h = (8 + (3 * d) % 10).toInt
    val l1 = (2 + d % 3).toInt; val t1 = (1 + d % 2).toInt
    val l2 = (1 + d % 4).toInt; val t2 = (2 + d % 3).toInt
    import graft.sources.AssetCodecs.GifFrameSpec
    AssetCodecs.encodeGifAnimComposite(w, h, background = 0, Seq(
      GifFrameSpec(0, 0, w, h, disposal = 1, transparentIdx = -1,
        (x, y) => ((3 * x + 5 * y + d) % 251).toInt),
      GifFrameSpec(l1, t1, 5, 4, disposal = 2, transparentIdx = -1,
        (fx, fy) => ((7 * (l1 + fx) + 11 * (t1 + fy) + d) % 251).toInt),
      GifFrameSpec(l2, t2, 6, 3, disposal = 3, transparentIdx = -1,
        (fx, fy) => ((13 * (l2 + fx) + 17 * (t2 + fy) + d) % 251).toInt),
      GifFrameSpec(3, 3, 5, 4, disposal = 0, transparentIdx = 255,
        (fx, fy) => {
          val x = 3 + fx; val y = 3 + fy
          if ((x + y + d) % 3 == 0) 255 else ((19 * x + 23 * y + d) % 251).toInt
        })))
  }

  /** m35 fixture: an Adam7-interlaced greyscale PNG per document —
    * dims and pixel lattice closed-form from doc_id; the seven passes
    * carry independently-filtered sub-images the decoder must scatter
    * back (PNG §8.2).
    */
  def pngAdam7For(d: Long): Array[Byte] =
    AssetCodecs.encodePngAdam7((9 + d % 13).toInt, (6 + (5 * d) % 11).toInt,
      (x, y) => ((23 * x + 41 * y + d) % 256).toInt)

  /** Adam7 decode gate (m35): POSITION-WEIGHTED pixel sum
    * (Σ v(x,y) · (y·w + x + 1)) per document — weighted so a wrong
    * pass-scatter (which a plain sum, being permutation-invariant,
    * cannot see) shifts the value. Same `mapPartitions` bytes-only
    * plumbing as the other decoders.
    */
  def pngAdam7Decode(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val (w, h, img) = AssetCodecs.decodePngImage(pngAdam7For(id))
          var s = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              s += (img(y)(x) & 0xff).toLong * (y.toLong * w + x + 1)
              x += 1
            }
            y += 1
          }
          (id, w.toLong, h.toLong, s)
        }
      }
      .toDF("doc_id", "width", "height", "weighted_sum")
      .orderBy(col("doc_id"))
  }

  /** m36 fixture: an animated GIF whose frames carry LOCAL colour
    * tables — the shape real crawl GIFs very often have, where an
    * index canvas cannot represent the composite. Frame 0 full-canvas
    * global (identity ramp); frame 1 a partial local-palette overlay
    * with a transparent index; frame 2 full-canvas, INTERLACED, with a
    * second local palette. All closed-form from doc_id.
    */
  def gifLocalFor(d: Long): Array[Byte] = {
    val w = (8 + d % 10).toInt
    val h = (7 + (3 * d) % 9).toInt
    import graft.sources.AssetCodecs.GifFrameSpec
    AssetCodecs.encodeGifAnimComposite(w, h, background = 0, Seq(
      GifFrameSpec(0, 0, w, h, disposal = 0, transparentIdx = -1,
        (x, y) => ((11 * x + 17 * y + d) % 256).toInt),
      GifFrameSpec(2, 2, w - 4, h - 4, disposal = 0, transparentIdx = 3,
        (fx, fy) => ((7 * fx + 5 * fy + d) % 256).toInt,
        localPalette = Some(v => (((2 * v + 19 + d % 7) % 256).toInt,
          v, (3 * v) % 256))),
      GifFrameSpec(0, 0, w, h, disposal = 0, transparentIdx = -1,
        (x, y) => ((3 * x + 13 * y + 2 * d) % 256).toInt,
        interlaced = true,
        localPalette = Some(v => ((5 * v + 1) % 256, (v + 7) % 256, v)))))
  }

  /** Local-palette compositing gate (m36): decode through the RGB
    * canvas (the palette-correct model — frame indices address their
    * OWN tables) and emit each frame's position-weighted RED sum
    * (Σ R(x,y) · (y·w + x + 1)); weighting makes the interlaced
    * frame's row scatter and the overlay placement observable.
    */
  def gifLocalPaletteSample(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val (w, h, frames) = AssetCodecs.decodeGifFramesRgb(gifLocalFor(id))
          frames.zipWithIndex.map { case (rgb, f) =>
            var s = 0L
            var p = 0
            while (p < w * h) {
              s += (rgb(3 * p) & 0xff).toLong * (p + 1)
              p += 1
            }
            (id, f.toLong, w.toLong, h.toLong, s)
          }
        }
      }
      .toDF("doc_id", "frame", "width", "height", "weighted_red_sum")
      .orderBy(col("doc_id"), col("frame"))
  }

  /** Disposal compositing gate (m17): decode the four-frame composite
    * fixture and emit each DISPLAYED canvas's exact stats — the m15
    * shape over streams where frame k is NOT the canvas (partial rects,
    * background/previous restores, transparency). The oracle replays
    * the whole composition chain in closed form, so a bug in any
    * disposal step or the transparency path shifts a value_sum.
    */
  def gifCompositeSample(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val (w, h, pal, frames) = AssetCodecs.decodeGifFrames(gifCompositeFor(id))
          frames.zipWithIndex.map { case (idx, f) =>
            var s = 0L
            var i = 0
            while (i < idx.length) { s += pal(3 * (idx(i) & 0xff)) & 0xff; i += 1 }
            (id, f.toLong, frames.size.toLong, w.toLong, h.toLong, s)
          }
        }
      }
      .toDF("doc_id", "frame", "n_frames", "width", "height", "value_sum")
      .orderBy(col("doc_id"), col("frame"))
  }

  /** Real distributed decode (m04): encode each document's fixture asset,
    * then recover its metadata and exact content sum from the BYTES with
    * the real byte-level codecs — the non-stub counterpart of
    * [[decodeFeatures]]. Same `mapPartitions` plumbing (per-partition
    * decoder init amortizes across the batch); the decoder sees only the
    * payload, never the generating formula.
    */
  def decodeAssets(documents: DataFrame): Dataset[AssetDecoded] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val m = AssetCodecs.decode(assetFor(id))
          AssetDecoded(id, m.fmt, m.width, m.height, m.channels,
            m.bitDepth, m.sampleRate, m.nUnits, m.valueSum)
        }
      }
      .orderBy(col("doc_id")).as[AssetDecoded]
  }

  /** m05 fixture: a structurally valid JPEG shell per document, dims and
    * channel count in closed form from doc_id (oracle regenerates them
    * without the bytes).
    */
  def jpegShellFor(d: Long): Array[Byte] =
    AssetCodecs.encodeJpeg((16 + d % 101).toInt, (16 + (7 * d) % 67).toInt,
      if (d % 2 == 0) 1 else 3)

  /** JPEG dimension extraction (m05): the header-level operation every
    * thumbnailer/`identify` runs — marker walk to SOFn, byte-stuffed scan
    * to EOI, no pixel decode. Same mapPartitions shape as [[decodeAssets]];
    * the decoder sees only bytes.
    */
  def jpegDims(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val m = AssetCodecs.decodeJpeg(jpegShellFor(id))
          (id, m.width, m.height, m.channels, m.bitDepth)
        }
      }
      .toDF("doc_id", "width", "height", "channels", "precision_bits")
      .orderBy(col("doc_id"))
  }

  /** Distributed decode + feature extraction over the payload column:
    * `mapPartitions` so a real decoder amortizes per-partition init (codec
    * contexts, model weights) across its batch — the Spark-side plumbing a
    * heavy decoder needs. Output is a typed Dataset with an explicit schema.
    */
  def decodeFeatures(documents: DataFrame): Dataset[AssetFeatures] = {
    val spark = documents.sparkSession
    import spark.implicits._
    withPayload(documents)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (stubbed)
        it.map { case (id, bytes) =>
          val (w, h, luma) = stubDecode(bytes)
          val sum = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          // floor(x·10⁴ + 0.5): identical IEEE ops in the SQL oracle,
          // unlike rint's half-even tie-break which SQL round() lacks
          AssetFeatures(id, bytes.length.toLong,
            sum.map("%02x".format(_)).mkString, w, h,
            math.floor(luma * 10000 + 0.5) / 10000)
        }
      }
  }

  /** Per-image perceptual hash row (m06): the 64-bit aHash split into
    * two 32-bit halves (a single BIGINT would overflow at bit 63).
    */
  case class ImagePhash(doc_id: Long, width: Long, height: Long,
                        hash_hi: Long, hash_lo: Long, n_set: Long)

  /** Scale factor for integer-exact block means: every aHash block holds
    * c ∈ {1..12} pixels (widths {1..4} × heights {1..3} from the fixture
    * dimension ranges), and 27720 = lcm(1..12), so s·(27720/c) is the
    * EXACT mean scaled by 27720 — no rational arithmetic, no IEEE
    * summation-order hazard anywhere in the hash.
    */
  val PhashScale: Long = 27720L

  /** Image perceptual hash (m06) — average-hash over the REAL decoded
    * PNG raster: downsample to an 8×8 block grid (floor split, exactly
    * `(x·8) div w`), threshold each block's mean against the global
    * mean, pack the 64 bits. This is THE image near-dup primitive (the
    * cheap member of the aHash/pHash/dHash family): near-identical
    * images — recompressed, lightly edited — land within a small
    * Hamming distance, and the hash feeds the d04-style banded join for
    * corpus-scale image dedup.
    *
    * Everything is integer arithmetic (see [[PhashScale]]): block mean
    * M = s·(27720/c) exactly, threshold `M·64 > ΣM` by cross-
    * multiplication — so the DuckDB oracle regenerates the identical
    * bits from the closed-form pixel formulas without touching bytes,
    * while the engine recovers them from the encoded PNG through zlib
    * inflate + row-filter reconstruction (m04's discipline: a decode
    * bug anywhere breaks the hash). mapPartitions plumbing as in
    * [[decodeAssets]]; the decoder sees only bytes.
    */
  def imagePhash(documents: DataFrame): Dataset[ImagePhash] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 0) // the PNG third of the fixture
      .mapPartitions { it =>
        it.map { id =>
          val (w, h, img) = graft.sources.AssetCodecs.decodePngImage(assetFor(id))
          ahash(id, w, h, (y, x) => img(y)(x) & 0xff)
        }
      }
      .orderBy(col("doc_id")).as[ImagePhash]
  }

  /** Near-duplicate IMAGE detection end-to-end (m22) — the multimodal
    * dedup flagship: real PNG byte decode → aHash ([[imagePhash]]) →
    * Hamming-pigeonhole candidate join → exact verify, i.e. d17's
    * text-simhash machinery running on perceptual image hashes. A pair
    * within `maxHamming` bit flips agrees EXACTLY on at least one of
    * the `maxHamming + 1` equal-width bands (pigeonhole), so candidates
    * come from band-value equi-joins on 8-byte keys — never an
    * all-pairs XOR. At 100 TB: signatures are 8 bytes/image, the join
    * is banded equi-shuffles, the decode cost amortizes into the same
    * scan that computed the hash.
    */
  def imageNearDups(documents: DataFrame, maxHamming: Int = 3,
                    maxBandFreq: Option[Int] = None): DataFrame = {
    require(maxHamming >= 1 && 64 % (maxHamming + 1) == 0,
      s"imageNearDups: bands must split 64 bits evenly, got maxHamming=$maxHamming")
    val bands = maxHamming + 1
    val bandBits = 64 / bands
    val mask = (1L << bandBits) - 1
    val sig = graft.Session.barrier(
      imagePhash(documents).toDF().select(col("doc_id"),
        shiftleft(col("hash_hi"), 32).bitwiseOR(col("hash_lo")).as("sig")))
    val bandedAll = sig.select(col("doc_id"), col("sig"),
        explode(array((0 until bands).map(k => struct(
          lit(k).as("k"),
          shiftrightunsigned(col("sig"), k * bandBits)
            .bitwiseAND(lit(mask)).as("bv"))): _*)).as("b"))
      .select(col("doc_id"), col("sig"), col("b.k"), col("b.bv"))
    // d17's hot-band cap: an image-heavy crawl is dominated by exact and
    // near-exact duplicate assets, whose TRUE pair set is quadratic in
    // the duplication — the cap bounds the join at the cost of recall
    // only inside over-hot buckets. Exact mode (None) is the gate
    // default; its quadratic tail on duplicated corpora is output-bound
    // by definition (SCALE.md m22 note).
    val banded = maxBandFreq match {
      case None => bandedAll
      case Some(cap) =>
        val sized = bandedAll.groupBy(col("k"), col("bv"))
          .agg(count(lit(1)).as("bn"))
        bandedAll.join(sized.where(col("bn") <= cap).select(col("k"), col("bv")),
          Seq("k", "bv"))
    }
    banded.as("a").join(banded.as("b"),
        col("a.k") === col("b.k") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.sig").as("sa"), col("b.sig").as("sb"))
      .distinct()
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Spectral perceptual hash (m20) — the pHash family's
    * transform-domain construction with the Walsh–Hadamard transform in
    * the seat DCT-II normally occupies: WHT basis values are ±1, so
    * every coefficient is an EXACT integer over the m06 scaled block
    * means (DCT's irrational cosines are non-portable transcendental
    * territory — the r21 atan2 rule). Robustness story is the same as
    * DCT-pHash: sign bits of low-order spectral coefficients survive
    * brightness scaling and blur that flip aHash's mean-threshold bits.
    *
    * Coefficient (u,v) = Σ_{by,bx} m(by,bx) · (−1)^{popcount(by&u) +
    * popcount(bx&v)}; the 64 sign bits pack into hash_hi/hash_lo
    * (bit k = u·8+v set iff coefficient > 0 — DC is always set on a
    * nonzero image), with `dc` (total mass) and `energy` (Σ|coef|,
    * Parseval-pinned in the spec) as exact integer audits.
    *
    * Plumbing identical to [[imagePhash]]: mapPartitions over ids, the
    * decoder sees only PNG bytes; per-asset work is 64 block sums + a
    * 64×64 integer butterfly — row-local, embarrassingly parallel.
    */
  def whtPhash(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 0) // the PNG third of the fixture
      .mapPartitions { it =>
        it.map { id =>
          val (w, h, img) = graft.sources.AssetCodecs.decodePngImage(assetFor(id))
          require(w >= 8 && h >= 8,
            s"whtPhash requires dims >= 8x8, got ${w}x$h for doc $id")
          val s = Array.ofDim[Long](8, 8)
          val c = Array.ofDim[Long](8, 8)
          var y = 0
          while (y < h) {
            val by = y * 8 / h
            var x = 0
            while (x < w) {
              s(by)(x * 8 / w) += img(y)(x) & 0xff
              c(by)(x * 8 / w) += 1
              x += 1
            }
            y += 1
          }
          val m = Array.tabulate(8, 8)((by, bx) => s(by)(bx) * (PhashScale / c(by)(bx)))
          var hi = 0L; var lo = 0L; var nPos = 0L; var dc = 0L; var energy = 0L
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              var coef = 0L
              var by = 0
              while (by < 8) {
                var bx = 0
                while (bx < 8) {
                  val neg = (Integer.bitCount(by & u) + Integer.bitCount(bx & v)) & 1
                  coef += (if (neg == 1) -m(by)(bx) else m(by)(bx))
                  bx += 1
                }
                by += 1
              }
              val k2 = u * 8 + v
              if (coef > 0) {
                if (k2 < 32) lo |= (1L << k2) else hi |= (1L << (k2 - 32))
                nPos += 1
              }
              if (k2 == 0) dc = coef
              energy += math.abs(coef)
              v += 1
            }
            u += 1
          }
          (id, w.toLong, h.toLong, hi, lo, nPos, dc, energy)
        }
      }
      .toDF("doc_id", "w", "h", "hash_hi", "hash_lo", "n_pos", "dc", "energy")
      .orderBy(col("doc_id"))
  }

  /** M24: blur / sharpness scoring via Laplacian variance (Pech-Pacheco
    * et al., ICPR'00 — the standard "variance of Laplacian" focus
    * measure every image-curation pipeline runs before training): the
    * 4-neighbour Laplacian d = 4·p − p↑ − p↓ − p← − p→ at every
    * interior pixel of the REAL decoded PNG, population variance in
    * exact integers — var·n² = n·Σd² − (Σd)², reported milli-floored
    * as `1000·varNum div n²` so the score hash-compares. Low variance
    * ⇒ few/weak edges ⇒ blurry; the band column is the curation
    * decision itself.
    *
    * Scale shape: [[imagePhash]]'s exactly — mapPartitions byte decode
    * + a per-image O(w·h) integer kernel, no shuffle before the
    * presentation sort; at 100 TB this rides the same decode pass as
    * the other per-asset signals.
    */
  def blurDetect(documents: DataFrame, blurMilli: Long = 18000000L): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 0) // the PNG third of the fixture
      .mapPartitions { it =>
        it.map { id =>
          val (w, h, img) = graft.sources.AssetCodecs.decodePngImage(assetFor(id))
          var n = 0L; var s = 0L; var s2 = 0L
          var y = 1
          while (y < h - 1) {
            var x = 1
            while (x < w - 1) {
              val d = 4L * (img(y)(x) & 0xff) -
                (img(y - 1)(x) & 0xff) - (img(y + 1)(x) & 0xff) -
                (img(y)(x - 1) & 0xff) - (img(y)(x + 1) & 0xff)
              n += 1; s += d; s2 += d * d
              x += 1
            }
            y += 1
          }
          val varMilli = Math.floorDiv(1000L * (n * s2 - s * s), n * n)
          (id, w.toLong, h.toLong, n, s, s2, varMilli)
        }
      }
      .toDF("doc_id", "width", "height", "n_interior", "sum_lap",
        "sum_sq_lap", "var_milli")
      .withColumn("band",
        when(col("var_milli") < blurMilli, "blurry").otherwise("sharp"))
      .orderBy(col("doc_id"))
  }

  /** M27: Sobel edge map over the REAL decoded PNG raster — the
    * gradient-magnitude edge detector (Sobel–Feldman 1968) image
    * curation runs for detail/texture scoring, as m24's Laplacian is
    * run for focus. At every interior pixel the two 3×3 kernels
    *
    *   gx = [p↗+2p→+p↘] − [p↖+2p←+p↙]   gy = [p↙+2p↓+p↘] − [p↖+2p↑+p↗]
    *
    * give the exact integer gradient; `g² = gx² + gy²` is the squared
    * magnitude (the sqrt is presentation), a pixel is an EDGE when
    * g² ≥ `edgeThreshSq`, and `density_milli = 1000·edges div interior`
    * is the curation signal with its band. On the closed-form lattice
    * (value = (7x+13y+id) mod 256) the threshold sits above the plane's
    * constant gradient (gx=56, gy=104 ⇒ g²=13952), so what the detector
    * finds are the mod-256 WRAP SEAMS — real discontinuities, image-
    * dependent, not a constant answer.
    *
    * Scale shape: [[imagePhash]]'s — mapPartitions byte decode + a
    * per-image O(w·h) integer kernel, no shuffle before the
    * presentation sort; rides the same decode pass as m06/m24/m25.
    */
  def sobelEdges(documents: DataFrame, edgeThreshSq: Long = 20000L,
                 busyMilli: Long = 250L): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 0) // the PNG third of the fixture
      .mapPartitions { it =>
        it.map { id =>
          val (w, h, img) = graft.sources.AssetCodecs.decodePngImage(assetFor(id))
          def p(y: Int, x: Int): Long = (img(y)(x) & 0xff).toLong
          var n = 0L; var edges = 0L; var energy = 0L
          var y = 1
          while (y < h - 1) {
            var x = 1
            while (x < w - 1) {
              val gx = (p(y - 1, x + 1) + 2 * p(y, x + 1) + p(y + 1, x + 1)) -
                (p(y - 1, x - 1) + 2 * p(y, x - 1) + p(y + 1, x - 1))
              val gy = (p(y + 1, x - 1) + 2 * p(y + 1, x) + p(y + 1, x + 1)) -
                (p(y - 1, x - 1) + 2 * p(y - 1, x) + p(y - 1, x + 1))
              val g2 = gx * gx + gy * gy
              n += 1; energy += g2
              if (g2 >= edgeThreshSq) edges += 1
              x += 1
            }
            y += 1
          }
          (id, w.toLong, h.toLong, n, edges, energy,
            Math.floorDiv(1000L * edges, n))
        }
      }
      .toDF("doc_id", "width", "height", "n_interior", "n_edges",
        "energy", "density_milli")
      .withColumn("band",
        when(col("density_milli") >= busyMilli, "busy").otherwise("clean"))
      .orderBy(col("doc_id"))
  }

  /** M26: classical audio features over the REAL decoded WAV PCM —
    * zero-crossing count (the cheap voiced/unvoiced and music/speech
    * discriminator every audio-curation pass computes first), total
    * energy Σx², absolute sum, and peak, all exact BIGINTs. ZCR
    * convention pinned: sign(x) = 1 for x ≥ 0 else −1 (zero is
    * non-negative), a crossing is a sign change between CONSECUTIVE
    * samples — the oracle replays the same convention with a lag
    * window over the closed-form sample formula.
    *
    * Scale shape: mapPartitions decode + per-clip O(n) integer fold,
    * no shuffle before the presentation sort (the m-family envelope).
    */
  def audioFeatures(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 2) // the WAV third of the fixture
      .mapPartitions { it =>
        it.map { id =>
          val (rate, samples) = graft.sources.AssetCodecs.decodeWavSamples(assetFor(id))
          var zcr = 0L; var energy = 0L; var absSum = 0L; var peak = 0L
          var i = 0
          var prevSign = 0
          while (i < samples.length) {
            val x = samples(i).toLong
            val sign = if (x >= 0) 1 else -1
            if (i > 0 && sign != prevSign) zcr += 1
            prevSign = sign
            energy += x * x
            val a = math.abs(x)
            absSum += a
            if (a > peak) peak = a
            i += 1
          }
          (id, rate.toLong, samples.length.toLong, zcr, energy, absSum, peak)
        }
      }
      .toDF("doc_id", "sample_rate", "n_samples", "zcr", "energy",
        "abs_sum", "peak")
      .orderBy(col("doc_id"))
  }

  /** M29: clipping detection over the REAL decoded WAV PCM — the
    * loudness-war / damaged-recording audit every audio-curation pass
    * runs next to [[audioFeatures]]: samples within `railGap` of the
    * int range's rails count as clipped (|x| ≥ 1000 on the ±1024
    * fixture scale), and the MAX CONSECUTIVE RUN of clipped samples
    * separates true waveform clipping (flat-topped runs) from isolated
    * loud peaks. `first_clip` is the earliest clipped index (−1 when
    * clean). All exact integers; the oracle replays the run-length via
    * the gaps-and-islands window over the closed-form samples.
    *
    * Scale shape: mapPartitions decode + per-clip O(n) integer fold,
    * no shuffle before the presentation sort (the m-family envelope).
    */
  def clippingDetect(documents: DataFrame, clipAbs: Long = 1000L): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 2) // the WAV third of the fixture
      .mapPartitions { it =>
        it.map { id =>
          val (_, samples) = graft.sources.AssetCodecs.decodeWavSamples(assetFor(id))
          var nClip = 0L; var maxRun = 0L; var run = 0L; var first = -1L
          var i = 0
          while (i < samples.length) {
            if (math.abs(samples(i).toLong) >= clipAbs) {
              nClip += 1; run += 1
              if (run > maxRun) maxRun = run
              if (first < 0) first = i
            } else run = 0
            i += 1
          }
          (id, samples.length.toLong, nClip,
            Math.floorDiv(1000L * nClip, samples.length.toLong), maxRun, first)
        }
      }
      .toDF("doc_id", "n_samples", "n_clipped", "clip_milli", "max_run",
        "first_clip")
      .orderBy(col("doc_id"))
  }

  /** M31: bitplane complexity over the REAL decoded PNG raster — the
    * BPCS-style texture/noise profile (each of the 8 bitplanes scored
    * by its horizontal transition count): low planes of natural images
    * flip near-randomly (density → ~500‰), high planes flip rarely —
    * the profile separates noise, texture, and synthetic gradients,
    * and is the standard complexity measure steganalysis and
    * compressibility screens use. Exact integers: per plane b,
    * `n_trans = Σ_y Σ_x [bit_b(p(y,x)) ≠ bit_b(p(y,x+1))]` and
    * `density_milli = 1000·n_trans div (h·(w−1))`.
    *
    * Scale shape: mapPartitions decode + per-image O(8·w·h) integer
    * kernel emitting 8 rows, no shuffle before the presentation sort.
    */
  def bitplaneComplexity(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 0) // the PNG third of the fixture
      .flatMap { id =>
        val (w, h, img) = graft.sources.AssetCodecs.decodePngImage(assetFor(id))
        val trans = new Array[Long](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w - 1) {
            val d = (img(y)(x) ^ img(y)(x + 1)) & 0xff
            var b = 0
            while (b < 8) {
              if (((d >> b) & 1) == 1) trans(b) += 1
              b += 1
            }
            x += 1
          }
          y += 1
        }
        val denom = h.toLong * (w - 1)
        (0 until 8).map { b =>
          (id, b.toLong, w.toLong, h.toLong, trans(b),
            Math.floorDiv(1000L * trans(b), denom))
        }
      }
      .toDF("doc_id", "plane", "width", "height", "n_trans", "density_milli")
      .orderBy(col("doc_id"), col("plane"))
  }

  /** M32: histogram SPECIFICATION (matching) over the REAL decoded PNG
    * raster — [[histEqualize]]'s general form: instead of the uniform
    * target, each image's CDF maps onto a pinned reference CDF (the
    * quadratic dark-skewed ramp `cdfRef(u) ∝ (u+1)²`), the remap every
    * style-normalization / domain-adaptation preprocessing pass runs.
    * Exact integers: `out(v) = min u: (u+1)²·n ≥ 65536·cdf(v)` — the
    * CDF-to-CDF inverse lookup cross-multiplied, no division at all.
    * Reported per image: the m25 position-weighted checksum (a remap
    * error at any single pixel breaks the hash), output range, and the
    * monotonicity-guaranteed distinct count.
    *
    * Scale shape: mapPartitions decode + per-image O(w·h + 256·log)
    * integer kernel, no shuffle before the presentation sort.
    */
  def histMatch(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 0) // the PNG third of the fixture
      .mapPartitions { it =>
        it.map { id =>
          val (w, h, img) = graft.sources.AssetCodecs.decodePngImage(assetFor(id))
          val n = w.toLong * h
          val hist = new Array[Long](256)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { hist(img(y)(x) & 0xff) += 1; x += 1 }
            y += 1
          }
          val cdf = new Array[Long](256)
          var run = 0L
          var v = 0
          while (v < 256) { run += hist(v); cdf(v) = run; v += 1 }
          val out = new Array[Long](256)
          v = 0
          while (v < 256) {
            var u = 0
            while ((u + 1).toLong * (u + 1) * n < 65536L * cdf(v)) u += 1
            out(v) = u.toLong
            v += 1
          }
          var chk = 0L; var outMin = 255L; var outMax = 0L; var nVals = 0L
          y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val o = out(img(y)(x) & 0xff)
              chk += o * (y.toLong * w + x + 1)
              x += 1
            }
            y += 1
          }
          v = 0
          val seen = new Array[Boolean](256)
          while (v < 256) {
            if (hist(v) > 0) {
              if (out(v) < outMin) outMin = out(v)
              if (out(v) > outMax) outMax = out(v)
              if (!seen(out(v).toInt)) { seen(out(v).toInt) = true; nVals += 1 }
            }
            v += 1
          }
          (id, w.toLong, h.toLong, nVals, outMin, outMax, chk)
        }
      }
      .toDF("doc_id", "width", "height", "n_out_vals", "out_min", "out_max",
        "checksum")
      .orderBy(col("doc_id"))
  }

  /** M33: patch extraction (the ViT preprocessing seat — images become
    * a grid of fixed-size patches whose statistics feed normalization
    * and masking decisions) over the REAL decoded PNG raster: FULL
    * `patch`×`patch` patches only (the right/bottom remainder is
    * cropped, ViT's behavior), each emitting its exact integer sum,
    * sum of squares, and the population-variance numerator
    * `n·Σv² − (Σv)²` — the per-patch contrast signal MAE-style masking
    * ranks on.
    *
    * Scale shape: mapPartitions decode + per-image O(w·h) integer
    * kernel emitting (w div p)·(h div p) rows, no shuffle before the
    * presentation sort.
    */
  def patchify(documents: DataFrame, patch: Int = 4): DataFrame = {
    require(patch >= 1, s"patchify: patch must be >= 1")
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 0) // the PNG third of the fixture
      .flatMap { id =>
        val (w, h, img) = graft.sources.AssetCodecs.decodePngImage(assetFor(id))
        val pw = w / patch; val ph = h / patch
        val n = (patch * patch).toLong
        for (py <- 0 until ph; px <- 0 until pw) yield {
          var s = 0L; var q = 0L
          var y = py * patch
          while (y < (py + 1) * patch) {
            var x = px * patch
            while (x < (px + 1) * patch) {
              val v = (img(y)(x) & 0xff).toLong
              s += v; q += v * v
              x += 1
            }
            y += 1
          }
          (id, py.toLong, px.toLong, n, s, q, n * q - s * s)
        }
      }
      .toDF("doc_id", "py", "px", "n_px", "sum_v", "sum_sq", "var_num")
      .orderBy(col("doc_id"), col("py"), col("px"))
  }

  /** M34: gray-world white balance over the REAL color JPEG decode —
    * the illumination-normalization preprocessing vision pipelines run
    * (Buchsbaum 1980: assume the average scene is gray, so scale R and
    * B to match the G mean): channel gains in exact milli
    * (`gain_r = 1000·Σg div Σr`), corrected pixels
    * `min(255, (v·gain) div 1000)`, and the m25 position-weighted
    * checksum over `r' + 2·g + 3·b'` so a single mis-corrected pixel
    * breaks the hash.
    *
    * Scale shape: [[jpegColorPhash]]'s — mapPartitions byte decode +
    * per-image O(w·h) integer kernel, no shuffle before the
    * presentation sort.
    */
  def grayWorld(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val img = graft.sources.AssetCodecs.decodeJpegYccAuto(jpegColorSmallFor(id))
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < img.h) {
            var x = 0
            while (x < img.w) {
              val (r, g, b) = graft.sources.AssetCodecs.ycbcrToRgb(
                img.y(y)(x), img.cb(y)(x), img.cr(y)(x))
              sr += r; sg += g; sb += b
              x += 1
            }
            y += 1
          }
          val gainR = if (sr > 0) 1000L * sg / sr else 1000L
          val gainB = if (sb > 0) 1000L * sg / sb else 1000L
          var chk = 0L
          y = 0
          while (y < img.h) {
            var x = 0
            while (x < img.w) {
              val (r, g, b) = graft.sources.AssetCodecs.ycbcrToRgb(
                img.y(y)(x), img.cb(y)(x), img.cr(y)(x))
              val rc = math.min(255L, r * gainR / 1000L)
              val bc = math.min(255L, b * gainB / 1000L)
              chk += (rc + 2L * g + 3L * bc) * (y.toLong * img.w + x + 1)
              x += 1
            }
            y += 1
          }
          (id, img.w.toLong, img.h.toLong, sr, sg, sb, gainR, gainB, chk)
        }
      }
      .toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b",
        "gain_r_milli", "gain_b_milli", "checksum")
      .orderBy(col("doc_id"))
  }

  /** M30: onset detection over the REAL decoded WAV PCM — the
    * energy-jump event detector audio pipelines run for beat/segment
    * candidates (the spectral-flux seat, kept exact by using frame
    * ENERGY deltas instead of FFT magnitudes): frames of `frameLen`
    * samples (m08's framing), an onset fires at frame f ≥ 1 when
    * `2·e_f > 3·e_{f−1}` (energy jumps ≥ 1.5×, compared
    * cross-multiplied — no ratio ever materializes) AND `e_f ≥
    * minEnergy` (silence flicker is not an onset). Reported per clip:
    * frame count, onset count, first onset frame (−1 when none).
    *
    * Scale shape: mapPartitions decode + per-clip O(n) integer fold,
    * no shuffle before the presentation sort (the m-family envelope).
    */
  def onsetDetect(documents: DataFrame, frameLen: Int = 32,
                  minEnergy: Long = 1000L): DataFrame = {
    require(frameLen > 0, s"onsetDetect: frameLen must be positive")
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 2) // the WAV third of the fixture
      .mapPartitions { it =>
        it.map { id =>
          val (_, samples) = graft.sources.AssetCodecs.decodeWavSamples(assetFor(id))
          val nf = (samples.length + frameLen - 1) / frameLen
          val e = new Array[Long](nf)
          var i = 0
          while (i < samples.length) {
            val x = samples(i).toLong
            e(i / frameLen) += x * x
            i += 1
          }
          var onsets = 0L; var first = -1L
          var f = 1
          while (f < nf) {
            if (2 * e(f) > 3 * e(f - 1) && e(f) >= minEnergy) {
              onsets += 1
              if (first < 0) first = f
            }
            f += 1
          }
          (id, nf.toLong, onsets, first)
        }
      }
      .toDF("doc_id", "n_frames", "n_onsets", "first_onset")
      .orderBy(col("doc_id"))
  }

  /** M25: histogram equalization (the classic contrast-normalization
    * preprocessing step of image training pipelines) over the REAL
    * decoded PNG raster, in exact integers: the standard CDF remap
    * out(v) = (cdf(v) − cdf_min)·255 div (n − cdf_min), with the
    * constant-image degenerate case pinned to 0. Reported per image:
    * distinct-value count, output range, and a POSITION-WEIGHTED
    * checksum Σ out(p(y,x))·(y·w + x + 1) — so a remap error at any
    * single pixel, not just in aggregate, breaks the hash.
    *
    * Scale shape: [[imagePhash]]'s — mapPartitions decode + per-image
    * O(w·h + 256) integer kernel, no shuffle before the presentation
    * sort.
    */
  def histEqualize(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 0) // the PNG third of the fixture
      .mapPartitions { it =>
        it.map { id =>
          val (w, h, img) = graft.sources.AssetCodecs.decodePngImage(assetFor(id))
          val n = w.toLong * h
          val hist = new Array[Long](256)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { hist(img(y)(x) & 0xff) += 1; x += 1 }
            y += 1
          }
          val cdf = new Array[Long](256)
          var run = 0L; var cdfMin = -1L; var nVals = 0L
          var v = 0
          while (v < 256) {
            run += hist(v); cdf(v) = run
            if (hist(v) > 0) { nVals += 1; if (cdfMin < 0) cdfMin = run }
            v += 1
          }
          val out = new Array[Long](256)
          v = 0
          while (v < 256) {
            out(v) = if (n == cdfMin) 0L
              else (cdf(v) - cdfMin) * 255 / (n - cdfMin)
            v += 1
          }
          var chk = 0L; var outMin = 255L; var outMax = 0L
          y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val o = out(img(y)(x) & 0xff)
              chk += o * (y.toLong * w + x + 1)
              x += 1
            }
            y += 1
          }
          v = 0
          while (v < 256) {
            if (hist(v) > 0) {
              if (out(v) < outMin) outMin = out(v)
              if (out(v) > outMax) outMax = out(v)
            }
            v += 1
          }
          (id, w.toLong, h.toLong, nVals, outMin, outMax, chk)
        }
      }
      .toDF("doc_id", "width", "height", "n_vals", "out_min", "out_max",
        "checksum")
      .orderBy(col("doc_id"))
  }

  /** The integer-exact aHash core shared by the PNG (m06) and JPEG (m07)
    * paths. Contract: every 8x8 block must be non-empty (else the block
    * mean divides by zero) and its pixel count must divide [[PhashScale]]
    * for the integer-exactness claim to hold. The fixtures guarantee
    * both (dims 8..96, block sizes ≤ 12, all dividing 27720); fail
    * loudly for any other input rather than throwing a bare
    * ArithmeticException below.
    */
  private def ahash(id: Long, w: Int, h: Int, pix: (Int, Int) => Int): ImagePhash = {
    require(w >= 8 && h >= 8,
      s"aHash requires dims >= 8x8, got ${w}x$h for doc $id")
    val s = Array.ofDim[Long](8, 8)
    val c = Array.ofDim[Long](8, 8)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val bx = x * 8 / w
        s(by)(bx) += pix(y, x) & 0xff
        c(by)(bx) += 1
        x += 1
      }
      y += 1
    }
    val m = Array.tabulate(64)(k => s(k / 8)(k % 8) * (PhashScale / c(k / 8)(k % 8)))
    val tot = m.sum
    var hi = 0L; var lo = 0L; var nSet = 0L
    var k = 0
    while (k < 64) {
      if (m(k) * 64 > tot) {
        if (k < 32) lo |= (1L << k) else hi |= (1L << (k - 32))
        nSet += 1
      }
      k += 1
    }
    ImagePhash(id, w, h, hi, lo, nSet)
  }

  /** Box-filter image downsample (m09) — the thumbnail/resize stage of
    * the multimodal mandate, over the REAL PNG decode path. Target-grid
    * mapping is the same floor split aHash uses (source pixel (x, y) →
    * output cell ((x·ow)/w, (y·oh)/h)), each output pixel the FLOOR MEAN
    * of its source box — emitted as `sum DIV count` with the exact
    * integers alongside, so no division precision is ever in play and
    * the closed-form oracle regenerates every output pixel without
    * touching bytes while the engine goes through zlib + row filters.
    *
    * Plumbing identical to [[imagePhash]]: mapPartitions over ids, the
    * decoder sees only bytes, output rows are (doc, oy, ox)-addressed —
    * ow·oh rows per image, the batch shape a downstream vision encoder
    * consumes. Row-local per image; zero shuffles before the gate's
    * ORDER BY.
    */
  def imageResize(documents: DataFrame, ow: Int = 4, oh: Int = 4): DataFrame = {
    require(ow >= 1 && oh >= 1, "imageResize: target dims must be >= 1")
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 0) // the PNG third of the fixture
      .flatMap { id =>
        val (w, h, img) = graft.sources.AssetCodecs.decodePngImage(assetFor(id))
        require(w >= ow && h >= oh,
          s"imageResize: upscaling unsupported, got ${w}x$h -> ${ow}x$oh for doc $id")
        val s = Array.ofDim[Long](oh, ow)
        val c = Array.ofDim[Long](oh, ow)
        var y = 0
        while (y < h) {
          val by = y * oh / h
          var x = 0
          while (x < w) {
            s(by)(x * ow / w) += img(y)(x) & 0xff
            c(by)(x * ow / w) += 1
            x += 1
          }
          y += 1
        }
        for (oy <- 0 until oh; ox <- 0 until ow)
          yield (id, oy.toLong, ox.toLong, s(oy)(ox) / c(oy)(ox), s(oy)(ox), c(oy)(ox))
      }
      .toDF("doc_id", "oy", "ox", "pix", "s", "c")
      .orderBy(col("doc_id"), col("oy"), col("ox"))
  }

  /** m07 fixture: one real baseline JPEG per document — grayscale,
    * per-8x8-block-constant pixels `(19·⌊x/8⌋ + 23·⌊y/8⌋ + 29·(d mod
    * 97)) mod 256`, non-block-multiple dims so edge blocks pad. Constant
    * blocks make the lossy format EXACT (DC-only coefficients survive
    * FDCT→quantize→IDCT bit-for-bit — AssetCodecsSpec pins it), which is
    * what lets a closed-form SQL oracle exist for a JPEG pipeline at
    * all; the general lossy path is cross-checked against the JDK
    * decoder in the spec instead.
    */
  def jpegImageFor(d: Long): Array[Byte] = {
    // dims 9..32 x 9..24 keep aHash block sizes within {1..4}x{1..3},
    // the PhashScale divisibility contract (see [[ahash]])
    val w = (9 + d % 24).toInt
    val h = (9 + (3 * d) % 16).toInt
    graft.sources.AssetCodecs.encodeJpegGray(w, h,
      (x, y) => ((19 * (x / 8) + 23 * (y / 8) + 29 * (d % 97)) % 256).toInt)
  }

  /** JPEG perceptual hash (m07): m06's aHash with the decode side
    * swapped to the full baseline JPEG path — Huffman, dequantize,
    * IDCT, level shift — covering the dominant real-world image format.
    * Runs over every document (each carries its own JPEG fixture, as
    * with m05's shells).
    */
  def jpegPhash(documents: DataFrame): Dataset[ImagePhash] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val (w, h, img) = graft.sources.AssetCodecs.decodeJpegImage(jpegImageFor(id))
          ahash(id, w, h, (y, x) => img(y)(x))
        }
      }
      .orderBy(col("doc_id")).as[ImagePhash]
  }

  /** m10 fixture: one real baseline COLOR JPEG per document — direct
    * YCbCr planes, each constant per 16x16 tile:
    * Y  = (17·⌊x/16⌋ + 29·⌊y/16⌋ + 31·(d mod 89)) mod 256
    * Cb = (23·⌊x/16⌋ + 13·⌊y/16⌋ +  7·(d mod 83)) mod 256
    * Cr = (11·⌊x/16⌋ + 19·⌊y/16⌋ +  5·(d mod 79)) mod 256
    * Even docs encode 4:2:0 (luma 2x2), odd 4:2:2 (luma 2x1). Tiles are
    * 16-aligned, so every 8x8 block of every component — including the
    * downsampled chroma blocks and edge-replicated padding — is constant
    * and therefore DC-only: the lossy format becomes EXACT (the m07
    * trick extended through chroma subsampling), which is what lets a
    * closed-form SQL oracle gate a color JPEG pipeline. Dims 17..48 x
    * 17..40 are non-multiples of the MCU so edge MCUs pad.
    */
  def jpegColorFor(d: Long): Array[Byte] = {
    val w = (17 + d % 32).toInt
    val h = (17 + (3 * d) % 24).toInt
    val (hs, vs) = if (d % 2 == 0) (2, 2) else (2, 1)
    graft.sources.AssetCodecs.encodeJpegYcc(w, h,
      (x, y) => ((17 * (x / 16) + 29 * (y / 16) + 31 * (d % 89)) % 256).toInt,
      (x, y) => ((23 * (x / 16) + 13 * (y / 16) + 7 * (d % 83)) % 256).toInt,
      (x, y) => ((11 * (x / 16) + 19 * (y / 16) + 5 * (d % 79)) % 256).toInt,
      hs, vs)
  }

  /** Color JPEG tile decode (m10): the full 3-component baseline path —
    * per-component Huffman/quant tables, interleaved MCU scan, chroma
    * upsampling, fixed-point YCbCr→RGB — over the per-tile-constant
    * color fixture. One row per 16x16 tile with the tile's YCbCr and RGB
    * values; the engine additionally REQUIRES every pixel of the tile to
    * equal the emitted value across all three upsampled planes, so a
    * decode bug anywhere (wrong table selector, predictor mix-up,
    * misplaced chroma block, broken upsample) fails loudly instead of
    * sliding through an aggregate. Plumbing as in [[jpegPhash]]:
    * mapPartitions over ids, the decoder sees only bytes, row-local per
    * image, zero shuffles before the presentation sort.
    */
  def jpegColorTiles(documents: DataFrame): DataFrame =
    colorTiles(documents, jpegColorFor)

  /** m13: the m10 gate with RESTART INTERVALS in the bitstream (DRI +
    * RSTm every 2 MCUs — the camera-file reality: most real JPEGs carry
    * restart markers for error resilience). Pixel values are identical
    * to m10's by construction, so the gate shares m10's oracle string
    * VERBATIM — the decoder must handle byte realignment, marker
    * verification, and DC-predictor resets without changing a single
    * output value.
    */
  def jpegColorTilesDri(documents: DataFrame): DataFrame =
    colorTiles(documents, d => {
      val w = (17 + d % 32).toInt
      val h = (17 + (3 * d) % 24).toInt
      val (hs, vs) = if (d % 2 == 0) (2, 2) else (2, 1)
      graft.sources.AssetCodecs.encodeJpegYcc(w, h,
        (x, y) => ((17 * (x / 16) + 29 * (y / 16) + 31 * (d % 89)) % 256).toInt,
        (x, y) => ((23 * (x / 16) + 13 * (y / 16) + 7 * (d % 83)) % 256).toInt,
        (x, y) => ((11 * (x / 16) + 19 * (y / 16) + 5 * (d % 79)) % 256).toInt,
        hs, vs, quant = 1, restartInterval = 2)
    })

  /** m16: the m10 gate through a PROGRESSIVE (SOF2) bitstream — the m13
    * discipline at the frame level: the fixture's pixel values are
    * identical to m10's by construction (per-tile-constant content is
    * DC-only, and progressive transmission is a coefficient
    * permutation), so the gate shares m10's oracle string VERBATIM while
    * the decoder must survive the full Annex-G scan grammar: an
    * interleaved DC scan with the Al=1 point transform, EOB-run-coded AC
    * scans through a Huffman table redefined between scans, and a DC
    * refinement scan.
    */
  def jpegProgressiveTiles(documents: DataFrame): DataFrame =
    colorTiles(documents, d => {
      val w = (17 + d % 32).toInt
      val h = (17 + (3 * d) % 24).toInt
      val (hs, vs) = if (d % 2 == 0) (2, 2) else (2, 1)
      graft.sources.AssetCodecs.encodeJpegYccProgressive(w, h,
        (x, y) => ((17 * (x / 16) + 29 * (y / 16) + 31 * (d % 89)) % 256).toInt,
        (x, y) => ((23 * (x / 16) + 13 * (y / 16) + 7 * (d % 83)) % 256).toInt,
        (x, y) => ((11 * (x / 16) + 19 * (y / 16) + 5 * (d % 79)) % 256).toInt,
        hs, vs)
    })

  private def colorTiles(documents: DataFrame,
                         fixture: Long => Array[Byte]): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .flatMap { id =>
        val img = graft.sources.AssetCodecs.decodeJpegYccAuto(fixture(id))
        val sampling = s"4:2:${if (img.vSamp == 2) 0 else 2}"
        val tilesX = (img.w + 15) / 16
        val tilesY = (img.h + 15) / 16
        for (ty <- 0 until tilesY; tx <- 0 until tilesX) yield {
          val yv = img.y(ty * 16)(tx * 16)
          val cb = img.cb(ty * 16)(tx * 16)
          val cr = img.cr(ty * 16)(tx * 16)
          var py = ty * 16
          while (py < math.min(ty * 16 + 16, img.h)) {
            var pxx = tx * 16
            while (pxx < math.min(tx * 16 + 16, img.w)) {
              require(img.y(py)(pxx) == yv && img.cb(py)(pxx) == cb &&
                img.cr(py)(pxx) == cr,
                s"doc $id tile ($ty,$tx): non-constant decode at ($py,$pxx)")
              pxx += 1
            }
            py += 1
          }
          val (r, g, b) = graft.sources.AssetCodecs.ycbcrToRgb(yv, cb, cr)
          (id, ty.toLong, tx.toLong, sampling,
            yv.toLong, cb.toLong, cr.toLong, r.toLong, g.toLong, b.toLong)
        }
      }
      .toDF("doc_id", "ty", "tx", "sampling", "y", "cb", "cr", "r", "g", "b")
      .orderBy(col("doc_id"), col("ty"), col("tx"))
  }

  /** m11/m12 fixture: the m10 color construction at m07's aHash-safe
    * dims (9..32 x 9..24 keep block pixel counts within the PhashScale
    * divisibility contract — see [[ahash]]); tiles stay 16-aligned so
    * the DC-exactness argument is unchanged. Even docs 4:2:0, odd 4:2:2.
    */
  def jpegColorSmallFor(d: Long): Array[Byte] = {
    val w = (17 + d % 16).toInt  // 17..32
    val h = (17 + (3 * d) % 8).toInt // 17..24
    val (hs, vs) = if (d % 2 == 0) (2, 2) else (2, 1)
    graft.sources.AssetCodecs.encodeJpegYcc(w, h,
      (x, y) => ((17 * (x / 16) + 29 * (y / 16) + 31 * (d % 89)) % 256).toInt,
      (x, y) => ((23 * (x / 16) + 13 * (y / 16) + 7 * (d % 83)) % 256).toInt,
      (x, y) => ((11 * (x / 16) + 19 * (y / 16) + 5 * (d % 79)) % 256).toInt,
      hs, vs)
  }

  /** M28: dominant color extraction (the palette/thumbnail-color signal
    * image curation and UI pipelines compute per asset) over the REAL
    * color JPEG decode: every pixel's exact fixed-point RGB quantizes
    * to the RGB444 cube (4 bits per channel — the classic 4096-cell
    * palette histogram), and the modal cell wins with ties to the
    * smallest key; `share_milli` is the dominance signal (a logo on
    * white scores high, a photo low). `n_colors` counts occupied cells.
    *
    * Scale shape: [[jpegColorPhash]]'s — mapPartitions byte decode +
    * per-image O(w·h) integer kernel with a bounded (≤4096) histogram,
    * no shuffle before the presentation sort.
    */
  def dominantColor(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val img = graft.sources.AssetCodecs.decodeJpegYccAuto(jpegColorSmallFor(id))
          val counts = new Array[Long](4096)
          var y = 0
          while (y < img.h) {
            var x = 0
            while (x < img.w) {
              val (r, g, b) = graft.sources.AssetCodecs.ycbcrToRgb(
                img.y(y)(x), img.cb(y)(x), img.cr(y)(x))
              counts(((r >> 4) << 8) | ((g >> 4) << 4) | (b >> 4)) += 1
              x += 1
            }
            y += 1
          }
          var nColors = 0L; var domKey = -1; var domCnt = -1L
          var kk = 0
          while (kk < 4096) {
            if (counts(kk) > 0) {
              nColors += 1
              if (counts(kk) > domCnt) { domCnt = counts(kk); domKey = kk }
            }
            kk += 1
          }
          val n = img.w.toLong * img.h
          (id, img.w.toLong, img.h.toLong, nColors, domKey.toLong, domCnt,
            Math.floorDiv(1000L * domCnt, n))
        }
      }
      .toDF("doc_id", "width", "height", "n_colors", "rgb444", "dom_count",
        "share_milli")
      .orderBy(col("doc_id"))
  }

  /** COLOR-path perceptual hash (m11): m07's aHash fed by the full
    * 3-component JPEG decode — the luma plane after per-component
    * Huffman/dequant/IDCT and interleaved-MCU reassembly. Closes the
    * loop the m10 tile gate opens: the color decode output flows into
    * the same downstream feature stage the grayscale path feeds, and
    * the oracle regenerates the hash from the closed-form Y formula
    * without touching bytes.
    */
  def jpegColorPhash(documents: DataFrame): Dataset[ImagePhash] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val img = graft.sources.AssetCodecs.decodeJpegYccAuto(jpegColorSmallFor(id))
          ahash(id, img.w, img.h, (y, x) => img.y(y)(x))
        }
      }
      .orderBy(col("doc_id")).as[ImagePhash]
  }

  /** COLOR-path resize (m12): m09's box-filter downsample fed by the
    * color decode — per output pixel the floor mean of each RGB channel
    * over its source box, the thumbnail shape a vision encoder consumes.
    * RGB comes from the exact fixed-point conversion, so all sums are
    * exact integers and the oracle is closed-form end to end.
    */
  def jpegColorResize(documents: DataFrame, ow: Int = 4, oh: Int = 4): DataFrame = {
    require(ow >= 1 && oh >= 1, "jpegColorResize: target dims must be >= 1")
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .flatMap { id =>
        val img = graft.sources.AssetCodecs.decodeJpegYccAuto(jpegColorSmallFor(id))
        require(img.w >= ow && img.h >= oh,
          s"jpegColorResize: upscaling unsupported for doc $id")
        val s = Array.ofDim[Long](3, oh, ow)
        val c = Array.ofDim[Long](oh, ow)
        var y = 0
        while (y < img.h) {
          val by = y * oh / img.h
          var x = 0
          while (x < img.w) {
            val bx = x * ow / img.w
            val (r, g, b) = graft.sources.AssetCodecs.ycbcrToRgb(
              img.y(y)(x), img.cb(y)(x), img.cr(y)(x))
            s(0)(by)(bx) += r; s(1)(by)(bx) += g; s(2)(by)(bx) += b
            c(by)(bx) += 1
            x += 1
          }
          y += 1
        }
        for (oy <- 0 until oh; ox <- 0 until ow)
          yield (id, oy.toLong, ox.toLong,
            s(0)(oy)(ox) / c(oy)(ox), s(1)(oy)(ox) / c(oy)(ox), s(2)(oy)(ox) / c(oy)(ox),
            s(0)(oy)(ox), s(1)(oy)(ox), s(2)(oy)(ox), c(oy)(ox))
      }
      .toDF("doc_id", "oy", "ox", "r", "g", "b", "sr", "sg", "sb", "c")
      .orderBy(col("doc_id"), col("oy"), col("ox"))
  }

  /** Audio frame features (m08): the framing + feature-extraction stage
    * every speech/audio corpus pipeline runs before VAD, language ID, or
    * dataset filtering — decode PCM, cut it into fixed frames, and emit
    * per-frame energy, amplitude sum, peak, and zero-crossing count.
    * All features are exact integers (Σx, Σx², max|x|, sign-transition
    * count over PCM16 values), so the gate holds full values instead of
    * float RMS/dB approximations (the m04 discipline: sqrt/log are not
    * bit-portable across engines; the monotone maps preserve every
    * downstream threshold).
    *
    * Shape: the byte decode is one `mapPartitions` over the WAV third of
    * the asset fixture (zlib-free RIFF walk, the only non-relational
    * step); framing and features are pure Catalyst array expressions —
    * `sequence`/`slice`/`aggregate`/`zip_with` on the samples column, so
    * the per-frame loop never leaves the executor row and needs no
    * shuffle at all until the final presentation sort. A 100 TB audio
    * corpus runs this scan-shaped: no explode-then-regroup round trip
    * (exploding 16 kHz samples to rows would 16000× the row count before
    * re-aggregating them right back).
    */
  def audioFrames(documents: DataFrame, frameLen: Int = 32): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    require(frameLen > 0, s"frameLen must be positive, got $frameLen")
    val decoded = documents.select(col("doc_id")).where(col("doc_id") % 3 === 2)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val (rate, samples) = AssetCodecs.decodeWavSamples(assetFor(id))
          (id, rate, samples.map(_.toInt))
        }
      }
      .toDF("doc_id", "sample_rate", "samples")
    val fl = lit(frameLen)
    val fr = slice(col("samples"), col("frame") * fl + 1, fl)
    decoded
      // guard: sequence(0, nf-1) on an empty samples array would DESCEND
      // (Spark's sequence default step is -1 when start > stop) — the
      // fixture never emits empty PCM, but the operator must not depend
      // on that
      .where(size(col("samples")) > 0)
      .select(col("doc_id"), col("sample_rate"), col("samples"),
        explode(sequence(lit(0),
          ((size(col("samples")) + fl - 1).cast("int") / fl).cast("int") - 1))
          .as("frame"))
      .select(col("doc_id"), col("sample_rate").cast("long").as("sample_rate"),
        col("frame").cast("long").as("frame"),
        size(fr).cast("long").as("n_samples"),
        aggregate(fr, lit(0L), (a, x) => a + x).as("sum_amp"),
        aggregate(fr, lit(0L), (a, x) => a + x.cast("long") * x).as("energy"),
        aggregate(fr, lit(0L), (a, x) => greatest(a, abs(x).cast("long"))).as("peak"),
        aggregate(
          zip_with(slice(fr, lit(1), size(fr) - 1), slice(fr, lit(2), size(fr) - 1),
            (a, b) => when((a >= 0) =!= (b >= 0), 1L).otherwise(0L)),
          lit(0L), (a, x) => a + x).as("zero_crossings"))
      .orderBy(col("doc_id"), col("frame"))
  }

  /** m18 fixture: a 16 kHz WAV per document whose 48-sample blocks
    * alternate quiet (|x| ≤ 15) and loud (|x| ≤ 900) on a closed-form
    * lattice from doc_id — the m04 discipline: the oracle regenerates
    * every PCM value by formula, never touching the bytes. The loud
    * formula intentionally dips under any reasonable threshold ~7% of
    * the time, so run boundaries are data-driven, not block-aligned —
    * both engines must agree on the islands, not just the lattice.
    */
  def silenceWavFor(d: Long): Array[Byte] =
    AssetCodecs.encodeWav(16000,
      Array.tabulate((256 + d % 97).toInt) { k =>
        (if ((k / 48 + d) % 3 == 0) (13L * k + 7 * d) % 31 - 15
         else (29L * k + 11 * d) % 1800 - 900).toShort
      })

  /** Energy-threshold silence segmentation (m18): the VAD-ish trim/split
    * stage every speech corpus runs before transcription or packing —
    * find maximal runs of samples under an amplitude threshold, keep the
    * runs long enough to be real pauses (≥ minRun samples), and emit
    * each as (start, end, length, energy). Exact integers throughout
    * (the m08 discipline — no float RMS/dB), so the gate carries full
    * values.
    *
    * Shape: decode is one `mapPartitions` over the WAV subset; the run
    * detection is ARRAY-NATIVE — run starts/ends are two indexed
    * `filter`s over the sample array zipped into one struct list, so
    * 16 kHz audio never pays the explode-to-rows-then-window round trip
    * (a row per SAMPLE would 16000× the row count and force a
    * per-document window sort; a row per emitted SEGMENT is
    * output-sized). `get` is the 0-based null-safe accessor, so the
    * boundary lambdas stay total without branching on index range.
    */
  def silenceSegments(documents: DataFrame, threshold: Int = 256,
                      minRun: Int = 32): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    require(threshold > 0, s"threshold must be positive, got $threshold")
    require(minRun >= 1, s"minRun must be >= 1, got $minRun")
    val decoded = documents.select(col("doc_id")).where(col("doc_id") % 3 === 2)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val (_, samples) = AssetCodecs.decodeWavSamples(silenceWavFor(id))
          (id, samples.map(_.toInt))
        }
      }
      .toDF("doc_id", "samples")
    val n = size(col("samples"))
    def quiet(i: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      abs(get(col("samples"), i)) < threshold
    val idx = sequence(lit(0), n - 1)
    // a run STARTS where a quiet sample has no quiet left-neighbour and
    // ENDS where it has no quiet right-neighbour; `get` returns null
    // off-array, and `true OR null` = true closes the boundary cases
    val starts = filter(idx, i => quiet(i) && (i === 0 || !quiet(i - 1)))
    val ends = filter(idx, i => quiet(i) && (i === n - 1 || !quiet(i + 1)))
    decoded
      .where(n > 0)
      .select(col("doc_id"), col("samples"),
        explode(zip_with(starts, ends,
          (s, e) => struct(s.as("s"), e.as("e")))).as("seg"))
      .select(col("doc_id"), col("samples"),
        col("seg.s").cast("long").as("start_k"),
        col("seg.e").cast("long").as("end_k"))
      .withColumn("n_samples", col("end_k") - col("start_k") + 1)
      .where(col("n_samples") >= minRun)
      .select(col("doc_id"), col("start_k"), col("end_k"), col("n_samples"),
        aggregate(
          slice(col("samples"), (col("start_k") + 1).cast("int"),
            col("n_samples").cast("int")),
          lit(0L), (a, x) => a + x.cast("long") * x).as("energy"))
      .orderBy(col("doc_id"), col("start_k"))
  }

  /** Rational-ratio audio resample (m21) — linear interpolation at
    * exact rational positions, the sample-rate normalization every
    * audio corpus runs before feature extraction or model ingest
    * (mixed-provenance crawls land at 8/16/22.05/44.1 kHz; training
    * wants ONE rate). Output sample j sits at input position j·M/L
    * (rate × L/M), so with i = ⌊jM/L⌋ and f = jM mod L:
    *   y[j] = ⌊((L−f)·(x[i]+B) + f·(x[i+1]+B)) / L⌋ − B,  B = 1024
    * The bias B ≥ max|amplitude| keeps the numerator non-negative, so
    * floor and truncating division agree — the one rounding whose
    * cross-engine bit-identity survives negative samples (DuckDB's
    * `//` truncates, Spark's pmod-floor floors; on ℕ they coincide).
    * n_out = ⌊(n_in−1)·L/M⌋ + 1 pins the last position inside the
    * input, so no extrapolation is ever needed (when f = 0 the x[i+1]
    * term has weight 0 and the off-end lookup is null→0, inert).
    *
    * Real byte decode (the m08/m18 WAV path) feeding a pure array
    * expression chain — row-local, codegen'd, no shuffle; at 100 TB
    * the cost is one decode plus O(n_out) integer ops per clip.
    */
  /** Closed-form STEREO twin of [[assetFor]]'s WAV arm — interleaved
    * L/R PCM16 with per-channel deterministic ramps, so the m23 oracle
    * can replay both channels arithmetically without decoding a byte.
    */
  def stereoAssetFor(d: Long): Array[Byte] = {
    val n = (64 + d % 193).toInt
    val interleaved = Array.tabulate(2 * n) { j =>
      val k = j / 2
      if (j % 2 == 0) (((31L * k + 7 * d) % 2048) - 1024).toShort
      else (((17L * k + 5 * d) % 2048) - 1024).toShort
    }
    AssetCodecs.encodeWavMulti((8000 + (d % 5) * 4000).toInt, 2, interleaved)
  }

  /** Stereo→mono mixdown + integer peak normalization (m23) — the first
    * two steps of every speech/audio training-data pipeline (whisper-
    * style ingestion mixes to mono and normalizes level before feature
    * extraction). Decode is per-partition imperative ([[AssetCodecs
    * .decodeWavPcm]], any channel count); everything signal-side is
    * Catalyst array expressions:
    *
    *  - deinterleave = two indexed `filter`s over the interleaved array,
    *  - mono = `floor((L+R)/2)` via a +4096 bias and an arithmetic
    *    shift — the m21 bias contract that makes flooring identical in
    *    any engine's division semantics,
    *  - gain targets −0.2 dBFS-ish 32000 in milli-units
    *    (`32000000 div peak`), normalized samples floor through the
    *    same bias pattern (`+B, div 1000, −B/1000` with B=65536·10⁶),
    *    all exact BIGINT — peaks, sums and energies are value-oracled.
    *
    * Scale shape: one decode pass, per-doc array ops inside codegen, a
    * presentation sort — no shuffle, no explode of samples to rows.
    */
  def audioMixdown(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val bias = 65536000000L
    val decoded = documents.select(col("doc_id")).where(col("doc_id") % 3 === 2)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val (rate, ch, inter) = AssetCodecs.decodeWavPcm(stereoAssetFor(id))
          require(ch == 2, s"mixdown fixture must be stereo, got $ch channels")
          (id, rate, inter.map(_.toInt))
        }
      }
      .toDF("doc_id", "sample_rate", "interleaved")
    val leftC = filter(col("interleaved"), (_, i) => i % 2 === 0)
    val rightC = filter(col("interleaved"), (_, i) => i % 2 === 1)
    val mono = zip_with(leftC, rightC,
      (l, r) => shiftright(l.cast("long") + r + 4096L, 1) - 2048L)
    def normExpr(x: org.apache.spark.sql.Column) = {
      val num = x * col("gain_milli") + bias
      (num - pmod(num, lit(1000L))) / 1000L - (bias / 1000L)
    }
    val peak = aggregate(col("mono"), lit(0L), (a, x) => greatest(a, abs(x)))
    val gnum = lit(32000000L)
    val pclamp = greatest(col("peak_mono"), lit(1L))
    decoded
      .select(col("doc_id"), col("sample_rate").cast("long").as("sample_rate"),
        mono.as("mono"))
      .withColumn("n_samples", size(col("mono")).cast("long"))
      .withColumn("peak_mono", peak)
      .withColumn("gain_milli",
        ((gnum - pmod(gnum, pclamp)) / pclamp).cast("long"))
      .select(col("doc_id"), col("sample_rate"), col("n_samples"),
        col("peak_mono"), col("gain_milli"),
        aggregate(col("mono"), lit(0L),
          (a, x) => greatest(a, abs(normExpr(x)).cast("long"))).as("peak_norm"),
        aggregate(col("mono"), lit(0L),
          (a, x) => a + normExpr(x).cast("long")).as("sum_norm"),
        aggregate(col("mono"), lit(0L),
          (a, x) => a + (normExpr(x) * normExpr(x)).cast("long")).as("energy_norm"))
      .orderBy(col("doc_id"))
  }

  def audioResample(documents: DataFrame, l: Int = 3, m: Int = 2): DataFrame = {
    require(l > 0 && m > 0, s"audioResample: ratio $l/$m must be positive")
    val spark = documents.sparkSession
    import spark.implicits._
    val bias = 1024
    val decoded = documents.select(col("doc_id")).where(col("doc_id") % 3 === 2)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val (_, samples) = AssetCodecs.decodeWavSamples(silenceWavFor(id))
          (id, samples.map(_.toInt))
        }
      }
      .toDF("doc_id", "samples")
    val nIn = size(col("samples")).cast("long")
    val numOut = (nIn - 1) * l
    // Column `/` is double division; exact here (numerator divisible by
    // m, magnitudes far below 2^53) and cast back to long immediately
    val nOut = ((numOut - pmod(numOut, lit(m))) / m).cast("long") + 1
    val t = col("pos") * m
    val f = pmod(t, lit(l))
    val i = ((t - f) / l).cast("int")
    val xi = element_at(col("samples"), i + 1) + bias
    val xi1 = coalesce(element_at(col("samples"), i + 2), lit(0)) + bias
    val num = (lit(l.toLong) - f) * xi + f * xi1
    decoded
      .where(nIn > 0)
      .select(col("doc_id"), col("samples"),
        explode(sequence(lit(0L), nOut - 1)).as("pos"))
      .select(col("doc_id"), col("pos"),
        (((num - pmod(num, lit(l))) / l).cast("long") - bias).as("amp"))
      .orderBy(col("doc_id"), col("pos"))
  }
}
