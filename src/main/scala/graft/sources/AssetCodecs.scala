package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32, Deflater, Inflater}

/** Real byte-level asset codecs for the multimodal column family: PNG
  * (ISO/IEC 15948 / RFC 2083), BMP (BITMAPINFOHEADER, the public
  * Windows DIB layout), and WAV (RIFF + PCM, the public Microsoft/IBM
  * multimedia format). These replace the deliberately-stubbed decoder
  * with the same discipline [[Grib1]] applied to FM-92 bytes: implement
  * the published wire format from scratch, reject anything outside the
  * declared scope loudly, and let a closed-form oracle cross-check every
  * decoded quantity (gate m04).
  *
  * Reference boundary: the reference treats assets as opaque bytes
  * reassembled from ranged fetches (src/download.js:58-94) and hands
  * decoding to external tools (wgrib, src/file-conversions.js:114-135);
  * this module is the in-engine equivalent for the three formats whose
  * wire layout is small enough to own outright.
  *
  * Scope, rejected loudly outside it:
  *  - PNG: 8-bit greyscale (colour type 0), progressive (Adam7, §8.2:
  *    7 independently-filtered passes) or sequential, all five row
  *    filters (None/Sub/Up/Average/Paeth), zlib IDAT (possibly split
  *    across chunks).
  *  - BMP: uncompressed 24-bit BITMAPINFOHEADER, bottom-up or top-down,
  *    4-byte row padding.
  *  - WAV: PCM (format 1) 16-bit, any channel count/rate; unknown RIFF
  *    chunks (LIST, fact, ...) are skipped via the chunk walk, odd-sized
  *    chunks consume their pad byte.
  *  - GIF (87a/89a): global AND local colour tables, interlaced or
  *    sequential frames (appendix-E 4-pass row order), animation
  *    compositing on an index canvas (global-palette subset) or an RGB
  *    canvas (palette-correct with per-frame local tables); extensions
  *    skipped; full variable-width LSB-first LZW both directions
  *    (encoder resets at a full table, decoder handles mid-stream
  *    CLEAR and the KwKwK case).
  */
object AssetCodecs {

  /** Uniform decoded-asset record. Non-applicable fields are 0 (not
    * null) so the oracle compare stays integer-typed end to end:
    * images have sampleRate 0; audio has width/height 0.
    * `nUnits` = pixels (images) or frames (audio); `valueSum` = exact
    * integer content sum — grey values (PNG), b+g+r over all pixels
    * (BMP), signed samples over all channels (WAV).
    */
  final case class AssetMeta(fmt: String, width: Long, height: Long,
                             channels: Long, bitDepth: Long,
                             sampleRate: Long, nUnits: Long, valueSum: Long)

  /** Sniff the container from magic bytes and decode. */
  def decode(bytes: Array[Byte]): AssetMeta =
    if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') decodePng(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I') decodeWav(bytes)
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
      decodeJpeg(bytes)
    else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
      decodeGif(bytes)
    else sys.error(s"unrecognized asset container (${bytes.take(4).map(b => f"$b%02x").mkString(" ")})")

  // ---------------------------------------------------------------- PNG

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Encode an 8-bit greyscale image. Row filters cycle through all five
    * spec types (y mod 5) so a decoder that skims any filter's
    * reconstruction math cannot round-trip the fixture.
    */
  def encodePng(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"degenerate image ${w}x$h")
    val raw = Array.tabulate(h, w)((y, x) => (pix(x, y) & 0xff).toByte)
    val filtered = new java.io.ByteArrayOutputStream()
    var y = 0
    while (y < h) {
      val ft = y % 5
      filtered.write(ft)
      val cur = raw(y); val up = if (y > 0) raw(y - 1) else null
      var x = 0
      while (x < w) {
        val r = cur(x) & 0xff
        val a = if (x > 0) cur(x - 1) & 0xff else 0       // left (bpp=1)
        val b = if (up != null) up(x) & 0xff else 0        // above
        val c = if (x > 0 && up != null) up(x - 1) & 0xff else 0
        val f = ft match {
          case 0 => r
          case 1 => r - a
          case 2 => r - b
          case 3 => r - (a + b) / 2
          case 4 => r - paeth(a, b, c)
        }
        filtered.write(f & 0xff)
        x += 1
      }
      y += 1
    }
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
    ihdr.put(8.toByte)  // bit depth
    ihdr.put(0.toByte)  // colour type: greyscale
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    writeChunk(out, "IHDR", ihdr.array())
    // split the zlib stream across two IDAT chunks: concatenation across
    // chunk boundaries is part of the format, so the fixture exercises it
    val z = zlibDeflate(filtered.toByteArray)
    val cut = z.length / 2
    writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, 0, cut))
    writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, cut, z.length))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Encode an 8-bit greyscale PNG with Adam7 interlacing (interlace
    * method 1): each pass's sub-image filtered independently, all five
    * row filters cycling across each pass — the layout real interlaced
    * crawl images carry. Independent walk of spec §8.2 for the decoder
    * gates.
    */
  def encodePngAdam7(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"degenerate image ${w}x$h")
    val filtered = new java.io.ByteArrayOutputStream()
    Adam7Passes.foreach { case (x0, y0, dx, dy) =>
      val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
      if (pw > 0 && ph > 0) {
        val raw = Array.tabulate(ph, pw)((py, px) =>
          (pix(x0 + px * dx, y0 + py * dy) & 0xff).toByte)
        var y = 0
        while (y < ph) {
          val ft = y % 5
          filtered.write(ft)
          val cur = raw(y); val up = if (y > 0) raw(y - 1) else null
          var x = 0
          while (x < pw) {
            val r = cur(x) & 0xff
            val a = if (x > 0) cur(x - 1) & 0xff else 0
            val b = if (up != null) up(x) & 0xff else 0
            val c = if (x > 0 && up != null) up(x - 1) & 0xff else 0
            val f = ft match {
              case 0 => r
              case 1 => r - a
              case 2 => r - b
              case 3 => r - (a + b) / 2
              case 4 => r - paeth(a, b, c)
            }
            filtered.write(f & 0xff)
            x += 1
          }
          y += 1
        }
      }
    }
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
    ihdr.put(8.toByte)
    ihdr.put(0.toByte)
    ihdr.put(0.toByte).put(0.toByte).put(1.toByte) // deflate, adaptive, ADAM7
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    writeChunk(out, "IHDR", ihdr.array())
    val z = zlibDeflate(filtered.toByteArray)
    val cut = z.length / 2
    writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, 0, cut))
    writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, cut, z.length))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  def decodePng(bytes: Array[Byte]): AssetMeta = {
    val (w, h, img) = decodePngImage(bytes)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += img(y)(x) & 0xff; x += 1 }
      y += 1
    }
    AssetMeta("png", w, h, channels = 1, bitDepth = 8,
      sampleRate = 0, nUnits = w.toLong * h, valueSum = sum)
  }

  /** Full PNG pixel decode (the [[decodePng]] metadata path reuses this;
    * m06's perceptual hash needs the actual raster): returns
    * (width, height, rows of grey bytes). 8-bit API — a 16-bit stream
    * goes through [[decodePngGrey]].
    */
  def decodePngImage(bytes: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
    val (w, h, depth, img) = decodePngGrey(bytes)
    require(depth == 8, s"decodePngImage: ${depth}-bit stream (use decodePngGrey)")
    (w, h, img.map(_.map(_.toByte)))
  }

  /** Greyscale PNG decode at either spec depth (8 or 16): returns
    * (width, height, bitDepth, rows of samples). Filters reconstruct at
    * the BYTE level with bpp = depth/8 (the left neighbour is the byte
    * `bpp` positions back — PNG §6); 16-bit samples are big-endian.
    */
  def decodePngGrey(bytes: Array[Byte]): (Int, Int, Int, Array[Array[Int]]) = {
    require(bytes.length > 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, 0, 8), PngSig), "bad PNG signature")
    var pos = 8
    var w = -1; var h = -1; var depth = -1
    var adam7 = false
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(pos + 8 <= bytes.length, "truncated PNG chunk header")
      val len = be32(bytes, pos); val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      require(len >= 0 && pos + 12 + len <= bytes.length, s"truncated PNG chunk $typ")
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == be32(bytes, pos + 8 + len), s"PNG CRC mismatch in $typ")
      typ match {
        case "IHDR" =>
          w = be32(bytes, pos + 8); h = be32(bytes, pos + 12)
          // dimension plausibility cap BEFORE any allocation (mirrors the
          // Jpeg2000 hardening): crafted dims like 65535x65536 would
          // overflow h*(w+1) to 0 — making the inflate length check pass
          // vacuously — and then attempt a multi-GB Array.ofDim, an
          // OOM-level DoS reachable from untrusted bytes via asset
          // sniffing and the GRIB2 5.41 decode path
          require(w >= 1 && h >= 1 && w.toLong * h <= (1L << 26),
            s"implausible PNG dimensions ${w}x$h (cap: 2^26 pixels)")
          depth = bytes(pos + 16) & 0xff
          val colour = bytes(pos + 17) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          require((depth == 8 || depth == 16) && colour == 0,
            s"unsupported PNG depth/colour $depth/$colour (scope: 8/16-bit greyscale)")
          require(interlace == 0 || interlace == 1,
            s"PNG interlace method $interlace out of scope (0 / Adam7)")
          adam7 = interlace == 1
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => done = true
        case _      => () // ancillary chunk: skip
      }
      pos += 12 + len
    }
    require(w > 0 && h > 0, "PNG missing IHDR")
    val bpp = depth / 8
    // defilter a (width x height) sub-image's scanlines starting at
    // `off` in the inflated stream — PNG §6 byte-level reconstruction;
    // Adam7 passes defilter independently with their own dimensions
    def defilter(scan: Array[Byte], off: Int, width: Int, height: Int)
    : Array[Array[Byte]] = {
      val stride = width * bpp + 1
      val rows = Array.ofDim[Byte](height, width * bpp)
      var y = 0
      while (y < height) {
        val ft = scan(off + y * stride) & 0xff
        val base = off + y * stride + 1
        val cur = rows(y); val up = if (y > 0) rows(y - 1) else null
        var x = 0
        while (x < width * bpp) {
          val f = scan(base + x) & 0xff
          val a = if (x >= bpp) cur(x - bpp) & 0xff else 0
          val b = if (up != null) up(x) & 0xff else 0
          val c = if (x >= bpp && up != null) up(x - bpp) & 0xff else 0
          val r = ft match {
            case 0 => f
            case 1 => f + a
            case 2 => f + b
            case 3 => f + (a + b) / 2
            case 4 => f + paeth(a, b, c)
            case other => sys.error(s"bad PNG filter type $other")
          }
          cur(x) = (r & 0xff).toByte
          x += 1
        }
        y += 1
      }
      rows
    }
    def sample(row: Array[Byte], xx: Int): Int =
      if (bpp == 1) row(xx) & 0xff
      else ((row(2 * xx) & 0xff) << 8) | (row(2 * xx + 1) & 0xff)
    val img =
      if (!adam7) {
        val rows = defilter(zlibInflate(idat.toByteArray, h * (w * bpp + 1)), 0, w, h)
        Array.tabulate(h, w)((yy, xx) => sample(rows(yy), xx))
      } else {
        // Adam7 (spec §8.2): 7 passes, each an independent sub-image
        // with its own filtered scanlines; empty passes contribute 0 bytes
        val total = Adam7Passes.map { case (x0, y0, dx, dy) =>
          val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
          val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
          if (pw == 0 || ph == 0) 0L else ph.toLong * (pw * bpp + 1)
        }.sum
        require(total <= Int.MaxValue, "implausible interlaced PNG size")
        val scan = zlibInflate(idat.toByteArray, total.toInt)
        val out = Array.ofDim[Int](h, w)
        var off = 0
        Adam7Passes.foreach { case (x0, y0, dx, dy) =>
          val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
          val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
          if (pw > 0 && ph > 0) {
            val rows = defilter(scan, off, pw, ph)
            var py = 0
            while (py < ph) {
              var px = 0
              while (px < pw) {
                out(y0 + py * dy)(x0 + px * dx) = sample(rows(py), px)
                px += 1
              }
              py += 1
            }
            off += ph * (pw * bpp + 1)
          }
        }
        out
      }
    (w, h, depth, img)
  }

  /** Adam7 pass lattice (PNG spec §8.2): (xStart, yStart, xStep, yStep). */
  private val Adam7Passes = Seq(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Encode a 16-bit greyscale PNG (big-endian samples). Same filter
    * discipline as [[encodePng]] — all five row filters cycle, at the
    * byte level with bpp = 2 — and the same two-IDAT split.
    */
  def encodePng16(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"degenerate image ${w}x$h")
    val raw = Array.ofDim[Byte](h, w * 2)
    for (y <- 0 until h; x <- 0 until w) {
      val v = pix(x, y) & 0xffff
      raw(y)(2 * x) = (v >> 8).toByte
      raw(y)(2 * x + 1) = (v & 0xff).toByte
    }
    val filtered = new java.io.ByteArrayOutputStream()
    var y = 0
    while (y < h) {
      val ft = y % 5
      filtered.write(ft)
      val cur = raw(y); val up = if (y > 0) raw(y - 1) else null
      var x = 0
      while (x < w * 2) {
        val r = cur(x) & 0xff
        val a = if (x >= 2) cur(x - 2) & 0xff else 0
        val b = if (up != null) up(x) & 0xff else 0
        val c = if (x >= 2 && up != null) up(x - 2) & 0xff else 0
        val f = ft match {
          case 0 => r
          case 1 => r - a
          case 2 => r - b
          case 3 => r - (a + b) / 2
          case 4 => r - paeth(a, b, c)
        }
        filtered.write(f & 0xff)
        x += 1
      }
      y += 1
    }
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
    ihdr.put(16.toByte)
    ihdr.put(0.toByte)
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    writeChunk(out, "IHDR", ihdr.array())
    val z = zlibDeflate(filtered.toByteArray)
    val cut = z.length / 2
    writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, 0, cut))
    writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, cut, z.length))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Paeth predictor (PNG spec §6.6) — order of the tie-break matters. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    val t = typ.getBytes("US-ASCII")
    out.write(t); out.write(data)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  private def zlibDeflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def zlibInflate(data: Array[Byte], expect: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expect)
    var off = 0
    while (off < expect && !inf.finished()) {
      val n = inf.inflate(out, off, expect - off)
      // 0 while unfinished = truncated OR a crafted FDICT header
      // (needsDictionary) — checking needsInput alone spins forever
      require(n > 0 || inf.finished(), "truncated PNG pixel stream")
      off += n
    }
    require(off == expect, s"PNG pixel stream: got $off of $expect bytes")
    inf.end()
    out
  }

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  // ---------------------------------------------------------------- BMP

  /** Encode an uncompressed 24-bit bottom-up BMP; `pix` is a grey value
    * written to all three channels. Rows are padded to 4-byte multiples
    * (the layout detail every naive reader gets wrong).
    */
  def encodeBmp(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"degenerate image ${w}x$h")
    val rowBytes = (3 * w + 3) & ~3
    val size = 54 + rowBytes * h
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h) // positive height = bottom-up
    buf.putShort(1).putShort(24).putInt(0).putInt(rowBytes * h)
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, no palette
    var fy = 0
    while (fy < h) {
      val imgY = h - 1 - fy // file row fy holds image row (h-1-fy)
      var x = 0
      while (x < w) {
        val v = (pix(x, imgY) & 0xff).toByte
        buf.put(v).put(v).put(v) // B, G, R
        x += 1
      }
      var pad = 3 * w
      while (pad < rowBytes) { buf.put(0.toByte); pad += 1 }
      fy += 1
    }
    buf.array()
  }

  def decodeBmp(bytes: Array[Byte]): AssetMeta = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "bad BMP magic")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOff = buf.getInt(10)
    val dibSize = buf.getInt(14)
    require(dibSize >= 40, s"BMP core-header variant (DIB size $dibSize) out of scope")
    val w = buf.getInt(18)
    val hRaw = buf.getInt(22) // negative = top-down
    val bpp = buf.getShort(28) & 0xffff
    val compression = buf.getInt(30)
    require(bpp == 24 && compression == 0,
      s"unsupported BMP bpp/compression $bpp/$compression (scope: uncompressed 24-bit)")
    val h = math.abs(hRaw)
    require(w > 0 && h > 0, s"degenerate BMP ${w}x$hRaw")
    val rowBytes = (3 * w + 3) & ~3
    require(dataOff + rowBytes.toLong * h <= bytes.length, "truncated BMP pixel array")
    var sum = 0L
    var fy = 0
    while (fy < h) {
      val base = dataOff + fy * rowBytes
      var x = 0
      while (x < 3 * w) { // b+g+r of every pixel — touches every content byte
        sum += (bytes(base + x) & 0xff)
        x += 1
      }
      fy += 1
    }
    AssetMeta("bmp", w, h, channels = 3, bitDepth = 24,
      sampleRate = 0, nUnits = w.toLong * h, valueSum = sum)
  }

  // --------------------------------------------------------------- JPEG

  /** Encode a structurally valid JPEG shell: SOI · APP0/JFIF · DQT ·
    * SOF0 (the frame header carrying precision/height/width/channels) ·
    * DHT · SOS with entropy-coded payload (0xFF bytes byte-stuffed as
    * FF 00 per spec §B.1.1.5) · EOI. The entropy payload is deterministic
    * filler — real DCT coefficients need none of the marker structure
    * this codec is about — so [[decodeJpeg]] recovers frame metadata,
    * not pixels (dimension extraction IS the ubiquitous real-world
    * header-level JPEG operation: every `identify`/thumbnailer does it
    * without a full decode).
    */
  def encodeJpeg(w: Int, h: Int, channels: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, s"bad dims ${w}x$h")
    require(channels == 1 || channels == 3, s"JPEG channels must be 1 or 3, got $channels")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def segment(m: Int, payload: Array[Byte]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff); out.write(payload)
    }
    marker(0xd8) // SOI
    segment(0xe0, "JFIF".getBytes("US-ASCII") ++ // NUL-terminated identifier
      Array[Byte](0, 1, 2, 0, 0, 1, 0, 1, 0, 0)) // JFIF 1.2, no thumbnail
    segment(0xdb, Array.tabulate(65)(i => if (i == 0) 0 else 16).map(_.toByte)) // DQT id 0
    // SOF0: precision 8, height, width, components (id, sampling 0x11, dqt 0)
    segment(0xc0, Array[Byte](8) ++
      Array((h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte) ++
      Array(channels.toByte) ++
      (1 to channels).flatMap(c => Seq(c.toByte, 0x11.toByte, 0.toByte)))
    // minimal DHT (class 0, id 0: one 1-bit code)
    segment(0xc4, Array[Byte](0x00, 1) ++ Array.fill[Byte](15)(0) ++ Array[Byte](0))
    // SOS header, then entropy filler containing 0xFF values that MUST be
    // byte-stuffed — a decoder that treats every 0xFF as a marker dies here
    segment(0xda, Array[Byte](channels.toByte) ++
      (1 to channels).flatMap(c => Seq(c.toByte, 0.toByte)) ++
      Array[Byte](0, 63, 0))
    for (k <- 0 until 64 + (w * h) % 97) {
      val b = (k * 37 + w + h) % 256
      if (b == 0xff) { out.write(0xff); out.write(0x00) } // stuffed
      else out.write(b)
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Walk the marker stream to the frame header (any SOFn baseline/
    * progressive variant), then through the byte-stuffed scan to EOI —
    * rejecting truncated or structurally broken streams loudly.
    */
  def decodeJpeg(bytes: Array[Byte]): AssetMeta = {
    require(bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "bad JPEG SOI")
    var pos = 2
    var w = -1; var h = -1; var channels = -1; var precision = -1
    var inScan = false; var sawEoi = false
    while (!sawEoi) {
      require(pos < bytes.length, "truncated JPEG (no EOI)")
      if (inScan) {
        // entropy-coded data: 0xFF is a marker only when NOT followed by
        // 0x00 (stuffing) or RST0-7
        if ((bytes(pos) & 0xff) != 0xff) pos += 1
        else {
          require(pos + 2 <= bytes.length, "truncated JPEG scan")
          val m = bytes(pos + 1) & 0xff
          if (m == 0x00 || (m >= 0xd0 && m <= 0xd7)) pos += 2
          else if (m == 0xd9) { sawEoi = true }
          else sys.error(f"unexpected marker 0x$m%02x inside scan")
        }
      } else {
        require(pos + 2 <= bytes.length &&
          (bytes(pos) & 0xff) == 0xff, f"expected marker at $pos")
        val m = bytes(pos + 1) & 0xff
        m match {
          case 0xd9 => sawEoi = true
          case x if x >= 0xd0 && x <= 0xd7 => pos += 2 // standalone RST
          case 0x01 => pos += 2                        // standalone TEM
          case _ =>
            require(pos + 4 <= bytes.length, "truncated JPEG segment header")
            val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
            require(len >= 2 && pos + 2 + len <= bytes.length, s"truncated JPEG segment")
            // SOFn frame headers carry the dimensions; C4/C8/CC are
            // DHT/JPG/DAC, not frames
            if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
              precision = bytes(pos + 4) & 0xff
              h = ((bytes(pos + 5) & 0xff) << 8) | (bytes(pos + 6) & 0xff)
              w = ((bytes(pos + 7) & 0xff) << 8) | (bytes(pos + 8) & 0xff)
              channels = bytes(pos + 9) & 0xff
            }
            if (m == 0xda) {
              require(w > 0, "JPEG SOS before any SOF frame header")
              inScan = true
            }
            pos += 2 + len
        }
      }
    }
    require(w > 0 && h > 0, "JPEG stream ended without a frame header")
    AssetMeta("jpeg", w, h, channels, precision,
      sampleRate = 0, nUnits = w.toLong * h, valueSum = 0)
  }

  // -------------------------------------- JPEG baseline (real pixel path)
  //
  // Full baseline-sequential grayscale codec (ITU-T T.81 / ISO 10918-1):
  // 8x8 FDCT + quantization + zigzag + Annex-K Huffman on the encode
  // side; Huffman + dequantize + IDCT + level shift on decode. This is
  // the pixel-level path m05's marker-walk stops short of — thumbnails,
  // perceptual hashes and feature extractors need the samples, not just
  // the frame header.

  /** ITU-T T.81 Figure A.6 zigzag scan order: zigzag index → raster. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.3.1 luminance DC table: code counts per length, then the
    * (category) values in code order.
    */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array.tabulate(12)(identity)

  /** Annex K.3.2 luminance AC table. */
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Annex K.3.1 chrominance DC table (counts per length, then values). */
  private val DcBitsC = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcValsC = Array.tabulate(12)(identity)

  /** Annex K.3.2 chrominance AC table. */
  private val AcBitsC = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcValsC: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical Huffman: per-length counts + ordered values → value →
    * (code, length).
    */
  private def huffEncodeTable(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      for (_ <- 0 until bits(len - 1)) {
        out += vals(k) -> ((code, len)); code += 1; k += 1
      }
      code <<= 1
    }
    out.result()
  }

  private val cosTable: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private def cdct(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Encode an 8-bit grayscale image as baseline-sequential JPEG
    * (SOF0, one component, no subsampling, Annex-K Huffman tables,
    * uniform quantizer `quant`). Edge blocks pad by edge replication
    * (the standard choice — keeps the padded DCT's energy at the edge
    * rows' level instead of injecting a synthetic step).
    */
  def encodeJpegGray(w: Int, h: Int, pix: (Int, Int) => Int,
                     quant: Int = 1): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, s"bad dims ${w}x$h")
    require(quant >= 1 && quant <= 255, s"bad quantizer $quant")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def segment(m: Int, payload: Array[Byte]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff); out.write(payload)
    }
    marker(0xd8)
    segment(0xe0, "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 2, 0, 0, 1, 0, 1, 0, 0))
    segment(0xdb, Array[Byte](0) ++ Array.fill(64)(quant.toByte)) // DQT id 0, 8-bit
    segment(0xc0, Array[Byte](8) ++ // SOF0: precision 8
      Array((h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte) ++
      Array[Byte](1, 1, 0x11, 0)) // 1 component, 1:1 sampling, DQT 0
    segment(0xc4, Array[Byte](0x00) ++ DcBits.map(_.toByte) ++ DcVals.map(_.toByte))
    segment(0xc4, Array[Byte](0x10) ++ AcBits.map(_.toByte) ++ AcVals.map(_.toByte))
    segment(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0)) // SOS: comp 1, DC 0 / AC 0

    val dcTab = huffEncodeTable(DcBits, DcVals)
    val acTab = huffEncodeTable(AcBits, AcVals)
    // entropy bit sink with FF 00 byte stuffing, 1-padded at the end
    var acc = 0L; var nAcc = 0
    def putBits(v: Int, n: Int): Unit = {
      acc = (acc << n) | (v & ((1L << n) - 1)); nAcc += n
      while (nAcc >= 8) {
        val b = ((acc >>> (nAcc - 8)) & 0xff).toInt
        out.write(b); if (b == 0xff) out.write(0x00)
        nAcc -= 8
      }
    }
    def magCat(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))
    def putCoef(v: Int, cat: Int): Unit =
      if (cat > 0) putBits(if (v < 0) v - 1 else v, cat)

    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    var prevDc = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            val sx = math.min(bx * 8 + xx, w - 1)
            val sy = math.min(by * 8 + yy, h - 1)
            block(yy * 8 + xx) = (pix(sx, sy) & 0xff) - 128.0
            xx += 1
          }
          yy += 1
        }
        // FDCT + quantize, in zigzag order
        var zz = 0
        while (zz < 64) {
          val r = ZigZag(zz); val u = r % 8; val v = r / 8
          var s = 0.0
          var y2 = 0
          while (y2 < 8) {
            var x2 = 0
            while (x2 < 8) {
              s += block(y2 * 8 + x2) * cosTable(x2)(u) * cosTable(y2)(v)
              x2 += 1
            }
            y2 += 1
          }
          coef(zz) = math.round(cdct(u) * cdct(v) / 4.0 * s / quant).toInt
          zz += 1
        }
        val diff = coef(0) - prevDc
        prevDc = coef(0)
        val dcCat = magCat(diff)
        val (dcCode, dcLen) = dcTab(dcCat)
        putBits(dcCode, dcLen); putCoef(diff, dcCat)
        var k = 1; var run = 0
        while (k < 64) {
          if (coef(k) == 0) run += 1
          else {
            while (run >= 16) { val (c, l) = acTab(0xf0); putBits(c, l); run -= 16 }
            val cat = magCat(coef(k))
            val (c, l) = acTab((run << 4) | cat)
            putBits(c, l); putCoef(coef(k), cat)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (c, l) = acTab(0x00); putBits(c, l) } // EOB
        bx += 1
      }
      by += 1
    }
    if (nAcc > 0) { // pad with 1-bits, stuffing a final FF if produced
      val b = (((acc << (8 - nAcc)) | ((1 << (8 - nAcc)) - 1)) & 0xff).toInt
      out.write(b); if (b == 0xff) out.write(0x00)
    }
    marker(0xd9)
    out.toByteArray
  }

  /** Decode a baseline-sequential grayscale JPEG to its samples:
    * `(width, height, row-major pixels)`. Scope rejected loudly outside
    * it: SOF0, 8-bit precision, one component, 1:1 sampling, no restart
    * intervals — the shape [[encodeJpegGray]] emits and the common
    * grayscale-asset case; color/subsampled frames still go through
    * [[decodeJpeg]] for header metadata.
    */
  def decodeJpegImage(bytes: Array[Byte]): (Int, Int, Array[Array[Int]]) = {
    require(bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "bad JPEG SOI")
    var pos = 2
    var w = -1; var h = -1
    val quantTables = new Array[Array[Int]](4)
    // huffLookup(cls)(id) = (maxcode/valptr decoding tables)
    val huffMin = Array.ofDim[Array[Int]](2, 4)
    val huffMax = Array.ofDim[Array[Int]](2, 4)
    val huffValPtr = Array.ofDim[Array[Int]](2, 4)
    val huffVals = Array.ofDim[Array[Int]](2, 4)
    var compQuant = -1; var dcSel = -1; var acSel = -1
    var scanStart = -1

    while (scanStart < 0) {
      require(pos + 4 <= bytes.length && (bytes(pos) & 0xff) == 0xff,
        s"expected marker at $pos")
      val m = bytes(pos + 1) & 0xff
      require(m != 0xd9, "JPEG EOI before scan data")
      val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      require(len >= 2 && pos + 2 + len <= bytes.length, "truncated JPEG segment")
      val seg = pos + 4
      m match {
        case 0xdb =>
          var p = seg
          while (p < pos + 2 + len) {
            val pq = (bytes(p) & 0xff) >> 4; val tq = bytes(p) & 0x0f
            require(pq == 0, "16-bit quantization tables unsupported")
            quantTables(tq) = Array.tabulate(64)(i => bytes(p + 1 + i) & 0xff)
            p += 65
          }
        case 0xc4 =>
          var p = seg
          while (p < pos + 2 + len) {
            val cls = (bytes(p) & 0xff) >> 4; val id = bytes(p) & 0x0f
            require(cls <= 1 && id <= 3, "bad DHT class/id")
            val counts = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
            val total = counts.sum
            val vals = Array.tabulate(total)(i => bytes(p + 17 + i) & 0xff)
            // canonical tables → per-length (min, max, valptr)
            val mn = new Array[Int](17); val mx = new Array[Int](17)
            val vp = new Array[Int](17)
            var code = 0; var k = 0
            for (l <- 1 to 16) {
              mn(l) = code; vp(l) = k
              code += counts(l - 1); k += counts(l - 1)
              mx(l) = code - 1
              code <<= 1
            }
            // mark empty lengths so the decoder never matches them
            for (l <- 1 to 16) if (counts(l - 1) == 0) mx(l) = -1
            huffMin(cls)(id) = mn; huffMax(cls)(id) = mx
            huffValPtr(cls)(id) = vp; huffVals(cls)(id) = vals
            p += 17 + total
          }
        case x if x >= 0xc0 && x <= 0xcf && x != 0xc4 && x != 0xc8 && x != 0xcc =>
          require(x == 0xc0, f"only baseline SOF0 supported for pixel decode, got SOF${x - 0xc0}%d")
          require((bytes(seg) & 0xff) == 8, "only 8-bit precision supported")
          h = ((bytes(seg + 1) & 0xff) << 8) | (bytes(seg + 2) & 0xff)
          w = ((bytes(seg + 3) & 0xff) << 8) | (bytes(seg + 4) & 0xff)
          val nc = bytes(seg + 5) & 0xff
          require(nc == 1, s"only single-component (grayscale) pixel decode supported, got $nc")
          require((bytes(seg + 7) & 0xff) == 0x11, "subsampling unsupported for grayscale")
          compQuant = bytes(seg + 8) & 0xff
        case 0xdd => sys.error("restart intervals unsupported in pixel decode")
        case 0xda =>
          require(w > 0, "JPEG SOS before SOF0")
          require((bytes(seg) & 0xff) == 1, "scan must cover the single component")
          dcSel = (bytes(seg + 2) & 0xff) >> 4
          acSel = bytes(seg + 2) & 0x0f
          scanStart = pos + 2 + len
        case _ => () // APPn/COM/other: skip
      }
      if (scanStart < 0) pos += 2 + len
    }
    val q = quantTables(compQuant)
    require(q != null, s"missing quantization table $compQuant")
    require(huffVals(0)(dcSel) != null && huffVals(1)(acSel) != null,
      "missing Huffman tables for scan")

    // entropy-coded bit reader with FF 00 unstuffing
    var bp = scanStart
    var bitBuf = 0L; var bitCnt = 0
    def fill(): Unit = {
      while (bitCnt <= 56) {
        require(bp < bytes.length, "truncated JPEG scan")
        val b = bytes(bp) & 0xff
        if (b == 0xff) {
          val nxt = if (bp + 1 < bytes.length) bytes(bp + 1) & 0xff else -1
          if (nxt == 0x00) { bitBuf = (bitBuf << 8) | 0xff; bitCnt += 8; bp += 2 }
          else return // a real marker (EOI): stop feeding, pad-read as 0
        } else { bitBuf = (bitBuf << 8) | b; bitCnt += 8; bp += 1 }
      }
    }
    def getBit(): Int = {
      fill()
      if (bitCnt == 0) 1 // past the scan: spec pads with 1-bits
      else { bitCnt -= 1; ((bitBuf >>> bitCnt) & 1L).toInt }
    }
    def receive(n: Int): Int = { var v = 0; var i = 0; while (i < n) { v = (v << 1) | getBit(); i += 1 }; v }
    def extend(v: Int, n: Int): Int = if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v
    def huffDecode(cls: Int, id: Int): Int = {
      val mn = huffMin(cls)(id); val mx = huffMax(cls)(id)
      val vp = huffValPtr(cls)(id); val vs = huffVals(cls)(id)
      var code = getBit(); var l = 1
      while (l <= 16 && (mx(l) < 0 || code > mx(l))) {
        code = (code << 1) | getBit(); l += 1
      }
      require(l <= 16, "corrupt Huffman code in JPEG scan")
      vs(vp(l) + code - mn(l))
    }

    val bw2 = (w + 7) / 8; val bh2 = (h + 7) / 8
    val img = Array.ofDim[Int](h, w)
    val coef = new Array[Int](64)
    val px = new Array[Double](64)
    var prevDc = 0
    var by = 0
    while (by < bh2) {
      var bx = 0
      while (bx < bw2) {
        java.util.Arrays.fill(coef, 0)
        val dcCat = huffDecode(0, dcSel)
        prevDc += extend(receive(dcCat), dcCat)
        coef(0) = prevDc * q(0)
        var k = 1
        while (k < 64) {
          val rs = huffDecode(1, acSel)
          val run = rs >> 4; val cat = rs & 0x0f
          if (cat == 0) {
            if (run == 15) k += 16 // ZRL
            else k = 64            // EOB
          } else {
            k += run
            require(k < 64, "AC coefficient index overrun")
            coef(ZigZag(k)) = extend(receive(cat), cat) * q(k)
            k += 1
          }
        }
        // IDCT (separable would be faster; direct keeps it obviously
        // correct and the blocks are fixture-sized)
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            var s = 0.0
            var v = 0
            while (v < 8) {
              var u = 0
              while (u < 8) {
                val c = coef(v * 8 + u)
                if (c != 0) s += cdct(u) * cdct(v) * c * cosTable(xx)(u) * cosTable(yy)(v)
                u += 1
              }
              v += 1
            }
            px(yy * 8 + xx) = s / 4.0
            xx += 1
          }
          yy += 1
        }
        yy = 0
        while (yy < 8) {
          val sy = by * 8 + yy
          if (sy < h) {
            var xx = 0
            while (xx < 8) {
              val sx = bx * 8 + xx
              if (sx < w) {
                val v = math.round(px(yy * 8 + xx) + 128.0).toInt
                img(sy)(sx) = math.max(0, math.min(255, v))
              }
              xx += 1
            }
          }
          yy += 1
        }
        bx += 1
      }
      by += 1
    }
    (w, h, img)
  }

  // ------------------------------------ JPEG baseline color (YCbCr path)
  //
  // 3-component interleaved baseline JPEG (ITU-T T.81): luma sampled at
  // hSamp x vSamp in {1,2}^2 (4:4:4 / 4:2:2 / 4:2:0), chroma at 1x1,
  // separate Annex-K luma/chroma Huffman tables and per-component quant
  // tables. This closes the verdict gap that the grayscale pixel path
  // covered only a slice of the dominant real-world image format
  // (YCbCr 4:2:0 baseline JPEG).

  /** Decoded color JPEG: full-resolution Y/Cb/Cr planes (chroma
    * upsampled by replication — the plain/"nearest" mode, exact for the
    * DC-constant fixtures; fancy interpolated upsampling is a display
    * nicety, not part of the bitstream) plus the frame's luma sampling
    * factors so callers can see which subsampling mode the file used.
    */
  final case class JpegYcc(w: Int, h: Int, hSamp: Int, vSamp: Int,
                           y: Array[Array[Int]],
                           cb: Array[Array[Int]],
                           cr: Array[Array[Int]])

  /** Exact fixed-point YCbCr → RGB (the libjpeg 16-bit constants:
    * round(1.402·2^16) etc.; `>> 16` is an arithmetic shift = floor, so
    * an oracle can mirror it as `floor(x / 65536.0)` — division by a
    * power of two is exact in IEEE doubles). Returns clamped 0..255.
    */
  def ycbcrToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def clamp(v: Int): Int = math.max(0, math.min(255, v))
    val r = y + ((91881 * (cr - 128) + 32768) >> 16)
    val g = y - ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768) >> 16)
    val b = y + ((116130 * (cb - 128) + 32768) >> 16)
    (clamp(r), clamp(g), clamp(b))
  }

  /** Encode direct YCbCr planes as baseline-sequential color JPEG (SOF0,
    * components Y/Cb/Cr ids 1/2/3, luma sampling `hSamp`x`vSamp`, chroma
    * 1x1, Annex-K luma tables for Y and chroma tables for Cb/Cr, uniform
    * quantizer `quant` in both DQTs, one interleaved scan). Taking YCbCr
    * directly keeps the gate free of RGB→YCbCr rounding — JPEG stores
    * YCbCr; the RGB conversion is presentation ([[ycbcrToRgb]]).
    *
    * Chroma is downsampled by the rounded mean of each luma-site group
    * (exact on the per-tile-constant fixtures); edge MCUs pad by edge
    * replication per component, as in [[encodeJpegGray]].
    */
  def encodeJpegYcc(w: Int, h: Int,
                    pixY: (Int, Int) => Int,
                    pixCb: (Int, Int) => Int,
                    pixCr: (Int, Int) => Int,
                    hSamp: Int = 2, vSamp: Int = 2,
                    quant: Int = 1,
                    restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, s"bad dims ${w}x$h")
    require(hSamp >= 1 && hSamp <= 2 && vSamp >= 1 && vSamp <= 2,
      s"luma sampling must be in {1,2}x{1,2}, got ${hSamp}x$vSamp")
    require(quant >= 1 && quant <= 255, s"bad quantizer $quant")
    require(restartInterval >= 0, "bad restart interval")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def segment(m: Int, payload: Array[Byte]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff); out.write(payload)
    }
    marker(0xd8)
    segment(0xe0, "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 2, 0, 0, 1, 0, 1, 0, 0))
    segment(0xdb, Array[Byte](0) ++ Array.fill(64)(quant.toByte)) // DQT 0 (luma)
    segment(0xdb, Array[Byte](1) ++ Array.fill(64)(quant.toByte)) // DQT 1 (chroma)
    segment(0xc0, Array[Byte](8) ++
      Array((h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte) ++
      Array[Byte](3,
        1, ((hSamp << 4) | vSamp).toByte, 0, // Y: hSamp x vSamp, DQT 0
        2, 0x11, 1,                          // Cb: 1x1, DQT 1
        3, 0x11, 1))                         // Cr: 1x1, DQT 1
    segment(0xc4, Array[Byte](0x00) ++ DcBits.map(_.toByte) ++ DcVals.map(_.toByte))
    segment(0xc4, Array[Byte](0x10) ++ AcBits.map(_.toByte) ++ AcVals.map(_.toByte))
    segment(0xc4, Array[Byte](0x01) ++ DcBitsC.map(_.toByte) ++ DcValsC.map(_.toByte))
    segment(0xc4, Array[Byte](0x11) ++ AcBitsC.map(_.toByte) ++ AcValsC.map(_.toByte))
    if (restartInterval > 0)
      segment(0xdd, Array(((restartInterval >> 8) & 0xff).toByte,
        (restartInterval & 0xff).toByte))
    segment(0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))

    val dcTabs = Array(huffEncodeTable(DcBits, DcVals), huffEncodeTable(DcBitsC, DcValsC))
    val acTabs = Array(huffEncodeTable(AcBits, AcVals), huffEncodeTable(AcBitsC, AcValsC))
    var acc = 0L; var nAcc = 0
    def putBits(v: Int, n: Int): Unit = {
      acc = (acc << n) | (v & ((1L << n) - 1)); nAcc += n
      while (nAcc >= 8) {
        val b = ((acc >>> (nAcc - 8)) & 0xff).toInt
        out.write(b); if (b == 0xff) out.write(0x00)
        nAcc -= 8
      }
    }
    def magCat(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))
    def putCoef(v: Int, cat: Int): Unit =
      if (cat > 0) putBits(if (v < 0) v - 1 else v, cat)

    // chroma planes at component resolution: rounded mean of each
    // vSamp x hSamp luma-site group (in-bounds sites only at edges)
    val cw = (w + hSamp - 1) / hSamp
    val ch = (h + vSamp - 1) / vSamp
    def downsample(pix: (Int, Int) => Int): (Int, Int) => Int = (cx, cy) => {
      var s = 0; var n = 0
      var j = 0
      while (j < vSamp) {
        val sy = cy * vSamp + j
        if (sy < h) {
          var i = 0
          while (i < hSamp) {
            val sx = cx * hSamp + i
            if (sx < w) { s += pix(sx, sy) & 0xff; n += 1 }
            i += 1
          }
        }
        j += 1
      }
      (s + n / 2) / n
    }
    val cbAt = downsample(pixCb)
    val crAt = downsample(pixCr)

    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    // one 8x8 block: load (edge-replicated), FDCT+quantize, entropy-code
    def encodeBlock(sample: (Int, Int) => Int, sw: Int, sh: Int,
                    ox: Int, oy: Int, tab: Int, prevDc: Int): Int = {
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          val sx = math.min(ox + xx, sw - 1)
          val sy = math.min(oy + yy, sh - 1)
          block(yy * 8 + xx) = (sample(sx, sy) & 0xff) - 128.0
          xx += 1
        }
        yy += 1
      }
      var zz = 0
      while (zz < 64) {
        val r = ZigZag(zz); val u = r % 8; val v = r / 8
        var s = 0.0
        var y2 = 0
        while (y2 < 8) {
          var x2 = 0
          while (x2 < 8) {
            s += block(y2 * 8 + x2) * cosTable(x2)(u) * cosTable(y2)(v)
            x2 += 1
          }
          y2 += 1
        }
        coef(zz) = math.round(cdct(u) * cdct(v) / 4.0 * s / quant).toInt
        zz += 1
      }
      val diff = coef(0) - prevDc
      val dcCat = magCat(diff)
      val (dcCode, dcLen) = dcTabs(tab)(dcCat)
      putBits(dcCode, dcLen); putCoef(diff, dcCat)
      var k = 1; var run = 0
      while (k < 64) {
        if (coef(k) == 0) run += 1
        else {
          while (run >= 16) { val (c, l) = acTabs(tab)(0xf0); putBits(c, l); run -= 16 }
          val cat = magCat(coef(k))
          val (c, l) = acTabs(tab)((run << 4) | cat)
          putBits(c, l); putCoef(coef(k), cat)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (c, l) = acTabs(tab)(0x00); putBits(c, l) }
      coef(0)
    }

    val mcusX = (w + 8 * hSamp - 1) / (8 * hSamp)
    val mcusY = (h + 8 * vSamp - 1) / (8 * vSamp)
    // 1-pad the partial byte (with FF stuffing) — before a restart
    // marker and at end of scan
    def flushBits(): Unit = if (nAcc > 0) {
      val b = (((acc << (8 - nAcc)) | ((1 << (8 - nAcc)) - 1)) & 0xff).toInt
      out.write(b); if (b == 0xff) out.write(0x00)
      acc = 0L; nAcc = 0
    }
    var dcY = 0; var dcCb = 0; var dcCr = 0
    var mcuIdx = 0
    var rstM = 0
    val totalMcus = mcusX * mcusY
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var vy = 0
        while (vy < vSamp) {
          var vx = 0
          while (vx < hSamp) {
            dcY = encodeBlock(pixY, w, h,
              (mx * hSamp + vx) * 8, (my * vSamp + vy) * 8, 0, dcY)
            vx += 1
          }
          vy += 1
        }
        dcCb = encodeBlock(cbAt, cw, ch, mx * 8, my * 8, 1, dcCb)
        dcCr = encodeBlock(crAt, cw, ch, mx * 8, my * 8, 1, dcCr)
        mcuIdx += 1
        // restart boundary: byte-align, RSTm (cycling 0..7), reset the
        // DC predictors — never after the final MCU
        if (restartInterval > 0 && mcuIdx % restartInterval == 0 &&
            mcuIdx < totalMcus) {
          flushBits()
          marker(0xd0 + rstM)
          rstM = (rstM + 1) % 8
          dcY = 0; dcCb = 0; dcCr = 0
        }
        mx += 1
      }
      my += 1
    }
    flushBits()
    marker(0xd9)
    out.toByteArray
  }

  /** Decode a baseline-sequential 3-component YCbCr JPEG: per-component
    * quantization and Huffman tables, interleaved MCU scan with
    * per-component DC predictors, chroma upsampled by replication to
    * full resolution. Scope rejected loudly outside it: SOF0, 8-bit,
    * exactly 3 components, luma sampling in {1,2}x{1,2}, chroma 1x1, no
    * restart intervals — grayscale files go through [[decodeJpegImage]].
    */
  def decodeJpegYcc(bytes: Array[Byte]): JpegYcc = {
    require(bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "bad JPEG SOI")
    var pos = 2
    var w = -1; var h = -1
    var hSamp = -1; var vSamp = -1
    var restartInterval = 0
    val quantTables = new Array[Array[Int]](4)
    val huffMin = Array.ofDim[Array[Int]](2, 4)
    val huffMax = Array.ofDim[Array[Int]](2, 4)
    val huffValPtr = Array.ofDim[Array[Int]](2, 4)
    val huffVals = Array.ofDim[Array[Int]](2, 4)
    val compQuant = new Array[Int](3)   // frame order: Y, Cb, Cr
    val dcSel = new Array[Int](3)
    val acSel = new Array[Int](3)
    var scanStart = -1

    while (scanStart < 0) {
      require(pos + 4 <= bytes.length && (bytes(pos) & 0xff) == 0xff,
        s"expected marker at $pos")
      val m = bytes(pos + 1) & 0xff
      require(m != 0xd9, "JPEG EOI before scan data")
      val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      require(len >= 2 && pos + 2 + len <= bytes.length, "truncated JPEG segment")
      val seg = pos + 4
      m match {
        case 0xdb =>
          var p = seg
          while (p < pos + 2 + len) {
            val pq = (bytes(p) & 0xff) >> 4; val tq = bytes(p) & 0x0f
            require(pq == 0, "16-bit quantization tables unsupported")
            quantTables(tq) = Array.tabulate(64)(i => bytes(p + 1 + i) & 0xff)
            p += 65
          }
        case 0xc4 =>
          var p = seg
          while (p < pos + 2 + len) {
            val cls = (bytes(p) & 0xff) >> 4; val id = bytes(p) & 0x0f
            require(cls <= 1 && id <= 3, "bad DHT class/id")
            val counts = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
            val total = counts.sum
            val vals = Array.tabulate(total)(i => bytes(p + 17 + i) & 0xff)
            val mn = new Array[Int](17); val mx = new Array[Int](17)
            val vp = new Array[Int](17)
            var code = 0; var k = 0
            for (l <- 1 to 16) {
              mn(l) = code; vp(l) = k
              code += counts(l - 1); k += counts(l - 1)
              mx(l) = code - 1
              code <<= 1
            }
            for (l <- 1 to 16) if (counts(l - 1) == 0) mx(l) = -1
            huffMin(cls)(id) = mn; huffMax(cls)(id) = mx
            huffValPtr(cls)(id) = vp; huffVals(cls)(id) = vals
            p += 17 + total
          }
        case x if x >= 0xc0 && x <= 0xcf && x != 0xc4 && x != 0xc8 && x != 0xcc =>
          require(x == 0xc0, f"only baseline SOF0 supported for pixel decode, got SOF${x - 0xc0}%d")
          require((bytes(seg) & 0xff) == 8, "only 8-bit precision supported")
          h = ((bytes(seg + 1) & 0xff) << 8) | (bytes(seg + 2) & 0xff)
          w = ((bytes(seg + 3) & 0xff) << 8) | (bytes(seg + 4) & 0xff)
          val nc = bytes(seg + 5) & 0xff
          require(nc == 3,
            s"decodeJpegYcc: expected 3 components, got $nc (grayscale -> decodeJpegImage)")
          var ci = 0
          while (ci < 3) {
            val o = seg + 6 + ci * 3
            val samp = bytes(o + 1) & 0xff
            if (ci == 0) {
              hSamp = samp >> 4; vSamp = samp & 0x0f
              require(hSamp >= 1 && hSamp <= 2 && vSamp >= 1 && vSamp <= 2,
                s"luma sampling ${hSamp}x$vSamp out of scope (must be in {1,2}x{1,2})")
            } else require(samp == 0x11,
              f"chroma sampling 0x$samp%02x out of scope (must be 1x1)")
            compQuant(ci) = bytes(o + 2) & 0xff
            ci += 1
          }
        case 0xdd => // DRI: MCUs per restart interval (0 disables)
          restartInterval = ((bytes(seg) & 0xff) << 8) | (bytes(seg + 1) & 0xff)
        case 0xda =>
          require(w > 0, "JPEG SOS before SOF0")
          require((bytes(seg) & 0xff) == 3, "scan must cover all 3 components")
          var ci = 0
          while (ci < 3) {
            val sel = bytes(seg + 2 + ci * 2) & 0xff
            dcSel(ci) = sel >> 4; acSel(ci) = sel & 0x0f
            ci += 1
          }
          scanStart = pos + 2 + len
        case _ => () // APPn/COM/other: skip
      }
      if (scanStart < 0) pos += 2 + len
    }
    val q = compQuant.map { tq =>
      val t = quantTables(tq)
      require(t != null, s"missing quantization table $tq"); t
    }
    for (ci <- 0 until 3)
      require(huffVals(0)(dcSel(ci)) != null && huffVals(1)(acSel(ci)) != null,
        s"missing Huffman tables for component $ci")

    var bp = scanStart
    var bitBuf = 0L; var bitCnt = 0
    def fill(): Unit = {
      while (bitCnt <= 56) {
        require(bp < bytes.length, "truncated JPEG scan")
        val b = bytes(bp) & 0xff
        if (b == 0xff) {
          val nxt = if (bp + 1 < bytes.length) bytes(bp + 1) & 0xff else -1
          if (nxt == 0x00) { bitBuf = (bitBuf << 8) | 0xff; bitCnt += 8; bp += 2 }
          else return
        } else { bitBuf = (bitBuf << 8) | b; bitCnt += 8; bp += 1 }
      }
    }
    def getBit(): Int = {
      fill()
      if (bitCnt == 0) 1
      else { bitCnt -= 1; ((bitBuf >>> bitCnt) & 1L).toInt }
    }
    def receive(n: Int): Int = { var v = 0; var i = 0; while (i < n) { v = (v << 1) | getBit(); i += 1 }; v }
    def extend(v: Int, n: Int): Int = if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v
    def huffDecode(cls: Int, id: Int): Int = {
      val mn = huffMin(cls)(id); val mx = huffMax(cls)(id)
      val vp = huffValPtr(cls)(id); val vs = huffVals(cls)(id)
      var code = getBit(); var l = 1
      while (l <= 16 && (mx(l) < 0 || code > mx(l))) {
        code = (code << 1) | getBit(); l += 1
      }
      require(l <= 16, "corrupt Huffman code in JPEG scan")
      vs(vp(l) + code - mn(l))
    }

    val mcusX = (w + 8 * hSamp - 1) / (8 * hSamp)
    val mcusY = (h + 8 * vSamp - 1) / (8 * vSamp)
    // planes at MCU-padded component resolution; cropped on return
    val planes = Array(
      Array.ofDim[Int](mcusY * vSamp * 8, mcusX * hSamp * 8),
      Array.ofDim[Int](mcusY * 8, mcusX * 8),
      Array.ofDim[Int](mcusY * 8, mcusX * 8))
    val prevDc = new Array[Int](3)
    val coef = new Array[Int](64)
    val px = new Array[Double](64)
    def decodeBlockInto(ci: Int, ox: Int, oy: Int): Unit = {
      java.util.Arrays.fill(coef, 0)
      val qt = q(ci)
      val dcCat = huffDecode(0, dcSel(ci))
      prevDc(ci) += extend(receive(dcCat), dcCat)
      coef(0) = prevDc(ci) * qt(0)
      var k = 1
      while (k < 64) {
        val rs = huffDecode(1, acSel(ci))
        val run = rs >> 4; val cat = rs & 0x0f
        if (cat == 0) {
          if (run == 15) k += 16
          else k = 64
        } else {
          k += run
          require(k < 64, "AC coefficient index overrun")
          coef(ZigZag(k)) = extend(receive(cat), cat) * qt(k)
          k += 1
        }
      }
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          var s = 0.0
          var v = 0
          while (v < 8) {
            var u = 0
            while (u < 8) {
              val c = coef(v * 8 + u)
              if (c != 0) s += cdct(u) * cdct(v) * c * cosTable(xx)(u) * cosTable(yy)(v)
              u += 1
            }
            v += 1
          }
          px(yy * 8 + xx) = s / 4.0
          xx += 1
        }
        yy += 1
      }
      val plane = planes(ci)
      yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          val v = math.round(px(yy * 8 + xx) + 128.0).toInt
          plane(oy + yy)(ox + xx) = math.max(0, math.min(255, v))
          xx += 1
        }
        yy += 1
      }
    }

    var mcuIdx = 0
    var rstExpect = 0
    val totalMcus = mcusX * mcusY
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var vy = 0
        while (vy < vSamp) {
          var vx = 0
          while (vx < hSamp) {
            decodeBlockInto(0, (mx * hSamp + vx) * 8, (my * vSamp + vy) * 8)
            vx += 1
          }
          vy += 1
        }
        decodeBlockInto(1, mx * 8, my * 8)
        decodeBlockInto(2, mx * 8, my * 8)
        mcuIdx += 1
        // restart boundary: the remaining buffered bits are the
        // encoder's 1-padding (fill() never reads past a real marker, so
        // nothing from the next interval can be in the buffer) — discard
        // them, verify the expected RSTm (strictly cycling 0..7), skip
        // it, and reset the DC predictors
        if (restartInterval > 0 && mcuIdx % restartInterval == 0 &&
            mcuIdx < totalMcus) {
          bitCnt = 0; bitBuf = 0L
          require(bp + 1 < bytes.length && (bytes(bp) & 0xff) == 0xff &&
            (bytes(bp + 1) & 0xff) == 0xd0 + rstExpect,
            f"expected RST$rstExpect%d marker at byte $bp in JPEG scan")
          bp += 2
          rstExpect = (rstExpect + 1) % 8
          java.util.Arrays.fill(prevDc, 0)
        }
        mx += 1
      }
      my += 1
    }

    val yOut = Array.tabulate(h, w)((yy, xx) => planes(0)(yy)(xx))
    val cbOut = Array.tabulate(h, w)((yy, xx) => planes(1)(yy / vSamp)(xx / hSamp))
    val crOut = Array.tabulate(h, w)((yy, xx) => planes(2)(yy / vSamp)(xx / hSamp))
    JpegYcc(w, h, hSamp, vSamp, yOut, cbOut, crOut)
  }

  // ------------------------------------- JPEG progressive (SOF2, T.81 §G)

  /** Dispatch on the frame type: baseline SOF0 through the streaming
    * MCU decoder, progressive SOF2 through the coefficient-buffer
    * decoder. The reject narrows to what is genuinely out of scope —
    * arithmetic-coded (SOF9-11/13-15) and lossless/hierarchical
    * (SOF3/5-7) frames — instead of excluding the large progressive
    * share of real web-crawl JPEGs.
    */
  def decodeJpegYccAuto(bytes: Array[Byte]): JpegYcc = {
    require(bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "bad JPEG SOI")
    var pos = 2
    var sof = -1
    while (sof < 0) {
      require(pos + 4 <= bytes.length && (bytes(pos) & 0xff) == 0xff,
        s"expected marker at $pos")
      val m = bytes(pos + 1) & 0xff
      require(m != 0xd9 && m != 0xda, "JPEG scan before any SOF frame header")
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) sof = m
      else {
        val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
        pos += 2 + len
      }
    }
    sof match {
      case 0xc0 => decodeJpegYcc(bytes)
      case 0xc2 => decodeJpegYccProgressive(bytes)
      case x => sys.error(f"unsupported JPEG frame type SOF${x - 0xc0}%d " +
        "(scope: baseline SOF0 and progressive SOF2; arithmetic-coded and " +
        "lossless/hierarchical frames rejected)")
    }
  }

  /** Decode a progressive (SOF2) 3-component YCbCr JPEG: spectral
    * selection and successive approximation per ITU T.81 Annex G —
    * interleaved or single-component DC scans with the point transform,
    * DC refinement bits, single-component AC scans with EOB-run coding,
    * AC refinement with correction bits, Huffman tables redefinable
    * between scans, restart intervals resetting predictors AND the
    * EOB run. Coefficients accumulate in per-component block buffers
    * (the structural cost progressive imposes — the scan order is a
    * coefficient permutation, so dequant+IDCT runs once at the end and
    * a baseline and progressive encode of the same quantized
    * coefficients decode bit-identically, which is what the ImageIO
    * cross-check spec pins). Scope mirrors [[decodeJpegYcc]]: 8-bit,
    * exactly 3 components, luma sampling {1,2}x{1,2}, chroma 1x1.
    */
  def decodeJpegYccProgressive(bytes: Array[Byte]): JpegYcc = {
    require(bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "bad JPEG SOI")
    var pos = 2
    var w = -1; var h = -1
    var hSamp = -1; var vSamp = -1
    var restartInterval = 0
    val quantTables = new Array[Array[Int]](4)
    val huffMin = Array.ofDim[Array[Int]](2, 4)
    val huffMax = Array.ofDim[Array[Int]](2, 4)
    val huffValPtr = Array.ofDim[Array[Int]](2, 4)
    val huffVals = Array.ofDim[Array[Int]](2, 4)
    val compQuant = new Array[Int](3)
    // per-component coefficient buffers in ZIGZAG order, padded to the
    // MCU grid (interleaved scans cover padding blocks; non-interleaved
    // scans cover only the component's ceil grid)
    var coefs: Array[Array[Array[Int]]] = null // (comp)(blockIdx)(64)
    var pbw: Array[Int] = null // padded blocks wide per comp
    var nbw: Array[Int] = null; var nbh: Array[Int] = null // non-interleaved grid
    var mcusX = 0; var mcusY = 0
    def hOf(ci: Int): Int = if (ci == 0) hSamp else 1
    def vOf(ci: Int): Int = if (ci == 0) vSamp else 1

    var done = false
    while (!done) {
      require(pos + 2 <= bytes.length && (bytes(pos) & 0xff) == 0xff,
        s"expected marker at $pos")
      val m = bytes(pos + 1) & 0xff
      if (m == 0xd9) { done = true }
      else {
        require(pos + 4 <= bytes.length, "truncated JPEG segment header")
        val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
        require(len >= 2 && pos + 2 + len <= bytes.length, "truncated JPEG segment")
        val seg = pos + 4
        m match {
          case 0xdb =>
            var p = seg
            while (p < pos + 2 + len) {
              val pq = (bytes(p) & 0xff) >> 4; val tq = bytes(p) & 0x0f
              require(pq == 0, "16-bit quantization tables unsupported")
              quantTables(tq) = Array.tabulate(64)(i => bytes(p + 1 + i) & 0xff)
              p += 65
            }
          case 0xc4 =>
            var p = seg
            while (p < pos + 2 + len) {
              val cls = (bytes(p) & 0xff) >> 4; val id = bytes(p) & 0x0f
              require(cls <= 1 && id <= 3, "bad DHT class/id")
              val counts = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
              val total = counts.sum
              val vals = Array.tabulate(total)(i => bytes(p + 17 + i) & 0xff)
              val mn = new Array[Int](17); val mx = new Array[Int](17)
              val vp = new Array[Int](17)
              var code = 0; var k = 0
              for (l <- 1 to 16) {
                mn(l) = code; vp(l) = k
                code += counts(l - 1); k += counts(l - 1)
                mx(l) = code - 1
                code <<= 1
              }
              for (l <- 1 to 16) if (counts(l - 1) == 0) mx(l) = -1
              huffMin(cls)(id) = mn; huffMax(cls)(id) = mx
              huffValPtr(cls)(id) = vp; huffVals(cls)(id) = vals
              p += 17 + total
            }
          case x if x >= 0xc0 && x <= 0xcf && x != 0xc4 && x != 0xc8 && x != 0xcc =>
            require(x == 0xc2, f"decodeJpegYccProgressive: expected SOF2, got SOF${x - 0xc0}%d")
            require((bytes(seg) & 0xff) == 8, "only 8-bit precision supported")
            h = ((bytes(seg + 1) & 0xff) << 8) | (bytes(seg + 2) & 0xff)
            w = ((bytes(seg + 3) & 0xff) << 8) | (bytes(seg + 4) & 0xff)
            require(w >= 1 && h >= 1 && w.toLong * h <= (1L << 26),
              s"implausible JPEG dimensions ${w}x$h (cap: 2^26 pixels)")
            val nc = bytes(seg + 5) & 0xff
            require(nc == 3, s"decodeJpegYccProgressive: expected 3 components, got $nc")
            var ci = 0
            while (ci < 3) {
              val o = seg + 6 + ci * 3
              val samp = bytes(o + 1) & 0xff
              if (ci == 0) {
                hSamp = samp >> 4; vSamp = samp & 0x0f
                require(hSamp >= 1 && hSamp <= 2 && vSamp >= 1 && vSamp <= 2,
                  s"luma sampling ${hSamp}x$vSamp out of scope (must be in {1,2}x{1,2})")
              } else require(samp == 0x11,
                f"chroma sampling 0x$samp%02x out of scope (must be 1x1)")
              compQuant(ci) = bytes(o + 2) & 0xff
              ci += 1
            }
            mcusX = (w + 8 * hSamp - 1) / (8 * hSamp)
            mcusY = (h + 8 * vSamp - 1) / (8 * vSamp)
            pbw = Array.tabulate(3)(c => mcusX * hOf(c))
            val pbh = Array.tabulate(3)(c => mcusY * vOf(c))
            nbw = Array.tabulate(3) { c =>
              val cw = (w * hOf(c) + hSamp - 1) / hSamp; (cw + 7) / 8
            }
            nbh = Array.tabulate(3) { c =>
              val ch = (h * vOf(c) + vSamp - 1) / vSamp; (ch + 7) / 8
            }
            coefs = Array.tabulate(3)(c => Array.ofDim[Int](pbw(c) * pbh(c), 64))
          case 0xdd =>
            restartInterval = ((bytes(seg) & 0xff) << 8) | (bytes(seg + 1) & 0xff)
          case 0xda =>
            require(coefs != null, "JPEG SOS before SOF2")
            pos = decodeProgressiveScan(bytes, pos, len,
              huffMin, huffMax, huffValPtr, huffVals,
              coefs, pbw, nbw, nbh, mcusX, mcusY, hSamp, vSamp, restartInterval) - 2 - len
          case _ => () // APPn/COM/other
        }
        pos += 2 + len
      }
    }
    require(coefs != null && w > 0, "JPEG missing SOF2 frame")

    // dequantize + IDCT every block into padded planes, then crop and
    // replicate-upsample exactly as the baseline path does
    val q = compQuant.map { tq =>
      val t = quantTables(tq)
      require(t != null, s"missing quantization table $tq"); t
    }
    val planes = Array(
      Array.ofDim[Int](mcusY * vSamp * 8, mcusX * hSamp * 8),
      Array.ofDim[Int](mcusY * 8, mcusX * 8),
      Array.ofDim[Int](mcusY * 8, mcusX * 8))
    val nat = new Array[Int](64)
    var ci = 0
    while (ci < 3) {
      val qt = q(ci)
      val bw = pbw(ci)
      val plane = planes(ci)
      var bi = 0
      while (bi < coefs(ci).length) {
        val blk = coefs(ci)(bi)
        java.util.Arrays.fill(nat, 0)
        var k = 0
        while (k < 64) { nat(ZigZag(k)) = blk(k) * qt(k); k += 1 }
        val ox = (bi % bw) * 8; val oy = (bi / bw) * 8
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            var s = 0.0
            var v = 0
            while (v < 8) {
              var u = 0
              while (u < 8) {
                val c = nat(v * 8 + u)
                if (c != 0) s += cdct(u) * cdct(v) * c * cosTable(xx)(u) * cosTable(yy)(v)
                u += 1
              }
              v += 1
            }
            val pv = math.round(s / 4.0 + 128.0).toInt
            plane(oy + yy)(ox + xx) = math.max(0, math.min(255, pv))
            xx += 1
          }
          yy += 1
        }
        bi += 1
      }
      ci += 1
    }
    val yOut = Array.tabulate(h, w)((yy, xx) => planes(0)(yy)(xx))
    val cbOut = Array.tabulate(h, w)((yy, xx) => planes(1)(yy / vSamp)(xx / hSamp))
    val crOut = Array.tabulate(h, w)((yy, xx) => planes(2)(yy / vSamp)(xx / hSamp))
    JpegYcc(w, h, hSamp, vSamp, yOut, cbOut, crOut)
  }

  /** One progressive entropy-coded scan (called at the SOS marker,
    * `len` = the SOS segment length): decodes into the coefficient
    * buffers and returns the byte position of the next marker.
    */
  private def decodeProgressiveScan(bytes: Array[Byte], sosPos: Int, len: Int,
      huffMin: Array[Array[Array[Int]]], huffMax: Array[Array[Array[Int]]],
      huffValPtr: Array[Array[Array[Int]]], huffVals: Array[Array[Array[Int]]],
      coefs: Array[Array[Array[Int]]], pbw: Array[Int],
      nbw: Array[Int], nbh: Array[Int], mcusX: Int, mcusY: Int,
      hSamp: Int, vSamp: Int, restartInterval: Int): Int = {
    val seg = sosPos + 4
    val ns = bytes(seg) & 0xff
    require(ns >= 1 && ns <= 3, s"bad scan component count $ns")
    val scanComp = new Array[Int](ns)
    val dcSel = new Array[Int](3); val acSel = new Array[Int](3)
    var i = 0
    while (i < ns) {
      val id = bytes(seg + 1 + i * 2) & 0xff
      require(id >= 1 && id <= 3, s"unknown scan component id $id")
      scanComp(i) = id - 1
      val sel = bytes(seg + 2 + i * 2) & 0xff
      dcSel(id - 1) = sel >> 4; acSel(id - 1) = sel & 0x0f
      i += 1
    }
    val ss = bytes(seg + 1 + ns * 2) & 0xff
    val se = bytes(seg + 2 + ns * 2) & 0xff
    val ahAl = bytes(seg + 3 + ns * 2) & 0xff
    val ah = ahAl >> 4; val al = ahAl & 0x0f
    require(ss <= 63 && se <= 63 && ss <= se, s"bad spectral band $ss..$se")
    require(al <= 13 && (ah == 0 || ah == al + 1),
      s"bad successive approximation Ah=$ah Al=$al")
    val isDc = ss == 0
    require(!isDc || se == 0, "DC scan must have Se=0")
    require(isDc || ns == 1, "AC scans must be single-component")

    var bp = sosPos + 2 + len
    var bitBuf = 0L; var bitCnt = 0
    def fill(): Unit = {
      while (bitCnt <= 56) {
        if (bp >= bytes.length) return
        val b = bytes(bp) & 0xff
        if (b == 0xff) {
          val nxt = if (bp + 1 < bytes.length) bytes(bp + 1) & 0xff else -1
          if (nxt == 0x00) { bitBuf = (bitBuf << 8) | 0xff; bitCnt += 8; bp += 2 }
          else return
        } else { bitBuf = (bitBuf << 8) | b; bitCnt += 8; bp += 1 }
      }
    }
    def getBit(): Int = {
      fill()
      if (bitCnt == 0) 1 // 1-padding past the end of the segment
      else { bitCnt -= 1; ((bitBuf >>> bitCnt) & 1L).toInt }
    }
    def receive(n: Int): Int = {
      var v = 0; var j = 0
      while (j < n) { v = (v << 1) | getBit(); j += 1 }; v
    }
    def extend(v: Int, n: Int): Int =
      if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v
    def huffDecode(cls: Int, id: Int): Int = {
      val mn = huffMin(cls)(id); val mx = huffMax(cls)(id)
      require(mn != null, s"missing Huffman table class $cls id $id")
      val vp = huffValPtr(cls)(id); val vs = huffVals(cls)(id)
      var code = getBit(); var l = 1
      while (l <= 16 && (mx(l) < 0 || code > mx(l))) {
        code = (code << 1) | getBit(); l += 1
      }
      require(l <= 16, "corrupt Huffman code in JPEG scan")
      vs(vp(l) + code - mn(l))
    }

    val prevDc = new Array[Int](3)
    var eobRun = 0
    val bit = 1 << al

    def decodeDcFirst(ci: Int, blk: Array[Int]): Unit = {
      val cat = huffDecode(0, dcSel(ci))
      prevDc(ci) += extend(receive(cat), cat)
      blk(0) = prevDc(ci) << al
    }
    def decodeDcRefine(blk: Array[Int]): Unit =
      if (getBit() == 1) blk(0) |= bit
    def decodeAcFirst(ci: Int, blk: Array[Int]): Unit = {
      if (eobRun > 0) { eobRun -= 1; return }
      var k = ss
      while (k <= se) {
        val rs = huffDecode(1, acSel(ci))
        val r = rs >> 4; val s = rs & 0x0f
        if (s == 0) {
          if (r < 15) {
            eobRun = (1 << r) - 1
            if (r > 0) eobRun += receive(r)
            k = 64 // end of band for this block
          } else k += 16 // ZRL
        } else {
          k += r
          require(k <= se, "AC coefficient index overrun")
          blk(k) = extend(receive(s), s) << al
          k += 1
        }
      }
    }
    def decodeAcRefine(ci: Int, blk: Array[Int]): Unit = {
      def refine(z: Int): Unit =
        if (getBit() == 1 && (blk(z) & bit) == 0)
          blk(z) += (if (blk(z) >= 0) bit else -bit)
      if (eobRun > 0) {
        eobRun -= 1
        var k = ss
        while (k <= se) { if (blk(k) != 0) refine(k); k += 1 }
        return
      }
      var k = ss
      while (k <= se) {
        val rs = huffDecode(1, acSel(ci))
        var r = rs >> 4; val s = rs & 0x0f
        var newVal = 0
        if (s == 0) {
          if (r < 15) {
            eobRun = (1 << r) - 1
            if (r > 0) eobRun += receive(r)
            r = 64 // never exhausts: correct to end of band, then stop
          }
          // r == 15: sixteen zero-history coefficients skipped below
        } else {
          require(s == 1, s"AC refinement magnitude $s (must be 1)")
          newVal = if (getBit() == 1) bit else -bit
        }
        // advance past r zero-history coefficients (refining nonzero-
        // history ones as passed), then place the new coefficient; the
        // EOB case's r=64 makes this refine to the end of the band
        var placed = false
        while (k <= se && !placed) {
          if (blk(k) != 0) refine(k)
          else {
            if (r == 0) {
              if (newVal != 0) blk(k) = newVal
              placed = true
            }
            r -= 1
          }
          k += 1
        }
      }
    }

    def blockOf(ci: Int, bx: Int, by: Int): Array[Int] =
      coefs(ci)(by * pbw(ci) + bx)

    // restart boundary shared by both scan shapes
    var rstExpect = 0
    def restart(unitIdx: Int, totalUnits: Int): Unit =
      if (restartInterval > 0 && unitIdx % restartInterval == 0 &&
          unitIdx < totalUnits) {
        bitCnt = 0; bitBuf = 0L
        require(bp + 1 < bytes.length && (bytes(bp) & 0xff) == 0xff &&
          (bytes(bp + 1) & 0xff) == 0xd0 + rstExpect,
          f"expected RST$rstExpect%d marker at byte $bp in JPEG scan")
        bp += 2
        rstExpect = (rstExpect + 1) % 8
        java.util.Arrays.fill(prevDc, 0)
        eobRun = 0
      }

    if (ns > 1) {
      // interleaved scan (DC only, per the requires above): MCU order
      val totalMcus = mcusX * mcusY
      var mcuIdx = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          var sci = 0
          while (sci < ns) {
            val ci = scanComp(sci)
            val hi = if (ci == 0) hSamp else 1
            val vi = if (ci == 0) vSamp else 1
            var vy = 0
            while (vy < vi) {
              var vx = 0
              while (vx < hi) {
                val blk = blockOf(ci, mx * hi + vx, my * vi + vy)
                if (ah == 0) decodeDcFirst(ci, blk) else decodeDcRefine(blk)
                vx += 1
              }
              vy += 1
            }
            sci += 1
          }
          mcuIdx += 1
          restart(mcuIdx, totalMcus)
          mx += 1
        }
        my += 1
      }
    } else {
      // non-interleaved: raster over the component's ceil-grid blocks
      val ci = scanComp(0)
      val bw = nbw(ci); val bh = nbh(ci)
      val total = bw * bh
      var bi = 0
      while (bi < total) {
        val blk = blockOf(ci, bi % bw, bi / bw)
        if (isDc) { if (ah == 0) decodeDcFirst(ci, blk) else decodeDcRefine(blk) }
        else { if (ah == 0) decodeAcFirst(ci, blk) else decodeAcRefine(ci, blk) }
        bi += 1
        restart(bi, total)
      }
    }
    require(eobRun == 0, "JPEG scan ended inside an EOB run")
    bp
  }

  /** Encode per-block-CONSTANT YCbCr content as a progressive (SOF2)
    * JPEG exercising the full scan grammar the decoder must survive:
    * an interleaved DC-first scan with the Al=1 point transform, three
    * single-component AC scans coded entirely as EOB runs through a
    * custom EOBn Huffman table DEFINED BETWEEN SCANS, and a final
    * interleaved DC-refinement scan carrying each block's low DC bit.
    * Constant blocks are DC-only, so the progressive stream decodes to
    * EXACTLY the same pixels as [[encodeJpegYcc]]'s baseline stream of
    * the same content — which is what lets the m16 gate share the m10
    * oracle verbatim. Non-constant blocks (nonzero AC) reject loudly:
    * this encoder's scope is the exactness fixture, not general
    * content (ImageIO supplies general progressive streams for the
    * decoder's cross-check spec).
    */
  def encodeJpegYccProgressive(w: Int, h: Int,
                               pixY: (Int, Int) => Int,
                               pixCb: (Int, Int) => Int,
                               pixCr: (Int, Int) => Int,
                               hSamp: Int = 2, vSamp: Int = 2,
                               quant: Int = 1): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, s"bad dims ${w}x$h")
    require(hSamp >= 1 && hSamp <= 2 && vSamp >= 1 && vSamp <= 2,
      s"luma sampling must be in {1,2}x{1,2}, got ${hSamp}x$vSamp")
    require(quant >= 1 && quant <= 255, s"bad quantizer $quant")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def segment(m: Int, payload: Array[Byte]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff); out.write(payload)
    }
    marker(0xd8)
    segment(0xe0, "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 2, 0, 0, 1, 0, 1, 0, 0))
    segment(0xdb, Array[Byte](0) ++ Array.fill(64)(quant.toByte))
    segment(0xdb, Array[Byte](1) ++ Array.fill(64)(quant.toByte))
    segment(0xc2, Array[Byte](8) ++ // SOF2: progressive DCT, Huffman
      Array((h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte) ++
      Array[Byte](3,
        1, ((hSamp << 4) | vSamp).toByte, 0,
        2, 0x11, 1,
        3, 0x11, 1))
    segment(0xc4, Array[Byte](0x00) ++ DcBits.map(_.toByte) ++ DcVals.map(_.toByte))
    segment(0xc4, Array[Byte](0x01) ++ DcBitsC.map(_.toByte) ++ DcValsC.map(_.toByte))

    val dcTabs = Array(huffEncodeTable(DcBits, DcVals), huffEncodeTable(DcBitsC, DcValsC))
    var acc = 0L; var nAcc = 0
    def putBits(v: Int, n: Int): Unit = {
      acc = (acc << n) | (v & ((1L << n) - 1)); nAcc += n
      while (nAcc >= 8) {
        val b = ((acc >>> (nAcc - 8)) & 0xff).toInt
        out.write(b); if (b == 0xff) out.write(0x00)
        nAcc -= 8
      }
    }
    def flushBits(): Unit = if (nAcc > 0) {
      val b = (((acc << (8 - nAcc)) | ((1 << (8 - nAcc)) - 1)) & 0xff).toInt
      out.write(b); if (b == 0xff) out.write(0x00)
      acc = 0L; nAcc = 0
    }
    def magCat(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))
    def putCoef(v: Int, cat: Int): Unit =
      if (cat > 0) putBits(if (v < 0) v - 1 else v, cat)

    val cw = (w + hSamp - 1) / hSamp
    val ch = (h + vSamp - 1) / vSamp
    def downsample(pix: (Int, Int) => Int): (Int, Int) => Int = (cx, cy) => {
      var s = 0; var n = 0
      var j = 0
      while (j < vSamp) {
        val sy = cy * vSamp + j
        if (sy < h) {
          var i = 0
          while (i < hSamp) {
            val sx = cx * hSamp + i
            if (sx < w) { s += pix(sx, sy) & 0xff; n += 1 }
            i += 1
          }
        }
        j += 1
      }
      (s + n / 2) / n
    }
    val cbAt = downsample(pixCb)
    val crAt = downsample(pixCr)

    val block = new Array[Double](64)
    // full FDCT so a non-DC-only block is DETECTED, not silently dropped
    def dcOf(sample: (Int, Int) => Int, sw: Int, sh: Int, ox: Int, oy: Int): Int = {
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          val sx = math.min(ox + xx, sw - 1)
          val sy = math.min(oy + yy, sh - 1)
          block(yy * 8 + xx) = (sample(sx, sy) & 0xff) - 128.0
          xx += 1
        }
        yy += 1
      }
      var zz = 0
      var dc = 0
      while (zz < 64) {
        val r = ZigZag(zz); val u = r % 8; val v = r / 8
        var s = 0.0
        var y2 = 0
        while (y2 < 8) {
          var x2 = 0
          while (x2 < 8) {
            s += block(y2 * 8 + x2) * cosTable(x2)(u) * cosTable(y2)(v)
            x2 += 1
          }
          y2 += 1
        }
        val c = math.round(cdct(u) * cdct(v) / 4.0 * s / quant).toInt
        if (zz == 0) dc = c
        else require(c == 0,
          s"encodeJpegYccProgressive: nonzero AC coefficient at block ($ox,$oy) " +
            "— scope is per-block-constant (DC-only) content")
        zz += 1
      }
      dc
    }

    val mcusX = (w + 8 * hSamp - 1) / (8 * hSamp)
    val mcusY = (h + 8 * vSamp - 1) / (8 * vSamp)
    // gather every block's DC in interleaved MCU order, per component
    val dcY = Array.ofDim[Int](mcusY * vSamp, mcusX * hSamp)
    val dcCb = Array.ofDim[Int](mcusY, mcusX)
    val dcCr = Array.ofDim[Int](mcusY, mcusX)
    for (by <- 0 until mcusY * vSamp; bx <- 0 until mcusX * hSamp)
      dcY(by)(bx) = dcOf(pixY, w, h, bx * 8, by * 8)
    for (by <- 0 until mcusY; bx <- 0 until mcusX) {
      dcCb(by)(bx) = dcOf(cbAt, cw, ch, bx * 8, by * 8)
      dcCr(by)(bx) = dcOf(crAt, cw, ch, bx * 8, by * 8)
    }
    def mcuBlocks(f: (Int, Array[Array[Int]], Int, Int) => Unit): Unit =
      for (my <- 0 until mcusY; mx <- 0 until mcusX) {
        for (vy <- 0 until vSamp; vx <- 0 until hSamp)
          f(0, dcY, mx * hSamp + vx, my * vSamp + vy)
        f(1, dcCb, mx, my)
        f(2, dcCr, mx, my)
      }

    // scan 1: interleaved DC first, point transform Al=1
    segment(0xda, Array[Byte](3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0, 0x01))
    val pred = new Array[Int](3)
    mcuBlocks { (ci, dc, bx, by) =>
      val v = dc(by)(bx) >> 1
      val diff = v - pred(ci)
      pred(ci) = v
      val cat = magCat(diff)
      val (code, clen) = dcTabs(if (ci == 0) 0 else 1)(cat)
      putBits(code, clen); putCoef(diff, cat)
    }
    flushBits()

    // custom AC table for the EOB-run-only scans: the 15 EOBn symbols
    // (r = n, s = 0) as a flat 4-bit canonical code — deliberately NOT
    // Annex-K, so table redefinition between scans is exercised
    val eobnBits = Array(0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val eobnVals = Array.tabulate(15)(n => n << 4)
    segment(0xc4, Array[Byte](0x10) ++ eobnBits.map(_.toByte) ++ eobnVals.map(_.toByte))
    segment(0xc4, Array[Byte](0x11) ++ eobnBits.map(_.toByte) ++ eobnVals.map(_.toByte))
    val eobnTab = huffEncodeTable(eobnBits, eobnVals)

    // scans 2-4: per-component AC 1..63 first pass, all-zero bands as
    // maximal EOB runs over the component's non-interleaved block grid
    val scanDefs = Seq[(Int, Int)](
      (1, (w + 7) / 8 * ((h + 7) / 8)),
      (2, (cw + 7) / 8 * ((ch + 7) / 8)),
      (3, (cw + 7) / 8 * ((ch + 7) / 8)))
    scanDefs.foreach { case (compId, nBlocks) =>
      segment(0xda, Array[Byte](1, compId.toByte,
        (if (compId == 1) 0x00 else 0x01).toByte, 1, 63, 0x00))
      var remaining = nBlocks
      while (remaining > 0) {
        var n = math.min(14, 31 - Integer.numberOfLeadingZeros(remaining))
        val run = math.min(remaining, (1 << n) + ((1 << n) - 1))
        val (code, clen) = eobnTab(n << 4)
        putBits(code, clen)
        if (n > 0) putBits(run - (1 << n), n)
        remaining -= run
      }
      flushBits()
    }

    // scan 5: interleaved DC refinement, Ah=1 Al=0 — each block's low bit
    segment(0xda, Array[Byte](3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0, 0x10))
    mcuBlocks { (ci, dc, bx, by) => putBits(dc(by)(bx) & 1, 1) }
    flushBits()
    marker(0xd9)
    out.toByteArray
  }

  // ---------------------------------------------------------------- WAV

  /** Encode PCM 16-bit little-endian mono, with a gratuitous LIST chunk
    * between fmt and data so decoders must actually walk chunks rather
    * than assume the canonical 44-byte layout.
    */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] =
    encodeWavMulti(sampleRate, 1, samples)

  /** [[encodeWav]] generalized to `channels` interleaved PCM16 channels
    * (frame = one sample per channel, little-endian, channel order as
    * interleaved). Same gratuitous LIST chunk so decoders must walk.
    */
  def encodeWavMulti(sampleRate: Int, channels: Int,
                     interleaved: Array[Short]): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"WAV channels out of range: $channels")
    require(interleaved.length % channels == 0,
      s"ragged interleave: ${interleaved.length} samples over $channels channels")
    val listPayload = "INFOgraft".getBytes("US-ASCII") // odd length: 9 → pad byte
    val listChunk = 8 + listPayload.length + (listPayload.length & 1)
    val dataLen = interleaved.length * 2
    val riffLen = 4 + (8 + 16) + listChunk + (8 + dataLen)
    val buf = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffLen).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2 * channels) // byte rate
    buf.putShort((2 * channels).toShort)  // block align
    buf.putShort(16)                      // bits per sample
    buf.put("LIST".getBytes("US-ASCII")).putInt(listPayload.length).put(listPayload)
    if ((listPayload.length & 1) == 1) buf.put(0.toByte)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    interleaved.foreach(buf.putShort)
    buf.array()
  }

  /** Full PCM16 sample decode — the m08 feature-extraction entry point.
    * Same RIFF chunk walk as [[decodeWav]] but returns the samples
    * themselves: (sampleRate, interleaved frames). Scope: mono PCM16,
    * matching the encoder; anything else fails loudly.
    */
  def decodeWavSamples(bytes: Array[Byte]): (Int, Array[Short]) = {
    val (rate, channels, out) = decodeWavPcm(bytes)
    require(channels == 1, "non-mono WAV out of scope")
    (rate, out)
  }

  /** PCM16 decode accepting ANY channel count — the [[decodeWavSamples]]
    * chunk walk with the channel scope lifted (the m23 mixdown entry
    * point): returns (sampleRate, channels, interleaved samples).
    */
  def decodeWavPcm(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "bad RIFF/WAVE header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var rate = -1
    var channels = -1
    var out: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = buf.getInt(pos + 4)
      require(len >= 0 && pos + 8 + len <= bytes.length, s"truncated WAV chunk $id")
      id match {
        case "fmt " =>
          require(len >= 16, "short fmt chunk")
          require((buf.getShort(pos + 8) & 0xffff) == 1, "non-PCM WAV out of scope")
          channels = buf.getShort(pos + 10) & 0xffff
          require(channels >= 1 && channels <= 8, s"WAV channels out of range: $channels")
          rate = buf.getInt(pos + 12)
          require((buf.getShort(pos + 22) & 0xffff) == 16, "scope: PCM16")
        case "data" =>
          require(rate > 0, "WAV data chunk before fmt")
          out = Array.tabulate(len / 2)(i => buf.getShort(pos + 8 + 2 * i))
        case _ => ()
      }
      pos += 8 + len + (len & 1)
    }
    require(out != null, "WAV missing data chunk")
    (rate, channels, out)
  }

  def decodeWav(bytes: Array[Byte]): AssetMeta = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "bad RIFF/WAVE header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var channels = -1; var rate = -1; var bits = -1
    var sum = 0L; var nFrames = -1L
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = buf.getInt(pos + 4)
      require(len >= 0 && pos + 8 + len <= bytes.length, s"truncated WAV chunk $id")
      id match {
        case "fmt " =>
          require(len >= 16, "short fmt chunk")
          val fmt = buf.getShort(pos + 8) & 0xffff
          require(fmt == 1, s"non-PCM WAV (format $fmt) out of scope")
          channels = buf.getShort(pos + 10) & 0xffff
          rate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22) & 0xffff
          require(bits == 16, s"unsupported WAV bit depth $bits (scope: PCM16)")
        case "data" =>
          require(channels > 0, "WAV data chunk before fmt")
          var off = pos + 8
          val end = pos + 8 + len
          var s = 0L
          while (off + 1 < end) { s += buf.getShort(off); off += 2 }
          sum = s
          nFrames = len.toLong / (2L * channels)
        case _ => () // LIST/fact/...: skip
      }
      pos += 8 + len + (len & 1) // odd chunks carry a pad byte
    }
    require(nFrames >= 0, "WAV missing data chunk")
    AssetMeta("wav", width = 0, height = 0, channels = channels,
      bitDepth = 16, sampleRate = rate, nUnits = nFrames, valueSum = sum)
  }

  // ---------------------------------------------------------------- GIF

  /** Encode an 8-bit indexed GIF87a image over the 256-entry greyscale
    * global palette (entry i = (i,i,i)), with a REAL LZW compressor —
    * dictionary of (prefix-code, byte) pairs, variable code width
    * 9→12 bits packed LSB-first (GIF packs bits the opposite way round
    * from TIFF's MSB-first LZW in [[GeoTiff]]), CLEAR emitted up front
    * and again whenever the table fills at 4096 entries. `pix(x, y)`
    * is the palette index (masked to 0..255).
    */
  def encodeGif(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, s"encodeGif: bad dims ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF87a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0xf7) // global table, 8-bit colour resolution, 256 entries
    out.write(0)    // background index
    out.write(0)    // pixel aspect ratio: unspecified
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(0x00) // no local table, not interlaced
    out.write(8)    // LZW minimum code size
    val idx = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { idx(y * w + x) = (pix(x, y) & 0xff).toByte; x += 1 }
      y += 1
    }
    val data = lzwCompressGif(idx, 8)
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n); out.write(data, off, n); off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF-flavour LZW compress: width grows AFTER the entry numbered
    * (1<<width) is allocated (the encoder's next-free counter leads the
    * decoder's by exactly one, so encoder `next == (1<<w)+1` and decoder
    * `next == (1<<w)` fire at the same point in the code stream — no
    * "early change": that is TIFF's variant, not GIF's).
    */
  private def lzwCompressGif(idx: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nAcc = 0
    var width = minCodeSize + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << nAcc; nAcc += width
      while (nAcc >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; nAcc -= 8 }
    }
    val dict = new scala.collection.mutable.LongMap[Int]()
    var next = eoi + 1
    put(clear)
    var cur = idx(0) & 0xff
    var i = 1
    while (i < idx.length) {
      val k = idx(i) & 0xff
      val key = (cur.toLong << 8) | k
      dict.get(key) match {
        case Some(c) => cur = c
        case None =>
          put(cur)
          dict.put(key, next); next += 1
          if (next == (1 << width) + 1 && width < 12) width += 1
          if (next == 4096) { // table full: reset both sides
            put(clear)
            dict.clear(); next = eoi + 1; width = minCodeSize + 1
          }
          cur = k
      }
      i += 1
    }
    put(cur); put(eoi)
    if (nAcc > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  /** Decode a GIF87a/89a image: (width, height, 768-byte greyscale-or-
    * colour global palette, per-pixel indices). Scope, rejected loudly
    * outside it: a global colour table, one non-interlaced image with no
    * local table; extension blocks (GCE/comment/application) are skipped
    * via the sub-block walk. The LZW decoder carries the full variable-
    * width protocol: CLEAR resets mid-stream, the KwKwK
    * (code == next-free) case, and strict pixel-count/truncation checks.
    */
  def decodeGifImage(bytes: Array[Byte]): (Int, Int, Array[Byte], Array[Byte]) = {
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"not a GIF: $sig")
    def le16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    val w = le16(6); val h = le16(8)
    val packed = bytes(10) & 0xff
    require((packed & 0x80) != 0, "GIF without a global colour table (scope: global palette)")
    val gctSize = 1 << ((packed & 7) + 1)
    val palette = new Array[Byte](768)
    System.arraycopy(bytes, 13, palette, 0, 3 * gctSize)
    var pos = 13 + 3 * gctSize
    while (true) {
      (bytes(pos) & 0xff) match {
        case 0x21 => // extension: label byte then sub-blocks
          pos += 2
          while ((bytes(pos) & 0xff) != 0) pos += 1 + (bytes(pos) & 0xff)
          pos += 1
        case 0x2c =>
          val iw = le16(pos + 5); val ih = le16(pos + 7)
          val ip = bytes(pos + 9) & 0xff
          require(iw.toLong * ih > 0, s"GIF: empty image ${iw}x$ih")
          // local colour table (very common in real crawl GIFs): the
          // frame's indices address IT, not the global table
          var q = pos + 10
          val activePal = if ((ip & 0x80) != 0) {
            val n = 1 << ((ip & 7) + 1)
            val lp = new Array[Byte](768)
            require(q + 3 * n <= bytes.length, "GIF: truncated local colour table")
            System.arraycopy(bytes, q, lp, 0, 3 * n)
            q += 3 * n
            lp
          } else palette
          val minCodeSize = bytes(q) & 0xff
          require(minCodeSize >= 2 && minCodeSize <= 8, s"GIF: bad LZW min code size $minCodeSize")
          pos = q + 1
          val data = new java.io.ByteArrayOutputStream()
          while ((bytes(pos) & 0xff) != 0) {
            val n = bytes(pos) & 0xff
            data.write(bytes, pos + 1, n)
            pos += 1 + n
          }
          val indices = lzwDecompressGif(data.toByteArray, minCodeSize, iw * ih)
          val rows = if ((ip & 0x40) != 0) deinterlaceGif(indices, iw, ih) else indices
          return (iw, ih, activePal, rows)
        case 0x3b => sys.error("GIF trailer before any image block")
        case b => sys.error(f"GIF: unexpected block 0x$b%02x")
      }
    }
    sys.error("unreachable")
  }

  /** GIF row de-interlace (GIF89a appendix E): the stream carries rows
    * in four passes — start 0 step 8, start 4 step 8, start 2 step 4,
    * start 1 step 2 — reorder them back to top-to-bottom.
    */
  private def deinterlaceGif(indices: Array[Byte], iw: Int, ih: Int): Array[Byte] = {
    val out = new Array[Byte](indices.length)
    var src = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < ih) {
        System.arraycopy(indices, src * iw, out, y * iw, iw)
        src += 1
        y += step
      }
    }
    out
  }

  /** GIF-flavour LZW decompress (LSB-first bit order, prefix/suffix
    * table, stack expansion). Requires exactly `expect` pixels.
    */
  private def lzwDecompressGif(data: Array[Byte], minCodeSize: Int, expect: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](expect)
    var outN = 0
    var width = minCodeSize + 1
    var next = eoi + 1
    var acc = 0L; var nAcc = 0; var pos = 0
    def read(): Int = {
      while (nAcc < width) {
        require(pos < data.length, "GIF: LZW stream truncated (no EOI)")
        acc |= (data(pos) & 0xffL) << nAcc; pos += 1; nAcc += 8
      }
      val c = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; nAcc -= width; c
    }
    var prev = -1
    var first: Byte = 0
    var done = false
    while (!done) {
      val code = read()
      if (code == clear) { next = eoi + 1; width = minCodeSize + 1; prev = -1 }
      else if (code == eoi) done = true
      else {
        require(code < next || (code == next && prev >= 0),
          s"GIF: LZW code $code out of range (next=$next)")
        var sp = 0
        var c = code
        if (code == next) { stack(sp) = first; sp += 1; c = prev } // KwKwK
        while (c > eoi) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        require(c < clear, s"GIF: chain resolved to reserved code $c")
        first = c.toByte
        stack(sp) = first; sp += 1
        require(outN + sp <= expect, s"GIF: more than $expect pixels in LZW stream")
        while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev; suffix(next) = first; next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    require(outN == expect, s"GIF: decoded $outN pixels, expected $expect")
    out
  }

  /** Encode a multi-frame (animated) GIF: one image block per frame,
    * every frame full-canvas at (0,0) — the no-compositing subset where
    * frame k IS the canvas after k steps. Shares [[lzwCompressGif]];
    * each frame's LZW stream starts fresh (its own CLEAR), as the spec
    * requires per image block.
    */
  def encodeGifAnim(w: Int, h: Int, frames: Int,
                    pix: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, s"encodeGifAnim: bad dims ${w}x$h")
    require(frames >= 1, s"encodeGifAnim: need >= 1 frame, got $frames")
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0xf7); out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    var f = 0
    while (f < frames) {
      out.write(0x2c)
      le16(0); le16(0); le16(w); le16(h)
      out.write(0x00)
      out.write(8)
      val idx = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { idx(y * w + x) = (pix(f, x, y) & 0xff).toByte; x += 1 }
        y += 1
      }
      val data = lzwCompressGif(idx, 8)
      var off = 0
      while (off < data.length) {
        val n = math.min(255, data.length - off)
        out.write(n); out.write(data, off, n); off += n
      }
      out.write(0)
      f += 1
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** Decode every frame of a (possibly multi-image) GIF, COMPOSITED per
    * the GIF89a disposal protocol over a persistent canvas — partial-
    * frame updates being the common case in crawled media. Each emitted
    * frame is the full `w`x`h` canvas AS DISPLAYED after that image:
    *
    *  - the canvas starts as the header's background colour index;
    *  - each image block draws its rect at (left, top), skipping pixels
    *    equal to the GCE's transparent index (underlying canvas shows
    *    through);
    *  - after display, disposal 0/1 keep the canvas, disposal 2 restores
    *    the rect to the background index, disposal 3 restores the rect
    *    to the pre-draw canvas.
    *
    * Full-canvas no-GCE streams compose to exactly the per-frame images
    * (frame k overwrites everything), so the m15 oracle is unchanged.
    * Scope as [[decodeGifImage]] otherwise: global palette, no local
    * tables, non-interlaced. Returns (width, height, palette, one
    * composited index canvas per frame).
    */
  def decodeGifFrames(bytes: Array[Byte]): (Int, Int, Array[Byte], Vector[Array[Byte]]) = {
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"not a GIF: $sig")
    def le16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    val w = le16(6); val h = le16(8)
    val packed = bytes(10) & 0xff
    require((packed & 0x80) != 0, "GIF without a global colour table (scope: global palette)")
    val bgIndex = bytes(11) & 0xff
    val gctSize = 1 << ((packed & 7) + 1)
    val palette = new Array[Byte](768)
    System.arraycopy(bytes, 13, palette, 0, 3 * gctSize)
    var pos = 13 + 3 * gctSize
    val frames = Vector.newBuilder[Array[Byte]]
    val canvas = Array.fill[Byte](w * h)(bgIndex.toByte)
    // pending Graphic Control Extension state — applies to ONE image
    var disposal = 0
    var transIdx = -1
    var done = false
    while (!done) {
      (bytes(pos) & 0xff) match {
        case 0x21 =>
          val label = bytes(pos + 1) & 0xff
          if (label == 0xf9) { // GCE: packed, delay(2), transparent index
            require((bytes(pos + 2) & 0xff) == 4, "GIF: bad GCE block size")
            val gp = bytes(pos + 3) & 0xff
            disposal = (gp >> 2) & 0x07
            require(disposal <= 3, s"GIF: reserved disposal method $disposal")
            transIdx = if ((gp & 1) != 0) bytes(pos + 6) & 0xff else -1
          }
          pos += 2
          while ((bytes(pos) & 0xff) != 0) pos += 1 + (bytes(pos) & 0xff)
          pos += 1
        case 0x2c =>
          val left = le16(pos + 1); val top = le16(pos + 3)
          val iw = le16(pos + 5); val ih = le16(pos + 7)
          require(iw > 0 && ih > 0 && left + iw <= w && top + ih <= h,
            s"GIF frame rect ${iw}x$ih@($left,$top) outside the ${w}x$h canvas")
          val ip = bytes(pos + 9) & 0xff
          require((ip & 0x80) == 0, "GIF local colour table in the index-canvas " +
            "decoder — use decodeGifFramesRgb (indices are palette-relative)")
          val minCodeSize = bytes(pos + 10) & 0xff
          require(minCodeSize >= 2 && minCodeSize <= 8, s"GIF: bad LZW min code size $minCodeSize")
          pos += 11
          val data = new java.io.ByteArrayOutputStream()
          while ((bytes(pos) & 0xff) != 0) {
            val n = bytes(pos) & 0xff
            data.write(bytes, pos + 1, n)
            pos += 1 + n
          }
          pos += 1
          val raw0 = lzwDecompressGif(data.toByteArray, minCodeSize, iw * ih)
          val indices = if ((ip & 0x40) != 0) deinterlaceGif(raw0, iw, ih) else raw0
          val before = if (disposal == 3) canvas.clone else null
          var yy = 0
          while (yy < ih) {
            var xx = 0
            while (xx < iw) {
              val v = indices(yy * iw + xx) & 0xff
              if (v != transIdx) canvas((top + yy) * w + (left + xx)) = v.toByte
              xx += 1
            }
            yy += 1
          }
          frames += canvas.clone
          disposal match {
            case 2 =>
              var dy = 0
              while (dy < ih) {
                java.util.Arrays.fill(canvas, (top + dy) * w + left,
                  (top + dy) * w + left + iw, bgIndex.toByte)
                dy += 1
              }
            case 3 =>
              var dy = 0
              while (dy < ih) {
                System.arraycopy(before, (top + dy) * w + left,
                  canvas, (top + dy) * w + left, iw)
                dy += 1
              }
            case _ => ()
          }
          disposal = 0; transIdx = -1
        case 0x3b => done = true
        case b => sys.error(f"GIF: unexpected block 0x$b%02x")
      }
    }
    val fs = frames.result()
    require(fs.nonEmpty, "GIF with no image block")
    (w, h, palette, fs)
  }

  /** RGB-canvas compositing decode: the palette-correct model when
    * frames carry LOCAL colour tables (animated crawl GIFs very often
    * do — each frame's indices address its own palette, so an index
    * canvas cannot represent the composite). Supports interlaced
    * frames, transparency, disposal 0-3; background and disposal-2
    * fills resolve through the GLOBAL palette's background index.
    * Returns (width, height, one 3-byte-per-pixel RGB canvas per frame).
    */
  def decodeGifFramesRgb(bytes: Array[Byte]): (Int, Int, Vector[Array[Byte]]) = {
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"not a GIF: $sig")
    def le16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    val w = le16(6); val h = le16(8)
    val packed = bytes(10) & 0xff
    require((packed & 0x80) != 0, "GIF without a global colour table (scope: global palette)")
    val bgIndex = bytes(11) & 0xff
    val gctSize = 1 << ((packed & 7) + 1)
    val globalPal = new Array[Byte](768)
    System.arraycopy(bytes, 13, globalPal, 0, 3 * gctSize)
    var pos = 13 + 3 * gctSize
    val frames = Vector.newBuilder[Array[Byte]]
    val canvas = new Array[Byte](3 * w * h)
    val bg = Array(globalPal(3 * bgIndex), globalPal(3 * bgIndex + 1),
      globalPal(3 * bgIndex + 2))
    var p0 = 0
    while (p0 < canvas.length) { canvas(p0) = bg(0); canvas(p0 + 1) = bg(1)
      canvas(p0 + 2) = bg(2); p0 += 3 }
    var disposal = 0
    var transIdx = -1
    var done = false
    while (!done) {
      (bytes(pos) & 0xff) match {
        case 0x21 =>
          val label = bytes(pos + 1) & 0xff
          if (label == 0xf9) {
            require((bytes(pos + 2) & 0xff) == 4, "GIF: bad GCE block size")
            val gp = bytes(pos + 3) & 0xff
            disposal = (gp >> 2) & 0x07
            require(disposal <= 3, s"GIF: reserved disposal method $disposal")
            transIdx = if ((gp & 1) != 0) bytes(pos + 6) & 0xff else -1
          }
          pos += 2
          while ((bytes(pos) & 0xff) != 0) pos += 1 + (bytes(pos) & 0xff)
          pos += 1
        case 0x2c =>
          val left = le16(pos + 1); val top = le16(pos + 3)
          val iw = le16(pos + 5); val ih = le16(pos + 7)
          require(iw > 0 && ih > 0 && left + iw <= w && top + ih <= h,
            s"GIF frame rect ${iw}x$ih@($left,$top) outside the ${w}x$h canvas")
          val ip = bytes(pos + 9) & 0xff
          var q = pos + 10
          val pal = if ((ip & 0x80) != 0) {
            val n = 1 << ((ip & 7) + 1)
            val lp = new Array[Byte](768)
            require(q + 3 * n <= bytes.length, "GIF: truncated local colour table")
            System.arraycopy(bytes, q, lp, 0, 3 * n)
            q += 3 * n
            lp
          } else globalPal
          val minCodeSize = bytes(q) & 0xff
          require(minCodeSize >= 2 && minCodeSize <= 8,
            s"GIF: bad LZW min code size $minCodeSize")
          pos = q + 1
          val data = new java.io.ByteArrayOutputStream()
          while ((bytes(pos) & 0xff) != 0) {
            val n = bytes(pos) & 0xff
            data.write(bytes, pos + 1, n)
            pos += 1 + n
          }
          pos += 1
          val raw0 = lzwDecompressGif(data.toByteArray, minCodeSize, iw * ih)
          val indices = if ((ip & 0x40) != 0) deinterlaceGif(raw0, iw, ih) else raw0
          val before = if (disposal == 3) canvas.clone else null
          var yy = 0
          while (yy < ih) {
            var xx = 0
            while (xx < iw) {
              val v = indices(yy * iw + xx) & 0xff
              if (v != transIdx) {
                val d = 3 * ((top + yy) * w + (left + xx))
                canvas(d) = pal(3 * v); canvas(d + 1) = pal(3 * v + 1)
                canvas(d + 2) = pal(3 * v + 2)
              }
              xx += 1
            }
            yy += 1
          }
          frames += canvas.clone
          disposal match {
            case 2 =>
              var dy = 0
              while (dy < ih) {
                var dx = 0
                while (dx < iw) {
                  val d = 3 * ((top + dy) * w + (left + dx))
                  canvas(d) = bg(0); canvas(d + 1) = bg(1); canvas(d + 2) = bg(2)
                  dx += 1
                }
                dy += 1
              }
            case 3 =>
              var dy = 0
              while (dy < ih) {
                System.arraycopy(before, 3 * ((top + dy) * w + left),
                  canvas, 3 * ((top + dy) * w + left), 3 * iw)
                dy += 1
              }
            case _ => ()
          }
          disposal = 0; transIdx = -1
        case 0x3b => done = true
        case b => sys.error(f"GIF: unexpected block 0x$b%02x")
      }
    }
    val fs = frames.result()
    require(fs.nonEmpty, "GIF with no image block")
    (w, h, fs)
  }

  /** One frame of a composited animated GIF: `pix(fx, fy)` in FRAME
    * coordinates yields the palette index; `transparentIdx` ≥ 0 turns
    * that index into "underlying canvas shows through" (and is emitted
    * in the frame's GCE); `disposal` 0-3 per the GIF89a protocol.
    */
  case class GifFrameSpec(left: Int, top: Int, w: Int, h: Int,
                          disposal: Int, transparentIdx: Int,
                          pix: (Int, Int) => Int,
                          // frame stored in the 4-pass interlace order
                          interlaced: Boolean = false,
                          // 256-entry LOCAL colour table: index -> (r,g,b);
                          // None = frame uses the global table
                          localPalette: Option[Int => (Int, Int, Int)] = None)

  /** Encode an animated GIF with PARTIAL frames, disposal methods, and
    * transparency — the compositing fixture [[decodeGifFrames]] must
    * reassemble. Global greyscale identity palette (so index = grey
    * value), one GCE per frame carrying its disposal and transparent
    * index.
    */
  def encodeGifAnimComposite(w: Int, h: Int, background: Int,
                             frames: Seq[GifFrameSpec]): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, s"bad dims ${w}x$h")
    require(frames.nonEmpty, "need >= 1 frame")
    frames.foreach { f =>
      require(f.w > 0 && f.h > 0 && f.left >= 0 && f.top >= 0 &&
        f.left + f.w <= w && f.top + f.h <= h,
        s"frame rect ${f.w}x${f.h}@(${f.left},${f.top}) outside ${w}x$h")
      require(f.disposal >= 0 && f.disposal <= 3, s"bad disposal ${f.disposal}")
    }
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0xf7)
    out.write(background & 0xff)
    out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    frames.foreach { f =>
      out.write(0x21); out.write(0xf9); out.write(4) // GCE
      val transFlag = if (f.transparentIdx >= 0) 1 else 0
      out.write((f.disposal << 2) | transFlag)
      le16(0) // delay
      out.write(math.max(0, f.transparentIdx) & 0xff)
      out.write(0) // GCE terminator
      out.write(0x2c)
      le16(f.left); le16(f.top); le16(f.w); le16(f.h)
      out.write((if (f.localPalette.isDefined) 0x87 else 0x00) |
        (if (f.interlaced) 0x40 else 0x00)) // 0x87 = local table, 256 entries
      f.localPalette.foreach { lp =>
        var v = 0
        while (v < 256) {
          val (r, g, b) = lp(v)
          out.write(r & 0xff); out.write(g & 0xff); out.write(b & 0xff)
          v += 1
        }
      }
      out.write(8)
      val idx = new Array[Byte](f.w * f.h)
      var y = 0
      while (y < f.h) {
        var x = 0
        while (x < f.w) { idx(y * f.w + x) = (f.pix(x, y) & 0xff).toByte; x += 1 }
        y += 1
      }
      // interlaced frames store their rows in the 4-pass order
      val stored = if (!f.interlaced) idx else {
        val o = new Array[Byte](idx.length)
        var src = 0
        for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
          var yy = start
          while (yy < f.h) {
            System.arraycopy(idx, yy * f.w, o, src * f.w, f.w)
            src += 1
            yy += step
          }
        }
        o
      }
      val data = lzwCompressGif(stored, 8)
      var off = 0
      while (off < data.length) {
        val n = math.min(255, data.length - off)
        out.write(n); out.write(data, off, n); off += n
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** Sniffed GIF decode to the uniform record: channels 1 because the
    * fixture palette is the greyscale identity ramp; `valueSum` is the
    * exact integer sum of the palette RED component over all pixels
    * (= the grey value under the identity ramp).
    */
  def decodeGif(bytes: Array[Byte]): AssetMeta = {
    val (w, h, palette, idx) = decodeGifImage(bytes)
    var s = 0L
    var i = 0
    while (i < idx.length) { s += palette(3 * (idx(i) & 0xff)) & 0xff; i += 1 }
    AssetMeta("gif", width = w, height = h, channels = 1, bitDepth = 8,
      sampleRate = 0, nUnits = w.toLong * h, valueSum = s)
  }
}
