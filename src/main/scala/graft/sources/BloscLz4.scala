package graft.sources

/** Blosc v1 container + LZ4 block codec, spec-from-scratch — the default
  * compressor stack of real-world Zarr v2 stores (numcodecs writes
  * `{"id":"blosc","cname":"lz4",...}` unless told otherwise, so most
  * third-party stores need exactly this to open). Public formats only:
  *
  *  - the c-blosc 1.x frame ("Blosc chunk format", c-blosc
  *    README_CHUNK_FORMAT.rst): 16-byte header `[version, versionlz,
  *    flags, typesize, nbytes:i32le, blocksize:i32le, cbytes:i32le]`,
  *    then (unless the memcpy flag is set) one `int32le` start offset
  *    per block, then the blocks; each block is one or more STREAMS,
  *    each `int32le csize` + payload, `csize == uncompressed size`
  *    meaning stored-raw;
  *  - the LZ4 block format (lz4_Block_format.md): token byte with
  *    4-bit literal/match-length nibbles, 255-run length extensions,
  *    little-endian 16-bit match offset, minmatch 4, last sequence
  *    literals-only with the final 5 bytes never matched.
  *
  * Scope (loud rejects otherwise): compressor code 1 (LZ4/LZ4HC — the
  * block format is shared), byte-shuffle and no-shuffle frames, memcpy
  * frames. Bit-shuffle (flag 0x4) and the other compcodes (blosclz,
  * snappy, zlib-in-blosc) reject with a pointer; zstd (compcode 5)
  * decodes via [[BloscZstd]]. Split layout follows c-blosc's
  * deterministic rule — a full block splits into `typesize` streams
  * iff `2 <= typesize <= 16`, the block is typesize-aligned and
  * `blocksize/typesize >= 128` (independent of shuffle, per blosc.c
  * `split_block`); frames from c-blosc >= 1.14 record the decision in
  * header flags bit 4 (set = not split) which overrides the rule; the
  * leftover block never splits. Byte-shuffle transposes the
  * typesize-aligned prefix of each block; the unaligned tail rides raw
  * (c-blosc `shuffle()` semantics).
  *
  * Scale shape: this codec runs inside the per-chunk decode task of
  * [[Zarr.readRecords]] — allocation is bounded by the chunk cell cap
  * the metadata walk already enforces, and every declared size here is
  * re-checked against the actual frame before any buffer is sized.
  */
object BloscLz4 {

  private val FlagShuffle = 0x1
  private val FlagMemcpy = 0x2
  private val FlagBitShuffle = 0x4
  private val FlagNoSplit = 0x10 // c-blosc >= 1.14: blocks NOT split
  private val CompLz4 = 1 // bits 5-7 of the flags byte
  private val CompLz4hc = 2 // same block format as LZ4 on decode
  private val CompZstd = 5 // streams are zstd frames ([[ZstdCodec]])

  // ------------------------------------------------------------ LZ4 block

  /** Greedy hash-table LZ4 block compressor (valid per the block spec:
    * minmatch 4, 16-bit offsets, last 5 bytes literal, last match ends
    * >= 12 bytes before the end on the encode side).
    */
  private[graft] def lz4Compress(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(src.length / 2 + 16)
    val hashBits = 14
    val table = Array.fill(1 << hashBits)(-1)
    def read4(p: Int): Int =
      (src(p) & 0xff) | ((src(p + 1) & 0xff) << 8) |
        ((src(p + 2) & 0xff) << 16) | ((src(p + 3) & 0xff) << 24)
    def hash(v: Int): Int = (v * -1640531535) >>> (32 - hashBits)
    def writeLen(extra: Int): Unit = {
      var e = extra
      while (e >= 255) { out.write(255); e -= 255 }
      out.write(e)
    }
    def emit(litFrom: Int, litTo: Int, matchLen: Int, offset: Int): Unit = {
      val lit = litTo - litFrom
      val ml = if (matchLen == 0) 0 else matchLen - 4
      out.write(((math.min(lit, 15)) << 4) | (if (matchLen == 0) 0 else math.min(ml, 15)))
      if (lit >= 15) writeLen(lit - 15)
      out.write(src, litFrom, lit)
      if (matchLen > 0) {
        out.write(offset & 0xff); out.write((offset >>> 8) & 0xff)
        if (ml >= 15) writeLen(ml - 15)
      }
    }
    var anchor = 0
    var pos = 0
    val mfLimit = src.length - 12 // spec: last match starts before this
    while (pos < mfLimit) {
      val h = hash(read4(pos))
      val cand = table(h)
      table(h) = pos
      if (cand >= 0 && pos - cand <= 0xffff && read4(cand) == read4(pos)) {
        var ml = 4
        val matchLimit = src.length - 5 // spec: last 5 bytes are literals
        while (pos + ml < matchLimit && src(cand + ml) == src(pos + ml)) ml += 1
        emit(anchor, pos, ml, pos - cand)
        pos += ml
        anchor = pos
      } else pos += 1
    }
    emit(anchor, src.length, 0, 0) // final literals-only sequence
    out.toByteArray
  }

  /** LZ4 block decode of `comp[off, off+len)` into exactly `expect`
    * bytes; every read and copy is bounds-checked so a corrupt stream
    * rejects loudly instead of tearing memory.
    */
  private[graft] def lz4Decompress(comp: Array[Byte], off: Int, len: Int,
                                     expect: Int, label: String): Array[Byte] = {
    val out = new Array[Byte](expect)
    var ip = off
    val end = off + len
    var op = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"blosc/lz4: $msg in $label")
    def readLen(base: Int): Int = {
      var v = base
      if (base == 15) {
        var b = 255
        while (b == 255) {
          if (ip >= end) fail("truncated length run")
          b = comp(ip) & 0xff; ip += 1
          v += b
          if (v < 0 || v > expect) fail(s"length run overflows ($v)")
        }
      }
      v
    }
    while (ip < end) {
      val token = comp(ip) & 0xff; ip += 1
      val lit = readLen(token >>> 4)
      if (lit > end - ip || lit > expect - op) fail(s"literal run $lit out of bounds")
      System.arraycopy(comp, ip, out, op, lit)
      ip += lit; op += lit
      if (ip < end) { // a match follows unless this was the last sequence
        if (end - ip < 2) fail("truncated match offset")
        val offset = (comp(ip) & 0xff) | ((comp(ip + 1) & 0xff) << 8)
        ip += 2
        if (offset == 0 || offset > op) fail(s"match offset $offset out of window")
        val ml = readLen(token & 0xf) + 4
        if (ml > expect - op) fail(s"match length $ml out of bounds")
        var k = 0 // byte-wise copy: overlapping matches (RLE) must self-feed
        while (k < ml) { out(op + k) = out(op + k - offset); k += 1 }
        op += ml
      }
    }
    if (op != expect) fail(s"block decodes to $op bytes, expected $expect")
    out
  }

  // ---------------------------------------------------------- shuffle

  /** Byte-shuffle (transpose) the typesize-aligned prefix; tail rides raw. */
  private[graft] def shuffle(raw: Array[Byte], typesize: Int): Array[Byte] = {
    val n = raw.length
    val aligned = n - n % typesize
    val m = aligned / typesize
    val out = new Array[Byte](n)
    var e = 0
    while (e < m) {
      var j = 0
      while (j < typesize) { out(j * m + e) = raw(e * typesize + j); j += 1 }
      e += 1
    }
    System.arraycopy(raw, aligned, out, aligned, n - aligned)
    out
  }

  private[graft] def unshuffle(shuf: Array[Byte], typesize: Int): Array[Byte] = {
    val n = shuf.length
    val aligned = n - n % typesize
    val m = aligned / typesize
    val out = new Array[Byte](n)
    var e = 0
    while (e < m) {
      var j = 0
      while (j < typesize) { out(e * typesize + j) = shuf(j * m + e); j += 1 }
      e += 1
    }
    System.arraycopy(shuf, aligned, out, aligned, n - aligned)
    out
  }

  // ------------------------------------------------------------ frames

  /** c-blosc's LZ4 split rule — independent of shuffle (blosc.c
    * `split_block`: LZ4/blosclz split whenever `typesize <= 16` and
    * `blocksize/typesize >= 128`); the leftover block never splits.
    * Frames from c-blosc >= 1.14 additionally record the per-frame
    * decision in flags bit 4 (set = not split), which overrides this.
    */
  private def splitStreams(typesize: Int,
                           blocksize: Int, leftover: Boolean): Int =
    if (!leftover && typesize >= 2 && typesize <= 16 &&
      blocksize % typesize == 0 && blocksize / typesize >= 128) typesize
    else 1

  /** Compress `raw` into a blosc-1 frame (shuffle on for
    * typesize > 1; `cname` picks the stream codec — `lz4` splits per
    * the eligibility rule, `zstd` never splits, matching c-blosc's
    * FORWARD_COMPAT split mode). Falls back to a memcpy frame when
    * compression does not pay, exactly like c-blosc.
    */
  def compress(raw: Array[Byte], typesize: Int,
               blocksizeReq: Int = 1 << 14,
               cname: String = "lz4"): Array[Byte] = {
    require(typesize >= 1 && typesize <= 255, s"typesize $typesize out of range")
    val compcode = cname match {
      case "lz4" => CompLz4
      case "zstd" => CompZstd
      case other => throw new IllegalArgumentException(
        s"blosc writer cname '$other' out of scope (lz4 / zstd)")
    }
    val n = raw.length
    // block size: requested, typesize-aligned, at least one element,
    // never beyond the buffer itself
    val alignedReq = math.max(typesize, blocksizeReq / typesize * typesize)
    val blocksize = math.max(typesize, math.min(math.max(n, typesize), alignedReq))
    val doShuffle = typesize > 1
    val nblocks = math.max(1, (n + blocksize - 1) / blocksize)
    val body = new java.io.ByteArrayOutputStream(n / 2 + 64)
    val bstarts = new Array[Int](nblocks)
    val headerLen = 16 + 4 * nblocks
    def i32le(v: Int): Array[Byte] = Array((v & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, ((v >>> 16) & 0xff).toByte, (v >>> 24).toByte)
    var b = 0
    while (b < nblocks) {
      bstarts(b) = headerLen + body.size()
      val bOff = b * blocksize
      val bSize = math.min(blocksize, n - bOff)
      val leftover = bSize < blocksize
      val block0 = java.util.Arrays.copyOfRange(raw, bOff, bOff + bSize)
      val block = if (doShuffle) shuffle(block0, typesize) else block0
      val nstreams =
        if (compcode == CompZstd) 1 else splitStreams(typesize, blocksize, leftover)
      val streamLen = block.length / nstreams
      var s = 0
      while (s < nstreams) {
        val part = java.util.Arrays.copyOfRange(block, s * streamLen,
          if (s == nstreams - 1) block.length else (s + 1) * streamLen)
        val comp =
          if (compcode == CompZstd) ZstdCodec.compress(part) else lz4Compress(part)
        if (comp.length < part.length) {
          body.write(i32le(comp.length)); body.write(comp)
        } else { // stored-raw stream: csize == uncompressed size
          body.write(i32le(part.length)); body.write(part)
        }
        s += 1
      }
      b += 1
    }
    val total = headerLen + body.size()
    if (total >= n + 16) { // compression didn't pay: memcpy frame
      val out = new Array[Byte](16 + n)
      out(0) = 2; out(1) = 1; out(2) = FlagMemcpy.toByte; out(3) = typesize.toByte
      System.arraycopy(i32le(n), 0, out, 4, 4)
      System.arraycopy(i32le(blocksize), 0, out, 8, 4)
      System.arraycopy(i32le(16 + n), 0, out, 12, 4)
      System.arraycopy(raw, 0, out, 16, n)
      return out
    }
    val out = new java.io.ByteArrayOutputStream(total)
    out.write(2); out.write(1)
    // bit 4 = 0 when the frame's full blocks split (c-blosc >= 1.14)
    val noSplit = if (compcode == CompZstd ||
      splitStreams(typesize, blocksize, leftover = false) == 1) FlagNoSplit else 0
    out.write((if (doShuffle) FlagShuffle else 0) | noSplit | (compcode << 5))
    out.write(typesize)
    out.write(i32le(n)); out.write(i32le(blocksize)); out.write(i32le(total))
    bstarts.foreach(v => out.write(i32le(v)))
    body.writeTo(out)
    out.toByteArray
  }

  /** Decode a blosc-1 frame into exactly `expect` bytes. */
  def decompress(frame: Array[Byte], expect: Int, label: String): Array[Byte] = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"blosc: $msg in $label")
    if (frame.length < 16) fail(s"frame is ${frame.length} bytes, header needs 16")
    def i32le(p: Int): Int =
      (frame(p) & 0xff) | ((frame(p + 1) & 0xff) << 8) |
        ((frame(p + 2) & 0xff) << 16) | ((frame(p + 3) & 0xff) << 24)
    val flags = frame(2) & 0xff
    val typesize = frame(3) & 0xff
    val nbytes = i32le(4)
    val blocksize = i32le(8)
    val cbytes = i32le(12)
    if (nbytes != expect) fail(s"frame declares $nbytes bytes, chunk expects $expect")
    if (cbytes != frame.length)
      fail(s"frame declares cbytes=$cbytes but is ${frame.length} bytes")
    if ((flags & FlagMemcpy) != 0) {
      if (frame.length != 16 + nbytes) fail("memcpy frame length mismatch")
      return java.util.Arrays.copyOfRange(frame, 16, 16 + nbytes)
    }
    if ((flags & FlagBitShuffle) != 0)
      fail("bit-shuffle (flag 0x4) out of scope — byte-shuffle and no-shuffle decode")
    val compcode = flags >>> 5
    if (compcode != CompLz4 && compcode != CompLz4hc && compcode != CompZstd)
      fail(s"compressor code $compcode out of scope — LZ4 (1), LZ4HC (2) " +
        "and zstd (5) decode; blosclz/snappy/zlib-in-blosc reject here")
    if (blocksize <= 0 || blocksize > (1 << 28)) fail(s"blocksize $blocksize out of range")
    val doShuffle = (flags & FlagShuffle) != 0 && typesize > 1
    val nblocks = math.max(1, (nbytes + blocksize - 1) / blocksize)
    if (16 + 4L * nblocks > frame.length) fail("bstarts run past the frame")
    val out = new Array[Byte](nbytes)
    var b = 0
    while (b < nblocks) {
      var sp = i32le(16 + 4 * b) // this block's start, from bstarts
      val bOff = b * blocksize
      val bSize = math.min(blocksize, nbytes - bOff)
      val leftover = bSize < blocksize
      val nstreams =
        if ((flags & FlagNoSplit) != 0) 1
        else splitStreams(typesize, blocksize, leftover)
      val base = bSize / nstreams
      val block = new Array[Byte](bSize)
      var filled = 0
      var s = 0
      while (s < nstreams) {
        val streamLen = if (s == nstreams - 1) bSize - filled else base
        if (sp < 16 || sp + 4 > frame.length) fail(s"stream header at $sp out of frame")
        val csize = i32le(sp); sp += 4
        if (csize < 0 || sp + csize > frame.length) fail(s"stream size $csize out of frame")
        val part =
          if (csize == streamLen) java.util.Arrays.copyOfRange(frame, sp, sp + csize)
          else if (compcode == CompZstd) ZstdCodec.decompress(
            java.util.Arrays.copyOfRange(frame, sp, sp + csize), streamLen, label)
          else lz4Decompress(frame, sp, csize, streamLen, label)
        System.arraycopy(part, 0, block, filled, streamLen)
        sp += csize
        filled += streamLen
        s += 1
      }
      val plain = if (doShuffle) unshuffle(block, typesize) else block
      System.arraycopy(plain, 0, out, bOff, bSize)
      b += 1
    }
    out
  }
}
