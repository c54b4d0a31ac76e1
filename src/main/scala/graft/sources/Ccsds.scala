package graft.sources

/** CCSDS 121.0-B lossless coder (the "AEC"/Rice coder behind GRIB2 data
  * representation template 5.42 — ECMWF's operational packing since
  * 2023; wgrib2/eccodes decode it through libaec). Spec-from-scratch
  * against the public CCSDS 121.0-B-2 recommendation:
  *
  *  - unit-delay PREPROCESSOR: the first sample of each reference
  *    sample interval (RSI) rides verbatim; every later sample is the
  *    standard-mapped prediction error `d` against the previous sample
  *    (`θ = min(p, xmax−p)`; `d = 2Δ` / `−2Δ−1` / `θ+|Δ|`), which keeps
  *    `d` inside the n-bit dynamic range;
  *  - adaptive ENTROPY CODER per block of J samples: an ID field
  *    (3 bits for n ≤ 8, 4 for n ≤ 16, else 5) selects the option —
  *    `0` = low-entropy (one more bit: `0` zero-block run, `1` second
  *    extension), `1..2^len−2` = split-sample with `k = id−1` (all
  *    fundamental-sequence MSB parts, then all k-bit LSB parts), all-
  *    ones = uncompressed (n raw bits per sample);
  *  - FS codeword = value-many `0`s then a `1`; zero-block run counts
  *    map `z ≤ 3 → z+1` blocks, `z = 4 → ROS` (rest of the 64-block
  *    segment, clipped to the interval), `z ≥ 5 → z` blocks;
  *  - a reference block's raw sample follows the ID immediately; the
  *    mode then covers the remaining J−1 samples (second extension
  *    keeps its positional pairing and discards the ref-slot value,
  *    matching the published decoder structure).
  *
  * Scope (loud rejects otherwise): unsigned samples, 2 ≤ n ≤ 24,
  * block size ∈ {8, 16, 32, 64}, preprocessing ON, MSB sample order —
  * the exact shape eccodes writes (flags `AEC_DATA_MSB |
  * AEC_DATA_PREPROCESS`). Signed/3-byte/restricted/RSI-padded streams
  * reject with a pointer. The encoder never emits ROS (exact counts
  * are always spec-valid); the decoder accepts it.
  *
  * Scale shape: runs inside the per-record GRIB2 decode task — strictly
  * streaming over the bit buffer, output sized by the caller's declared
  * sample count, every FS run and block count bounds-checked.
  */
object Ccsds {

  val FlagSigned = 1
  val Flag3Byte = 2
  val FlagMsb = 4
  val FlagPreprocess = 8
  val FlagRestricted = 16
  val FlagPadRsi = 32

  /** The flags eccodes writes for GRIB2 5.42. */
  val GribFlags: Int = FlagMsb | FlagPreprocess

  private def idLen(n: Int): Int = if (n <= 8) 3 else if (n <= 16) 4 else 5

  def validate(n: Int, blockSize: Int, rsi: Int, flags: Int, label: String): Unit = {
    require(n >= 2 && n <= 24,
      s"ccsds: $n bits/sample out of scope (2..24) in $label")
    require(Set(8, 16, 32, 64).contains(blockSize),
      s"ccsds: block size $blockSize out of scope (8/16/32/64) in $label")
    require(rsi >= 1 && rsi <= 4096, s"ccsds: RSI $rsi out of range in $label")
    require((flags & FlagPreprocess) != 0,
      s"ccsds: unpreprocessed stream out of scope in $label")
    require((flags & FlagMsb) != 0,
      s"ccsds: LSB-first sample order out of scope in $label")
    require((flags & (FlagSigned | Flag3Byte | FlagRestricted | FlagPadRsi)) == 0,
      s"ccsds: flags ${flags & ~GribFlags} (signed/3-byte/restricted/pad-RSI) " +
        s"out of scope in $label")
  }

  // -------------------------------------------------------------- bit IO

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L; private var nAcc = 0
    def put(v: Long, w: Int): Unit = {
      var t = w - 1
      while (t >= 0) {
        acc = (acc << 1) | ((v >>> t) & 1L); nAcc += 1
        if (nAcc == 8) { out.write(acc.toInt & 0xff); acc = 0L; nAcc = 0 }
        t -= 1
      }
    }
    def putFs(v: Long): Unit = { // v zeros then a terminating 1
      var r = v
      while (r >= 32) { put(0L, 32); r -= 32 }
      put(1L, r.toInt + 1)
    }
    def toBytes: Array[Byte] = {
      if (nAcc > 0) { out.write((acc << (8 - nAcc)).toInt & 0xff); acc = 0L; nAcc = 0 }
      out.toByteArray
    }
  }

  private final class BitReader(b: Array[Byte], label: String) {
    private var pos = 0 // bit position
    private val end = b.length * 8
    def get(w: Int): Long = {
      require(pos + w <= end, s"ccsds: bitstream ends inside a $w-bit field in $label")
      var v = 0L; var t = 0
      while (t < w) {
        v = (v << 1) | ((b(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1; t += 1
      }
      v
    }
    def getFs(): Long = { // count zeros until the terminating 1
      var v = 0L
      while ({ require(pos < end, s"ccsds: unterminated FS codeword in $label")
        val bit = (b(pos >> 3) >> (7 - (pos & 7))) & 1
        pos += 1
        if (bit == 0) { v += 1; require(v <= (1L << 26),
          s"ccsds: FS run exceeds 2^26 in $label"); true }
        else false }) ()
      v
    }
  }

  // -------------------------------------------------------- preprocessor

  /** Standard mapper: prediction error → non-negative n-bit value. */
  private def mapDelta(x: Int, p: Int, xmax: Int): Int = {
    val theta = math.min(p, xmax - p)
    val delta = x - p
    if (delta >= 0 && delta <= theta) 2 * delta
    else if (delta < 0 && -delta <= theta) -2 * delta - 1
    else theta + math.abs(delta)
  }

  private def unmapDelta(d: Int, p: Int, xmax: Int, label: String): Int = {
    val theta = math.min(p, xmax - p)
    val delta =
      if (d <= 2 * theta) { if ((d & 1) == 0) d / 2 else -((d + 1) / 2) }
      else if (theta == p) d - theta // prediction near xmin: excess is positive
      else theta - d                 // near xmax: excess is negative
    val x = p + delta
    require(x >= 0 && x <= xmax, s"ccsds: unmapped sample $x outside [0,$xmax] in $label")
    x
  }

  // ------------------------------------------------------------- encode

  /** Encode unsigned `samples` (each in `[0, 2^n)`). The final partial
    * block pads with mapped-zero (repeat-prediction) samples the
    * decoder discards via its declared count.
    */
  def encode(samples: Array[Int], n: Int, blockSize: Int, rsi: Int): Array[Byte] = {
    validate(n, blockSize, rsi, GribFlags, "<encode>")
    require(samples.nonEmpty, "ccsds: empty sample array")
    val xmax = (1 << n) - 1
    samples.foreach(v => require(v >= 0 && v <= xmax,
      s"ccsds: sample $v outside [0,$xmax]"))
    val len = idLen(n)
    val kMax = math.min((1 << len) - 3, n - 1)
    val uncompId = (1 << len) - 1
    val intervalSamples = rsi * blockSize
    val nBlocks = (samples.length + blockSize - 1) / blockSize
    // mapped values, block-major, padded to whole blocks
    val mapped = new Array[Int](nBlocks * blockSize)
    val refs = new Array[Int]((nBlocks + rsi - 1) / rsi)
    var k = 0
    var p = 0
    while (k < samples.length) {
      if (k % intervalSamples == 0) refs(k / intervalSamples) = samples(k)
      else mapped(k) = mapDelta(samples(k), p, xmax)
      p = samples(k)
      k += 1
    }
    val bw = new BitWriter
    var blk = 0
    while (blk < nBlocks) {
      val isRef = blk % rsi == 0
      val from = blk * blockSize + (if (isRef) 1 else 0)
      val to = (blk + 1) * blockSize
      def blockZero(bi: Int): Boolean = {
        val f = bi * blockSize + (if (bi % rsi == 0) 1 else 0)
        val t = (bi + 1) * blockSize
        var j = f; var z = true
        while (j < t && z) { z = mapped(j) == 0; j += 1 }
        z
      }
      if (blockZero(blk)) {
        // zero-block run: confined to this RSI and this 64-block segment,
        // never crossing into the next reference block; exact counts only
        val intervalEnd = math.min(nBlocks, (blk / rsi + 1) * rsi)
        val segmentEnd = math.min(intervalEnd, (blk / 64 + 1) * 64)
        var run = 1
        while (blk + run < segmentEnd && blockZero(blk + run)) run += 1
        bw.put(0L, len) // low-entropy ID
        if (isRef) bw.put(refs(blk / rsi).toLong, n)
        bw.put(0L, 1) // selector: zero-block
        val z = if (run <= 4) run - 1 else run // 4 is the ROS marker
        bw.putFs(z.toLong)
        blk += run
      } else {
        val cnt = to - from
        // candidate costs: split k (FS parts + k LSBs each), uncompressed
        var bestK = -1; var bestCost = n.toLong * cnt // uncompressed cost
        var kk = 0
        while (kk <= kMax) {
          var c = (kk + 1).toLong * cnt
          var j = from
          while (j < to) { c += (mapped(j) >> kk).toLong; j += 1 }
          if (c < bestCost) { bestCost = c; bestK = kk }
          kk += 1
        }
        // second extension: positional pairs over the block (ref slot
        // pairs against an implicit zero), only meaningful for tiny d
        var seCost = Long.MaxValue
        if (blockSize % 2 == 0) {
          var c = 0L; var ok = true
          var pos2 = if (isRef) 1 else 0
          while (ok && pos2 < blockSize) {
            val a = if (pos2 % 2 == 0) mapped(blk * blockSize + pos2) else 0
            val b2 = if (pos2 % 2 == 0) {
              if (pos2 + 1 < blockSize) mapped(blk * blockSize + pos2 + 1) else 0
            } else mapped(blk * blockSize + pos2)
            val g = a.toLong + b2
            val m = g * (g + 1) / 2 + b2
            if (m > (1L << 24)) ok = false else c += m + 1
            pos2 += (if (pos2 % 2 == 0) 2 else 1)
          }
          if (ok) seCost = c
        }
        if (seCost < bestCost) {
          bw.put(0L, len)
          if (isRef) bw.put(refs(blk / rsi).toLong, n)
          bw.put(1L, 1) // selector: second extension
          var pos2 = if (isRef) 1 else 0
          while (pos2 < blockSize) {
            val a = if (pos2 % 2 == 0) mapped(blk * blockSize + pos2) else 0
            val b2 = if (pos2 % 2 == 0) {
              if (pos2 + 1 < blockSize) mapped(blk * blockSize + pos2 + 1) else 0
            } else mapped(blk * blockSize + pos2)
            val g = a.toLong + b2
            bw.putFs(g * (g + 1) / 2 + b2)
            pos2 += (if (pos2 % 2 == 0) 2 else 1)
          }
        } else if (bestK >= 0) {
          bw.put((bestK + 1).toLong, len)
          if (isRef) bw.put(refs(blk / rsi).toLong, n)
          var j = from
          while (j < to) { bw.putFs((mapped(j) >> bestK).toLong); j += 1 }
          if (bestK > 0) {
            j = from
            while (j < to) { bw.put(mapped(j).toLong & ((1L << bestK) - 1), bestK); j += 1 }
          }
        } else {
          bw.put(uncompId.toLong, len)
          if (isRef) bw.put(refs(blk / rsi).toLong, n)
          var j = from
          while (j < to) { bw.put(mapped(j).toLong, n); j += 1 }
        }
        blk += 1
      }
    }
    bw.toBytes
  }

  // ------------------------------------------------------------- decode

  /** Decode `count` unsigned samples. `flags` must be the GRIB2 shape
    * ([[GribFlags]]); everything else rejects loudly in [[validate]].
    */
  def decode(bytes: Array[Byte], count: Int, n: Int, blockSize: Int,
             rsi: Int, flags: Int, label: String): Array[Int] = {
    validate(n, blockSize, rsi, flags, label)
    require(count > 0, s"ccsds: sample count $count must be positive in $label")
    val xmax = (1 << n) - 1
    val len = idLen(n)
    val uncompId = (1 << len) - 1
    val br = new BitReader(bytes, label)
    val nBlocks = (count + blockSize - 1) / blockSize
    val mapped = new Array[Int](nBlocks * blockSize)
    val refs = new Array[Int]((nBlocks + rsi - 1) / rsi)
    var blk = 0
    while (blk < nBlocks) {
      val isRef = blk % rsi == 0
      val id = br.get(len).toInt
      if (isRef) {
        val r = br.get(n).toInt
        refs(blk / rsi) = r
      }
      val from = blk * blockSize + (if (isRef) 1 else 0)
      val to = (blk + 1) * blockSize
      if (id == 0) {
        if (br.get(1) == 0L) {
          // zero block(s): mapped values already 0; advance the run
          val z = br.getFs()
          val intervalEnd = math.min(nBlocks, (blk / rsi + 1) * rsi)
          val run =
            if (z <= 3) z + 1
            else if (z == 4) { // ROS: rest of the 64-block segment
              val segmentEnd = math.min(intervalEnd, (blk / 64 + 1) * 64)
              (segmentEnd - blk).toLong
            } else z
          require(run >= 1 && blk + run <= intervalEnd,
            s"ccsds: zero-block run $run crosses the reference interval in $label")
          blk += run.toInt
        } else {
          // second extension: positional pairs; the ref slot's pair
          // member is discarded (it was coded against an implicit zero)
          var pos2 = if (isRef) 1 else 0
          while (pos2 < blockSize) {
            val m = br.getFs()
            var g = 0L // γ with γ(γ+1)/2 <= m
            while ((g + 1) * (g + 2) / 2 <= m) g += 1
            val d1 = m - g * (g + 1) / 2
            val d0 = g - d1
            require(d0 <= xmax && d1 <= xmax,
              s"ccsds: second-extension pair ($d0,$d1) exceeds range in $label")
            if (pos2 % 2 == 0) {
              mapped(blk * blockSize + pos2) = d0.toInt
              if (pos2 + 1 < blockSize) mapped(blk * blockSize + pos2 + 1) = d1.toInt
              pos2 += 2
            } else { // odd start (ref): keep only the second member
              mapped(blk * blockSize + pos2) = d1.toInt
              pos2 += 1
            }
          }
          blk += 1
        }
      } else if (id == uncompId) {
        var j = from
        while (j < to) { mapped(j) = br.get(n).toInt; j += 1 }
        blk += 1
      } else {
        val k = id - 1
        require(k < n, s"ccsds: split k=$k at $n bits/sample in $label")
        var j = from
        while (j < to) {
          val fsv = br.getFs() // bound BEFORE the shift: no Int wraparound
          require((fsv << k) <= xmax,
            s"ccsds: split MSB part $fsv at k=$k exceeds range in $label")
          mapped(j) = (fsv << k).toInt; j += 1
        }
        if (k > 0) {
          j = from
          while (j < to) { mapped(j) = mapped(j) | br.get(k).toInt; j += 1 }
        }
        blk += 1
      }
    }
    // inverse preprocessor per interval
    val out = new Array[Int](count)
    var kk = 0
    var p = 0
    val intervalSamples = rsi * blockSize
    while (kk < count) {
      if (kk % intervalSamples == 0) { p = refs(kk / intervalSamples)
        require(p <= xmax, s"ccsds: reference sample $p exceeds range in $label")
        out(kk) = p }
      else { out(kk) = unmapDelta(mapped(kk), p, xmax, label); p = out(kk) }
      kk += 1
    }
    out
  }
}
