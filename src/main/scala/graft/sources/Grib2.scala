package graft.sources

import java.nio.file.{Files, Path}
import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

/** Native GRIB edition-2 reader/writer (WMO FM-92 GRIB2, public spec:
  * WMO Manual on Codes No.306 Vol I.2). Closes the S6 byte-level gap the
  * same way [[Grib1]] closed S5: the reference shells out
  * `wgrib2 input -match RE -limit N -grib out` to extract matching
  * records from GRIB2 bytes (reference src/file-conversions.js:76-95);
  * this object is that boundary in-engine — bytes → long-format grid
  * rows, with the `-match`/`-limit` record selection reproduced on the
  * decoded stream.
  *
  * Edition 2 restructures the message into length-prefixed numbered
  * sections (0 indicator · 1 identification · [2 local] · 3 grid ·
  * 4 product · 5 representation · 6 bitmap · 7 data · 8 end), allows
  * sections 3-7 to REPEAT so one message carries many fields, moves the
  * reference value from IBM-360 hex float to IEEE-754 binary32, and
  * widens coordinates to signed (sign-magnitude) microdegrees.
  *
  * Scope (= the slice the reference's wgrib2 invocations touch, plus the
  * packing real-world GRIB2 actually ships), rejected loudly outside it:
  * grid templates 3.0 (regular lat/lon) and 3.40 (Gaussian, the native
  * ERA5/spectral-model layout — abscissas computed by Newton iteration
  * on the Legendre recurrence; both regular and REDUCED row layouts,
  * the latter via the missing-ni + per-row point list encoding),
  * product templates 4.0, 4.1 (individual ensemble member — the
  * GEFS/ERA5-EDA shape), 4.8 (statistical processing over a time
  * interval — the accumulation shape operational precipitation ships,
  * e.g. the reference's total_precipitation dataset) and 4.11
  * (ensemble + statistical), data
  * representation templates 5.0 (simple packing), 5.2 (complex packing,
  * general group splitting, no missing-value management — bitmaps carry
  * the mask), 5.3 (complex + spatial differencing, order 1/2 — the
  * encoding NCEP GFS ships), 5.40 (lossless JPEG2000 via
  * [[Jpeg2000]]; lossy rejects with a pointer), 5.41 (PNG packing via
  * [[AssetCodecs]]'s greyscale codec, nbits ≤ 8, dense fields) and
  * 5.42 (CCSDS-AEC via [[Ccsds]] — ECMWF's operational packing since
  * 2023; composes with bitmaps), bitmap indicator 0/255, scan modes
  * 0x00/0x40, i-fastest. Decode math ends identically for all three:
  * `value = (R + X·2^E) / 10^D` over exact integers X — template 5.2
  * reconstructs X as groupRef + packed per group, 5.3 additionally
  * undoes the spatial differencing (X[k] += X[k-1], or
  * 2·X[k-1] − X[k-2] for order 2) after re-adding the overall minimum,
  * exactly g2clib/wgrib2's `comunpack` recurrence.
  */
object Grib2 {

  /** One decoded field: georeferencing in signed microdegrees (edition 2
    * widens GRIB1's millidegrees), values row-major in scan order,
    * bitmap-masked cells NaN.
    */
  final case class Record(
      discipline: Int,
      category: Int,
      number: Int,
      variable: String,
      time: LocalDateTime,
      ni: Int,
      nj: Int,
      la1Micro: Long,
      lo1Micro: Long,
      diMicro: Long,
      djMicro: Long,
      scanJPositive: Boolean,
      values: Array[Double],
      // non-null for Gaussian grids (template 3.40): the per-row
      // latitudes in scan order, microdegrees — rows are NOT uniformly
      // spaced, so la1/dj stepping doesn't apply
      latsMicro: Array[Long] = null,
      // non-null for REDUCED Gaussian grids: points per row in scan
      // order; `values` is ragged row-major with rowNi.sum cells and
      // each row spans the full circle from lo1 at 360/rowNi(j) spacing
      rowNi: Array[Int] = null,
      // product template 4.8 statistical processing (WMO Code Table 4.10):
      // -1 = instantaneous (template 4.0); 0 avg / 1 accum / 2 max / 3 min.
      // `time` stays the reference (interval-start) time; `intervalEnd` is
      // octets 35-41's end-of-overall-interval; `rangeHours` the length.
      statProcess: Int = -1,
      intervalEnd: LocalDateTime = null,
      rangeHours: Int = 0,
      // templates 4.1 / 4.11 (individual ensemble member — the
      // GEFS/ERA5-EDA shape): member number and ensemble size;
      // -1 / 0 = deterministic (4.0 / 4.8)
      ensMember: Int = -1,
      ensSize: Int = 0,
      // templates 4.2 / 4.12 (derived ensemble products — the GEFS
      // mean/spread files): WMO Code Table 4.7 derived-forecast type;
      // -1 = not a derived product
      derivedType: Int = -1,
      // templates 4.5 / 4.9 (probability forecasts — the GEFS
      // probability-of-exceedance products): WMO Code Table 4.9
      // probability type (0 below lower / 1 above upper / 2 between /
      // 3 above lower / 4 below upper), this forecast's number out of
      // the total, and the decoded lower/upper thresholds in physical
      // units (scaled sign-magnitude per spec). -1 = not a probability
      probType: Int = -1,
      probNumber: Int = -1,
      probTotal: Int = 0,
      probLower: Double = Double.NaN,
      probUpper: Double = Double.NaN,
      // templates 4.6 / 4.10 (percentile forecasts): 0..100;
      // -1 = not a percentile product
      percentile: Int = -1,
      // non-null for PROJECTED grids (template 3.30 Lambert conformal):
      // per-cell coordinates from the inverse projection in scan order;
      // la1/lo1 then hold the first grid point and di/dj are 0
      cellLats: Array[Double] = null,
      cellLons: Array[Double] = null)

  /** WMO Code Table 4.10 statistical-process names (the wgrib2 inventory
    * suffixes: `0-24 hour acc fcst` etc.). */
  def statNameOf(code: Int): String = code match {
    case -1 => "instant"
    case 0 => "avg"
    case 1 => "acc"
    case 2 => "max"
    case 3 => "min"
    case other => s"stat$other"
  }

  /** WMO Code Table 4.7 derived-forecast names (the wgrib2 inventory
    * suffixes: `ens mean`, `ens spread`, ...). */
  def derivedNameOf(code: Int): String = code match {
    case -1 => "member"
    case 0 => "mean" // unweighted mean of all members
    case 1 => "wmean"
    case 2 => "stddev"
    case 4 => "spread"
    case other => s"derived$other"
  }

  /** WMO Code Table 4.2 (discipline, category, number) → wgrib2 short
    * name, for the parameters the reference's datasets touch; anything
    * else keeps a stable synthetic name (wgrib2 prints `var discipline=…`
    * for unknowns — same idea).
    */
  private val paramNames = Map(
    (0, 0, 0) -> "TMP", (0, 1, 1) -> "RH", (0, 1, 7) -> "PRATE",
    (0, 1, 8) -> "APCP",
    (0, 2, 2) -> "UGRD", (0, 2, 3) -> "VGRD",
    (0, 3, 1) -> "PRMSL", (0, 3, 5) -> "HGT", (2, 0, 0) -> "LAND")

  def nameOf(d: Int, c: Int, n: Int): String =
    paramNames.getOrElse((d, c, n), s"var$d-$c-$n")

  /** Inverse of [[nameOf]]: the known table plus the synthetic
    * `var{d}-{c}-{n}` form — so any name [[nameOf]] can emit writes back.
    */
  def paramOf(name: String): (Int, Int, Int) =
    paramNames.collectFirst { case (k, v) if v == name => k }.getOrElse {
      val syn = "var(\\d+)-(\\d+)-(\\d+)".r
      name match {
        case syn(d, c, n) => (d.toInt, c.toInt, n.toInt)
        case _ => sys.error(
          s"grib2 writer: variable name '$name' has no GRIB parameter mapping " +
            "(use a known name like TMP/PRATE or the var{d}-{c}-{n} form)")
      }
    }

  // ---------------------------------------------------------------- parse

  /** All fields of all GRIB2 messages in a byte buffer. Files concatenate
    * messages; messages concatenate field groups (sections 3-7 repeat,
    * with 3 and 6 optionally inherited from the previous group).
    */
  def parseMessages(bytes: Array[Byte], label: String = "<bytes>"): Seq[Record] = {
    val out = Seq.newBuilder[Record]
    var pos = 0
    def u(i: Int): Int = bytes(i) & 0xff
    while (pos + 16 <= bytes.length) {
      require(bytes(pos) == 'G' && bytes(pos + 1) == 'R' &&
        bytes(pos + 2) == 'I' && bytes(pos + 3) == 'B',
        s"not a GRIB message at offset $pos in $label")
      val discipline = u(pos + 6)
      val edition = u(pos + 7)
      require(edition == 2, s"GRIB edition $edition unsupported here (only 2) in $label")
      var total = 0L
      var k = 8
      while (k < 16) { total = (total << 8) | u(pos + k); k += 1 }
      require(total > 16 && pos + total <= bytes.length,
        s"corrupt GRIB2 total-length $total at offset $pos in $label " +
          s"(file has ${bytes.length} bytes)")
      out ++= parseMessage(bytes, pos, pos + total.toInt, discipline, label)
      pos += total.toInt
      while (pos < bytes.length && bytes(pos) == 0) pos += 1
    }
    out.result()
  }

  /** Header-only present-cell count for the DSv2 COUNT(*) pushdown: the
    * per-record section walk reads ONLY section headers — category/
    * number from section 4 (to apply pushed variable predicates) and
    * the authoritative point count from section 5 octets 6-9, which the
    * full decode path separately `require`s to equal the bitmap's
    * popcount — and never touches a section-7 payload bit, so a
    * count(*) over a 100 TB GRIB archive costs header I/O, not a
    * simple/complex/JPEG2000 unpack. Bitmap-masked cells are absent
    * from the count exactly as [[cells]] drops their NaNs.
    */
  def countPresentCells(bytes: Array[Byte], label: String,
                        keep: String => Boolean): Long = {
    def u(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (u(i) << 8) | u(i + 1)
    def u32(i: Int): Long = (u16(i).toLong << 16) | u16(i + 2)
    var cnt = 0L
    var pos = 0
    while (pos + 16 <= bytes.length) {
      require(bytes(pos) == 'G' && bytes(pos + 1) == 'R' &&
        bytes(pos + 2) == 'I' && bytes(pos + 3) == 'B',
        s"not a GRIB message at offset $pos in $label")
      val discipline = u(pos + 6)
      require(u(pos + 7) == 2, s"GRIB edition ${u(pos + 7)} unsupported here (only 2) in $label")
      var total = 0L
      var k = 8
      while (k < 16) { total = (total << 8) | u(pos + k); k += 1 }
      require(total > 16 && pos + total <= bytes.length,
        s"corrupt GRIB2 total-length $total at offset $pos in $label")
      val end = pos + total.toInt
      var p = pos + 16
      var category = -1; var number = -1; var nPresent = -1
      var done = false
      while (!done) {
        require(p + 4 <= end, s"ran past message end without 7777 in $label")
        if (bytes(p) == '7' && bytes(p + 1) == '7' &&
            bytes(p + 2) == '7' && bytes(p + 3) == '7') done = true
        else {
          require(p + 5 <= end, s"truncated section header in $label")
          val len = u32(p).toInt
          val num = u(p + 4)
          require(len >= 5 && p + len <= end, s"corrupt section-$num length $len in $label")
          num match {
            case 4 => category = u(p + 9); number = u(p + 10)
            case 5 =>
              nPresent = u32(p + 5).toInt
              require(nPresent >= 0, s"corrupt section-5 point count in $label")
            case 7 =>
              require(category >= 0 && nPresent >= 0,
                s"data section before sections 4/5 in $label")
              if (keep(nameOf(discipline, category, number))) cnt += nPresent
            case _ => ()
          }
          p += len
        }
      }
      pos += total.toInt
      while (pos < bytes.length && bytes(pos) == 0) pos += 1
    }
    cnt
  }

  /** Latitudes of the regular Gaussian grid with `nRows` parallels
    * pole-to-pole (nRows = 2N), north→south, microdegrees: lat_k =
    * asin(μ_k) where μ_k are the roots of the Legendre polynomial
    * P_{2N}(μ) — computed by Newton iteration on the three-term
    * recurrence (the classic gauleg scheme; Abramowitz & Stegun 22.16.6
    * supplies the cosine initial guess), NOT a hardcoded table. The
    * northern half is computed and mirrored (roots are symmetric).
    * Double-precision Newton converges to ~1e-15 on the root, far inside
    * the microdegree rounding; Grib2Spec pins N32's first row against
    * ECMWF's published 87.8638° and the whole N8 set against an
    * independent Gauss–Legendre implementation.
    */
  def gaussianLatitudesMicro(nRows: Int): Array[Long] = {
    require(nRows > 0 && nRows % 2 == 0, s"Gaussian row count $nRows must be even")
    val m = nRows
    val out = new Array[Long](m)
    var i = 0
    while (i < m / 2) {
      var x = math.cos(math.Pi * (i + 0.75) / (m + 0.5))
      var delta = 1.0
      var iter = 0
      while (math.abs(delta) > 1e-15 && iter < 100) {
        var p0 = 1.0; var p1 = x
        var k = 2
        while (k <= m) {
          val p2 = ((2 * k - 1) * x * p1 - (k - 1) * p0) / k
          p0 = p1; p1 = p2; k += 1
        }
        val dp = m * (x * p1 - p0) / (x * x - 1.0)
        delta = p1 / dp
        x -= delta
        iter += 1
      }
      val micro = math.round(math.toDegrees(math.asin(x)) * 1e6)
      out(i) = micro
      out(m - 1 - i) = -micro
      i += 1
    }
    out
  }

  private def parseMessage(b: Array[Byte], start: Int, end: Int,
                           discipline: Int, label: String): Seq[Record] = {
    def u(i: Int): Int = b(i) & 0xff
    def u16(i: Int): Int = (u(i) << 8) | u(i + 1)
    def u32(i: Int): Long = (u16(i).toLong << 16) | u16(i + 2)
    // GRIB2 signed fields are sign-magnitude: MSB = sign, rest = magnitude
    def s16(i: Int): Int = { val v = u16(i); if ((v & 0x8000) != 0) -(v & 0x7fff) else v }
    def s32(i: Int): Long = {
      val v = u32(i); if ((v & 0x80000000L) != 0) -(v & 0x7fffffffL) else v
    }

    var pos = start + 16
    var time: LocalDateTime = null
    // section-3 state (persists across repeated 4-7 groups)
    var ni = -1; var nj = -1
    var la1 = 0L; var lo1 = 0L; var di = 0L; var dj = 0L
    var jPositive = false
    var gaussLats: Array[Long] = null
    var rowNi: Array[Int] = null // reduced Gaussian per-row point counts
    // projected grids (template 3.30): per-cell coordinates from the
    // inverse projection, row-major in scan order
    var projLats: Array[Double] = null
    var projLons: Array[Double] = null
    def gridTotal: Int =
      if (rowNi != null) rowNi.sum else ni * nj
    // section-4/5 state for the current group
    var category = -1; var number = -1
    var statProcess = -1; var intervalEnd: LocalDateTime = null; var rangeHours = 0
    var ensMember = -1; var ensSize = 0 // templates 4.1 / 4.11
    var derivedType = -1 // templates 4.2 / 4.12 (Code Table 4.7)
    var probType = -1; var probNumber = -1; var probTotal = 0 // 4.5 / 4.9
    var probLower = Double.NaN; var probUpper = Double.NaN
    var percentile = -1 // templates 4.6 / 4.10
    var nPresent = -1
    var refVal = 0.0; var eScale = 0; var dScale = 0; var nbits = -1
    var drTemplate = -1
    // complex-packing (5.2/5.3) state
    var ng = 0; var refGW = 0; var nbitsGW = 0
    var refGL = 0L; var lenInc = 0; var lastLen = 0L; var nbitsGL = 0
    var sdOrder = 0; var sdOctets = 0
    // CCSDS (5.42) state
    var ccFlags = 0; var ccBlock = 0; var ccRsi = 0
    var bitmap: Array[Boolean] = null

    val out = Seq.newBuilder[Record]
    var done = false
    while (!done) {
      require(pos + 4 <= end, s"ran past message end without 7777 in $label")
      if (b(pos) == '7' && b(pos + 1) == '7' && b(pos + 2) == '7' && b(pos + 3) == '7') {
        require(pos + 4 == end, s"7777 before declared total length in $label")
        done = true
      } else {
        require(pos + 5 <= end, s"truncated section header in $label")
        val len = u32(pos).toInt
        val num = u(pos + 4)
        require(len >= 5 && pos + len <= end, s"corrupt section-$num length $len in $label")
        num match {
          case 1 =>
            require(len >= 21, s"identification section too short ($len) in $label")
            time = LocalDateTime.of(u16(pos + 12), u(pos + 14), u(pos + 15),
              u(pos + 16), u(pos + 17), u(pos + 18))
          case 2 => () // local use: skip
          case 3 =>
            val template = u16(pos + 12)
            require(template == 0 || template == 1 || template == 10 ||
              template == 20 || template == 30 || template == 40,
              s"grid template 3.$template unsupported (3.0 lat/lon / " +
                s"3.1 rotated lat/lon / 3.10 Mercator / 3.20 polar " +
                s"stereographic / 3.30 Lambert / 3.40 Gaussian) in $label")
            if (template == 1) {
              // Rotated lat/lon (the COSMO/ICON-EU regional shape):
              // 3.0's octets 15-72 in ROTATED coordinates, then octets
              // 73-84 = southern pole of rotation lat/lon + angle
              require(len >= 84, s"grid section 3.1 too short ($len) in $label")
              ni = u32(pos + 30).toInt; nj = u32(pos + 34).toInt
              require(ni > 1 && nj > 1 && ni.toLong * nj <= (1L << 26),
                s"implausible 3.1 grid ${ni}x$nj in $label")
              la1 = s32(pos + 46); lo1 = s32(pos + 50)
              di = u32(pos + 63); dj = u32(pos + 67)
              require(di > 0 && dj > 0, s"3.1 zero grid step in $label")
              val scan = u(pos + 71)
              require(scan == 0 || scan == 0x40,
                f"3.1 scanning mode 0x$scan%02x unsupported in $label")
              jPositive = scan == 0x40
              val spLat = s32(pos + 72); val spLon = s32(pos + 76)
              require(s32(pos + 80) == 0L,
                s"rotation angle ${s32(pos + 80)} out of scope (only 0) in $label")
              val (cl, cn) = rotatedCells(ni, nj, la1, lo1, di, dj,
                jPositive, spLat, spLon)
              projLats = cl; projLons = cn
              gaussLats = null; rowNi = null
            } else if (template == 10) {
              // Mercator: octets 31-38 Ni/Nj, 39-46 La1/Lo1, 48-51 LaD
              // (true-scale latitude), 52-59 La2/Lo2, 60 scan, 61-64
              // orientation, 65-72 Di/Dj (mm)
              require(len >= 72, s"grid section 3.10 too short ($len) in $label")
              val shape = u(pos + 14)
              require(shape == 6 || shape == 0,
                s"earth shape $shape unsupported for 3.10 (0 / 6 = sphere) in $label")
              val earthR = if (shape == 6) 6371229.0 else 6367470.0
              ni = u32(pos + 30).toInt; nj = u32(pos + 34).toInt
              require(ni > 1 && nj > 1 && ni.toLong * nj <= (1L << 26),
                s"implausible 3.10 grid ${ni}x$nj in $label")
              la1 = s32(pos + 38); lo1 = s32(pos + 42)
              val lad = s32(pos + 47)
              require(math.abs(lad) < 89000000L,
                s"Mercator true-scale latitude $lad at a pole in $label")
              val scan = u(pos + 59)
              require(scan == 0x40 || scan == 0x00,
                f"3.10 scanning mode 0x$scan%02x unsupported in $label")
              jPositive = scan == 0x40
              require(u32(pos + 60) == 0L,
                s"rotated Mercator (orientation ${u32(pos + 60)}) out of scope in $label")
              val diMm = u32(pos + 64); val djMm = u32(pos + 68)
              require(diMm > 0 && djMm > 0, s"3.10 zero grid step in $label")
              val (cl, cn) = mercatorCells(ni, nj, la1, lo1, lad,
                diMm, djMm, jPositive, earthR)
              projLats = cl; projLons = cn
              di = 0L; dj = 0L; gaussLats = null; rowNi = null
            } else if (template == 20) {
              // Polar stereographic (the GFS polar / sea-ice grid shape):
              // octets 31-38 Nx/Ny, 39-46 La1/Lo1, 48-55 LaD/LoV,
              // 56-63 Dx/Dy (mm), 64 projection centre, 65 scan
              require(len >= 65, s"grid section 3.20 too short ($len) in $label")
              val shape = u(pos + 14)
              require(shape == 6 || shape == 0,
                s"earth shape $shape unsupported for 3.20 (0 / 6 = sphere) in $label")
              val earthR = if (shape == 6) 6371229.0 else 6367470.0
              ni = u32(pos + 30).toInt; nj = u32(pos + 34).toInt
              require(ni > 1 && nj > 1 && ni.toLong * nj <= (1L << 26),
                s"implausible 3.20 grid ${ni}x$nj in $label")
              la1 = s32(pos + 38); lo1 = s32(pos + 42)
              val lad = s32(pos + 47); val lov = s32(pos + 51)
              val dxMm = u32(pos + 55); val dyMm = u32(pos + 59)
              require(dxMm > 0 && dyMm > 0, s"3.20 zero grid step in $label")
              require(u(pos + 63) == 0,
                s"projection centre 0x${u(pos + 63)} unsupported (north pole) in $label")
              val scan = u(pos + 64)
              require(scan == 0x40 || scan == 0x00,
                f"3.20 scanning mode 0x$scan%02x unsupported in $label")
              jPositive = scan == 0x40
              val (cl, cn) = polarCells(ni, nj, la1, lo1, lad, lov,
                dxMm, dyMm, jPositive, earthR)
              projLats = cl; projLons = cn
              di = 0L; dj = 0L; gaussLats = null; rowNi = null
            } else if (template == 30) {
              // Lambert conformal (the HRRR/NAM operational CONUS grid):
              // octets 31-34 Nx, 35-38 Ny, 39-46 La1/Lo1, 48-55 LaD/LoV,
              // 56-63 Dx/Dy (mm), 64 projection centre, 65 scan,
              // 66-73 Latin1/Latin2
              require(len >= 81, s"grid section 3.30 too short ($len) in $label")
              val shape = u(pos + 14)
              require(shape == 6 || shape == 0,
                s"earth shape $shape unsupported for 3.30 (0 / 6 = sphere) in $label")
              val earthR = if (shape == 6) 6371229.0 else 6367470.0
              ni = u32(pos + 30).toInt; nj = u32(pos + 34).toInt
              require(ni > 1 && nj > 1 && ni.toLong * nj <= (1L << 26),
                s"implausible 3.30 grid ${ni}x$nj in $label")
              la1 = s32(pos + 38); lo1 = s32(pos + 42)
              val lad = s32(pos + 47); val lov = s32(pos + 51)
              val dxMm = u32(pos + 55); val dyMm = u32(pos + 59)
              require(dxMm > 0 && dyMm > 0, s"3.30 zero grid step in $label")
              require(u(pos + 63) == 0,
                s"projection centre 0x${u(pos + 63)} unsupported (north pole) in $label")
              val scan = u(pos + 64) // octet 65
              require(scan == 0x40 || scan == 0x00,
                f"3.30 scanning mode 0x$scan%02x unsupported in $label")
              jPositive = scan == 0x40
              val latin1 = s32(pos + 65); val latin2 = s32(pos + 69)
              val (cl, cn) = lambertCells(ni, nj, la1, lo1, lad, lov,
                latin1, latin2, dxMm, dyMm, jPositive, earthR)
              projLats = cl; projLons = cn
              di = 0L; dj = 0L; gaussLats = null; rowNi = null
            } else {
            projLats = null; projLons = null
            val niRaw = u32(pos + 30); nj = u32(pos + 34).toInt
            val listOctets = u(pos + 10); val listInterp = u(pos + 11)
            // reduced Gaussian (ERA5's native layout): ni is MISSING and
            // octets 11/12 declare a per-row point-count list appended
            // after the fixed template (Code Table 3.11 interp 1 = counts)
            val reduced = niRaw == 0xffffffffL
            if (reduced) {
              require(template == 40,
                s"missing-ni (reduced) grid outside template 3.40 in $label")
              require(listOctets == 1 || listOctets == 2 || listOctets == 4,
                s"reduced-grid list octet width $listOctets unsupported in $label")
              require(listInterp == 1,
                s"reduced-grid list interpretation $listInterp unsupported " +
                  s"(only 1 = points per row) in $label")
              // Long math: a crafted nj (~2^29) would overflow the Int
              // bound and trigger a multi-GB tabulate before any byte
              // check — reject loudly instead.
              require(nj > 1 && 72L + nj.toLong * listOctets <= len,
                s"grid section too short for a $nj-row point list in $label")
              rowNi = Array.tabulate(nj) { j =>
                var v = 0L; var o = 0
                while (o < listOctets) { v = (v << 8) | u(pos + 72 + j * listOctets + o); o += 1 }
                require(v >= 2 && v <= Int.MaxValue,
                  s"reduced-grid row $j has $v points in $label")
                v.toInt
              }
              require(u32(pos + 6) == rowNi.map(_.toLong).sum,
                s"grid point total disagrees with the row list in $label")
              ni = rowNi.max
            } else { rowNi = null; ni = niRaw.toInt }
            require(ni > 1 && nj > 1, s"degenerate grid ${ni}x$nj in $label")
            la1 = s32(pos + 46); lo1 = s32(pos + 50)
            val la2 = s32(pos + 55); val lo2 = s32(pos + 59)
            di = if (reduced) 0L else u32(pos + 63)
            val scan = u(pos + 71)
            require(scan == 0 || scan == 0x40,
              f"scanning mode 0x$scan%02x unsupported (only 0x00 / 0x40) in $label")
            jPositive = scan == 0x40
            require(reduced || lo1 + (ni - 1).toLong * di == lo2,
              s"grid corners disagree with increments in $label")
            if (template == 0) {
              dj = u32(pos + 67)
              gaussLats = null
              val laEnd = if (jPositive) la1 + (nj - 1).toLong * dj
                          else la1 - (nj - 1).toLong * dj
              require(laEnd == la2,
                s"grid corners disagree with increments in $label")
            } else {
              // 3.40 regular Gaussian: octets 68-71 carry N (parallels
              // between a pole and the equator); rows sit at the roots of
              // the degree-2N Legendre polynomial — COMPUTED here, never a
              // lookup table. Scope: the full global row set (nj = 2N);
              // reduced Gaussian (per-row ni) stays a loud reject because
              // 3.40 with an ni list is flagged in octet 55's resolution
              // flags and we require a plain ni.
              dj = 0
              val nPar = u32(pos + 67).toInt
              require(nPar > 0 && nj == 2 * nPar,
                s"Gaussian grid nj=$nj != 2N (N=$nPar) unsupported " +
                  s"(only full regular Gaussian) in $label")
              val northSouth = gaussianLatitudesMicro(2 * nPar)
              val lats = if (jPositive) northSouth.reverse else northSouth
              // la1/la2 are the outermost Gaussian rows; allow 1 µdeg of
              // producer rounding slack
              require(math.abs(lats(0) - la1) <= 1 &&
                  math.abs(lats(nj - 1) - la2) <= 1,
                s"Gaussian corner latitudes $la1/$la2 disagree with the " +
                  s"computed N=$nPar abscissas ${lats(0)}/${lats(nj - 1)} in $label")
              gaussLats = lats
            }
            } // end non-3.30 grid templates
          case 4 =>
            // 4.0 (analysis/forecast at a point in time), 4.1 (individual
            // ensemble member — the GEFS/ERA5-EDA shape: 4.0 + three
            // ensemble octets), 4.8 (average/accumulation/extreme over a
            // time interval — the template operational precipitation
            // products actually ship; the reference's own
            // total_precipitation dataset shape) and 4.11 (ensemble +
            // statistical: 4.1's octets then 4.8's interval tail). 4.8 =
            // 4.0's octets 10-34 followed by the end-of-interval stamp,
            // the time-range-spec count, total missing and per-spec
            // statistical octets; the ensemble octets shift that tail
            // by 3.
            val pdt = u16(pos + 7)
            require(pdt == 0 || pdt == 1 || pdt == 2 || pdt == 5 ||
              pdt == 6 || pdt == 8 || pdt == 9 || pdt == 10 ||
              pdt == 11 || pdt == 12,
              s"product template 4.$pdt unsupported " +
                s"(only 4.0 / 4.1 / 4.2 / 4.5 / 4.6 / 4.8 / 4.9 / 4.10 / " +
                s"4.11 / 4.12) in $label")
            category = u(pos + 9); number = u(pos + 10)
            val ens = pdt == 1 || pdt == 11
            val derived = pdt == 2 || pdt == 12
            val prob = pdt == 5 || pdt == 9
            val pct = pdt == 6 || pdt == 10
            // 1-octet sign-magnitude (the limit scale factors)
            def s8(i: Int): Int = { val v = u(i); if ((v & 0x80) != 0) -(v & 0x7f) else v }
            if (prob) {
              // 4.5: octets 35/36 = probability number/total, 37 = Code
              // Table 4.9 type, 38 + 39-42 / 43 + 44-47 = scale factor +
              // scaled value of the lower/upper limits (sign-magnitude);
              // all-ones scaled value = that bound unused
              require(len >= 47, s"product section 4.$pdt too short ($len) in $label")
              probNumber = u(pos + 34); probTotal = u(pos + 35)
              probType = u(pos + 36)
              require(probType <= 4,
                s"probability type $probType outside Code Table 4.9 (0-4) in $label")
              probLower = if (u32(pos + 38) == 0xffffffffL) Double.NaN
                else s32(pos + 38) / math.pow(10, s8(pos + 37))
              probUpper = if (u32(pos + 43) == 0xffffffffL) Double.NaN
                else s32(pos + 43) / math.pow(10, s8(pos + 42))
            } else { probType = -1; probNumber = -1; probTotal = 0
              probLower = Double.NaN; probUpper = Double.NaN }
            if (pct) {
              // 4.6: octet 35 = percentile value (0..100)
              require(len >= 35, s"product section 4.$pdt too short ($len) in $label")
              percentile = u(pos + 34)
              require(percentile <= 100,
                s"percentile $percentile outside 0..100 in $label")
            } else percentile = -1
            if (ens) {
              require(len >= 37, s"product section 4.$pdt too short ($len) in $label")
              ensMember = u(pos + 35); ensSize = u(pos + 36)
              require(ensSize > 0 && ensMember <= ensSize,
                s"ensemble member $ensMember of $ensSize malformed in $label")
              derivedType = -1
            } else if (derived) {
              // 4.2: octet 35 = derived forecast type (Code Table 4.7),
              // octet 36 = number of forecasts in the ensemble
              require(len >= 36, s"product section 4.$pdt too short ($len) in $label")
              derivedType = u(pos + 34); ensSize = u(pos + 35)
              require(ensSize > 0, s"derived product over 0 forecasts in $label")
              ensMember = -1
            } else { ensMember = -1; ensSize = 0; derivedType = -1 }
            // ensemble octets shift the statistical tail by 3, derived
            // by 2, probability by 13 (4.5's octets 35-47), percentile
            // by 1 (4.6's octet 35)
            val eo = if (ens) 3 else if (derived) 2
              else if (prob) 13 else if (pct) 1 else 0
            if (pdt == 8 || pdt == 9 || pdt == 10 || pdt == 11 || pdt == 12) {
              require(len >= 58 + eo, s"product section 4.$pdt too short ($len) in $label")
              intervalEnd = LocalDateTime.of(u16(pos + 34 + eo), u(pos + 36 + eo),
                u(pos + 37 + eo), u(pos + 38 + eo), u(pos + 39 + eo), u(pos + 40 + eo))
              val nRanges = u(pos + 41 + eo)
              require(nRanges == 1,
                s"4.$pdt with $nRanges time-range specs unsupported (only 1) in $label")
              statProcess = u(pos + 46 + eo)
              val unit = u(pos + 48 + eo)
              require(unit == 0 || unit == 1,
                s"4.$pdt time-range unit $unit unsupported (only 0 minute / 1 hour) in $label")
              val rangeLen = u32(pos + 49 + eo)
              rangeHours =
                if (unit == 1) rangeLen.toInt
                else {
                  require(rangeLen % 60 == 0,
                    s"4.$pdt minute-unit range $rangeLen not whole hours in $label")
                  (rangeLen / 60).toInt
                }
            } else { statProcess = -1; intervalEnd = null; rangeHours = 0 }
          case 5 =>
            nPresent = u32(pos + 5).toInt
            drTemplate = u16(pos + 9)
            require(drTemplate == 0 || drTemplate == 2 || drTemplate == 3 ||
                drTemplate == 40 || drTemplate == 41 || drTemplate == 42,
              s"data representation template 5.$drTemplate unsupported " +
                s"(only 5.0 simple / 5.2 complex / 5.3 complex+spatial-diff / " +
                s"5.40 JPEG2000 / 5.41 PNG / 5.42 CCSDS-AEC) in $label")
            refVal = java.lang.Float.intBitsToFloat(u32(pos + 11).toInt).toDouble
            eScale = s16(pos + 15)
            dScale = s16(pos + 17)
            nbits = u(pos + 19)
            if (drTemplate == 40) {
              val compression = u(pos + 21)
              // both declared types decode: the codestream's COD marker
              // is authoritative for the transform, and the remaining
              // reject (scalar-QUANTIZED subbands) lives in
              // Jpeg2000.decode where the QCD is actually read
              require(compression == 0 || compression == 1,
                s"unknown 5.40 compression type $compression in $label " +
                  "(0 = lossless, 1 = lossy)")
            }
            if (drTemplate == 2 || drTemplate == 3) {
              val split = u(pos + 21); val missing = u(pos + 22)
              require(split == 1,
                s"group splitting method $split unsupported (only 1 = general) in $label")
              require(missing == 0,
                s"missing-value management $missing unsupported (only 0 — use a bitmap) in $label")
              ng = u32(pos + 31).toInt
              refGW = u(pos + 35); nbitsGW = u(pos + 36)
              refGL = u32(pos + 37); lenInc = u(pos + 41)
              lastLen = u32(pos + 42); nbitsGL = u(pos + 46)
              require(ng > 0, s"complex packing with 0 groups in $label")
            }
            if (drTemplate == 42) {
              // octets 22/23/24-25: CCSDS options mask, block size, RSI
              ccFlags = u(pos + 21); ccBlock = u(pos + 22); ccRsi = u16(pos + 23)
              if (nbits > 0) Ccsds.validate(nbits, ccBlock, ccRsi, ccFlags, label)
            }
            if (drTemplate == 3) {
              sdOrder = u(pos + 47); sdOctets = u(pos + 48)
              require(sdOrder == 1 || sdOrder == 2,
                s"spatial differencing order $sdOrder unsupported (only 1/2) in $label")
              require(sdOctets >= 1 && sdOctets <= 4,
                s"spatial-differencing descriptor width $sdOctets octets out of range in $label")
            } else { sdOrder = 0; sdOctets = 0 }
          case 6 =>
            val indicator = u(pos + 5)
            indicator match {
              case 255 => bitmap = null
              case 0 =>
                require(ni > 0, s"bitmap section before grid section in $label")
                require(len >= 6 + (gridTotal + 7) / 8,
                  s"BMS length $len too short for a $gridTotal-point grid in $label")
                val bits = Array.ofDim[Boolean](gridTotal)
                var k = 0
                while (k < bits.length) {
                  bits(k) = (u(pos + 6 + (k >> 3)) & (0x80 >> (k & 7))) != 0
                  k += 1
                }
                bitmap = bits
              case 254 => () // previously-defined bitmap: reuse current
              case other =>
                sys.error(s"pre-defined bitmap indicator $other unsupported in $label")
            }
          case 7 =>
            require(time != null && ni > 0 && category >= 0 && nbits >= 0,
              s"data section before sections 1/3/4/5 in $label")
            val expectPresent = if (bitmap == null) gridTotal else bitmap.count(identity)
            require(nPresent == expectPresent,
              s"section-5 point count $nPresent != present cells $expectPresent in $label")
            val twoE = math.pow(2.0, eScale)
            val tenD = math.pow(10.0, dScale)
            val packed = new Array[Double](nPresent)
            if (drTemplate == 40) {
              require(bitmap == null,
                s"bitmap with template 5.40 unsupported in $label (dense fields only)")
              val (jw, jh, xs) = Jpeg2000.decode(
                java.util.Arrays.copyOfRange(b, pos + 5, pos + len))
              require(jw == ni && jh == nj,
                s"JPEG2000 image ${jw}x$jh disagrees with grid ${ni}x$nj in $label")
              var k = 0
              while (k < nPresent) { packed(k) = (refVal + xs(k) * twoE) / tenD; k += 1 }
            } else if (drTemplate == 41) {
              require(bitmap == null,
                s"bitmap with template 5.41 unsupported in $label (dense fields only)")
              val (pw, ph, _, rows) = AssetCodecs.decodePngGrey(
                java.util.Arrays.copyOfRange(b, pos + 5, pos + len))
              require(pw == ni && ph == nj,
                s"PNG image ${pw}x$ph disagrees with grid ${ni}x$nj in $label")
              var k = 0
              while (k < nPresent) {
                packed(k) = (refVal + rows(k / ni)(k % ni) * twoE) / tenD
                k += 1
              }
            } else if (drTemplate == 42) {
              // CCSDS packs the PRESENT cells only, so (unlike the image
              // templates) a bitmap composes naturally
              if (nbits == 0) java.util.Arrays.fill(packed, refVal / tenD)
              else {
                val xs = Ccsds.decode(
                  java.util.Arrays.copyOfRange(b, pos + 5, pos + len),
                  nPresent, nbits, ccBlock, ccRsi, ccFlags, label)
                var k = 0
                while (k < nPresent) { packed(k) = (refVal + xs(k) * twoE) / tenD; k += 1 }
              }
            } else if (drTemplate >= 2) {
              val xs = unpackComplex(b, pos + 5, pos + len, nPresent, nbits,
                ng, refGW, nbitsGW, refGL, lenInc, lastLen, nbitsGL,
                sdOrder, sdOctets, label)
              var k = 0
              while (k < nPresent) { packed(k) = (refVal + xs(k) * twoE) / tenD; k += 1 }
            } else if (nbits == 0) java.util.Arrays.fill(packed, refVal / tenD)
            else {
              require(len >= 5 + (nPresent.toLong * nbits + 7) / 8,
                s"data section too short for $nPresent ${nbits}-bit values in $label")
              var k = 0
              var bitPos = (pos + 5) * 8
              while (k < nPresent) {
                var x = 0L
                var t = 0
                while (t < nbits) {
                  x = (x << 1) | ((u(bitPos >> 3) >> (7 - (bitPos & 7))) & 1)
                  bitPos += 1
                  t += 1
                }
                packed(k) = (refVal + x * twoE) / tenD
                k += 1
              }
            }
            val values = new Array[Double](gridTotal)
            if (bitmap == null) System.arraycopy(packed, 0, values, 0, values.length)
            else {
              var k = 0; var p = 0
              while (k < values.length) {
                values(k) = if (bitmap(k)) { val v = packed(p); p += 1; v } else Double.NaN
                k += 1
              }
            }
            out += Record(discipline, category, number,
              nameOf(discipline, category, number), time,
              ni, nj, la1, lo1, di, dj, jPositive, values,
              latsMicro = gaussLats, rowNi = rowNi, statProcess = statProcess,
              intervalEnd = intervalEnd, rangeHours = rangeHours,
              ensMember = ensMember, ensSize = ensSize,
              derivedType = derivedType,
              probType = probType, probNumber = probNumber,
              probTotal = probTotal, probLower = probLower,
              probUpper = probUpper, percentile = percentile,
              cellLats = projLats, cellLons = projLons)
          case other => sys.error(s"unexpected section number $other in $label")
        }
        pos += len
      }
    }
    out.result()
  }

  /** Data-section decode for templates 5.2/5.3 (data templates 7.2/7.3),
    * the g2clib/wgrib2 `comunpack` layout: [5.3 only: sign-magnitude
    * initial value(s) then overall minimum, each `sdOctets` whole
    * octets] · group references (`nbitsGref` bits each) · group widths
    * (`refGW` + `nbitsGW`-bit increment) · scaled group lengths
    * (`refGL` + `lenInc`·scaled, last group's TRUE length from section
    * 5) — each block padded to a whole octet — then per-group packed
    * values at that group's width, consecutive. Returns the exact
    * integers X of `value = (R + X·2^E)/10^D`.
    */
  private def unpackComplex(b: Array[Byte], start: Int, end: Int,
      n: Int, nbitsGref: Int,
      ng: Int, refGW: Int, nbitsGW: Int,
      refGL: Long, lenInc: Int, lastLen: Long, nbitsGL: Int,
      sdOrder: Int, sdOctets: Int, label: String): Array[Long] = {
    var bitPos = start * 8
    val endBits = end * 8
    def bits(w: Int): Long = {
      require(bitPos + w <= endBits, s"complex data section overrun in $label")
      var x = 0L; var t = 0
      while (t < w) {
        x = (x << 1) | ((b(bitPos >> 3) >> (7 - (bitPos & 7))) & 1)
        bitPos += 1; t += 1
      }
      x
    }
    def alignByte(): Unit = if ((bitPos & 7) != 0) bitPos += 8 - (bitPos & 7)
    def signMag(w: Int): Long = {
      val v = bits(w)
      if ((v & (1L << (w - 1))) != 0) -(v & ((1L << (w - 1)) - 1)) else v
    }
    var ival1 = 0L; var ival2 = 0L; var minsd = 0L
    if (sdOrder > 0) {
      ival1 = signMag(sdOctets * 8)
      if (sdOrder == 2) ival2 = signMag(sdOctets * 8)
      minsd = signMag(sdOctets * 8)
    }
    val grefs = new Array[Long](ng)
    if (nbitsGref > 0) {
      var g = 0; while (g < ng) { grefs(g) = bits(nbitsGref); g += 1 }; alignByte()
    }
    val widths = new Array[Int](ng)
    if (nbitsGW > 0) {
      var g = 0; while (g < ng) { widths(g) = refGW + bits(nbitsGW).toInt; g += 1 }; alignByte()
    } else java.util.Arrays.fill(widths, refGW)
    val lens = new Array[Long](ng)
    if (nbitsGL > 0) {
      var g = 0; while (g < ng) { lens(g) = refGL + lenInc * bits(nbitsGL); g += 1 }; alignByte()
    } else java.util.Arrays.fill(lens, refGL)
    lens(ng - 1) = lastLen
    val total = lens.sum
    require(total == n,
      s"complex-packing group lengths sum to $total, expected $n points in $label")
    val xs = new Array[Long](n)
    var k = 0; var g = 0
    while (g < ng) {
      val w = widths(g); var i = 0L
      while (i < lens(g)) {
        xs(k) = grefs(g) + (if (w == 0) 0L else bits(w))
        k += 1; i += 1
      }
      g += 1
    }
    // spatial differencing: overwrite the first `order` values with the
    // stored initial values, re-add the overall minimum, run the inverse
    // recurrence (g2clib comunpack, verbatim order of operations)
    if (sdOrder == 1) {
      xs(0) = ival1
      var j = 1
      while (j < n) { xs(j) += minsd + xs(j - 1); j += 1 }
    } else if (sdOrder == 2) {
      xs(0) = ival1
      if (n > 1) xs(1) = ival2
      var j = 2
      while (j < n) { xs(j) += minsd + 2 * xs(j - 1) - xs(j - 2); j += 1 }
    }
    xs
  }

  // ----------------------------------------------------------- distribute

  /** Long-format cell row — identical shape to [[Grib1.GridRow]], so both
    * editions land into the same grid tables.
    */
  final case class GridRow(variable: String, time: LocalDateTime,
                           lat: Double, lon: Double, value: Double)

  /** The Spark boundary with the reference's record selection built in:
    * GRIB2 paths → long-format grid rows for the first `limit` records
    * (per file, like wgrib2's per-invocation count) whose variable name
    * matches `matchRe` — `wgrib2 -match RE -limit N` on the decoded
    * stream. Same `binaryFile` scale shape as [[Grib1.readRecords]]:
    * per-file decode is the atom, Hadoop FS layer underneath, masked
    * cells never become rows.
    */
  def readRecords(spark: SparkSession, paths: Seq[String],
                  matchRe: String = ".*", limit: Int = Int.MaxValue): DataFrame = {
    import org.apache.spark.sql.functions.col
    val re = matchRe
    spark.createDataset(
      spark.read.format("binaryFile").load(paths: _*)
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])](Encoders.tuple(Encoders.STRING, Encoders.BINARY))
        .rdd
        .flatMap { case (p, bytes) =>
          val pat = java.util.regex.Pattern.compile(re)
          parseMessages(bytes, p).iterator
            .filter(r => pat.matcher(r.variable).find())
            .take(limit)
            .flatMap(cells)
        }
    )(Encoders.product[GridRow]).toDF()
  }

  /** [[GridRow]] widened with the 4.8 statistical octets — instantaneous
    * (4.0) records carry stat="instant", intervalEnd = the reference time
    * and rangeHours = 0, so one schema serves mixed files (exactly how
    * wgrib2's inventory prints both record kinds side by side).
    */
  final case class StatGridRow(variable: String, time: LocalDateTime,
                               stat: String, intervalEnd: LocalDateTime,
                               rangeHours: Int,
                               lat: Double, lon: Double, value: Double)

  /** [[readRecords]] with the product-template-4.8 statistical octets in
    * the row schema: stat process name, end of the overall interval, and
    * range length in hours.
    */
  def readStatRecords(spark: SparkSession, paths: Seq[String],
                      matchRe: String = ".*",
                      limit: Int = Int.MaxValue): DataFrame = {
    import org.apache.spark.sql.functions.col
    val re = matchRe
    spark.createDataset(
      spark.read.format("binaryFile").load(paths: _*)
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])](Encoders.tuple(Encoders.STRING, Encoders.BINARY))
        .rdd
        .flatMap { case (p, bytes) =>
          val pat = java.util.regex.Pattern.compile(re)
          parseMessages(bytes, p).iterator
            .filter(r => pat.matcher(r.variable).find())
            .take(limit)
            .flatMap { r =>
              val stat = statNameOf(r.statProcess)
              val end = if (r.intervalEnd == null) r.time else r.intervalEnd
              cells(r).map(c => StatGridRow(c.variable, c.time, stat, end,
                r.rangeHours, c.lat, c.lon, c.value))
            }
        }
    )(Encoders.product[StatGridRow]).toDF()
  }

  /** [[GridRow]] widened with the ensemble octets of templates 4.1/4.11:
    * member number and ensemble size (0/0 for deterministic records, so
    * one schema serves mixed files — wgrib2's `ens std dev`-style
    * inventory prints both side by side the same way).
    */
  final case class EnsGridRow(variable: String, time: LocalDateTime,
                              kind: String, member: Int, n_members: Int,
                              lat: Double, lon: Double, value: Double)

  /** [[readRecords]] with the template-4.1/4.11 ensemble octets in the
    * row schema.
    */
  def readEnsembleRecords(spark: SparkSession, paths: Seq[String],
                          matchRe: String = ".*",
                          limit: Int = Int.MaxValue): DataFrame = {
    import org.apache.spark.sql.functions.col
    val re = matchRe
    spark.createDataset(
      spark.read.format("binaryFile").load(paths: _*)
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])](Encoders.tuple(Encoders.STRING, Encoders.BINARY))
        .rdd
        .flatMap { case (p, bytes) =>
          val pat = java.util.regex.Pattern.compile(re)
          parseMessages(bytes, p).iterator
            .filter(r => pat.matcher(r.variable).find())
            .take(limit)
            .flatMap { r =>
              val member = math.max(r.ensMember, 0)
              val kind = derivedNameOf(r.derivedType) // "member" unless 4.2/4.12
              cells(r).map(c => EnsGridRow(c.variable, c.time, kind, member,
                r.ensSize, c.lat, c.lon, c.value))
            }
        }
    )(Encoders.product[EnsGridRow]).toDF()
  }

  /** WMO Code Table 4.9 probability-type names (wgrib2 prints these as
    * `prob <X` / `prob >X` inventory suffixes). */
  def probNameOf(code: Int): String = code match {
    case 0 => "below_lower"
    case 1 => "above_upper"
    case 2 => "between"
    case 3 => "above_lower"
    case 4 => "below_upper"
    case other => s"prob_$other"
  }

  /** [[GridRow]] widened with the probability/percentile octets of
    * templates 4.5/4.9/4.10 (+ the 4.8-style statistical tail of the
    * interval forms). Deterministic records carry kind="none",
    * percentile -1 and null limits, so one schema serves mixed files.
    */
  final case class ProbGridRow(variable: String, time: LocalDateTime,
                               kind: String, prob_number: Int, prob_total: Int,
                               lower_limit: Option[Double],
                               upper_limit: Option[Double],
                               percentile: Int, stat: String, range_hours: Int,
                               lat: Double, lon: Double, value: Double)

  /** [[readRecords]] with the template-4.5/4.9 probability octets and
    * the 4.6/4.10 percentile octet in the row schema.
    */
  def readProbabilityRecords(spark: SparkSession, paths: Seq[String],
                             matchRe: String = ".*",
                             limit: Int = Int.MaxValue): DataFrame = {
    import org.apache.spark.sql.functions.col
    val re = matchRe
    spark.createDataset(
      spark.read.format("binaryFile").load(paths: _*)
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])](Encoders.tuple(Encoders.STRING, Encoders.BINARY))
        .rdd
        .flatMap { case (p, bytes) =>
          val pat = java.util.regex.Pattern.compile(re)
          parseMessages(bytes, p).iterator
            .filter(r => pat.matcher(r.variable).find())
            .take(limit)
            .flatMap { r =>
              val kind = if (r.probType < 0) "none" else probNameOf(r.probType)
              val lower = if (r.probLower.isNaN) None else Some(r.probLower)
              val upper = if (r.probUpper.isNaN) None else Some(r.probUpper)
              cells(r).map(c => ProbGridRow(c.variable, c.time, kind,
                r.probNumber, r.probTotal, lower, upper, r.percentile,
                statNameOf(r.statProcess), r.rangeHours, c.lat, c.lon, c.value))
            }
        }
    )(Encoders.product[ProbGridRow]).toDF()
  }

  /** Inverse Lambert conformal conic on the sphere (Snyder, "Map
    * Projections — A Working Manual", USGS PP 1395, eqs. 15-1..15-5 and
    * 14-9..14-11): locate the first grid point (La1, Lo1) in projected
    * metres, step Dx/Dy per cell, invert each (x, y) back to (lat, lon)
    * degrees. Northern-hemisphere cone (projection centre 0); the
    * tangent (`latin1 == latin2`) and secant forms share the code path
    * via the cone constant `n`. Longitudes come out in LoV's frame
    * (no normalization), which is what wgrib2 prints for these grids.
    */
  private[graft] def lambertCells(ni: Int, nj: Int,
      la1Micro: Long, lo1Micro: Long, ladMicro: Long, lovMicro: Long,
      latin1Micro: Long, latin2Micro: Long,
      dxMilli: Long, dyMilli: Long, jPositive: Boolean,
      earthR: Double): (Array[Double], Array[Double]) = {
    import math._
    val phi1 = toRadians(latin1Micro / 1e6)
    val phi2 = toRadians(latin2Micro / 1e6)
    require(cos(phi1) > 1e-9 && cos(phi2) > 1e-9,
      "Lambert secant latitudes at a pole are out of scope")
    val n =
      if (latin1Micro == latin2Micro) sin(phi1)
      else log(cos(phi1) / cos(phi2)) /
        log(tan(Pi / 4 + phi2 / 2) / tan(Pi / 4 + phi1 / 2))
    require(n > 1e-9, "non-northern Lambert cone (n <= 0) out of scope")
    val F = cos(phi1) * pow(tan(Pi / 4 + phi1 / 2), n) / n
    def rho(latDeg: Double): Double =
      earthR * F / pow(tan(Pi / 4 + toRadians(latDeg) / 2), n)
    val rho0 = rho(ladMicro / 1e6)
    val rho1 = rho(la1Micro / 1e6)
    val th1 = n * toRadians((lo1Micro - lovMicro) / 1e6)
    val x1 = rho1 * sin(th1)
    val y1 = rho0 - rho1 * cos(th1)
    val dx = dxMilli / 1e3
    val dy = (if (jPositive) dyMilli else -dyMilli) / 1e3
    val lats = new Array[Double](ni * nj)
    val lons = new Array[Double](ni * nj)
    var k = 0
    while (k < ni * nj) {
      val i = k % ni; val j = k / ni
      val x = x1 + i * dx
      val y = y1 + j * dy
      val r = sqrt(x * x + (rho0 - y) * (rho0 - y))
      val theta = atan2(x, rho0 - y)
      lats(k) = toDegrees(2 * atan(pow(earthR * F / r, 1.0 / n)) - Pi / 2)
      lons(k) = lovMicro / 1e6 + toDegrees(theta / n)
      k += 1
    }
    (lats, lons)
  }

  /** Un-rotate a rotated lat/lon grid (template 3.1, angle 0 — the
    * COSMO/ICON convention, WMO Manual on Codes + COSMO documentation):
    * the rotated NORTH pole sits at `(-spLat, spLon - 180)` in true
    * coordinates; each rotated cell `(phiR, lamR)` maps back via
    * `phi = asin(sin phiR sin phiN + cos phiR cos phiN cos lamR)` and
    * `lam = lamN - atan2(cos phiR sin lamR,
    *                     sin phiR cos phiN - cos phiR sin phiN cos lamR)`
    * (the MINUS is the COSMO `rlarot2rla` orientation: a cell east of
    * the rotated origin lands east in true coordinates — verified
    * against the COSMO-EU anchor: pole (40, -170), rotated (0, 0) ->
    * (50N, 10E), rotated (0, 10) -> ~(48.97N, 25.34E)).
    */
  private[graft] def rotatedCells(ni: Int, nj: Int,
      la1Micro: Long, lo1Micro: Long, diMicro: Long, djMicro: Long,
      jPositive: Boolean, spLatMicro: Long, spLonMicro: Long)
      : (Array[Double], Array[Double]) = {
    import math._
    val phiN = toRadians(-spLatMicro / 1e6)
    val lamN = spLonMicro / 1e6 - 180.0
    val sinN = sin(phiN); val cosN = cos(phiN)
    val latStep = if (jPositive) djMicro else -djMicro
    val lats = new Array[Double](ni * nj)
    val lons = new Array[Double](ni * nj)
    var k = 0
    while (k < ni * nj) {
      val i = k % ni; val j = k / ni
      val phiR = toRadians((la1Micro + j * latStep) / 1e6)
      val lamR = toRadians((lo1Micro + i.toLong * diMicro) / 1e6)
      lats(k) = toDegrees(asin(sin(phiR) * sinN + cos(phiR) * cosN * cos(lamR)))
      val lonRaw = lamN - toDegrees(atan2(cos(phiR) * sin(lamR),
        sin(phiR) * cosN - cos(phiR) * sinN * cos(lamR)))
      // normalize to (-180, 180] — lonRaw ranges over (lamN-180, lamN+180]
      lons(k) = (lonRaw + 540.0) % 360.0 - 180.0
      k += 1
    }
    (lats, lons)
  }

  /** Inverse Mercator on the sphere with true scale at LaD (Snyder
    * eqs. 7-1..7-5 scaled by cos LaD): columns step uniformly in x
    * (`lon = Lo1 + i*Di / (R cos LaD)` radians), rows in the log-tan
    * ordinate (`lat = 2 atan(exp(y/k)) - pi/2`).
    */
  private[graft] def mercatorCells(ni: Int, nj: Int,
      la1Micro: Long, lo1Micro: Long, ladMicro: Long,
      diMilli: Long, djMilli: Long, jPositive: Boolean,
      earthR: Double): (Array[Double], Array[Double]) = {
    import math._
    val k = earthR * cos(toRadians(ladMicro / 1e6))
    val y1 = k * log(tan(Pi / 4 + toRadians(la1Micro / 1e6) / 2))
    val dx = diMilli / 1e3
    val dy = (if (jPositive) djMilli else -djMilli) / 1e3
    val lats = new Array[Double](ni * nj)
    val lons = new Array[Double](ni * nj)
    var c = 0
    while (c < ni * nj) {
      val i = c % ni; val j = c / ni
      lats(c) = toDegrees(2 * atan(exp((y1 + j * dy) / k)) - Pi / 2)
      lons(c) = lo1Micro / 1e6 + toDegrees(i * dx / k)
      c += 1
    }
    (lats, lons)
  }

  /** Inverse north-polar stereographic on the sphere (Snyder eqs.
    * 20-14..20-18, polar aspect with true scale at LaD): the radial
    * distance from the pole is `rho(lat) = R (1 + sin(LaD)) tan(pi/4 -
    * lat/2)`, the x axis points 90° clockwise from LoV and y runs along
    * LoV toward the pole (`x = rho sin(lon-LoV)`, `y = -rho
    * cos(lon-LoV)` — the NCEP grid convention wgrib2 prints).
    */
  private[graft] def polarCells(ni: Int, nj: Int,
      la1Micro: Long, lo1Micro: Long, ladMicro: Long, lovMicro: Long,
      dxMilli: Long, dyMilli: Long, jPositive: Boolean,
      earthR: Double): (Array[Double], Array[Double]) = {
    import math._
    val scale = earthR * (1 + sin(toRadians(ladMicro / 1e6)))
    def rho(latDeg: Double): Double =
      scale * tan(Pi / 4 - toRadians(latDeg) / 2)
    val rho1 = rho(la1Micro / 1e6)
    val th1 = toRadians((lo1Micro - lovMicro) / 1e6)
    val x1 = rho1 * sin(th1)
    val y1 = -rho1 * cos(th1)
    val dx = dxMilli / 1e3
    val dy = (if (jPositive) dyMilli else -dyMilli) / 1e3
    val lats = new Array[Double](ni * nj)
    val lons = new Array[Double](ni * nj)
    var k = 0
    while (k < ni * nj) {
      val i = k % ni; val j = k / ni
      val x = x1 + i * dx
      val y = y1 + j * dy
      val r = sqrt(x * x + y * y)
      lats(k) = toDegrees(Pi / 2 - 2 * atan(r / scale))
      lons(k) = lovMicro / 1e6 + toDegrees(atan2(x, -y))
      k += 1
    }
    (lats, lons)
  }

  /** Flatten one record to present cells (masked cells dropped). Regular
    * lat/lon rows step uniformly from la1; Gaussian rows (template 3.40)
    * read the per-row abscissa array; projected grids (3.30) read the
    * per-cell inverse-projection coordinates.
    */
  def cells(r: Record): Iterator[GridRow] = {
    val latStep = if (r.scanJPositive) r.djMicro else -r.djMicro
    val it =
      if (r.cellLats != null)
        Iterator.tabulate(r.nj * r.ni)(k =>
          GridRow(r.variable, r.time, r.cellLats(k), r.cellLons(k), r.values(k)))
      else if (r.rowNi == null)
        Iterator.tabulate(r.nj * r.ni) { k =>
          val j = k / r.ni; val i = k % r.ni
          val latMicro =
            if (r.latsMicro != null) r.latsMicro(j) else r.la1Micro + j * latStep
          GridRow(r.variable, r.time,
            latMicro / 1e6,
            (r.lo1Micro + i.toLong * r.diMicro) / 1e6,
            r.values(k))
        }
      else { // reduced Gaussian: ragged rows, each spanning the full circle
        var off = 0
        Iterator.range(0, r.nj).flatMap { j =>
          val nij = r.rowNi(j)
          val rowOff = off; off += nij
          // Exact µdeg step when the circle divides evenly; otherwise
          // wgrib2's i*360.0/nij in double — integer truncation would
          // drift up to ~nij µdeg across octahedral rows (e.g. 28-point
          // O-grid rows, where 360e6 % nij != 0).
          val even = 360000000L % nij == 0
          val stepMicro = if (even) 360000000L / nij else 0L
          Iterator.tabulate(nij)(i =>
            GridRow(r.variable, r.time,
              r.latsMicro(j) / 1e6,
              if (even) (r.lo1Micro + i.toLong * stepMicro) / 1e6
              else r.lo1Micro / 1e6 + i * 360.0 / nij,
              r.values(rowOff + i)))
        }
      }
    it.filterNot(c => c.value.isNaN)
  }

  // ---------------------------------------------------------------- write

  /** One field to encode: integer-scaled values (`value = scaled/10^D`),
    * `None` = bitmap-masked. Packing uses binary scale 0 and reference
    * `min(x)` (exact in binary32 for the magnitudes fixtures use), so
    * decode returns precisely `x / 10^D` — the property the closed-form
    * oracle depends on.
    */
  final case class Field(discipline: Int, category: Int, number: Int,
                         time: LocalDateTime,
                         ni: Int, nj: Int,
                         la1Micro: Long, lo1Micro: Long, diMicro: Long, djMicro: Long,
                         decimalScale: Int,
                         scaled: Array[Option[Int]],
                         scanMode: Int = 0x00,
                         template: Int = 0,
                         sdOrder: Int = 2,
                         groupLen: Int = 20,
                         // ≥ 0 emits product template 4.8 with this WMO
                         // 4.10 statistical process over `intervalHours`
                         // ending at time + intervalHours; -1 emits 4.0
                         statProcess: Int = -1,
                         intervalHours: Int = 0,
                         // > 0 emits grid template 3.40 (regular Gaussian,
                         // N parallels pole-to-equator): nj must equal 2N;
                         // la1Micro/djMicro are ignored — row latitudes
                         // are the computed Gaussian abscissas
                         gaussianN: Int = 0,
                         // non-empty emits a REDUCED Gaussian grid (ni
                         // missing + per-row point list): one count per
                         // row, each dividing 360000000 µdeg so row
                         // longitudes are exact; `scaled` is ragged
                         // row-major with reducedNi.sum cells and `ni`
                         // must equal reducedNi.max
                         reducedNi: Seq[Int] = Nil,
                         // >= 0 emits template 4.1 (or 4.11 when a stat
                         // process is also declared): this member number
                         // out of ensSize
                         ensMember: Int = -1,
                         ensSize: Int = 0,
                         // >= 0 emits template 4.2 (or 4.12 with a stat
                         // process): this Code Table 4.7 derived type
                         // over ensSize forecasts
                         derivedType: Int = -1,
                         // >= 0 emits template 4.5 (or 4.9 with a stat
                         // process): Code Table 4.9 probability type;
                         // thresholds given exactly as (decimal scale,
                         // sign-magnitude scaled value) pairs
                         probType: Int = -1,
                         probNumber: Int = 0,
                         probTotal: Int = 0,
                         probLowerScale: Int = 0, probLowerScaled: Long = 0,
                         probUpperScale: Int = 0, probUpperScaled: Long = 0,
                         // >= 0 emits template 4.6 (or 4.10 with a stat
                         // process): percentile value 0..100
                         percentile: Int = -1,
                         // non-null emits grid template 3.30 (Lambert
                         // conformal, sphere code 6): la1Micro/lo1Micro
                         // are the first grid point; di/djMicro ignored
                         lambert: LambertGrid = null,
                         // non-null emits grid template 3.20 (polar
                         // stereographic, north, sphere code 6)
                         polar: PolarGrid = null,
                         // non-null emits grid template 3.10 (Mercator,
                         // true scale at LaD, orientation 0)
                         mercator: MercatorGrid = null,
                         // non-null emits grid template 3.1 (rotated
                         // lat/lon): la1/lo1/di/dj are then ROTATED
                         // coordinates
                         rotated: RotatedGrid = null) {
    require(Seq(lambert != null, polar != null, mercator != null,
      rotated != null).count(identity) <= 1,
      "a grid is Lambert OR polar OR Mercator OR rotated lat/lon")
    require(Seq(ensMember >= 0, derivedType >= 0, probType >= 0,
      percentile >= 0).count(identity) <= 1,
      "a field is a member (4.1), derived (4.2), probability (4.5) or " +
        "percentile (4.6) product — at most one")
    if (probType >= 0) {
      require(probType <= 4, "probability type must be 0..4 (Code Table 4.9)")
      require(probTotal > 0 && probNumber >= 0 && probNumber <= probTotal &&
        probTotal <= 255, s"probability $probNumber of $probTotal malformed")
      require(math.abs(probLowerScale) <= 127 && math.abs(probUpperScale) <= 127 &&
        math.abs(probLowerScaled) <= 0x7fffffffL && math.abs(probUpperScaled) <= 0x7fffffffL,
        "probability limits out of sign-magnitude range")
    }
    require(percentile <= 100, "percentile must be 0..100")
    if (reducedNi.isEmpty)
      require(scaled.length == ni * nj, "scaled length must be ni*nj")
    else {
      require(gaussianN > 0, "reducedNi needs a Gaussian grid (gaussianN > 0)")
      require(reducedNi.length == nj, s"reducedNi needs one count per row ($nj)")
      reducedNi.foreach(v => require(v >= 2 && 360000000L % v == 0,
        s"reduced row count $v must be >= 2 and divide 360000000 µdeg"))
      // the row list is serialized 2 bytes per count — a wider count
      // would silently truncate modulo 65536 on the wire
      reducedNi.foreach(v => require(v <= 0xffff,
        s"reduced row count $v exceeds the 2-octet list width (65535)"))
      require(ni == reducedNi.max, "ni must equal reducedNi.max")
      require(scaled.length == reducedNi.sum,
        "scaled length must be reducedNi.sum (ragged row-major)")
    }
    require(scanMode == 0x00 || scanMode == 0x40, "scan mode must be 0x00 or 0x40")
    require(template == 0 || template == 2 || template == 3 || template == 40 ||
      template == 41 || template == 42 || template == 140,
      "data representation template must be 5.0, 5.2, 5.3, 5.40, 5.41, 5.42 " +
        "(or the writer-internal 140 = 5.40 with compression type 1, 9/7)")
    require(sdOrder == 1 || sdOrder == 2, "spatial differencing order must be 1 or 2")
    require(groupLen >= 2, "group length must be at least 2")
  }

  /** Template 3.30 grid parameters (microdegrees / millimetres, the
    * wire units): secant latitudes, orientation LoV, LaD, and the grid
    * steps. Scan mode comes from the Field.
    */
  final case class LambertGrid(latin1Micro: Long, latin2Micro: Long,
                               lovMicro: Long, ladMicro: Long,
                               dxMilli: Long, dyMilli: Long)

  /** Template 3.20 grid parameters (microdegrees / millimetres). */
  final case class PolarGrid(lovMicro: Long, ladMicro: Long,
                             dxMilli: Long, dyMilli: Long)

  /** Template 3.10 grid parameters (microdegrees / millimetres). */
  final case class MercatorGrid(ladMicro: Long,
                                diMilli: Long, djMilli: Long)

  /** Template 3.1 rotation parameters: the southern pole of rotation
    * (microdegrees; rotation angle fixed at 0, the COSMO convention).
    */
  final case class RotatedGrid(spLatMicro: Long, spLonMicro: Long)

  /** Serialize fields as one GRIB2 message each and write the
    * concatenation — spec-compliant section framing ready for any GRIB2
    * consumer (wgrib2, eccodes) as well as [[parseMessages]].
    */
  def writeFile(path: Path, fields: Seq[Field]): Path = {
    Files.createDirectories(path.getParent)
    val out = new java.io.ByteArrayOutputStream()
    fields.foreach(f => out.write(encodeMessage(f)))
    Files.write(path, out.toByteArray)
    path
  }

  /** MSB-first bit packer; blocks that must occupy whole octets call
    * [[alignByte]] (zero-padded, per data templates 7.2/7.3).
    */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L; private var nAcc = 0
    def put(v: Long, w: Int): Unit = {
      var t = w - 1
      while (t >= 0) {
        acc = (acc << 1) | ((v >>> t) & 1L)
        nAcc += 1
        if (nAcc == 8) { out.write(acc.toInt & 0xff); acc = 0L; nAcc = 0 }
        t -= 1
      }
    }
    def putSignMag(v: Long, w: Int): Unit = {
      val m = math.abs(v)
      require(m < (1L << (w - 1)), s"sign-magnitude overflow: $v in $w bits")
      put(if (v < 0) m | (1L << (w - 1)) else m, w)
    }
    def alignByte(): Unit =
      if (nAcc > 0) { out.write((acc << (8 - nAcc)).toInt & 0xff); acc = 0L; nAcc = 0 }
    def toBytes: Array[Byte] = { alignByte(); out.toByteArray }
  }

  /** Section-5 + section-7 payloads for complex packing (5.2, and 5.3
    * when `sdOrder` > 0): fixed-length groups of `groupLen` (the last
    * ragged, its TRUE length in section 5), per-group reference = group
    * min and width = bits of the group's spread; scaled group lengths
    * need zero bits by construction. `head` maps the group-reference bit
    * width to the template-common section-5 prefix (octets 6-21).
    */
  private def complexPayloads(head: Int => Array[Byte], vals: Array[Long],
      groupLen: Int, sdOrder: Int, sdOctets: Int,
      ivals: Seq[Long], minsd: Long): (Array[Byte], Array[Byte]) = {
    def bitsFor(v: Long): Int =
      if (v == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v)
    def u32e(v: Long): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val n = vals.length
    val ng = (n + groupLen - 1) / groupLen
    val lens = Array.tabulate(ng)(g => math.min(groupLen, n - g * groupLen))
    val grefs = new Array[Long](ng)
    val widths = new Array[Int](ng)
    var g = 0
    while (g < ng) {
      val s = g * groupLen; val e = s + lens(g)
      var mn = Long.MaxValue; var mx = Long.MinValue
      var k = s
      while (k < e) { val v = vals(k); if (v < mn) mn = v; if (v > mx) mx = v; k += 1 }
      grefs(g) = mn
      widths(g) = bitsFor(mx - mn)
      g += 1
    }
    val nbitsGref = bitsFor(grefs.max)
    val refGW = widths.min
    val nbitsGW = bitsFor((widths.max - refGW).toLong)
    val sec5 = head(nbitsGref) ++
      Array[Byte](1, 0) ++          // general group splitting, no missing mgmt
      u32e(0) ++ u32e(0) ++         // missing-value substitutes (unused)
      u32e(ng) ++
      Array(refGW.toByte, nbitsGW.toByte) ++
      u32e(groupLen) ++ Array[Byte](1) ++ // group-length reference, increment
      u32e(lens(ng - 1)) ++ Array[Byte](0) ++ // true last length; 0 scaled-length bits
      (if (sdOrder > 0) Array(sdOrder.toByte, sdOctets.toByte)
       else Array.empty[Byte])
    val bw = new BitWriter
    if (sdOrder > 0) (ivals :+ minsd).foreach(bw.putSignMag(_, sdOctets * 8))
    if (nbitsGref > 0) { grefs.foreach(bw.put(_, nbitsGref)); bw.alignByte() }
    if (nbitsGW > 0) {
      widths.foreach(w => bw.put((w - refGW).toLong, nbitsGW)); bw.alignByte()
    }
    g = 0
    while (g < ng) {
      val w = widths(g)
      if (w > 0) {
        var k = g * groupLen; val e = k + lens(g)
        while (k < e) { bw.put(vals(k) - grefs(g), w); k += 1 }
      }
      g += 1
    }
    (sec5, bw.toBytes)
  }

  def encodeMessage(f: Field): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()

    def section(num: Int, payload: Array[Byte]): Unit = {
      val len = payload.length + 5
      body.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte, num.toByte))
      body.write(payload)
    }
    def u16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)
    def u32(v: Long): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def sm16(v: Int): Array[Byte] = {
      val m = math.abs(v); require(m <= 0x7fff)
      u16(if (v < 0) m | 0x8000 else m)
    }
    def sm32(v: Long): Array[Byte] = {
      val m = math.abs(v); require(m <= 0x7fffffffL)
      u32(if (v < 0) m | 0x80000000L else m)
    }

    // section 1: identification (centre 255 = missing/test)
    val t = f.time
    section(1, u16(255) ++ u16(255) ++ Array[Byte](2, 1, 1) ++
      u16(t.getYear) ++ Array(t.getMonthValue.toByte, t.getDayOfMonth.toByte,
        t.getHour.toByte, t.getMinute.toByte, t.getSecond.toByte) ++
      Array[Byte](0, 1))

    // section 3: grid definition template 3.0 (regular lat/lon) or 3.40
    // (Gaussian — identical layout, octets 68-71 carry N instead of Dj
    // and the corner latitudes are the outermost Gaussian rows; REDUCED
    // grids set ni/Di/Lo2 missing and append the per-row point list)
    val reduced = f.reducedNi.nonEmpty
    val nPoints = if (reduced) f.reducedNi.map(_.toLong).sum else f.ni.toLong * f.nj
    val gauss = f.gaussianN > 0
    if (f.mercator != null) {
      // template 3.10: earth shape 6, Ni/Nj, La1/Lo1, res flags 0x48,
      // LaD, La2/Lo2 (computed from the forward walk), scan,
      // orientation 0, Di/Dj mm — 72 octets
      require(!gauss && !reduced, "a grid is Mercator OR lat-lon/Gaussian")
      require(f.mercator.diMilli > 0 && f.mercator.djMilli > 0,
        "Mercator grid steps must be positive")
      val (ls, ns) = mercatorCells(f.ni, f.nj, f.la1Micro, f.lo1Micro,
        f.mercator.ladMicro, f.mercator.diMilli, f.mercator.djMilli,
        f.scanMode == 0x40, 6371229.0)
      val la2 = math.round(ls(f.ni * f.nj - 1) * 1e6)
      val lo2 = math.round(ns(f.ni * f.nj - 1) * 1e6)
      section(3, Array[Byte](0) ++ u32(nPoints) ++ Array[Byte](0, 0) ++
        u16(10) ++
        Array[Byte](6) ++ Array[Byte](0) ++ u32(0) ++ Array[Byte](0) ++
        u32(0) ++ Array[Byte](0) ++ u32(0) ++
        u32(f.ni.toLong) ++ u32(f.nj.toLong) ++
        sm32(f.la1Micro) ++ sm32(f.lo1Micro) ++
        Array[Byte](0x48) ++
        sm32(f.mercator.ladMicro) ++ sm32(la2) ++ sm32(lo2) ++
        Array(f.scanMode.toByte) ++ u32(0) ++
        u32(f.mercator.diMilli) ++ u32(f.mercator.djMilli))
    } else if (f.polar != null) {
      // template 3.20: earth shape 6, Nx/Ny, La1/Lo1, res flags 0x48,
      // LaD/LoV, Dx/Dy mm, centre 0 (north), scan — 65 octets
      require(!gauss && !reduced, "a grid is polar OR lat-lon/Gaussian")
      require(f.polar.dxMilli > 0 && f.polar.dyMilli > 0,
        "polar grid steps must be positive")
      section(3, Array[Byte](0) ++ u32(nPoints) ++ Array[Byte](0, 0) ++
        u16(20) ++
        Array[Byte](6) ++ Array[Byte](0) ++ u32(0) ++ Array[Byte](0) ++
        u32(0) ++ Array[Byte](0) ++ u32(0) ++
        u32(f.ni.toLong) ++ u32(f.nj.toLong) ++
        sm32(f.la1Micro) ++ sm32(f.lo1Micro) ++
        Array[Byte](0x48) ++
        sm32(f.polar.ladMicro) ++ sm32(f.polar.lovMicro) ++
        u32(f.polar.dxMilli) ++ u32(f.polar.dyMilli) ++
        Array[Byte](0) ++ Array(f.scanMode.toByte))
    } else if (f.lambert != null) {
      // template 3.30: earth shape 6 (sphere 6371229 m), Nx/Ny,
      // La1/Lo1, res flags 0x48, LaD/LoV, Dx/Dy mm, centre 0, scan,
      // Latin1/Latin2, southern pole missing
      require(!gauss && !reduced, "a grid is Lambert OR lat-lon/Gaussian")
      require(f.lambert.dxMilli > 0 && f.lambert.dyMilli > 0,
        "Lambert grid steps must be positive")
      section(3, Array[Byte](0) ++ u32(nPoints) ++ Array[Byte](0, 0) ++
        u16(30) ++
        Array[Byte](6) ++ Array[Byte](0) ++ u32(0) ++ Array[Byte](0) ++
        u32(0) ++ Array[Byte](0) ++ u32(0) ++
        u32(f.ni.toLong) ++ u32(f.nj.toLong) ++
        sm32(f.la1Micro) ++ sm32(f.lo1Micro) ++
        Array[Byte](0x48) ++
        sm32(f.lambert.ladMicro) ++ sm32(f.lambert.lovMicro) ++
        u32(f.lambert.dxMilli) ++ u32(f.lambert.dyMilli) ++
        Array[Byte](0) ++ Array(f.scanMode.toByte) ++
        sm32(f.lambert.latin1Micro) ++ sm32(f.lambert.latin2Micro) ++
        sm32(-90000000L) ++ u32(0))
    } else {
    if (gauss) require(f.nj == 2 * f.gaussianN,
      s"Gaussian field nj=${f.nj} must equal 2N=${2 * f.gaussianN}")
    val gLats =
      if (!gauss) null
      else {
        val ns = gaussianLatitudesMicro(f.nj)
        if (f.scanMode == 0x40) ns.reverse else ns
      }
    val la1 = if (gauss) gLats(0) else f.la1Micro
    val la2 =
      if (gauss) gLats(f.nj - 1)
      else if (f.scanMode == 0x40) f.la1Micro + (f.nj - 1).toLong * f.djMicro
      else f.la1Micro - (f.nj - 1).toLong * f.djMicro
    val lo2 = f.lo1Micro + (f.ni - 1).toLong * f.diMicro
    val missing = 0xffffffffL
    val rowList: Array[Byte] =
      if (!reduced) Array.emptyByteArray
      else f.reducedNi.flatMap(v => Seq(((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)).toArray
    if (f.rotated != null) require(!gauss && !reduced,
      "a grid is rotated lat/lon OR Gaussian")
    section(3, Array[Byte](0) ++ u32(nPoints) ++
      (if (reduced) Array[Byte](2, 1) else Array[Byte](0, 0)) ++
      u16(if (gauss) 40 else if (f.rotated != null) 1 else 0) ++
      Array[Byte](6) ++ Array[Byte](0) ++ u32(0) ++ Array[Byte](0) ++ u32(0) ++
      Array[Byte](0) ++ u32(0) ++
      u32(if (reduced) missing else f.ni.toLong) ++ u32(f.nj) ++ u32(0) ++ u32(0) ++
      sm32(la1) ++ sm32(f.lo1Micro) ++ Array[Byte](48) ++
      sm32(la2) ++ (if (reduced) u32(missing) else sm32(lo2)) ++
      u32(if (reduced) missing else f.diMicro) ++
      u32(if (gauss) f.gaussianN.toLong else f.djMicro) ++
      Array(f.scanMode.toByte) ++
      (if (f.rotated == null) Array.emptyByteArray
       else sm32(f.rotated.spLatMicro) ++ sm32(f.rotated.spLonMicro) ++
         sm32(0L)) ++ // rotation angle 0 (octets 73-84)
      rowList)
    } // end non-Lambert grids

    // section 4: product definition template 4.0 (analysis, surface), or
    // 4.8 (statistical processing over a time interval) when a stat
    // process is declared — 4.0's octets 10-34 plus end-of-interval stamp,
    // one time-range spec, and the statistical octets
    val pdtCommon =
      Array(f.category.toByte, f.number.toByte, 0.toByte, 255.toByte, 255.toByte) ++
      u16(0) ++ Array[Byte](0, 1) ++ u32(0) ++
      Array[Byte](1, 0) ++ u32(0) ++ Array(255.toByte, 0.toByte) ++ u32(0)
    val ensOctets: Array[Byte] =
      if (f.ensMember >= 0) {
        require(f.ensSize > 0 && f.ensMember <= f.ensSize && f.ensMember <= 255,
          s"ensemble member ${f.ensMember} of ${f.ensSize} malformed")
        // 4.6: type 3 = positively perturbed (any member type decodes)
        Array(3.toByte, f.ensMember.toByte, f.ensSize.toByte)
      } else if (f.derivedType >= 0) {
        require(f.ensSize > 0 && f.derivedType <= 255,
          s"derived type ${f.derivedType} over ${f.ensSize} forecasts malformed")
        Array(f.derivedType.toByte, f.ensSize.toByte)
      } else if (f.probType >= 0) {
        // 4.5 octets 35-47: number/total/type, then the lower and upper
        // limits as 1-octet sign-magnitude scale + 4-octet sign-magnitude
        // scaled value each
        def sm8(v: Int): Byte =
          (if (v < 0) 0x80 | (-v) else v).toByte
        Array(f.probNumber.toByte, f.probTotal.toByte, f.probType.toByte,
          sm8(f.probLowerScale)) ++ sm32(f.probLowerScaled) ++
          Array(sm8(f.probUpperScale)) ++ sm32(f.probUpperScaled)
      } else if (f.percentile >= 0) {
        Array(f.percentile.toByte) // 4.6 octet 35
      } else Array.emptyByteArray
    val pdtNum =
      if (f.ensMember >= 0) { if (f.statProcess >= 0) 11 else 1 }
      else if (f.derivedType >= 0) { if (f.statProcess >= 0) 12 else 2 }
      else if (f.probType >= 0) { if (f.statProcess >= 0) 9 else 5 }
      else if (f.percentile >= 0) { if (f.statProcess >= 0) 10 else 6 }
      else if (f.statProcess >= 0) 8
      else 0
    if (f.statProcess < 0)
      section(4, u16(0) ++ u16(pdtNum) ++ pdtCommon ++ ensOctets)
    else {
      require(f.intervalHours > 0, "4.8/4.11 fields need a positive interval")
      val e = t.plusHours(f.intervalHours.toLong)
      section(4, u16(0) ++ u16(pdtNum) ++ pdtCommon ++ ensOctets ++
        u16(e.getYear) ++ Array(e.getMonthValue.toByte, e.getDayOfMonth.toByte,
          e.getHour.toByte, e.getMinute.toByte, e.getSecond.toByte) ++
        Array[Byte](1) ++            // one time-range specification
        u32(0) ++                    // no missing values in the interval
        Array(f.statProcess.toByte,
          2.toByte,                  // 4.11: successive times, same start
          1.toByte) ++               // 4.4: range unit = hour
        u32(f.intervalHours.toLong) ++
        Array[Byte](1) ++ u32(0))    // increment unit hour, increment 0
    }

    // pack: X = scaled - min(scaled), R = min(scaled), E = 0
    val present = f.scaled.flatten
    require(present.nonEmpty, "all-masked field")
    val minV = present.min
    require(minV.toFloat.toDouble == minV.toDouble,
      s"reference value $minV not exact in binary32 — oracle exactness would break")
    val base = present.map(v => (v - minV).toLong).toArray
    def bitsFor(v: Long): Int =
      if (v == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v)

    // section 5 header shared by all templates (octets 6-21)
    def sec5Head(template: Int, nbits: Int): Array[Byte] =
      u32(present.length) ++ u16(template) ++
        u32(java.lang.Float.floatToIntBits(minV.toFloat).toLong & 0xffffffffL) ++
        sm16(0) ++ sm16(f.decimalScale) ++ Array(nbits.toByte, 1.toByte)

    // build section-5/-7 payloads for the chosen template, then emit in
    // section order (5 · 6 bitmap · 7 data)
    val (sec5Payload, sec7Payload) = f.template match {
      case 0 =>
        val nbits = bitsFor(base.max)
        val bw = new BitWriter
        if (nbits > 0) base.foreach(bw.put(_, nbits))
        (sec5Head(0, nbits), bw.toBytes)
      case 2 =>
        complexPayloads(sec5Head(2, _), base, f.groupLen,
          sdOrder = 0, sdOctets = 0, ivals = Nil, minsd = 0L)
      case 3 =>
        // spatial differencing over the non-negative base integers:
        // initial value(s) kept verbatim, the rest replaced by
        // (difference − overall minimum); the leading `order` slots pack
        // as zeros and are overwritten by the decoder's ivals
        require(base.length > f.sdOrder,
          s"field too small (${base.length} points) for order-${f.sdOrder} spatial differencing")
        val d = base.clone()
        if (f.sdOrder == 1) {
          var k = base.length - 1
          while (k >= 1) { d(k) = base(k) - base(k - 1); k -= 1 }
        } else {
          var k = base.length - 1
          while (k >= 2) { d(k) = base(k) - 2 * base(k - 1) + base(k - 2); k -= 1 }
        }
        val minsd = d.drop(f.sdOrder).min
        val packed = d.clone()
        var k = 0
        while (k < f.sdOrder) { packed(k) = 0L; k += 1 }
        k = f.sdOrder
        while (k < packed.length) { packed(k) = d(k) - minsd; k += 1 }
        // descriptor width: whole octets fitting the largest sign-
        // magnitude value among ival1[, ival2], minsd
        val descMax = (Seq(base(0), minsd) ++
          (if (f.sdOrder == 2) Seq(base(1)) else Nil)).map(math.abs).max
        val sdOctets = math.max(1, (bitsFor(descMax) + 1 + 7) / 8)
        complexPayloads(sec5Head(3, _), packed, f.groupLen,
          sdOrder = f.sdOrder, sdOctets = sdOctets,
          ivals = if (f.sdOrder == 2) Seq(base(0), base(1)) else Seq(base(0)),
          minsd = minsd)
      case 40 =>
        // JPEG2000 packing (NCEP operational): section 7 is a lossless
        // J2K codestream of the non-negative scaled integers. Dense
        // fields only — with a bitmap the image geometry is ambiguous
        // across producers, so it is rejected rather than guessed.
        require(!f.scaled.exists(_.isEmpty),
          "bitmap with template 5.40 out of scope (dense fields only)")
        val nbits = math.max(2, bitsFor(base.max))
        require(nbits <= 16, s"5.40 fields wider than 16 bits out of scope (got $nbits)")
        val j2k = Jpeg2000.encodeLossless(f.ni, f.nj, base.map(_.toInt), nbits)
        // octet 22: compression type 0 = lossless; 23: target ratio missing
        (sec5Head(40, nbits) ++ Array[Byte](0, 255.toByte), j2k)
      case 140 =>
        // writer-internal 140 = template 5.40 with compression TYPE 1
        // (lossy): section 7 is a 9/7-irreversible codestream at Δ=1
        // (no subband quantization — the only loss is coefficient
        // rounding, zero on the all-constant r26 fixtures). Same dense
        // scope as lossless 5.40.
        require(!f.scaled.exists(_.isEmpty),
          "bitmap with template 5.40 out of scope (dense fields only)")
        val nbits = math.max(2, bitsFor(base.max))
        require(nbits <= 16, s"5.40 fields wider than 16 bits out of scope (got $nbits)")
        val j2k = Jpeg2000.encodeLossy97(f.ni, f.nj, base.map(_.toInt), nbits)
        (sec5Head(40, nbits) ++ Array[Byte](1, 255.toByte), j2k)
      case 42 =>
        // CCSDS-AEC packing (template 5.42, ECMWF's operational packing
        // since 2023): section 7 is a CCSDS 121.0-B stream of the
        // non-negative scaled integers over the PRESENT cells — the one
        // compressed representation here that composes with a bitmap.
        // eccodes' parameters: block 32, RSI 128, flags MSB|preprocess.
        val nbits = bitsFor(base.max)
        require(nbits <= 24, s"5.42 fields wider than 24 bits out of scope (got $nbits)")
        val width = if (nbits == 0) 0 else math.max(2, nbits.toInt) // 0 = constant field
        val payload =
          if (width == 0) Array.emptyByteArray
          else Ccsds.encode(base.map(_.toInt), width, 32, 128)
        (sec5Head(42, width) ++
          Array(Ccsds.GribFlags.toByte, 32.toByte) ++ u16(128), payload)
      case 41 =>
        // PNG packing (template 5.41, the other wgrib2/g2clib-standard
        // compressed representation): section 7 is a greyscale PNG of
        // the non-negative scaled integers — the SAME from-scratch PNG
        // codec the multimodal gates exercise (zlib deflate, row
        // filters). Fields up to 8 bits pack as 8-bit greyscale, 9-16
        // bits as 16-bit big-endian greyscale (wgrib2's depth ladder);
        // wider fields reject loudly.
        require(!f.scaled.exists(_.isEmpty),
          "bitmap with template 5.41 out of scope (dense fields only)")
        val nbits = math.max(1, bitsFor(base.max))
        require(nbits <= 16, s"5.41 fields wider than 16 bits out of scope (got $nbits)")
        val png =
          if (nbits <= 8) AssetCodecs.encodePng(f.ni, f.nj,
            (x, y) => base(y * f.ni + x).toInt)
          else AssetCodecs.encodePng16(f.ni, f.nj,
            (x, y) => base(y * f.ni + x).toInt)
        (sec5Head(41, nbits), png)
    }
    section(5, sec5Payload)

    // section 6: bitmap
    val hasMask = f.scaled.exists(_.isEmpty)
    if (!hasMask) section(6, Array(255.toByte))
    else {
      val bits = new Array[Byte]((f.scaled.length + 7) / 8)
      f.scaled.zipWithIndex.foreach { case (v, k) =>
        if (v.isDefined) bits(k >> 3) = (bits(k >> 3) | (0x80 >> (k & 7))).toByte
      }
      section(6, Array(0.toByte) ++ bits)
    }

    section(7, sec7Payload)

    val bodyBytes = body.toByteArray
    val total = 16L + bodyBytes.length + 4
    val head = new java.io.ByteArrayOutputStream()
    head.write("GRIB".getBytes("US-ASCII"))
    head.write(Array[Byte](0, 0)) // reserved
    head.write(f.discipline)
    head.write(2) // edition
    var k = 7
    while (k >= 0) { head.write(((total >>> (8 * k)) & 0xff).toInt); k -= 1 }
    head.write(bodyBytes)
    head.write("7777".getBytes("US-ASCII"))
    head.toByteArray
  }
}
