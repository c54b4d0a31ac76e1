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
  * Scope (= the slice the reference's wgrib2 invocations touch), rejected
  * loudly outside it: grid template 3.0 (regular lat/lon), product
  * template 4.0, data representation template 5.0 (simple packing),
  * bitmap indicator 0/255, scan modes 0x00/0x40, i-fastest. Decode math
  * (template 5.0): `value = (R + X·2^E) / 10^D`.
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
      values: Array[Double])

  /** WMO Code Table 4.2 (discipline, category, number) → wgrib2 short
    * name, for the parameters the reference's datasets touch; anything
    * else keeps a stable synthetic name (wgrib2 prints `var discipline=…`
    * for unknowns — same idea).
    */
  private val paramNames = Map(
    (0, 0, 0) -> "TMP", (0, 1, 1) -> "RH", (0, 1, 7) -> "PRATE",
    (0, 2, 2) -> "UGRD", (0, 2, 3) -> "VGRD",
    (0, 3, 1) -> "PRMSL", (0, 3, 5) -> "HGT", (2, 0, 0) -> "LAND")

  def nameOf(d: Int, c: Int, n: Int): String =
    paramNames.getOrElse((d, c, n), s"var$d-$c-$n")

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
    // section-4/5 state for the current group
    var category = -1; var number = -1
    var nPresent = -1
    var refVal = 0.0; var eScale = 0; var dScale = 0; var nbits = -1
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
            require(template == 0,
              s"grid template 3.$template unsupported (only 3.0 lat/lon) in $label")
            ni = u32(pos + 30).toInt; nj = u32(pos + 34).toInt
            require(ni > 1 && nj > 1, s"degenerate grid ${ni}x$nj in $label")
            la1 = s32(pos + 46); lo1 = s32(pos + 50)
            val la2 = s32(pos + 55); val lo2 = s32(pos + 59)
            di = u32(pos + 63); dj = u32(pos + 67)
            val scan = u(pos + 71)
            require(scan == 0 || scan == 0x40,
              f"scanning mode 0x$scan%02x unsupported (only 0x00 / 0x40) in $label")
            jPositive = scan == 0x40
            val laEnd = if (jPositive) la1 + (nj - 1).toLong * dj
                        else la1 - (nj - 1).toLong * dj
            require(lo1 + (ni - 1).toLong * di == lo2 && laEnd == la2,
              s"grid corners disagree with increments in $label")
          case 4 =>
            require(u16(pos + 7) == 0,
              s"product template 4.${u16(pos + 7)} unsupported (only 4.0) in $label")
            category = u(pos + 9); number = u(pos + 10)
          case 5 =>
            nPresent = u32(pos + 5).toInt
            val template = u16(pos + 9)
            require(template == 0,
              s"data representation template 5.$template unsupported (only 5.0 simple packing) in $label")
            refVal = java.lang.Float.intBitsToFloat(u32(pos + 11).toInt).toDouble
            eScale = s16(pos + 15)
            dScale = s16(pos + 17)
            nbits = u(pos + 19)
          case 6 =>
            val indicator = u(pos + 5)
            indicator match {
              case 255 => bitmap = null
              case 0 =>
                require(ni > 0, s"bitmap section before grid section in $label")
                require(len >= 6 + (ni * nj + 7) / 8,
                  s"BMS length $len too short for ${ni}x$nj grid in $label")
                val bits = Array.ofDim[Boolean](ni * nj)
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
            val expectPresent = if (bitmap == null) ni * nj else bitmap.count(identity)
            require(nPresent == expectPresent,
              s"section-5 point count $nPresent != present cells $expectPresent in $label")
            val twoE = math.pow(2.0, eScale)
            val tenD = math.pow(10.0, dScale)
            val packed = new Array[Double](nPresent)
            if (nbits == 0) java.util.Arrays.fill(packed, refVal / tenD)
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
            val values = new Array[Double](ni * nj)
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
              ni, nj, la1, lo1, di, dj, jPositive, values)
          case other => sys.error(s"unexpected section number $other in $label")
        }
        pos += len
      }
    }
    out.result()
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

  /** Flatten one record to present cells (masked cells dropped). */
  def cells(r: Record): Iterator[GridRow] = {
    val latStep = if (r.scanJPositive) r.djMicro else -r.djMicro
    Iterator.tabulate(r.nj * r.ni) { k =>
      val j = k / r.ni; val i = k % r.ni
      GridRow(r.variable, r.time,
        (r.la1Micro + j * latStep) / 1e6,
        (r.lo1Micro + i.toLong * r.diMicro) / 1e6,
        r.values(k))
    }.filterNot(c => c.value.isNaN)
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
                         scanMode: Int = 0x00) {
    require(scaled.length == ni * nj, "scaled length must be ni*nj")
    require(scanMode == 0x00 || scanMode == 0x40, "scan mode must be 0x00 or 0x40")
  }

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

    // section 3: grid definition template 3.0
    val nPoints = f.ni.toLong * f.nj
    val la2 = if (f.scanMode == 0x40) f.la1Micro + (f.nj - 1).toLong * f.djMicro
              else f.la1Micro - (f.nj - 1).toLong * f.djMicro
    val lo2 = f.lo1Micro + (f.ni - 1).toLong * f.diMicro
    section(3, Array[Byte](0) ++ u32(nPoints) ++ Array[Byte](0, 0) ++ u16(0) ++
      Array[Byte](6) ++ Array[Byte](0) ++ u32(0) ++ Array[Byte](0) ++ u32(0) ++
      Array[Byte](0) ++ u32(0) ++
      u32(f.ni) ++ u32(f.nj) ++ u32(0) ++ u32(0) ++
      sm32(f.la1Micro) ++ sm32(f.lo1Micro) ++ Array[Byte](48) ++
      sm32(la2) ++ sm32(lo2) ++ u32(f.diMicro) ++ u32(f.djMicro) ++
      Array(f.scanMode.toByte))

    // section 4: product definition template 4.0 (analysis, surface)
    section(4, u16(0) ++ u16(0) ++
      Array(f.category.toByte, f.number.toByte, 0.toByte, 255.toByte, 255.toByte) ++
      u16(0) ++ Array[Byte](0, 1) ++ u32(0) ++
      Array[Byte](1, 0) ++ u32(0) ++ Array(255.toByte, 0.toByte) ++ u32(0))

    // pack: X = scaled - min(scaled), R = min(scaled), E = 0
    val present = f.scaled.flatten
    require(present.nonEmpty, "all-masked field")
    val minV = present.min
    val maxX = present.map(_ - minV).max
    val nbits = if (maxX == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(maxX.toLong)
    require(minV.toFloat.toDouble == minV.toDouble,
      s"reference value $minV not exact in binary32 — oracle exactness would break")

    // section 5: data representation template 5.0
    section(5, u32(present.length) ++ u16(0) ++
      u32(java.lang.Float.floatToIntBits(minV.toFloat).toLong & 0xffffffffL) ++
      sm16(0) ++ sm16(f.decimalScale) ++ Array(nbits.toByte, 1.toByte))

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

    // section 7: packed data, MSB-first across byte boundaries
    val dataBits = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nAcc = 0
    present.foreach { v =>
      val x = (v - minV).toLong
      acc = (acc << nbits) | x
      nAcc += nbits
      while (nAcc >= 8) { dataBits.write(((acc >>> (nAcc - 8)) & 0xff).toInt); nAcc -= 8 }
    }
    if (nAcc > 0) dataBits.write(((acc << (8 - nAcc)) & 0xff).toInt)
    section(7, dataBits.toByteArray)

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
