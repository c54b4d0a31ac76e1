package graft.sources

import java.nio.file.{Files, Path}
import java.time.LocalDateTime
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

/** NetCDF classic (CDF-1) byte codec — the OTHER wire format the CDS /
  * ERA5 archive serves beside GRIB (beyond-reference source: the
  * reference shells GRIB through wgrib/cdo and never parses NetCDF
  * natively; at 100 TB the engine must read the archive format itself,
  * not fork a converter per file). Spec-from-scratch implementation of
  * the public Unidata classic file format ("The NetCDF Classic Format
  * Specification", CDF-1 magic `CDF\x01`):
  *
  *  - full header walk: dim_list / gatt_list / var_list tagged sections,
  *    4-byte-padded name strings and attribute values, typed attributes
  *    (CHAR / SHORT / INT / FLOAT / DOUBLE);
  *  - fixed-size data section for coordinate variables, then the RECORD
  *    section: the UNLIMITED `time` dimension interleaves one slab per
  *    record variable per record (`begin_v + r * recsize` addressing,
  *    slab sizes padded to 4);
  *  - CF-flavoured semantics: `_FillValue` cells drop from the scan,
  *    integer payloads carry a `decimal_scale` attribute and present as
  *    `raw / 10^D` — deliberately NOT `raw * scale_factor`, because
  *    multiplying by the unrepresentable double 0.1 is not bit-identical
  *    to dividing by 10 (the exactness discipline of the GRIB gates).
  *
  * All three classic variants decode (round-10: CDS NetCDF downloads are
  * routinely >2 GiB and Float32 — the reference's own value type,
  * src/file-conversions.js:64-65):
  *
  *  - CDF-1 (`CDF\x01`): 32-bit sizes and offsets;
  *  - CDF-2 (`CDF\x02`, 64-bit offset): identical except each variable's
  *    `begin` widens to INT64 — the layout for >2 GiB files;
  *  - CDF-5 (`CDF\x05`): every size/offset field widens to INT64
  *    (numrecs, list counts, name lengths, dim lengths, attribute
  *    counts, vsize, begin).
  *
  * Data payloads: NC_INT (`value = raw / 10^decimal_scale`, exact),
  * NC_SHORT with the CF packing convention (`value = packed *
  * scale_factor + add_offset` — the int16-packed shape CDS/CMIP
  * archives actually ship; fixtures use dyadic scale_factor so the
  * double arithmetic is exact on both engines), NC_FLOAT (`value` =
  * the stored binary32 widened — fixtures store DYADIC values,
  * scaled/4, which binary32 holds exactly), NC_DOUBLE (stored value
  * verbatim). `_FillValue` cells drop in all four (compared in PACKED
  * space for shorts, per CF).
  *
  * Remaining scope rejects stay LOUD: STREAMING numrecs, CHAR data
  * payloads, vsize/begin past the mapped bytes. Encoder and decoder are
  * independent walks of the same spec; NetcdfSpec round-trips all three
  * versions and pins wire offsets by hand; gates r27 (CDF-1 int), r44
  * (CDF-2 float), r45 (CDF-5 double) and r50 (CDF-1 short + CF packing)
  * prove the flatten against closed-form DuckDB oracles (the r12/r14
  * discipline).
  */
object Netcdf {

  private val TagDimension = 0x0A
  private val TagVariable = 0x0B
  private val TagAttribute = 0x0C

  private val NcChar = 2
  val NcShort = 3
  val NcInt = 4
  val NcFloat = 5
  val NcDouble = 6

  val FillInt: Int = -2147483647 // netCDF NC_FILL_INT
  val FillShort: Short = -32767 // NC_FILL_SHORT
  val FillFloat: Float = 9.9692099683868690e+36f // NC_FILL_FLOAT
  val FillDouble: Double = 9.9692099683868690e+36 // NC_FILL_DOUBLE

  /** One field to encode: `value = scaled / 10^decimalScale`, `None` =
    * `_FillValue`-masked cell. All fields of one file share the grid;
    * every (variable, time) pair appears exactly once.
    */
  final case class Field(variable: String, time: LocalDateTime,
                         ni: Int, nj: Int,
                         la1Micro: Long, lo1Micro: Long,
                         diMicro: Long, djMicro: Long,
                         decimalScale: Int,
                         scaled: Array[Option[Int]])

  final case class GridRow(variable: String, time: LocalDateTime,
                           lat: Double, lon: Double, value: Double)

  // ------------------------------------------------------------- write

  /** Write a classic file: `lat`/`lon` as fixed NC_DOUBLE coordinate
    * variables, `time` as the UNLIMITED NC_INT record coordinate (hours
    * since epoch), each distinct field variable as a record variable on
    * (time, lat, lon).
    *
    * `version`: 1 = CDF-1, 2 = CDF-2 (INT64 `begin`s), 5 = CDF-5 (all
    * size/offset fields INT64). `payloadType`:
    *  - [[NcInt]]: raw ints + `decimal_scale` (value = raw / 10^D);
    *  - [[NcFloat]]: stores scaled/4 as binary32 — DYADIC, so exact; the
    *    decode is the stored float widened (Field.decimalScale must be 0,
    *    the scale convention is /4 by construction);
    *  - [[NcDouble]]: stores scaled/10^D as binary64 (one IEEE divide,
    *    bit-identical to the oracle's), decode verbatim.
    */
  def writeFile(path: Path, fields: Seq[Field], version: Int = 1,
                payloadType: Int = NcInt,
                // CHAR label record variables (the station/QC-flag shape
                // real files carry): name -> one string per time step,
                // stored as a (time, strlen) NC_CHAR variable padded
                // with NULs to the longest label
                labels: Seq[(String, Seq[String])] = Nil): Path = {
    require(fields.nonEmpty, "no fields to write")
    require(version == 1 || version == 2 || version == 5,
      s"CDF version $version unsupported (1 / 2 / 5)")
    require(payloadType == NcInt || payloadType == NcFloat ||
      payloadType == NcDouble || payloadType == NcShort,
      s"payload type $payloadType unsupported (NC_SHORT / NC_INT / NC_FLOAT / NC_DOUBLE)")
    val g = fields.head
    fields.foreach { f =>
      require(f.ni == g.ni && f.nj == g.nj && f.la1Micro == g.la1Micro &&
        f.lo1Micro == g.lo1Micro && f.diMicro == g.diMicro &&
        f.djMicro == g.djMicro && f.decimalScale == g.decimalScale,
        "all fields of one netCDF file must share grid and scale")
      require(f.scaled.length == f.ni * f.nj, "scaled length must be ni*nj")
      f.scaled.foreach(_.foreach(v => require(v != FillInt,
        s"scaled value $v collides with _FillValue")))
      if (payloadType == NcFloat) {
        require(f.decimalScale == 0,
          "float payloads use the dyadic /4 convention — decimalScale must be 0")
        f.scaled.foreach(_.foreach(v => require(math.abs(v) < (1 << 22),
          s"scaled value $v too wide for exact binary32 quarters")))
      }
      if (payloadType == NcShort) {
        // the CF packing convention: value = packed * scale_factor +
        // add_offset, with dyadic scale_factor 0.25 and offset 300 so
        // the double arithmetic is exact on both engines
        require(f.decimalScale == 0,
          "short payloads use scale_factor/add_offset — decimalScale must be 0")
        f.scaled.foreach(_.foreach(v => require(v > -32767 && v <= 32767,
          s"scaled value $v outside the NC_SHORT packed range")))
      }
    }
    val times = fields.map(_.time).distinct.sorted(Ordering.fromLessThan[LocalDateTime](_ isBefore _))
    val vars = fields.map(_.variable).distinct
    for (v <- vars; t <- times)
      require(fields.count(f => f.variable == v && f.time == t) == 1,
        s"variable $v must appear exactly once per time step (missing/dup at $t)")

    val out = new ArrayBuffer[Byte]()
    def u8(v: Int): Unit = out += v.toByte
    def u32(v: Int): Unit = { u8(v >>> 24); u8((v >>> 16) & 0xff); u8((v >>> 8) & 0xff); u8(v & 0xff) }
    def u64(v: Long): Unit = for (s <- 56 to 0 by -8) u8(((v >>> s) & 0xff).toInt)
    // size/count fields: INT in CDF-1/2, INT64 in CDF-5
    def sz(v: Long): Unit = if (version == 5) u64(v) else u32(v.toInt)
    def u64d(v: Double): Unit = u64(java.lang.Double.doubleToLongBits(v))
    def f32(v: Float): Unit = u32(java.lang.Float.floatToIntBits(v))
    def name(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      sz(b.length); b.foreach(out += _)
      var p = b.length; while (p % 4 != 0) { u8(0); p += 1 }
    }
    def charAtt(n: String, v: String): Unit = {
      name(n); u32(NcChar)
      val b = v.getBytes("UTF-8")
      sz(b.length); b.foreach(out += _)
      var p = b.length; while (p % 4 != 0) { u8(0); p += 1 }
    }
    def intAtt(n: String, v: Int): Unit = { name(n); u32(NcInt); sz(1); u32(v) }
    def shortAtt(n: String, v: Short): Unit = {
      name(n); u32(NcShort); sz(1)
      u8((v >> 8) & 0xff); u8(v & 0xff); u8(0); u8(0) // padded to 4
    }
    def floatAtt(n: String, v: Float): Unit = { name(n); u32(NcFloat); sz(1); f32(v) }
    def doubleAtt(n: String, v: Double): Unit = { name(n); u32(NcDouble); sz(1); u64d(v) }

    val epochHours = times.map(t => java.time.Duration.between(
      LocalDateTime.of(1970, 1, 1, 0, 0), t).toHours.toInt)

    // --------------- header
    out ++= Array[Byte]('C', 'D', 'F', version.toByte)
    sz(times.length) // numrecs
    labels.foreach { case (n, ls) =>
      require(ls.length == times.length,
        s"label variable $n needs one string per time step")
      require(ls.forall(_.getBytes("UTF-8").nonEmpty), s"empty label in $n")
    }
    val strWidth =
      if (labels.isEmpty) 0
      else labels.flatMap(_._2).map(_.getBytes("UTF-8").length).max
    // dim_list: time (record, length 0), lat, lon [, strlen for labels]
    u32(TagDimension); sz(if (labels.isEmpty) 3 else 4)
    name("time"); sz(0)
    name("lat"); sz(g.nj)
    name("lon"); sz(g.ni)
    if (labels.nonEmpty) { name("strlen"); sz(strWidth) }
    // gatt_list
    u32(TagAttribute); sz(2)
    charAtt("title", "graft gridded analysis")
    charAtt("Conventions", "graft-1")
    // var_list: lat, lon, time, data vars, label vars
    u32(TagVariable); sz(3 + vars.length + labels.length)
    val latSize = 8 * g.nj
    val lonSize = 8 * g.ni
    val width = if (payloadType == NcDouble) 8
      else if (payloadType == NcShort) 2 else 4
    // per-record slab, rounded UP to the classic format's 4-byte
    // boundary (only shorts can leave a 2-byte tail)
    val slab = (width * g.ni * g.nj + 3) / 4 * 4
    // header size must be known to place `begin`s; assemble variable
    // entries into a scratch buffer first is avoided by computing sizes
    // closed-form: measure by writing with placeholder begins, then patch
    val beginW = if (version == 1) 4 else 8
    val beginPatches = ArrayBuffer[Int]() // positions of begin fields
    def varEntry(vname: String, dimids: Seq[Int], atts: () => Unit, nAtts: Int,
                 tpe: Int, vsize: Int): Unit = {
      name(vname); sz(dimids.length); dimids.foreach(u32) // dimids stay INT
      if (nAtts == 0) { u32(0); sz(0) } else { u32(TagAttribute); sz(nAtts); atts() }
      u32(tpe); sz(vsize)
      beginPatches += out.length
      if (beginW == 8) u64(0) else u32(0) // begin, patched below
    }
    varEntry("lat", Seq(1), () => charAtt("units", "degrees_north"), 1, NcDouble, latSize)
    varEntry("lon", Seq(2), () => charAtt("units", "degrees_east"), 1, NcDouble, lonSize)
    varEntry("time", Seq(0),
      () => charAtt("units", "hours since 1970-01-01 00:00:00"), 1, NcInt, 4)
    for (v <- vars) varEntry(v, Seq(0, 1, 2), () => {
      charAtt("units", "K")
      payloadType match {
        case NcInt =>
          intAtt("decimal_scale", g.decimalScale)
          intAtt("_FillValue", FillInt)
        case NcShort =>
          doubleAtt("scale_factor", 0.25)
          doubleAtt("add_offset", 300.0)
          shortAtt("_FillValue", FillShort)
        case NcFloat => floatAtt("_FillValue", FillFloat)
        case NcDouble => doubleAtt("_FillValue", FillDouble)
      }
    }, payloadType match { case NcInt => 3; case NcShort => 4; case _ => 2 },
      payloadType, slab)
    val labelSlab = (strWidth + 3) / 4 * 4
    for ((n, _) <- labels)
      varEntry(n, Seq(0, 3), () => charAtt("long_name", "per-record label"),
        1, NcChar, labelSlab)

    // --------------- patch begins now the header length is known
    val headerLen = out.length
    val latBegin = headerLen
    val lonBegin = latBegin + latSize
    val recBegin = lonBegin + lonSize
    val labelSlab2 = (strWidth + 3) / 4 * 4
    // time slab + data slabs + label slabs
    val recSize = 4 + vars.length * slab + labels.length * labelSlab2
    val begins = Seq(latBegin, lonBegin, recBegin) ++
      vars.indices.map(k => recBegin + 4 + k * slab) ++
      labels.indices.map(k => recBegin + 4 + vars.length * slab + k * labelSlab2)
    beginPatches.zip(begins).foreach { case (pos, b) =>
      val bw = if (beginW == 8) 8 else 4
      for (k <- 0 until bw)
        out(pos + k) = ((b.toLong >>> (8 * (bw - 1 - k))) & 0xff).toByte
    }

    // --------------- data: fixed section, then interleaved records
    for (j <- 0 until g.nj) u64d((g.la1Micro - j * g.djMicro) / 1e6)
    for (i <- 0 until g.ni) u64d((g.lo1Micro + i * g.diMicro) / 1e6)
    val denom = math.pow(10, g.decimalScale)
    for ((t, r) <- times.zipWithIndex) {
      u32(epochHours(r))
      for (v <- vars) {
        val f = fields.find(x => x.variable == v && x.time == t).get
        payloadType match {
          case NcInt => f.scaled.foreach(c => u32(c.getOrElse(FillInt)))
          case NcShort =>
            f.scaled.foreach { c =>
              val s = c.getOrElse(FillShort.toInt)
              u8((s >> 8) & 0xff); u8(s & 0xff)
            }
            var pad = 2 * g.ni * g.nj
            while (pad % 4 != 0) { u8(0); pad += 1 } // slab tail padding
          case NcFloat =>
            f.scaled.foreach(c => f32(c.map(_ / 4.0f).getOrElse(FillFloat)))
          case NcDouble =>
            f.scaled.foreach(c => u64d(c.map(_ / denom).getOrElse(FillDouble)))
        }
      }
      for ((_, ls) <- labels) {
        val lb = ls(r).getBytes("UTF-8")
        lb.foreach(out += _)
        var p = lb.length
        while (p < (strWidth + 3) / 4 * 4) { u8(0); p += 1 } // NUL pad + slab pad
      }
    }
    require(out.length == recBegin + times.length * recSize, "layout accounting broke")
    Files.createDirectories(path.getParent)
    Files.write(path, out.toArray)
    path
  }

  // -------------------------------------------------------------- read

  final case class Dim(name: String, len: Int)
  final case class Var(name: String, dimids: Seq[Int],
                               atts: Map[String, Any], tpe: Int,
                               vsize: Long, begin: Long)

  /** Parsed file: dims, global attributes, variables, raw bytes. */
  final case class NcFile(numrecs: Int, dims: Seq[Dim],
                          gatts: Map[String, Any], vars: Seq[Var],
                          bytes: Array[Byte]) {
    private def i32(p: Int): Int =
      ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
    private def f64(p: Int): Double = {
      var b = 0L
      for (k <- 0 until 8) b = (b << 8) | (bytes(p + k) & 0xffL)
      java.lang.Double.longBitsToDouble(b)
    }
    def doubles(v: Var): Array[Double] = {
      require(v.tpe == NcDouble, s"${v.name}: expected NC_DOUBLE")
      // allocation cap BEFORE Array.tabulate: a crafted vsize/begin must
      // fail loudly here, not as a multi-GB allocation (the PNG/J2K
      // dimension-cap discipline — untrusted bytes size nothing)
      require(v.vsize >= 0 && v.begin >= 0 &&
        v.begin + v.vsize <= bytes.length,
        s"${v.name}: vsize ${v.vsize} @ begin ${v.begin} exceeds the " +
          s"${bytes.length}-byte file")
      Array.tabulate((v.vsize / 8).toInt)(k => f64(v.begin.toInt + 8 * k))
    }
    private def slabBase(v: Var, r: Int, recSize: Long): Long = {
      // Long arithmetic: begin + r*recSize on crafted headers overflows
      // Int into a silently-wrong (or negative) slab base
      val base = v.begin + r.toLong * recSize
      require(v.vsize >= 0 && base >= 0 && base + v.vsize <= bytes.length,
        s"${v.name}: record $r slab [$base, ${base + v.vsize}) exceeds the " +
          s"${bytes.length}-byte file")
      base
    }
    /** Record-variable int slab for record r (CDF record interleaving:
      * `begin + r * recsize`).
      */
    def intRecord(v: Var, r: Int, recSize: Long): Array[Int] = {
      require(v.tpe == NcInt, s"${v.name}: expected NC_INT payload")
      val base = slabBase(v, r, recSize)
      Array.tabulate((v.vsize / 4).toInt)(k => i32(base.toInt + 4 * k))
    }
    /** Record slab as doubles for any supported payload type: NC_INT
      * verbatim ints (the caller applies decimal_scale), NC_FLOAT the
      * binary32 widened, NC_DOUBLE verbatim.
      */
    /** CHAR record slab decoded to its NUL-trimmed string. */
    def charRecord(v: Var, r: Int, recSize: Long): String = {
      require(v.tpe == NcChar, s"${v.name}: expected NC_CHAR payload")
      val base = slabBase(v, r, recSize)
      var n = 0
      while (n < v.vsize && bytes(base.toInt + n) != 0) n += 1
      new String(bytes, base.toInt, n, "UTF-8")
    }
    def numericRecord(v: Var, r: Int, recSize: Long): Array[Double] = {
      val base = slabBase(v, r, recSize)
      v.tpe match {
        case NcInt =>
          Array.tabulate((v.vsize / 4).toInt)(k => i32(base.toInt + 4 * k).toDouble)
        case NcShort => // vsize is 4-padded: the tail short (if any) is pad
          Array.tabulate((v.vsize / 2).toInt) { k =>
            val p = base.toInt + 2 * k
            (((bytes(p) << 8) | (bytes(p + 1) & 0xff)).toShort).toDouble
          }
        case NcFloat =>
          Array.tabulate((v.vsize / 4).toInt)(k =>
            java.lang.Float.intBitsToFloat(i32(base.toInt + 4 * k)).toDouble)
        case NcDouble =>
          Array.tabulate((v.vsize / 8).toInt)(k => f64(base.toInt + 8 * k))
        case t => throw new IllegalArgumentException(
          s"${v.name}: payload type $t out of scope " +
            "(NC_SHORT / NC_INT / NC_FLOAT / NC_DOUBLE)")
      }
    }
  }

  def parse(bytes: Array[Byte], label: String = "<bytes>"): NcFile = {
    var pos = 0
    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def i32(): Int = { val v = ((bytes(pos) & 0xff) << 24) | ((bytes(pos + 1) & 0xff) << 16) |
      ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff); pos += 4; v }
    def i64(): Long = { var v = 0L; for (_ <- 0 until 8) v = (v << 8) | u8(); v }
    require(bytes.length >= 8 && bytes(0) == 'C' && bytes(1) == 'D' && bytes(2) == 'F',
      s"not a NetCDF classic file: $label")
    val version = bytes(3) & 0xff
    require(version == 1 || version == 2 || version == 5,
      s"CDF version $version in $label out of scope — classic CDF-1, " +
        "64-bit-offset CDF-2 and CDF-5 are implemented; HDF5-based " +
        "netCDF-4 is a different container")
    // size/count fields widen to INT64 in CDF-5; `begin` offsets widen
    // to INT64 in CDF-2 AND CDF-5 (that is CDF-2's entire delta)
    def szVal(): Long = if (version == 5) i64() else i32().toLong
    def szInt(): Int = {
      val v = szVal()
      require(v >= 0 && v <= Int.MaxValue, s"size field $v out of range in $label")
      v.toInt
    }
    def beginVal(): Long = if (version == 1) i32().toLong else i64()
    pos = 4
    val numrecs = szVal()
    require(numrecs >= 0 && numrecs <= Int.MaxValue,
      s"STREAMING/oversized numrecs $numrecs in $label out of scope")
    def nameStr(): String = {
      val n = szInt()
      require(n >= 0 && n <= bytes.length - pos,
        s"name length $n exceeds remaining bytes in $label")
      val s = new String(bytes, pos, n, "UTF-8")
      pos += n; while (pos % 4 != 0) pos += 1
      s
    }
    def typedValues(tpe: Int, n: Int): Any = {
      // element count must fit the remaining bytes BEFORE any Array.fill
      // allocates — a crafted count is a loud reject, not an OOM
      val width = tpe match {
        case NcChar => 1L; case NcShort => 2L
        case NcInt | NcFloat => 4L; case NcDouble => 8L; case _ => 1L
      }
      require(n >= 0 && n * width <= (bytes.length - pos).toLong,
        s"attribute payload ($n x $width bytes) exceeds remaining bytes in $label")
      tpe match {
      case NcChar =>
        val s = new String(bytes, pos, n, "UTF-8"); pos += n
        while (pos % 4 != 0) pos += 1
        s
      case NcShort =>
        val a = Array.fill(n) { val v = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff); pos += 2; v.toShort }
        while (pos % 4 != 0) pos += 1
        a.toSeq
      case NcInt => Seq.fill(n)(i32())
      case NcFloat =>
        val a = Seq.fill(n)(java.lang.Float.intBitsToFloat(i32())); a
      case NcDouble =>
        Seq.fill(n) {
          var b = 0L; for (_ <- 0 until 8) b = (b << 8) | u8(); java.lang.Double.longBitsToDouble(b)
        }
      case t => throw new IllegalArgumentException(
        s"attribute type $t in $label out of scope (NC_BYTE attributes unused)")
      }
    }
    def attList(): Map[String, Any] = {
      val tag = i32(); val n = szInt()
      require((tag == TagAttribute && n >= 0 && n <= bytes.length) ||
        (tag == 0 && n == 0), s"bad att_list tag $tag in $label")
      (0 until n).map { _ =>
        val nm = nameStr(); val tpe = i32(); val cnt = szInt()
        val v = typedValues(tpe, cnt)
        nm -> (v match { case s: Seq[_] if s.length == 1 => s.head; case x => x })
      }.toMap
    }
    val dimTag = i32(); val nDims = szInt()
    require((dimTag == TagDimension && nDims >= 0 && nDims <= bytes.length) ||
      (dimTag == 0 && nDims == 0), s"bad dim_list tag $dimTag in $label")
    val dims = (0 until nDims).map(_ => Dim(nameStr(), szInt()))
    val gatts = attList()
    val varTag = i32(); val nVars = szInt()
    require((varTag == TagVariable && nVars >= 0 && nVars <= bytes.length) ||
      (varTag == 0 && nVars == 0), s"bad var_list tag $varTag in $label")
    val vars = (0 until nVars).map { _ =>
      val nm = nameStr()
      val nd = szInt()
      val dimids = Seq.fill(nd)(i32())
      val atts = attList()
      val tpe = i32(); val vsize = szVal(); val begin = beginVal()
      Var(nm, dimids, atts, tpe, vsize, begin)
    }
    NcFile(numrecs.toInt, dims, gatts, vars, bytes)
  }

  /** Flatten every data variable of one file into present-cell rows.
    * `value = raw / 10^decimal_scale`; `_FillValue` cells drop. HDF5
    * containers (netCDF-4) route to [[Hdf5.records]] — one flattened
    * contract across CDF-1/2/5 and the HDF5 classic-model subset.
    */
  def records(bytes: Array[Byte], label: String = "<bytes>",
              keep: String => Boolean = _ => true): Iterator[GridRow] = {
    if (Hdf5.isHdf5(bytes)) return Hdf5.records(bytes, label, keep)
    val nc = parse(bytes, label)
    val recDim = nc.dims.indexWhere(_.len == 0)
    require(recDim >= 0, s"no record dimension in $label")
    val byName = nc.vars.map(v => v.name -> v).toMap
    val lat = nc.doubles(byName("lat"))
    val lon = nc.doubles(byName("lon"))
    val recVars = nc.vars.filter(v => v.dimids.headOption.contains(recDim))
    val recSize = recVars.map(v => (v.vsize + 3) / 4 * 4).sum
    val timeVar = byName("time")
    require(timeVar.dimids == Seq(recDim), s"time must be the record coordinate in $label")
    // `keep` prunes whole variables BEFORE any slab decode — the
    // metadata-walk pushdown the DSv2 connector rides
    val dataVars = recVars.filter(v => v.name != "time" && v.dimids.length == 3 &&
      keep(v.name))
    dataVars.iterator.flatMap { v =>
      val d = (v.atts.getOrElse("decimal_scale", 0): @unchecked) match { case i: Int => i }
      // denom applies to NC_INT payloads only; float/double store the
      // final value directly (the writer pre-divides); shorts use the
      // CF packing convention value = packed * scale_factor + add_offset
      val denom = if (v.tpe == NcInt) math.pow(10, d) else 1.0
      def dblAtt(n: String, dflt: Double): Double = v.atts.get(n) match {
        case Some(x: Double) => x
        case Some(x: Float) => x.toDouble
        case Some(x: Int) => x.toDouble
        case _ => dflt
      }
      val sf = if (v.tpe == NcShort) dblAtt("scale_factor", 1.0) else 1.0
      val ao = if (v.tpe == NcShort) dblAtt("add_offset", 0.0) else 0.0
      val fill: Double = v.atts.get("_FillValue") match {
        case Some(i: Int) => i.toDouble
        case Some(s: Short) => s.toDouble
        case Some(f: Float) => f.toDouble
        case Some(dd: Double) => dd
        case _ => v.tpe match {
          case NcFloat => FillFloat.toDouble
          case NcDouble => FillDouble
          case NcShort => FillShort.toDouble
          case _ => FillInt.toDouble
        }
      }
      (0 until nc.numrecs).iterator.flatMap { r =>
        val epochH = nc.intRecord(timeVar, r, recSize)(0)
        val t = LocalDateTime.of(1970, 1, 1, 0, 0).plusHours(epochH)
        val slab0 = nc.numericRecord(v, r, recSize)
        val nj = lat.length; val ni = lon.length
        // NC_SHORT slabs may carry one trailing pad short (4-alignment)
        require(slab0.length == ni * nj ||
          (v.tpe == NcShort && slab0.length == ni * nj + 1),
          s"${v.name}: slab/grid mismatch in $label")
        val slab = slab0
        Iterator.tabulate(nj * ni) { k =>
          val j = k / ni; val i = k % ni
          if (slab(k) == fill) null
          else GridRow(v.name, t, lat(j), lon(i),
            if (v.tpe == NcShort) slab(k) * sf + ao else slab(k) / denom)
        }.filter(_ != null)
      }
    }
  }

  /** COUNT of present (non-fill) cells across kept data variables in
    * whichever container (classic CDF or HDF5) — the DSv2 COUNT(*)
    * partial: no GridRow materialization, pruned variables' slabs
    * never decoded, fill semantics mirroring [[records]].
    */
  def countPresentCells(bytes: Array[Byte], label: String,
                        keep: String => Boolean): Long = {
    if (Hdf5.isHdf5(bytes)) return Hdf5.countPresentCells(bytes, label, keep)
    val nc = parse(bytes, label)
    val recDim = nc.dims.indexWhere(_.len == 0)
    require(recDim >= 0, s"no record dimension in $label")
    val byName = nc.vars.map(v => v.name -> v).toMap
    val nj = nc.doubles(byName("lat")).length
    val ni = nc.doubles(byName("lon")).length
    val recVars = nc.vars.filter(v => v.dimids.headOption.contains(recDim))
    val recSize = recVars.map(v => (v.vsize + 3) / 4 * 4).sum
    var n = 0L
    recVars.filter(v => v.name != "time" && v.dimids.length == 3 &&
      keep(v.name)).foreach { v =>
      val fill: Double = v.atts.get("_FillValue") match {
        case Some(i: Int) => i.toDouble
        case Some(s: Short) => s.toDouble
        case Some(f: Float) => f.toDouble
        case Some(dd: Double) => dd
        case _ => v.tpe match {
          case NcFloat => FillFloat.toDouble
          case NcDouble => FillDouble
          case NcShort => FillShort.toDouble
          case _ => FillInt.toDouble
        }
      }
      (0 until nc.numrecs).foreach { r =>
        val slab = nc.numericRecord(v, r, recSize)
        // same slab/grid guard as records(): count and row paths must
        // reject malformed files identically, never diverge on them
        require(slab.length == ni * nj ||
          (v.tpe == NcShort && slab.length == ni * nj + 1),
          s"${v.name}: slab/grid mismatch in $label")
        var k = 0
        while (k < nj * ni) { if (slab(k) != fill) n += 1; k += 1 }
      }
    }
    n
  }

  final case class LabelRow(variable: String, time: LocalDateTime, label: String)

  /** Flatten every CHAR record variable (shape (time, strlen)) of one
    * classic file into (variable, time, label) rows — the station-name/
    * QC-flag metadata shape real files carry beside the numeric grid.
    */
  def labelRecords(bytes: Array[Byte], label: String = "<bytes>"): Iterator[LabelRow] = {
    val nc = parse(bytes, label)
    val recDim = nc.dims.indexWhere(_.len == 0)
    require(recDim >= 0, s"no record dimension in $label")
    val recVars = nc.vars.filter(v => v.dimids.headOption.contains(recDim))
    val recSize = recVars.map(v => (v.vsize + 3) / 4 * 4).sum
    val timeVar = nc.vars.find(_.name == "time")
      .getOrElse(throw new IllegalArgumentException(s"no time variable in $label"))
    val charVars = recVars.filter(v => v.tpe == NcChar && v.dimids.length == 2)
    charVars.iterator.flatMap { v =>
      (0 until nc.numrecs).iterator.map { r =>
        val epochH = nc.intRecord(timeVar, r, recSize)(0)
        LabelRow(v.name, LocalDateTime.of(1970, 1, 1, 0, 0).plusHours(epochH),
          nc.charRecord(v, r, recSize))
      }
    }
  }

  /** Distributed scan of CHAR label variables, same shape as
    * [[readRecords]].
    */
  def readLabels(spark: SparkSession, paths: Seq[String],
                 matchRe: String = ".*"): DataFrame = {
    import org.apache.spark.sql.functions.col
    val re = matchRe
    spark.createDataset(
      spark.read.format("binaryFile").load(paths: _*)
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])](Encoders.tuple(Encoders.STRING, Encoders.BINARY))
        .rdd
        .flatMap { case (p, bytes) =>
          val pat = java.util.regex.Pattern.compile(re)
          labelRecords(bytes, p).filter(r => pat.matcher(r.variable).find())
        }
    )(Encoders.product[LabelRow]).toDF()
  }

  /** Distributed scan: one task per file (binaryFile source), records
    * filtered by variable-name regex BEFORE cell flattening. Same shape
    * as [[Grib2.readRecords]]: at archive scale the per-file codec work
    * parallelizes across executors and the regex prunes whole variables
    * ahead of the ni×nj explode.
    */
  def readRecords(spark: SparkSession, paths: Seq[String],
                  matchRe: String = ".*"): DataFrame = {
    import org.apache.spark.sql.functions.col
    val re = matchRe
    spark.createDataset(
      spark.read.format("binaryFile").load(paths: _*)
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])](Encoders.tuple(Encoders.STRING, Encoders.BINARY))
        .rdd
        .flatMap { case (p, bytes) =>
          val pat = java.util.regex.Pattern.compile(re)
          // prune whole variables by name BEFORE any cell flattening,
          // in whichever container this file is
          val varNames =
            if (Hdf5.isHdf5(bytes)) Hdf5.parseDatasets(bytes, p).map(_.name)
            else parse(bytes, p).vars.map(_.name)
          val any = varNames.exists(v => pat.matcher(v).find())
          if (!any) Iterator.empty
          // per-VARIABLE pruning before any slab/chunk decode (not just
          // a row filter after the flatten)
          else records(bytes, p, v => pat.matcher(v).find())
        }
    )(Encoders.product[GridRow]).toDF()
  }
}
