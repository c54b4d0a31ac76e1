package graft.sources

import java.nio.file.{Files, Path}
import java.time.LocalDateTime
import scala.collection.mutable.ArrayBuffer

/** netCDF-4 read path: the classic-model subset of the HDF5 container
  * (public "HDF5 File Format Specification"), spec-from-scratch — CDS
  * delivers netCDF-4 by default for many datasets and CMIP6 archives
  * are overwhelmingly netCDF-4, so this is the highest-frequency
  * real-world format beside GRIB (the reference consumes exactly these
  * CDS downloads through shelled-out converters,
  * src/file-conversions.js; the engine reads the container natively).
  *
  * In scope (what default-configuration libhdf5 — hence the netCDF-4
  * library — actually writes for a (time, lat, lon) gridded product):
  *
  *  - superblock v0 (the netCDF-4 default) plus the v2/v3 prefix
  *    (which points straight at the root object header);
  *  - version-1 object headers with continuation blocks; root group
  *    via symbol table message -> v1 group B-tree -> SNOD symbol nodes
  *    -> local heap names;
  *  - version-2 ("OHDR") object headers — the 1.8-libver-bound shape:
  *    1-byte message types, optional per-message creation order and
  *    timestamps, gap, lookup3 chunk checksum VERIFIED; "OCHK"
  *    continuation blocks (how libhdf5 spills many attributes), each
  *    checksum-verified, cycle-guarded; root group via compact Link
  *    messages (hard links; libhdf5 stays compact below 8 links, and a
  *    gridded product has a handful of variables); dataspace v2 and
  *    attribute-message v3 bodies;
  *  - dataspace v1, datatype classes 0 (fixed-point), 1 (float) and
  *    3 (strings in attributes); fill-value messages skipped;
  *  - data layout v3: contiguous (coordinates) and chunked with the
  *    v1 B-tree chunk index (data variables), edge chunks stored full
  *    size per spec;
  *  - filter pipeline v1: deflate (zlib), shuffle, and fletcher32
  *    (filter 3: trailing LE u32 checksum verified and stripped — the
  *    `nc_def_var_fletcher32` shape), decoded in reverse pipeline
  *    order;
  *  - attribute messages v1 (int/double/string scalars parsed; other
  *    payloads — e.g. netCDF-4's vlen-reference DIMENSION_LIST —
  *    skipped by their declared sizes, never interpreted).
  *
  *  - groups beyond root (v1 symbol-table, v2 compact-link AND dense
  *    fractal-heap link storage — FRHP/FHDB + name-hash v2 B-tree,
  *    every checksum verified), datasets exposed as `group/name`;
  *  - data layout v4 with the FIXED ARRAY chunk index (FAHD/FADB,
  *    lookup3-verified) and the SINGLE CHUNK index (type 1) — the
  *    LIBVER_LATEST shapes h5py emits.
  *
  * Out of scope, rejecting loudly with a pointer: root indirect
  * fractal-heap blocks and deep link B-trees, v4 implicit/extensible-
  * array/v2-B-tree chunk indexes, paged fixed arrays,
  * szip (filter 4), compact layout,
  * datatypes other than int16/int32/float32/float64 data and float64
  * coords (float32 — the CMIP6/ERA5 netCDF-4 default payload — widens
  * exactly to double, fill compared in float space).
  * Semantics mirror [[Netcdf]] exactly: int32 `value = raw /
  * 10^decimal_scale`, int16 the CF packing convention (`value =
  * packed * scale_factor + add_offset`, fill compared in packed
  * space — the shape ERA5 netCDF-4 downloads actually ship), float64
  * stored verbatim (the NC_DOUBLE convention), `_FillValue` cells
  * drop, `time` is epoch-hours — one flattened contract across
  * CDF-1/2/5 and HDF5.
  *
  * Scale shape: identical to the classic reader — one decode task per
  * file via binaryFile, variable regex pruning whole datasets before
  * the cell explode; chunk decode is bounded by the validated chunk
  * dims before any inflate buffer is sized.
  */
object Hdf5 {

  private val Undef = -1L // 0xFFFF...FF: the spec's undefined address
  private val MaxCells = 1 << 26 // per-dataset cell cap (the Zarr cap)

  // ---------------------------------------------------------- model

  sealed trait Layout
  final case class Contiguous(addr: Long, size: Long) extends Layout
  /** `chunkDims` excludes the trailing element-size entry. */
  final case class Chunked(btreeAddr: Long, chunkDims: Seq[Int],
                           elemSize: Int) extends Layout
  /** Layout message v4 (the LIBVER_LATEST shape) with a FIXED ARRAY
    * chunk index ("FAHD"/"FADB") — the index libhdf5 picks for
    * fixed-dimension chunked datasets, which is what h5py emits under
    * `libver='latest'`. `filtered` mirrors the fixed array's client ID.
    */
  final case class ChunkedFixedArray(fahdAddr: Long, chunkDims: Seq[Int],
                                     elemSize: Int) extends Layout
  /** Layout v4 SINGLE CHUNK index (type 1): the dataset fits one
    * chunk, so the layout message itself carries the chunk address
    * (plus stored size + filter mask when filtered) — no index
    * structure at all. `storedSize` < 0 means unfiltered (the chunk
    * is exactly `chunkDims` × element size on disk).
    */
  final case class ChunkedSingle(addr: Long, storedSize: Long,
                                 chunkDims: Seq[Int],
                                 elemSize: Int) extends Layout

  final case class Filter(id: Int, cvals: Seq[Int])

  /** dtype: "i16" | "i32" | "f64" (all this subset needs). */
  final case class Dataset(name: String, dims: Seq[Int], dtype: String,
                           layout: Layout, filters: Seq[Filter],
                           atts: Map[String, Any])

  // ---------------------------------------------------------- write

  /** Write a netCDF-4-shaped HDF5 file from the shared [[Netcdf.Field]]
    * contract: `lat`/`lon` contiguous float64, `time` contiguous int32
    * epoch-hours, each variable a (time, lat, lon) int32 dataset
    * chunked `(1, chunkJ, chunkI)` through shuffle+deflate, with
    * `decimal_scale` / `_FillValue` / `units` attributes. Metadata is
    * little-endian per spec; the encoder is an independent walk of the
    * format (NetcdfSpec pins the wire against it by hand).
    *
    * `superblockVersion`: 0 (the netCDF-4 default) or 3 (the v2/v3
    * prefix shape; the object graph behind it stays v1).
    */
  def writeFile(path: Path, fields: Seq[Netcdf.Field],
                chunkJ: Int, chunkI: Int,
                superblockVersion: Int = 0,
                deflateLevel: Int = 6,
                // NcInt: int32 + decimal_scale (value = raw / 10^D);
                // NcDouble: float64 storing scaled/10^D pre-divided
                // (one IEEE divide, the NC_DOUBLE convention);
                // NcShort: int16 + CF scale_factor 0.25 / add_offset 300
                // (the r50 packing convention, dyadic-exact)
                payloadType: Int = Netcdf.NcInt,
                // true = the nc_def_var_fletcher32 shape: pipeline
                // shuffle -> fletcher32 -> deflate (checksum over the
                // shuffled raw bytes, stored LE after the data)
                fletcher: Boolean = false,
                // 1 = classic v1 headers (the netCDF-4 default);
                // 2 = "OHDR" v2 headers with compact root links,
                // dataspace v2 + attribute v3 bodies and lookup3 chunk
                // checksums — the 1.8-libver-bound shape (requires
                // superblockVersion 3, which is what that bound writes)
                objectHeaderVersion: Int = 1,
                // v2 headers: messages beyond this index move to an
                // "OCHK" continuation block (how libhdf5 spills many
                // attributes); default = everything in chunk 0
                v2ContinuationAfter: Int = Int.MaxValue,
                // 3 = layout message v3 with the v1 B-tree chunk index;
                // 4 = layout v4 with a FIXED ARRAY index (FAHD/FADB) —
                // the LIBVER_LATEST shape libhdf5/h5py emit
                layoutVersion: Int = 3,
                // true (v2 headers only) = groups store links DENSELY:
                // link messages as fractal-heap objects (FRHP + one
                // direct block) indexed by a name-hash v2 B-tree
                // (BTHD/BTLF) — the shape libhdf5 switches to above
                // max_compact links under the 1.8+ libver bound
                denseLinks: Boolean = false): Path = {
    require(objectHeaderVersion == 1 || objectHeaderVersion == 2,
      s"object header version $objectHeaderVersion unsupported (1 / 2)")
    require(layoutVersion == 3 || layoutVersion == 4,
      s"layout version $layoutVersion unsupported (3 / 4)")
    require(objectHeaderVersion == 1 || superblockVersion == 3,
      "v2 object headers pair with the v3 superblock (the 1.8 libver bound)")
    require(!denseLinks || objectHeaderVersion == 2,
      "dense link storage pairs with v2 object headers")
    require(fields.nonEmpty, "no fields to write")
    require(superblockVersion == 0 || superblockVersion == 3,
      s"superblock version $superblockVersion unsupported (0 / 3)")
    require(payloadType == Netcdf.NcInt || payloadType == Netcdf.NcDouble ||
      payloadType == Netcdf.NcShort || payloadType == Netcdf.NcFloat,
      s"payload type $payloadType unsupported (NC_SHORT / NC_INT / NC_FLOAT / NC_DOUBLE)")
    if (payloadType == Netcdf.NcFloat) fields.foreach { f =>
      // the classic writer's dyadic /4 convention (Netcdf.writeFile):
      // scaled/4 is exact in binary32 below 2^22, so decode == oracle
      require(f.decimalScale == 0,
        "float payloads use the dyadic /4 convention — decimalScale must be 0")
      f.scaled.foreach(_.foreach(v => require(math.abs(v) < (1 << 22),
        s"scaled value $v too wide for exact binary32 quarters")))
    }
    if (payloadType == Netcdf.NcShort) fields.foreach { f =>
      require(f.decimalScale == 0,
        "short payloads use scale_factor/add_offset — decimalScale must be 0")
      f.scaled.foreach(_.foreach(v => require(v > -32767 && v <= 32767,
        s"scaled value $v outside the NC_SHORT packed range")))
    }
    val g = fields.head
    fields.foreach { f =>
      require(f.ni == g.ni && f.nj == g.nj && f.la1Micro == g.la1Micro &&
        f.lo1Micro == g.lo1Micro && f.diMicro == g.diMicro &&
        f.djMicro == g.djMicro && f.decimalScale == g.decimalScale,
        "all fields of one file must share grid and scale")
      require(f.scaled.length == f.ni * f.nj, "scaled length must be ni*nj")
      f.scaled.foreach(_.foreach(v => require(v != Netcdf.FillInt,
        s"scaled value $v collides with _FillValue")))
    }
    require(chunkJ >= 1 && chunkI >= 1, "chunk dims must be positive")
    val times = fields.map(_.time).distinct
      .sorted(Ordering.fromLessThan[LocalDateTime](_ isBefore _))
    val vars = fields.map(_.variable).distinct
    for (v <- vars; t <- times)
      require(fields.count(f => f.variable == v && f.time == t) == 1,
        s"variable $v must appear exactly once per time step (missing/dup at $t)")

    val out = new ArrayBuffer[Byte]()
    def u8(v: Int): Unit = out += v.toByte
    def u16(v: Int): Unit = { u8(v & 0xff); u8((v >>> 8) & 0xff) }
    def u32(v: Long): Unit = { var k = 0; while (k < 4) { u8(((v >>> (8 * k)) & 0xff).toInt); k += 1 } }
    def u64(v: Long): Unit = { var k = 0; while (k < 8) { u8(((v >>> (8 * k)) & 0xff).toInt); k += 1 } }
    def patch64(pos: Int, v: Long): Unit = {
      var k = 0; while (k < 8) { out(pos + k) = ((v >>> (8 * k)) & 0xff).toByte; k += 1 }
    }

    // --------------- superblock
    out ++= Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
    var eofPatch = 0
    var rootPatch = 0
    if (superblockVersion == 0) {
      u8(0); u8(0); u8(0); u8(0) // sb ver, free-space ver, root-group ver, reserved
      u8(0); u8(8); u8(8); u8(0) // shared-msg ver, size of offsets, size of lengths, reserved
      u16(4); u16(16) // group leaf k, group internal k
      u32(0) // file consistency flags
      u64(0) // base address
      u64(Undef) // free-space address
      eofPatch = out.length; u64(0) // end-of-file address (patched)
      u64(Undef) // driver info block
      // root group symbol table entry: header address + empty cache
      u64(0) // link name offset
      rootPatch = out.length; u64(0) // object header address (patched)
      u32(0); u32(0) // cache type 0, reserved
      u64(0); u64(0) // scratch
    } else {
      u8(3) // superblock version
      u8(8); u8(8) // size of offsets / lengths
      u8(0) // file consistency flags
      u64(0) // base address
      u64(Undef) // superblock extension
      eofPatch = out.length; u64(0) // end-of-file (patched)
      rootPatch = out.length; u64(0) // root object header (patched)
      u32(0) // checksum (not verified by this subset's reader)
    }

    // --------------- shared message-building helpers
    val dataElemSize = payloadType match {
      case Netcdf.NcShort => 2; case Netcdf.NcDouble => 8; case _ => 4 // int32 / float32
    }
    def pad8(b: ArrayBuffer[Byte]): Unit = while (b.length % 8 != 0) b += 0
    def bb(f: ArrayBuffer[Byte] => Unit): ArrayBuffer[Byte] = {
      val b = new ArrayBuffer[Byte](); f(b); b
    }
    def b8(b: ArrayBuffer[Byte], v: Int): Unit = b += v.toByte
    def b16(b: ArrayBuffer[Byte], v: Int): Unit = { b8(b, v & 0xff); b8(b, (v >>> 8) & 0xff) }
    def b32(b: ArrayBuffer[Byte], v: Long): Unit = {
      var k = 0; while (k < 4) { b8(b, ((v >>> (8 * k)) & 0xff).toInt); k += 1 }
    }
    def b64(b: ArrayBuffer[Byte], v: Long): Unit = {
      var k = 0; while (k < 8) { b8(b, ((v >>> (8 * k)) & 0xff).toInt); k += 1 }
    }
    def dataspaceBody(dims: Seq[Int]): ArrayBuffer[Byte] = bb { b =>
      if (objectHeaderVersion == 2) {
        // v2 dataspace (the 1.8-libver shape): 4-byte header with an
        // explicit type field, no reserved block, no 8-padding
        b8(b, 2); b8(b, dims.length); b8(b, 0)
        b8(b, if (dims.isEmpty) 0 else 1) // scalar / simple
        dims.foreach(d => b64(b, d.toLong))
      } else {
        b8(b, 1); b8(b, dims.length); b8(b, 0) // version 1, rank, flags (no maxdims)
        var k = 0; while (k < 5) { b8(b, 0); k += 1 }
        dims.foreach(d => b64(b, d.toLong))
        pad8(b)
      }
    }
    def dtI32: ArrayBuffer[Byte] = bb { b =>
      b8(b, (1 << 4) | 0) // version 1, class 0 fixed-point
      b8(b, 0x08); b8(b, 0); b8(b, 0) // bit field: LE, signed
      b32(b, 4) // size
      b16(b, 0); b16(b, 32) // bit offset, precision
      pad8(b)
    }
    def dtI16: ArrayBuffer[Byte] = bb { b =>
      b8(b, (1 << 4) | 0) // version 1, class 0 fixed-point
      b8(b, 0x08); b8(b, 0); b8(b, 0) // bit field: LE, signed
      b32(b, 2) // size
      b16(b, 0); b16(b, 16) // bit offset, precision
      pad8(b)
    }
    def dtF64: ArrayBuffer[Byte] = bb { b =>
      b8(b, (1 << 4) | 1) // version 1, class 1 float
      b8(b, 0x20); b8(b, 0x3f); b8(b, 0) // LE, implied mantissa norm, sign bit 63
      b32(b, 8)
      b16(b, 0); b16(b, 64) // bit offset, precision
      b8(b, 52); b8(b, 11); b8(b, 0); b8(b, 52) // exp loc/size, mant loc/size
      b32(b, 1023) // exponent bias
      pad8(b)
    }
    def dtF32: ArrayBuffer[Byte] = bb { b =>
      b8(b, (1 << 4) | 1) // version 1, class 1 float
      b8(b, 0x20); b8(b, 0x1f); b8(b, 0) // LE, implied mantissa norm, sign bit 31
      b32(b, 4)
      b16(b, 0); b16(b, 32) // bit offset, precision
      b8(b, 23); b8(b, 8); b8(b, 0); b8(b, 23) // exp loc/size, mant loc/size
      b32(b, 127) // exponent bias
      pad8(b)
    }
    def dtString(n: Int): ArrayBuffer[Byte] = bb { b =>
      b8(b, (1 << 4) | 3) // version 1, class 3 string
      b8(b, 0); b8(b, 0); b8(b, 0) // null-terminate, ASCII
      b32(b, n.toLong)
      pad8(b)
    }
    def attrMsg(name: String, dt: ArrayBuffer[Byte], ds: ArrayBuffer[Byte],
                data: Array[Byte]): ArrayBuffer[Byte] = bb { b =>
      val nm = name.getBytes("UTF-8") :+ 0.toByte
      if (objectHeaderVersion == 2) {
        // attribute message v3: charset byte, NO 8-padding between parts
        b8(b, 3); b8(b, 0) // version 3, flags (nothing shared)
        b16(b, nm.length); b16(b, dt.length); b16(b, ds.length)
        b8(b, 0) // name charset: ASCII
        b ++= nm
        b ++= dt
        b ++= ds
        data.foreach(b += _)
      } else {
        b8(b, 1); b8(b, 0) // version 1, reserved
        b16(b, nm.length); b16(b, dt.length); b16(b, ds.length)
        b ++= nm; pad8(b)
        b ++= dt // already 8-padded
        b ++= ds
        data.foreach(b += _)
      }
    }
    def intAttr(name: String, v: Int): ArrayBuffer[Byte] =
      attrMsg(name, dtI32, dataspaceBody(Nil),
        Array[Byte]((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
          ((v >>> 16) & 0xff).toByte, (v >>> 24).toByte))
    def dblAttr(name: String, v: Double): ArrayBuffer[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(v)
      attrMsg(name, dtF64, dataspaceBody(Nil),
        Array.tabulate(8)(k => ((bits >>> (8 * k)) & 0xff).toByte))
    }
    def fltAttr(name: String, v: Float): ArrayBuffer[Byte] = {
      val bits = java.lang.Float.floatToIntBits(v)
      attrMsg(name, dtF32, dataspaceBody(Nil),
        Array.tabulate(4)(k => ((bits >>> (8 * k)) & 0xff).toByte))
    }
    def shortAttr(name: String, v: Short): ArrayBuffer[Byte] =
      attrMsg(name, dtI16, dataspaceBody(Nil),
        Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte))
    def strAttr(name: String, v: String): ArrayBuffer[Byte] = {
      val d = v.getBytes("UTF-8")
      attrMsg(name, dtString(d.length), dataspaceBody(Nil), d)
    }

    /** Emit a v1 object header with the given (type, body) messages;
      * returns its address.
      */
    def objectHeader(msgs: Seq[(Int, ArrayBuffer[Byte])]): Long = {
      if (objectHeaderVersion == 2) {
        // "OHDR" v2: u8 message types, no alignment, no times, no
        // creation-order tracking; lookup3 checksum over the whole
        // chunk (signature through the last message). Messages past
        // v2ContinuationAfter spill to an "OCHK" block (written first,
        // so the continuation message knows its address).
        def msgBytes(ms: Seq[(Int, ArrayBuffer[Byte])]): ArrayBuffer[Byte] =
          bb { bl =>
            ms.foreach { case (tpe, body) =>
              b8(bl, tpe); b16(bl, body.length); b8(bl, 0) // type, size, flags
              bl ++= body
            }
          }
        val (head, spill) = msgs.splitAt(math.min(v2ContinuationAfter, msgs.length))
        val contMsg: Seq[(Int, ArrayBuffer[Byte])] =
          if (spill.isEmpty) Nil
          else {
            val blk = bb { b =>
              "OCHK".getBytes("US-ASCII").foreach(b += _)
              b ++= msgBytes(spill)
            }
            val ck = lookup3(blk.toArray, 0, blk.length).toLong & 0xffffffffL
            val cAddr = out.length.toLong
            blk.foreach(out += _)
            u32(ck)
            // wire length INCLUDES signature and checksum
            Seq(0x10 -> bb { b => b64(b, cAddr); b64(b, blk.length + 4L) })
          }
        val hdr = bb { b =>
          val block = msgBytes(head ++ contMsg)
          "OHDR".getBytes("US-ASCII").foreach(b += _)
          b8(b, 2) // version
          b8(b, 2) // flags: chunk-0 size stored as 4 bytes
          b32(b, block.length.toLong)
          b ++= block
        }
        val ck = lookup3(hdr.toArray, 0, hdr.length).toLong & 0xffffffffL
        val addr = out.length.toLong
        hdr.foreach(out += _)
        u32(ck)
        addr
      } else {
        val addr = out.length.toLong
        val block = bb { b =>
          msgs.foreach { case (tpe, body0) =>
            val body = body0.clone(); pad8(body)
            b16(b, tpe); b16(b, body.length); b8(b, 0) // flags
            b8(b, 0); b8(b, 0); b8(b, 0)
            b ++= body
          }
        }
        u8(1); u8(0) // version 1, reserved
        u16(msgs.length)
        u32(1) // object reference count
        u32(block.length.toLong)
        u32(0) // 4-byte pad: messages begin 8-aligned after the 12-byte prefix
        block.foreach(out += _)
        addr
      }
    }

    // --------------- payload helpers
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(deflateLevel)
      d.setInput(raw); d.finish()
      val o = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) o.write(buf, 0, d.deflate(buf))
      d.end()
      o.toByteArray
    }

    // --------------- datasets: data first (addresses), then headers
    val epochHours = times.map(t => java.time.Duration.between(
      LocalDateTime.of(1970, 1, 1, 0, 0), t).toHours.toInt)

    def contiguous(bytes: Array[Byte]): Layout = {
      val addr = out.length.toLong
      bytes.foreach(out += _)
      Contiguous(addr, bytes.length.toLong)
    }
    def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, ((v >>> 16) & 0xff).toByte, (v >>> 24).toByte)
    def le64d(v: Double): Array[Byte] = {
      val b = java.lang.Double.doubleToLongBits(v)
      Array.tabulate(8)(k => ((b >>> (8 * k)) & 0xff).toByte)
    }

    val latLayout = contiguous(Array.tabulate(g.nj)(j =>
      (g.la1Micro - j * g.djMicro) / 1e6).flatMap(le64d))
    val lonLayout = contiguous(Array.tabulate(g.ni)(i =>
      (g.lo1Micro + i * g.diMicro) / 1e6).flatMap(le64d))
    val timeLayout = contiguous(epochHours.toArray.flatMap(le32))

    def chunkedVar(v: String): Layout = {
      val cgJ = (g.nj + chunkJ - 1) / chunkJ
      val cgI = (g.ni + chunkI - 1) / chunkI
      // write chunks, collect (offsets, addr, storedSize)
      val entries = for {
        (t, r) <- times.zipWithIndex
        cj <- 0 until cgJ
        ci <- 0 until cgI
      } yield {
        val f = fields.find(x => x.variable == v && x.time == t).get
        val denom = math.pow(10, g.decimalScale)
        val esz = dataElemSize
        val raw = new Array[Byte](chunkJ * chunkI * esz)
        var p = 0
        for (dj <- 0 until chunkJ; di <- 0 until chunkI) {
          val j = cj * chunkJ + dj; val i = ci * chunkI + di
          // edge chunks are stored FULL SIZE per spec, padded with fill
          val cell = if (j < g.nj && i < g.ni) f.scaled(j * g.ni + i) else None
          val b = payloadType match {
            case Netcdf.NcShort =>
              val s = cell.getOrElse(Netcdf.FillShort.toInt)
              Array[Byte]((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
            case Netcdf.NcDouble =>
              le64d(cell.map(_ / denom).getOrElse(Netcdf.FillDouble))
            case Netcdf.NcFloat =>
              le32(java.lang.Float.floatToIntBits(
                cell.map(_ / 4.0f).getOrElse(Netcdf.FillFloat)))
            case _ => le32(cell.getOrElse(Netcdf.FillInt))
          }
          System.arraycopy(b, 0, raw, p, esz)
          p += esz
        }
        // pipeline order shuffle [-> fletcher32] -> deflate
        val shuffled = BloscLz4.shuffle(raw, esz)
        val staged =
          if (!fletcher) shuffled
          else {
            val c = fletcher32(shuffled, shuffled.length)
            shuffled ++ Array.tabulate(4)(k => ((c >>> (8 * k)) & 0xff).toByte)
          }
        val stored = deflate(staged)
        val addr = out.length.toLong
        stored.foreach(out += _)
        (Seq(r.toLong, (cj * chunkJ).toLong, (ci * chunkI).toLong), addr, stored.length)
      }
      if (layoutVersion == 4 && entries.length == 1) {
        // SINGLE CHUNK index (v4 type 1): the whole dataset is one
        // filtered chunk — its address/size/mask live in the layout
        // message itself, no index structure on disk
        val (_, addr, size) = entries.head
        ChunkedSingle(addr, size.toLong, Seq(1, chunkJ, chunkI), dataElemSize)
      } else if (layoutVersion == 4) {
        // FIXED ARRAY chunk index (the LIBVER_LATEST shape): "FADB"
        // data block holding one element per chunk in LINEAR chunk
        // order (client ID 1 = filtered chunks: address + stored size
        // + filter mask), then the "FAHD" header pointing at it; both
        // carry verified lookup3 checksums. Unpaged (entries must fit
        // one page).
        require(entries.length <= 1024,
          s"chunk count ${entries.length} would page the fixed array (cap 1024)")
        val entrySize = 16 // address 8 + chunk size 4 + filter mask 4
        val fadbAddr = out.length.toLong
        val fadb = bb { b =>
          "FADB".getBytes("US-ASCII").foreach(b += _)
          b8(b, 0) // version
          b8(b, 1) // client ID: filtered dataset chunks
          b64(b, fadbAddr + 4 + 1 + 1 + 8 + entries.length.toLong * entrySize + 4)
          entries.foreach { case (_, addr, size) =>
            b64(b, addr); b32(b, size.toLong); b32(b, 0)
          }
        }
        val fahdAddr = fadbAddr + fadb.length + 4
        val ck1 = lookup3(fadb.toArray, 0, fadb.length).toLong & 0xffffffffL
        fadb.foreach(out += _); u32(ck1)
        val fahd = bb { b =>
          "FAHD".getBytes("US-ASCII").foreach(b += _)
          b8(b, 0) // version
          b8(b, 1) // client ID: filtered dataset chunks
          b8(b, entrySize)
          b8(b, 10) // page bits: <= 1024 entries stay unpaged
          b64(b, entries.length.toLong)
          b64(b, fadbAddr)
        }
        require(out.length.toLong == fahdAddr, "fixed-array accounting broke")
        val ck2 = lookup3(fahd.toArray, 0, fahd.length).toLong & 0xffffffffL
        fahd.foreach(out += _); u32(ck2)
        ChunkedFixedArray(fahdAddr, Seq(1, chunkJ, chunkI), dataElemSize)
      } else {
        // v1 B-tree, node type 1 (raw data chunks), single leaf node;
        // the entry count is a u16 on the wire — a larger chunk grid
        // would silently truncate modulo 65536 into a corrupt file
        require(entries.length <= 0xffff,
          s"chunk count ${entries.length} exceeds the single-leaf u16 bound")
        val btreeAddr = out.length.toLong
        out ++= "TREE".getBytes("US-ASCII")
        u8(1); u8(0) // node type 1, level 0
        u16(entries.length)
        u64(Undef); u64(Undef) // siblings
        def key(size: Int, offs: Seq[Long]): Unit = {
          u32(size.toLong); u32(0) // chunk size, filter mask
          offs.foreach(u64); u64(0) // per-dim offsets + the element-dim 0
        }
        entries.foreach { case (offs, addr, size) => key(size, offs); u64(addr) }
        // final key: one past the last chunk (canonical upper bound)
        key(0, Seq(times.length.toLong, (cgJ * chunkJ).toLong, (cgI * chunkI).toLong))
        Chunked(btreeAddr, Seq(1, chunkJ, chunkI), dataElemSize)
      }
    }

    def layoutMsg(l: Layout): ArrayBuffer[Byte] = bb { b =>
      l match {
        case Contiguous(addr, size) =>
          b8(b, 3); b8(b, 1); b64(b, addr); b64(b, size)
        case Chunked(addr, dims, elem) =>
          b8(b, 3); b8(b, 2); b8(b, dims.length + 1); b64(b, addr)
          dims.foreach(d => b32(b, d.toLong)); b32(b, elem.toLong)
        case ChunkedFixedArray(addr, dims, elem) =>
          b8(b, 4); b8(b, 2) // layout v4, class chunked
          b8(b, 0) // flags: edge chunks filtered (stored full size)
          b8(b, dims.length + 1) // dimensionality incl. the element dim
          b8(b, 8) // dimension-size encoded length
          dims.foreach(d => b64(b, d.toLong)); b64(b, elem.toLong)
          b8(b, 3) // chunk index type: fixed array
          b8(b, 10) // page bits (creation parameter, mirrored in FAHD)
          b64(b, addr)
        case ChunkedSingle(addr, size, dims, elem) =>
          b8(b, 4); b8(b, 2) // layout v4, class chunked
          b8(b, 2) // flags: SINGLE_INDEX_WITH_FILTER
          b8(b, dims.length + 1)
          b8(b, 8)
          dims.foreach(d => b64(b, d.toLong)); b64(b, elem.toLong)
          b8(b, 1) // chunk index type: single chunk
          b64(b, size) // filtered chunk size
          b32(b, 0) // filter mask
          b64(b, addr)
      }
    }
    val fillMsg = bb { b => b8(b, 2); b8(b, 2); b8(b, 2); b8(b, 0) } // v2, undefined
    val pipelineMsg = bb { b =>
      b8(b, 1); b8(b, if (fletcher) 3 else 2) // version 1, filter count
      b16(b, 0); b32(b, 0) // reserved
      // shuffle (2): one client value = element size; v1 pads odd counts
      b16(b, 2); b16(b, 0); b16(b, 0); b16(b, 1); b32(b, dataElemSize.toLong); b32(b, 0)
      // fletcher32 (3): no client values — the nc_def_var_fletcher32
      // position between shuffle and deflate
      if (fletcher) { b16(b, 3); b16(b, 0); b16(b, 0); b16(b, 0) }
      // deflate (1): one client value = level
      b16(b, 1); b16(b, 0); b16(b, 0); b16(b, 1); b32(b, deflateLevel.toLong); b32(b, 0)
    }

    val latAddr = objectHeader(Seq(
      0x0001 -> dataspaceBody(Seq(g.nj)), 0x0003 -> dtF64, 0x0005 -> fillMsg,
      0x0008 -> layoutMsg(latLayout),
      0x000C -> strAttr("units", "degrees_north"),
      // netCDF-4 marks dimension datasets like this; the reader must
      // skip-parse unknown string attributes without interpreting them
      0x000C -> strAttr("CLASS", "DIMENSION_SCALE")))
    val lonAddr = objectHeader(Seq(
      0x0001 -> dataspaceBody(Seq(g.ni)), 0x0003 -> dtF64, 0x0005 -> fillMsg,
      0x0008 -> layoutMsg(lonLayout),
      0x000C -> strAttr("units", "degrees_east")))
    val timeAddr = objectHeader(Seq(
      0x0001 -> dataspaceBody(Seq(times.length)), 0x0003 -> dtI32,
      0x0005 -> fillMsg, 0x0008 -> layoutMsg(timeLayout),
      0x000C -> strAttr("units", "hours since 1970-01-01 00:00:00")))
    val varAddrs = vars.map { v =>
      val l = chunkedVar(v)
      val scaleAtts: Seq[(Int, ArrayBuffer[Byte])] = payloadType match {
        case Netcdf.NcDouble =>
          Seq(0x000C -> dblAttr("_FillValue", Netcdf.FillDouble))
        case Netcdf.NcFloat =>
          Seq(0x000C -> fltAttr("_FillValue", Netcdf.FillFloat))
        case Netcdf.NcShort => Seq(
          0x000C -> dblAttr("scale_factor", 0.25),
          0x000C -> dblAttr("add_offset", 300.0),
          0x000C -> shortAttr("_FillValue", Netcdf.FillShort))
        case _ => Seq(
          0x000C -> intAttr("decimal_scale", g.decimalScale),
          0x000C -> intAttr("_FillValue", Netcdf.FillInt))
      }
      val dt = payloadType match {
        case Netcdf.NcDouble => dtF64
        case Netcdf.NcFloat => dtF32
        case Netcdf.NcShort => dtI16
        case _ => dtI32
      }
      v -> objectHeader(Seq(
        0x0001 -> dataspaceBody(Seq(times.length, g.nj, g.ni)),
        0x0003 -> dt,
        0x0005 -> fillMsg,
        0x0008 -> layoutMsg(l), 0x000B -> pipelineMsg) ++
        scaleAtts :+ (0x000C -> strAttr("units", "K")))
    }

    // --------------- group hierarchy: '/'-separated variable paths
    // become nested subgroups (the netCDF-4 group shape — GOES-R-style
    // products keep data variables inside groups), written bottom-up;
    // coordinates stay at root. Each v1 group carries its OWN local
    // heap + SNOD + B-tree; each v2 group its own compact Link
    // messages.
    def emitV1Group(entries: Seq[(String, Long)]): Long = {
      val names = entries.map(_._1) // already sorted (B-tree order)
      val addrOf = entries.toMap
      val heapData = new ArrayBuffer[Byte]()
      var k = 0; while (k < 8) { heapData += 0; k += 1 } // offset 0 = empty
      val nameOff = names.map { n =>
        val off = heapData.length.toLong
        n.getBytes("UTF-8").foreach(heapData += _)
        heapData += 0
        while (heapData.length % 8 != 0) heapData += 0
        n -> off
      }.toMap
      val heapAddr = out.length.toLong
      out ++= "HEAP".getBytes("US-ASCII")
      u8(0); u8(0); u8(0); u8(0) // version, reserved
      u64(heapData.length.toLong) // data segment size
      u64(heapData.length.toLong) // free list head: none (past the end)
      u64(heapAddr + 32) // data segment address (right after this header)
      heapData.foreach(out += _)

      val snodAddr = out.length.toLong
      out ++= "SNOD".getBytes("US-ASCII")
      u8(1); u8(0) // version, reserved
      u16(names.length)
      names.foreach { n =>
        u64(nameOff(n)); u64(addrOf(n))
        u32(0); u32(0) // cache type 0, reserved
        u64(0); u64(0) // scratch
      }

      val btreeAddr = out.length.toLong
      out ++= "TREE".getBytes("US-ASCII")
      u8(0); u8(0) // node type 0 (group), level 0
      u16(1) // one child
      u64(Undef); u64(Undef)
      u64(0) // key 0: offset of "" (smallest possible name)
      u64(snodAddr)
      u64(nameOff(names.last)) // key 1: the largest name in the child

      objectHeader(Seq(
        0x0011 -> bb { b => b64(b, btreeAddr); b64(b, heapAddr) }))
    }
    def emitV2Group(entries: Seq[(String, Long)]): Long =
      objectHeader(entries.map { case (n, a) =>
        val nb = n.getBytes("UTF-8")
        0x0006 -> bb { b =>
          b8(b, 1) // link message version
          b8(b, 0) // flags: 1-byte name length, hard link, no extras
          b8(b, nb.length)
          nb.foreach(b += _)
          b64(b, a)
        }
      })

    /** DENSE link storage (the above-max_compact libver-1.8+ shape):
      * link message bodies become fractal-heap managed objects in one
      * checksummed root DIRECT block ("FRHP" + "FHDB"), indexed by a
      * name-hash v2 B-tree ("BTHD" + one "BTLF" leaf, record = lookup3
      * name hash + 7-byte managed heap ID); the group's object header
      * carries only a Link Info message (0x0002) pointing at both.
      */
    def emitDenseGroup(entries: Seq[(String, Long)]): Long = {
      val objs = entries.map { case (n, a) =>
        val nb = n.getBytes("UTF-8")
        bb { b =>
          b8(b, 1); b8(b, 0); b8(b, nb.length)
          nb.foreach(b += _)
          b64(b, a)
        }
      }
      // ---- fractal heap: one 512-byte root direct block, flags bit1
      // (checksummed direct blocks), max heap size 32 bits -> 4-byte
      // heap-space offsets, max managed object 4096 -> 2-byte lengths,
      // heap ID = 1 + 4 + 2 = 7 bytes (the dense-link shape)
      val blockSize = 512
      val dblkHdr = 4 + 1 + 8 + 4 + 4 // sig, ver, heap hdr addr, block offset, checksum
      var hoff = dblkHdr
      val heapOffs = objs.map { o => val r = hoff; hoff += o.length; r }
      require(hoff <= blockSize,
        s"dense link block overflow ($hoff > $blockSize bytes — too many links)")
      val fhdbAddr = out.length.toLong
      val frhpAddr = fhdbAddr + blockSize
      val dblk = new Array[Byte](blockSize)
      def put8(p: Int, v: Int): Unit = dblk(p) = v.toByte
      def put64(p: Int, v: Long): Unit = {
        var k = 0; while (k < 8) { dblk(p + k) = ((v >>> (8 * k)) & 0xff).toByte; k += 1 }
      }
      "FHDB".getBytes("US-ASCII").zipWithIndex.foreach { case (c, k) => dblk(k) = c }
      put8(4, 0) // version
      put64(5, frhpAddr)
      // block offset (4 bytes, heap-space offset 0) already zero;
      // checksum field at 17..20 stays zero for the computation
      objs.zip(heapOffs).foreach { case (o, p0) =>
        o.zipWithIndex.foreach { case (c, k) => dblk(p0 + k) = c }
      }
      val dck = lookup3(dblk, 0, blockSize).toLong & 0xffffffffL
      var k1 = 0
      while (k1 < 4) { dblk(17 + k1) = ((dck >>> (8 * k1)) & 0xff).toByte; k1 += 1 }
      dblk.foreach(out += _)

      val frhp = bb { b =>
        "FRHP".getBytes("US-ASCII").foreach(b += _)
        b8(b, 0) // version
        b16(b, 7) // heap ID length
        b16(b, 0) // I/O filters' encoded length
        b8(b, 2) // flags: direct blocks are checksummed
        b32(b, 4096) // max size of managed objects
        b64(b, 0) // next huge object ID
        b64(b, Undef) // huge-object v2 B-tree
        b64(b, (blockSize - hoff).toLong) // free space in managed blocks
        b64(b, Undef) // free-space manager
        b64(b, blockSize.toLong) // amount of managed space
        b64(b, blockSize.toLong) // amount of allocated managed space
        b64(b, blockSize.toLong) // direct block iterator offset
        b64(b, objs.length.toLong) // number of managed objects
        b64(b, 0); b64(b, 0) // huge size / count
        b64(b, 0); b64(b, 0) // tiny size / count
        b16(b, 4) // table width
        b64(b, blockSize.toLong) // starting block size
        b64(b, 65536) // maximum direct block size
        b16(b, 32) // maximum heap size (bits)
        b16(b, 1) // starting # rows in root indirect block
        b64(b, fhdbAddr) // root block address
        b16(b, 0) // current # rows: 0 = root is a direct block
      }
      require(out.length.toLong == frhpAddr, "fractal heap accounting broke")
      val hck = lookup3(frhp.toArray, 0, frhp.length).toLong & 0xffffffffL
      frhp.foreach(out += _); u32(hck)

      // ---- name-index v2 B-tree: records sorted by lookup3 name hash
      val recs = entries.map(_._1).zip(heapOffs).zip(objs).map {
        case ((n, p0), o) =>
          val nb = n.getBytes("UTF-8")
          (lookup3(nb, 0, nb.length).toLong & 0xffffffffL, p0, o.length)
      }.sortBy(_._1)
      require(recs.map(_._1).distinct.length == recs.length,
        "link name hash collision — pick different names for this fixture")
      val btlfAddr = out.length.toLong
      val btlf = bb { b =>
        "BTLF".getBytes("US-ASCII").foreach(b += _)
        b8(b, 0) // version
        b8(b, 5) // type: group links indexed by name hash
        recs.foreach { case (h, p0, len) =>
          b32(b, h)
          b8(b, 0) // heap ID: version 0, type managed
          b32(b, p0.toLong) // heap-space offset (4 bytes)
          b16(b, len) // object length (2 bytes)
        }
      }
      val lck = lookup3(btlf.toArray, 0, btlf.length).toLong & 0xffffffffL
      btlf.foreach(out += _); u32(lck)
      val bthdAddr = out.length.toLong
      val bthd = bb { b =>
        "BTHD".getBytes("US-ASCII").foreach(b += _)
        b8(b, 0) // version
        b8(b, 5) // type
        b32(b, 512) // node size
        b16(b, 11) // record size: hash 4 + heap ID 7
        b16(b, 0) // depth: root is the leaf
        b8(b, 100); b8(b, 40) // split / merge percent
        b64(b, btlfAddr)
        b16(b, recs.length)
        b64(b, recs.length.toLong)
      }
      val bck = lookup3(bthd.toArray, 0, bthd.length).toLong & 0xffffffffL
      bthd.foreach(out += _); u32(bck)

      objectHeader(Seq(0x0002 -> bb { b =>
        b8(b, 0) // link info version
        b8(b, 0) // flags: no creation-order tracking
        b64(b, frhpAddr)
        b64(b, bthdAddr)
      }))
    }

    final class GNode {
      val subs = scala.collection.mutable.SortedMap.empty[String, GNode]
      val leaves = scala.collection.mutable.SortedMap.empty[String, Long]
    }
    val rootNode = new GNode
    def insert(path: String, addr: Long): Unit = {
      val segs = path.split('/')
      require(segs.length >= 1 && segs.forall(_.nonEmpty),
        s"bad variable path '$path'")
      require(segs.length <= 8, s"variable path '$path' nests deeper than 8")
      var n = rootNode
      segs.dropRight(1).foreach(s => n = n.subs.getOrElseUpdate(s, new GNode))
      require(!n.leaves.contains(segs.last), s"duplicate dataset path '$path'")
      n.leaves(segs.last) = addr
    }
    (Seq("lat" -> latAddr, "lon" -> lonAddr, "time" -> timeAddr) ++ varAddrs)
      .foreach { case (p, a) => insert(p, a) }
    def emitGroup(n: GNode): Long = {
      n.subs.keys.foreach(k => require(!n.leaves.contains(k),
        s"'$k' is both a group and a dataset"))
      val entries = (n.subs.toSeq.map { case (k, sub) => k -> emitGroup(sub) } ++
        n.leaves.toSeq).sortBy(_._1)
      if (denseLinks) emitDenseGroup(entries)
      else if (objectHeaderVersion == 2) emitV2Group(entries)
      else emitV1Group(entries)
    }
    val rootAddr = emitGroup(rootNode)

    patch64(rootPatch, rootAddr)
    patch64(eofPatch, out.length.toLong)
    Files.createDirectories(path.getParent)
    Files.write(path, out.toArray)
    path
  }

  // ----------------------------------------------------------- read

  private def fail(label: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"hdf5: $msg in $label")

  /** Bounds-checked 4-byte signature read — a crafted address must
    * reject loudly, never index outside the buffer.
    */
  private def sig4(b: Array[Byte], p: Long, label: String): String = {
    if (p < 0 || p + 4 > b.length)
      fail(label, s"signature read at $p outside ${b.length} bytes")
    new String(b, p.toInt, 4, "US-ASCII")
  }

  def isHdf5(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'H' &&
      bytes(2) == 'D' && bytes(3) == 'F'

  /** Parse the root group's datasets. */
  private[graft] def parseDatasets(b: Array[Byte], label: String): Seq[Dataset] = {
    def u8(p: Long): Int = {
      if (p < 0 || p >= b.length) fail(label, s"read at $p outside ${b.length} bytes")
      b(p.toInt) & 0xff
    }
    def u16(p: Long): Int = u8(p) | (u8(p + 1) << 8)
    def u32(p: Long): Long = u16(p).toLong | (u16(p + 2).toLong << 16)
    def u64(p: Long): Long = u32(p) | (u32(p + 4) << 32)
    if (!isHdf5(b)) fail(label, "bad signature")

    // superblock -> root object header address
    val rootAddr: Long = u8(8) match {
      case 0 | 1 =>
        if (u8(13) != 8 || u8(14) != 8)
          fail(label, s"offset/length sizes ${u8(13)}/${u8(14)} out of scope (8/8)")
        val entryBase = if (u8(8) == 0) 24L else 28L // v1 adds 4 bytes of btree-k
        u64(entryBase + 32 + 8) // base..driver (32) + link name offset (8)
      case 2 | 3 =>
        if (u8(9) != 8 || u8(10) != 8)
          fail(label, s"offset/length sizes ${u8(9)}/${u8(10)} out of scope (8/8)")
        u64(12 + 24) // base + extension + eof, then root object header
      case v => fail(label, s"superblock version $v out of scope (0/1/2/3)")
    }

    /** Walk a v2 ("OHDR") object header's messages — the shape libhdf5
      * writes under the 1.8 libver bound: 1-byte message types,
      * optional per-message creation order, gap, and a lookup3 checksum
      * over the whole chunk (VERIFIED — a corrupt prefix rejects, never
      * tears), plus "OCHK" continuation blocks (each checksum-verified,
      * cycle-guarded). Attribute-storage phase-change values reject.
      */
    def messagesV2(addr: Long): Seq[(Int, Long, Int)] = {
      if (u8(addr + 4) != 2)
        fail(label, s"OHDR version ${u8(addr + 4)} out of scope (2)")
      val hflags = u8(addr + 5)
      if ((hflags & 0x10) != 0)
        fail(label, "attribute-storage phase-change values out of scope")
      var p = addr + 6
      if ((hflags & 0x20) != 0) p += 16 // access/mod/change/birth times
      val szW = 1 << (hflags & 0x3)
      val chunk0 = szW match {
        case 1 => u8(p).toLong; case 2 => u16(p).toLong
        case 4 => u32(p); case _ => u64(p)
      }
      p += szW
      if (chunk0 < 0 || chunk0 > (1 << 20)) fail(label, s"implausible chunk-0 size $chunk0")
      val end = p + chunk0
      if (end + 4 > b.length) fail(label, "OHDR chunk outside the file")
      // checksum covers signature through gap (everything but itself)
      val stored = (u8(end) | (u8(end + 1) << 8) | (u8(end + 2) << 16) |
        (u8(end + 3) << 24)) & 0xffffffffL
      val computed = lookup3(b, addr.toInt, (end - addr).toInt) & 0xffffffffL
      if (stored != computed)
        fail(label, f"OHDR checksum mismatch (stored 0x$stored%08x, computed 0x$computed%08x)")
      val hdrSize = if ((hflags & 0x04) != 0) 6 else 4 // + creation order
      val out = ArrayBuffer.empty[(Int, Long, Int)]
      // continuation blocks ("OCHK": signature + messages + lookup3
      // checksum, the length on the wire INCLUDING both) — walked with
      // the v1 discipline: visited-set + cap, loud on a cycle
      val pending = scala.collection.mutable.Queue.empty[(Long, Long)]
      val seen = scala.collection.mutable.Set.empty[Long]
      def scanMessages(start: Long, stop: Long): Unit = {
        var q = start
        while (q + hdrSize <= stop) { // trailing bytes < hdrSize = the gap
          val tpe = u8(q)
          val size = u16(q + 1)
          val mflags = u8(q + 3)
          if ((mflags & 0x02) != 0) fail(label, s"shared message (type $tpe) out of scope")
          if (q + hdrSize + size > stop) fail(label, "message overruns its OHDR chunk")
          if (tpe == 0x10) {
            if (size < 16) fail(label, "OHDR continuation message too small")
            pending.enqueue((u64(q + hdrSize), u64(q + hdrSize + 8)))
          } else if (tpe != 0) out += ((tpe, q + hdrSize, size))
          q += hdrSize + size
        }
      }
      scanMessages(p, end)
      while (pending.nonEmpty) {
        val (off, len) = pending.dequeue()
        if (!seen.add(off))
          fail(label, s"OCHK continuation cycles back to block $off")
        if (seen.size > 64) fail(label, "implausible OCHK block count")
        if (len < 8 || off < 0 || off > b.length || len > b.length - off)
          fail(label, s"OCHK block [$off,+$len) outside the file")
        if (sig4(b, off, label) != "OCHK")
          fail(label, "OCHK signature missing on a continuation block")
        val blockEnd = off + len - 4 // the trailing lookup3 checksum
        val stored2 = (u8(blockEnd) | (u8(blockEnd + 1) << 8) |
          (u8(blockEnd + 2) << 16) | (u8(blockEnd + 3) << 24)) & 0xffffffffL
        val computed2 = lookup3(b, off.toInt, (blockEnd - off).toInt) & 0xffffffffL
        if (stored2 != computed2)
          fail(label, f"OCHK checksum mismatch (stored 0x$stored2%08x, " +
            f"computed 0x$computed2%08x)")
        scanMessages(off + 4, blockEnd)
      }
      out.toSeq
    }

    /** Walk a v1 object header's messages (with continuations). */
    def messages(addr: Long): Seq[(Int, Long, Int)] = {
      if (sig4(b, addr, label) == "OHDR") return messagesV2(addr)
      if (u8(addr) != 1) fail(label, s"object header version ${u8(addr)} out of scope")
      val nmsgs = u16(addr + 2)
      if (nmsgs > 4096) fail(label, s"implausible message count $nmsgs")
      val out = ArrayBuffer.empty[(Int, Long, Int)]
      // blocks of message bytes: the prefix block, then continuations.
      // A crafted continuation can point back at its own block —
      // continuation messages don't count toward nmsgs, so without a
      // visited set the walk would spin forever instead of rejecting.
      var blocks = List((addr + 16, u32(addr + 8)))
      val seen = scala.collection.mutable.Set.empty[Long]
      while (blocks.nonEmpty && out.length < nmsgs) {
        val (start, len) = blocks.head
        blocks = blocks.tail
        if (!seen.add(start))
          fail(label, s"header continuation cycles back to block $start")
        if (seen.size > 64) fail(label, "implausible header block count")
        var p = start
        val end = start + len
        if (end > b.length) fail(label, s"header block [$start,$end) outside file")
        while (p + 8 <= end && out.length < nmsgs) {
          val tpe = u16(p)
          val size = u16(p + 2)
          val flags = u8(p + 4)
          if ((flags & 0x02) != 0) fail(label, s"shared message (type $tpe) out of scope")
          if (p + 8 + size > end) fail(label, s"message overruns its header block")
          if (tpe == 0x0010) { // continuation: offset + length
            blocks = (u64(p + 8), u64(p + 16)) :: blocks
          } else if (tpe != 0) out += ((tpe, p + 8, size))
          p += 8 + size
        }
      }
      out.toSeq
    }

    def parseDataspace(p: Long): Seq[Int] = {
      val ver = u8(p)
      // v1: the classic-libver shape (8-byte header incl. reserved);
      // v2: the 1.8-libver shape (4-byte header with a type field)
      if (ver != 1 && ver != 2) fail(label, s"dataspace version $ver out of scope (1/2)")
      val rank = u8(p + 1)
      if (rank > 4) fail(label, s"rank-$rank dataspace out of scope")
      if (ver == 2 && u8(p + 3) > 1)
        fail(label, s"dataspace type ${u8(p + 3)} out of scope (scalar/simple)")
      val dims0 = if (ver == 1) p + 8 else p + 4
      Seq.tabulate(rank) { k =>
        val d = u64(dims0 + 8L * k)
        if (d < 0 || d > Int.MaxValue) fail(label, s"dimension $d out of range")
        d.toInt
      }
    }
    def parseDatatype(p: Long): String = {
      val cls = u8(p) & 0x0f
      val size = u32(p + 4)
      (cls, size) match {
        case (0, 4) | (0, 2) =>
          if ((u8(p + 1) & 0x01) != 0) fail(label, "big-endian int data out of scope")
          if ((u8(p + 1) & 0x08) == 0) fail(label, "unsigned int data out of scope")
          if (size == 4) "i32" else "i16" // i16 = the CF-packed CDS shape
        case (1, 8) | (1, 4) =>
          if ((u8(p + 1) & 0x01) != 0) fail(label, "big-endian float data out of scope")
          if (size == 8) "f64" else "f32" // f32 = the CMIP6/ERA5 netCDF-4 default
        case (3, _) => "str"
        case (c, s) => fail(label,
          s"datatype class $c size $s out of scope (int16/int32/float32/float64 " +
            "data, float64 coords)")
      }
    }
    def parseLayout(p: Long): Layout = {
      val ver = u8(p)
      if (ver != 3 && ver != 4)
        fail(label, s"layout message version $ver out of scope (3 / 4)")
      (ver, u8(p + 1)) match {
        case (3, 1) => Contiguous(u64(p + 2), u64(p + 10))
        case (3, 2) =>
          val nd = u8(p + 2) // rank + 1 (element dimension)
          if (nd < 2 || nd > 5) fail(label, s"chunk dimensionality $nd out of scope")
          val addr = u64(p + 3)
          val dims = Seq.tabulate(nd - 1)(k => u32(p + 11 + 4L * k))
          val elem = u32(p + 11 + 4L * (nd - 1))
          dims.foreach(d => if (d < 1 || d > Int.MaxValue) fail(label, s"chunk dim $d out of range"))
          if (dims.map(BigInt(_)).product > MaxCells)
            fail(label, s"chunk cell count ${dims.product} exceeds the 2^26 cap")
          Chunked(addr, dims.map(_.toInt), elem.toInt)
        case (4, 1) => Contiguous(u64(p + 2), u64(p + 10))
        case (4, 2) =>
          // v4 chunked (the LIBVER_LATEST shape): flags, dimensionality
          // incl. the element dim, per-dim encoded length, then the
          // chunk index type + its creation info + index address
          val flags = u8(p + 2)
          if ((flags & ~0x3) != 0) fail(label, s"layout v4 flags $flags out of scope")
          val nd = u8(p + 3)
          if (nd < 2 || nd > 5) fail(label, s"chunk dimensionality $nd out of scope")
          val encLen = u8(p + 4)
          if (encLen != 1 && encLen != 2 && encLen != 4 && encLen != 8)
            fail(label, s"dimension-size encoded length $encLen out of scope")
          def dimAt(k: Int): Long = encLen match {
            case 1 => u8(p + 5 + encLen.toLong * k).toLong
            case 2 => u16(p + 5 + encLen.toLong * k).toLong
            case 4 => u32(p + 5 + encLen.toLong * k)
            case _ => u64(p + 5 + encLen.toLong * k)
          }
          val dims = Seq.tabulate(nd - 1)(dimAt)
          val elem = dimAt(nd - 1)
          dims.foreach(d => if (d < 1 || d > Int.MaxValue) fail(label, s"chunk dim $d out of range"))
          if (dims.map(BigInt(_)).product > MaxCells)
            fail(label, s"chunk cell count ${dims.product} exceeds the 2^26 cap")
          val q = p + 5 + encLen.toLong * nd
          u8(q) match {
            case 3 => // fixed array: page bits (creation info) + address
              ChunkedFixedArray(u64(q + 2), dims.map(_.toInt), elem.toInt)
            case 1 => // single chunk: the layout message IS the index
              if ((flags & 0x02) != 0) { // SINGLE_INDEX_WITH_FILTER
                val size = u64(q + 1)
                if (u32(q + 9) != 0)
                  fail(label, "per-chunk filter masks out of scope")
                ChunkedSingle(u64(q + 13), size, dims.map(_.toInt), elem.toInt)
              } else
                ChunkedSingle(u64(q + 1), -1L, dims.map(_.toInt), elem.toInt)
            case 2 => fail(label, "v4 implicit chunk index out of scope (single chunk / fixed array)")
            case 4 => fail(label, "v4 extensible-array chunk index out of scope (single chunk / fixed array)")
            case 5 => fail(label, "v4 v2-B-tree chunk index out of scope (single chunk / fixed array)")
            case t => fail(label, s"v4 chunk index type $t out of scope")
          }
        case (_, 0) => fail(label, "compact layout out of scope (contiguous / chunked)")
        case (_, c) => fail(label, s"layout class $c out of scope")
      }
    }
    def parseFilters(p: Long): Seq[Filter] = {
      if (u8(p) != 1) fail(label, s"filter pipeline version ${u8(p)} out of scope (1)")
      val n = u8(p + 1)
      if (n > 8) fail(label, s"implausible filter count $n")
      var q = p + 8
      Seq.fill(n) {
        val id = u16(q); val nameLen = u16(q + 2); val nvals = u16(q + 6)
        q += 8 + ((nameLen + 7) / 8 * 8)
        val vals = Seq.tabulate(nvals)(k => u32(q + 4L * k).toInt)
        q += 4L * nvals
        if (nvals % 2 == 1) q += 4 // v1 pads odd client-value counts
        id match {
          case 1 | 2 | 3 => Filter(id, vals) // deflate, shuffle, fletcher32
          case 4 => fail(label, "szip filter out of scope (deflate/shuffle/fletcher32)")
          case other => fail(label,
            s"filter $other out of scope (deflate/shuffle/fletcher32)")
        }
      }
    }
    def parseAttr(p: Long, size: Int): (String, Any) = {
      val ver = u8(p)
      // v1 pads name/datatype/dataspace to 8 bytes; v3 (the v2-OHDR
      // companion) drops the padding and adds a name-charset byte
      if (ver != 1 && ver != 3)
        fail(label, s"attribute message version $ver out of scope (1/3)")
      if (ver == 3 && (u8(p + 1) & 0x03) != 0)
        fail(label, "shared attribute datatype/dataspace out of scope")
      val nameSize = u16(p + 2); val dtSize = u16(p + 4); val dsSize = u16(p + 6)
      // header is 8 bytes for v1, 9 for v3 (name-charset byte); every
      // section is bounded against the DECLARED message size so a
      // crafted attribute can never read past its message
      val msgEnd = p + size
      var q = p + (if (ver == 1) 8 else 9)
      if (q + nameSize > msgEnd) fail(label, "attribute name overruns its message")
      var nameLen = 0
      while (nameLen < nameSize && u8(q + nameLen) != 0) nameLen += 1
      val name = new String(b, q.toInt, nameLen, "UTF-8")
      def pad(v: Int): Long = if (ver == 1) (v + 7) / 8 * 8 else v.toLong
      q += pad(nameSize)
      val dtP = q
      if (dtP + dtSize > msgEnd)
        fail(label, s"attribute '$name' datatype overruns its message")
      q += pad(dtSize)
      val dsP = q
      if (dsP + dsSize > msgEnd)
        fail(label, s"attribute '$name' dataspace overruns its message")
      q += pad(dsSize)
      if (q > msgEnd) fail(label, s"attribute '$name' data begins past its message")
      val npoints = {
        val dsVer = u8(dsP)
        val rank = u8(dsP + 1)
        val dims0 = if (dsVer == 2) dsP + 4 else dsP + 8
        var n = 1L
        var k = 0; while (k < rank) { n *= u64(dims0 + 8L * k); k += 1 }
        n
      }
      val cls = u8(dtP) & 0x0f
      val esz = u32(dtP + 4)
      val value: Any =
        if (cls == 0 && esz == 4 && npoints == 1) u32(q).toInt
        else if (cls == 0 && esz == 2 && npoints == 1) u16(q).toShort
        else if (cls == 1 && esz == 8 && npoints == 1)
          java.lang.Double.longBitsToDouble(u64(q))
        else if (cls == 1 && esz == 4 && npoints == 1)
          java.lang.Float.intBitsToFloat(u32(q).toInt)
        else if (cls == 3 && npoints == 1 && esz <= 4096) {
          var n = 0
          while (n < esz && u8(q + n) != 0) n += 1
          new String(b, q.toInt, n, "UTF-8")
        } else () // vlen DIMENSION_LIST etc.: skipped, never interpreted
      name -> value
    }

    /** Parse one compact Link message (type 0x06): hard links only —
      * the root-group storage v2-OHDR files use below the compact/dense
      * threshold (libhdf5 default max_compact = 8; a gridded product
      * has a handful of variables, so this IS the real shape).
      */
    def parseLinkMsg(p0: Long): (String, Long) = {
      if (u8(p0) != 1) fail(label, s"link message version ${u8(p0)} out of scope (1)")
      val lf = u8(p0 + 1)
      var q = p0 + 2
      if ((lf & 0x08) != 0) {
        val lt = u8(q); q += 1
        if (lt != 0) fail(label, s"link type $lt out of scope (hard links)")
      }
      if ((lf & 0x04) != 0) q += 8 // creation order
      if ((lf & 0x10) != 0) q += 1 // charset
      val w = 1 << (lf & 0x3)
      val nameLen = w match {
        case 1 => u8(q).toLong; case 2 => u16(q).toLong
        case 4 => u32(q); case _ => u64(q)
      }
      q += w
      if (nameLen < 0 || nameLen > 4096) fail(label, s"implausible link name length $nameLen")
      if (q + nameLen + 8 > b.length) fail(label, "link message outside the file")
      val name = new String(b, q.toInt, nameLen.toInt, "UTF-8")
      name -> u64(q + nameLen)
    }

    /** One named object header -> Dataset. `msgs` is the already-walked
      * message list (the group walk classified the child from it).
      */
    def datasetOf(name: String, msgs: Seq[(Int, Long, Int)]): Dataset = {
      def one(tpe: Int, what: String): Long =
        msgs.find(_._1 == tpe).getOrElse(
          fail(label, s"dataset '$name' has no $what message"))._2
      val dims = parseDataspace(one(0x0001, "dataspace"))
      val dtype = parseDatatype(one(0x0003, "datatype"))
      if (dtype == "str") fail(label, s"string dataset '$name' out of scope")
      if (dims.map(BigInt(_)).product > MaxCells)
        fail(label, s"dataset '$name' cell count exceeds the 2^26 cap")
      val layout = parseLayout(one(0x0008, "layout"))
      val filters = msgs.find(_._1 == 0x000B)
        .map(m => parseFilters(m._2)).getOrElse(Nil)
      val atts = msgs.filter(_._1 == 0x000C)
        .map(m => parseAttr(m._2, m._3)).toMap
      Dataset(name, dims, dtype, layout, filters, atts)
    }

    /** Entries of one old-style group B-tree node (TREE -> SNOD), names
      * resolved through THAT group's local heap.
      */
    def groupEntries(node: Long, depth: Int,
                     heapName: Long => String): Seq[(String, Long)] = {
      // depth cap mirrors the chunk B-tree walk: a crafted child
      // pointer cycling back must reject loudly, not StackOverflow
      if (depth > 16) fail(label, "group B-tree too deep")
      if (sig4(b, node, label) == "SNOD") {
        val n = u16(node + 6)
        Seq.tabulate(n) { k =>
          val e = node + 8 + 40L * k
          heapName(u64(e)) -> u64(e + 8)
        }
      } else if (sig4(b, node, label) == "TREE") {
        if (u8(node + 4) != 0) fail(label, "chunk B-tree where a group tree belongs")
        val n = u16(node + 6)
        // keys and children alternate: key0 child0 key1 child1 ... keyN
        (0 until n).flatMap(k =>
          groupEntries(u64(node + 24 + 8 + 16L * k), depth + 1, heapName))
      } else fail(label, "group node signature missing (TREE/SNOD)")
    }

    /** Link Info message (0x0002, the v2-group companion): when its
      * fractal heap address is defined the group stores links DENSELY.
      */
    def denseLinkStorage(p: Long): Boolean = {
      if (u8(p) != 0) fail(label, s"link info version ${u8(p)} out of scope (0)")
      val flags = u8(p + 1)
      var q = p + 2
      if ((flags & 0x01) != 0) q += 8 // max creation index
      u64(q) != Undef // fractal heap address
    }

    // Recursive group walk — v1 symbol-table groups (TREE/SNOD + local
    // heap) and v2 compact-link groups, datasets exposed under
    // '/'-joined `group/name` paths: the netCDF-4 group shape real
    // satellite products ship (GOES-R L1b/L2, group-scoped CMIP6
    // metadata; the reference's pipelines convert exactly these CDS/
    // satellite downloads). Hard-link cycles and double-linked groups
    // reject loudly via the visited set; nesting caps at depth 8.
    val visitedGroups = scala.collection.mutable.Set.empty[Long]
    def walkGroup(addr: Long, prefix: String, depth: Int): Seq[Dataset] = {
      if (depth > 8) fail(label, "group nesting deeper than 8 out of scope")
      if (!visitedGroups.add(addr))
        fail(label, s"group at $addr linked more than once (cycle / double link)")
      val msgs = messages(addr)
      val links = msgs.filter(_._1 == 0x0006)
      val entries: Seq[(String, Long)] =
        if (msgs.exists(_._1 == 0x0011)) {
          val stab = msgs.find(_._1 == 0x0011).get._2
          val btreeAddr = u64(stab)
          val heapAddr = u64(stab + 8)
          if (sig4(b, heapAddr, label) != "HEAP")
            fail(label, "local heap signature missing")
          val heapSeg = u64(heapAddr + 24)
          val heapSize = u64(heapAddr + 8)
          def heapName(off: Long): String = {
            if (off < 0 || off >= heapSize)
              fail(label, s"heap offset $off outside segment")
            var n = 0
            while (u8(heapSeg + off + n) != 0) n += 1
            new String(b, (heapSeg + off).toInt, n, "UTF-8")
          }
          groupEntries(btreeAddr, 0, heapName)
        } else if (msgs.exists(_._1 == 0x0002) && denseLinkStorage(
            msgs.find(_._1 == 0x0002).get._2)) {
          denseGroupEntries(msgs.find(_._1 == 0x0002).get._2)
        } else if (links.nonEmpty) {
          links.map(m => parseLinkMsg(m._2)).sortBy(_._1)
        } else if (msgs.exists(m => m._1 == 0x0002 || m._1 == 0x000A)) {
          Nil // an empty compact group (link info / group info only)
        } else {
          fail(label, s"group '${if (prefix.isEmpty) "/" else prefix}' has " +
            "neither a symbol table message nor link storage")
        }
      if (entries.size > 4096)
        fail(label, s"implausible group entry count ${entries.size}")
      entries.flatMap { case (name, caddr) =>
        if (name.isEmpty || name.contains("/"))
          fail(label, s"bad link name '$name'")
        val cmsgs = messages(caddr)
        val isGroup = cmsgs.exists(m => m._1 == 0x0011 || m._1 == 0x0002 ||
          m._1 == 0x000A || m._1 == 0x0006)
        if (isGroup) {
          if (cmsgs.exists(_._1 == 0x0001))
            fail(label, s"'$prefix$name' carries both group and dataset messages")
          walkGroup(caddr, s"$prefix$name/", depth + 1)
        } else Seq(datasetOf(prefix + name, cmsgs))
      }
    }

    /** DENSE (fractal-heap) link storage — the above-max_compact
      * libver-1.8+ group shape: a "FRHP" fractal heap whose root is a
      * single checksummed DIRECT block holds the link message bodies
      * as managed objects; a name-hash v2 B-tree ("BTHD" + "BTLF")
      * enumerates them. Every checksum (header, direct block, B-tree
      * nodes) is lookup3-VERIFIED and each record's stored hash must
      * equal lookup3 of the link name it resolves to. Root INDIRECT
      * blocks, filtered heaps, non-7-byte heap IDs and deep B-trees
      * reject loudly with pointers.
      */
    def denseGroupEntries(linkInfoP: Long): Seq[(String, Long)] = {
      val liFlags = u8(linkInfoP + 1)
      var q = linkInfoP + 2
      if ((liFlags & 0x01) != 0) q += 8 // max creation index
      val fheap = u64(q)
      val nameBt = u64(q + 8)
      if (nameBt == Undef)
        fail(label, "dense group without a name-index v2 B-tree")
      // ---- fractal heap header
      if (sig4(b, fheap, label) != "FRHP")
        fail(label, "fractal heap signature missing")
      if (u8(fheap + 4) != 0)
        fail(label, s"fractal heap version ${u8(fheap + 4)} out of scope (0)")
      val idLen = u16(fheap + 5)
      if (idLen != 7)
        fail(label, s"fractal heap ID length $idLen out of scope (7 — the dense-link shape)")
      if (u16(fheap + 7) != 0)
        fail(label, "filtered fractal heap out of scope")
      val hflags = u8(fheap + 9)
      val maxManaged = u32(fheap + 10)
      val nManaged = u64(fheap + 70)
      val startBlock = u64(fheap + 112)
      val maxHeapBits = u16(fheap + 128)
      if ((maxHeapBits + 7) / 8 != 4)
        fail(label, s"heap-space offset width ${(maxHeapBits + 7) / 8} out of scope (4)")
      val rootBlock = u64(fheap + 132)
      if (u16(fheap + 140) != 0)
        fail(label, "fractal heap with a root INDIRECT block out of scope " +
          "(single direct block)")
      if (fheap + 146 > b.length) fail(label, "fractal heap header outside the file")
      val storedHk = u32(fheap + 142)
      val computedHk = lookup3(b, fheap.toInt, 142).toLong & 0xffffffffL
      if (storedHk != computedHk)
        fail(label, f"FRHP checksum mismatch (stored 0x$storedHk%08x, " +
          f"computed 0x$computedHk%08x)")
      if (startBlock < 32 || startBlock > (1 << 20))
        fail(label, s"implausible fractal heap block size $startBlock")
      val blockSize = startBlock.toInt
      // ---- root direct block
      if (rootBlock < 0 || rootBlock + blockSize > b.length)
        fail(label, "fractal heap direct block outside the file")
      if (sig4(b, rootBlock, label) != "FHDB")
        fail(label, "fractal heap direct block signature missing")
      if (u8(rootBlock + 4) != 0)
        fail(label, s"direct block version ${u8(rootBlock + 4)} out of scope (0)")
      if (u64(rootBlock + 5) != fheap)
        fail(label, "direct block does not point back at its heap header")
      if (u32(rootBlock + 13) != 0)
        fail(label, "root direct block offset is not 0")
      val dblkHdr = 4 + 1 + 8 + 4 + (if ((hflags & 0x02) != 0) 4 else 0)
      if ((hflags & 0x02) != 0) {
        // checksum over the WHOLE block with its checksum field zeroed
        val img = java.util.Arrays.copyOfRange(b, rootBlock.toInt,
          rootBlock.toInt + blockSize)
        val stored = (img(17) & 0xffL) | ((img(18) & 0xffL) << 8) |
          ((img(19) & 0xffL) << 16) | ((img(20) & 0xffL) << 24)
        java.util.Arrays.fill(img, 17, 21, 0.toByte)
        val computed = lookup3(img, 0, blockSize).toLong & 0xffffffffL
        if (stored != computed)
          fail(label, f"FHDB checksum mismatch (stored 0x$stored%08x, " +
            f"computed 0x$computed%08x)")
      }
      // ---- name-index v2 B-tree (type 5: links by name hash)
      if (sig4(b, nameBt, label) != "BTHD")
        fail(label, "v2 B-tree header signature missing")
      if (u8(nameBt + 4) != 0)
        fail(label, s"v2 B-tree version ${u8(nameBt + 4)} out of scope (0)")
      if (nameBt + 38 > b.length) fail(label, "v2 B-tree header outside the file")
      // checksum FIRST — no header field is interpreted before it holds
      val storedBk = u32(nameBt + 34)
      val computedBk = lookup3(b, nameBt.toInt, 34).toLong & 0xffffffffL
      if (storedBk != computedBk)
        fail(label, f"BTHD checksum mismatch (stored 0x$storedBk%08x, " +
          f"computed 0x$computedBk%08x)")
      if (u8(nameBt + 5) != 5)
        fail(label, s"v2 B-tree type ${u8(nameBt + 5)} where the link name index belongs")
      if (u16(nameBt + 10) != 11)
        fail(label, s"v2 B-tree record size ${u16(nameBt + 10)} out of scope (11)")
      if (u16(nameBt + 12) != 0)
        fail(label, "deep dense-link B-tree out of scope (root leaf only)")
      val leafAddr = u64(nameBt + 16)
      val nRec = u16(nameBt + 24)
      if (u64(nameBt + 26) != nRec)
        fail(label, "v2 B-tree total record count disagrees with its root")
      if (nRec.toLong != nManaged)
        fail(label, s"name index holds $nRec records, heap holds $nManaged objects")
      if (nRec > 4096) fail(label, s"implausible dense link count $nRec")
      // ---- leaf records -> heap objects -> link messages
      if (sig4(b, leafAddr, label) != "BTLF")
        fail(label, "v2 B-tree leaf signature missing")
      if (u8(leafAddr + 4) != 0 || u8(leafAddr + 5) != 5)
        fail(label, "v2 B-tree leaf version/type out of scope")
      val leafLen = 6 + 11L * nRec
      val storedLk = u32(leafAddr + leafLen)
      val computedLk = lookup3(b, leafAddr.toInt, leafLen.toInt).toLong & 0xffffffffL
      if (storedLk != computedLk)
        fail(label, f"BTLF checksum mismatch (stored 0x$storedLk%08x, " +
          f"computed 0x$computedLk%08x)")
      (0 until nRec).map { k =>
        val r = leafAddr + 6 + 11L * k
        val hash = u32(r)
        if (u8(r + 4) != 0)
          fail(label, s"heap ID version/type ${u8(r + 4)} out of scope (managed v0)")
        val off = u32(r + 5)
        val len = u16(r + 9)
        if (len > maxManaged)
          fail(label, s"heap object length $len exceeds the declared max $maxManaged")
        if (off < dblkHdr || off + len > blockSize)
          fail(label, s"heap object [$off,+$len) outside the direct block")
        val (name, addr) = parseLinkMsg(rootBlock + off)
        val nb2 = name.getBytes("UTF-8")
        val computed = lookup3(nb2, 0, nb2.length).toLong & 0xffffffffL
        if (computed != hash)
          fail(label, f"link name hash mismatch for '$name' " +
            f"(stored 0x$hash%08x, computed 0x$computed%08x)")
        name -> addr
      }.sortBy(_._1)
    }

    walkGroup(rootAddr, "", 0)
  }

  /** Raw little-endian element bytes of one dataset, chunks assembled
    * and filters reversed (deflate then shuffle).
    */
  private[graft] def readData(b: Array[Byte], d: Dataset, label: String): Array[Byte] = {
    def u8(p: Long): Int = {
      if (p < 0 || p >= b.length) fail(label, s"read at $p outside ${b.length} bytes")
      b(p.toInt) & 0xff
    }
    def u16(p: Long): Int = u8(p) | (u8(p + 1) << 8)
    def u32(p: Long): Long = u16(p).toLong | (u16(p + 2).toLong << 16)
    def u64(p: Long): Long = u32(p) | (u32(p + 4) << 32)
    val elemSize = d.dtype match {
      case "i16" => 2; case "i32" | "f32" => 4; case _ => 8
    }
    val cells = d.dims.map(_.toLong).product
    val total = cells * elemSize
    if (total > (MaxCells.toLong * 8)) fail(label, s"dataset '${d.name}' too large")
    d.layout match {
      case Contiguous(addr, size) =>
        if (size != total)
          fail(label, s"'${d.name}': contiguous size $size != dataspace $total")
        if (addr < 0 || addr > b.length || size > b.length - addr)
          fail(label, s"'${d.name}': contiguous block outside the file")
        if (d.filters.nonEmpty)
          fail(label, s"'${d.name}': filters on a contiguous layout out of scope")
        java.util.Arrays.copyOfRange(b, addr.toInt, (addr + size).toInt)
      case _ =>
        val (chunkDims, elem) = d.layout match {
          case Chunked(_, cd, e) => (cd, e)
          case ChunkedFixedArray(_, cd, e) => (cd, e)
          case ChunkedSingle(_, _, cd, e) => (cd, e)
          case Contiguous(_, _) => throw new IllegalStateException("unreachable")
        }
        if (elem != elemSize)
          fail(label, s"'${d.name}': chunk element size $elem != datatype $elemSize")
        if (chunkDims.length != d.dims.length)
          fail(label, s"'${d.name}': chunk rank ${chunkDims.length} != ${d.dims.length}")
        val out = new Array[Byte](total.toInt)
        // pre-fill with the dataset's _FillValue so unwritten chunks
        // read as fill (and later drop from the flatten)
        val f: Array[Byte] =
          if (d.dtype == "i32") {
            val v = d.atts.get("_FillValue") match {
              case Some(i: Int) => i
              case _ => Netcdf.FillInt
            }
            Array.tabulate(4)(k => ((v >>> (8 * k)) & 0xff).toByte)
          } else if (d.dtype == "i16") {
            val v: Int = d.atts.get("_FillValue") match {
              case Some(s: Short) => s.toInt
              case _ => Netcdf.FillShort.toInt
            }
            Array.tabulate(2)(k => ((v >>> (8 * k)) & 0xff).toByte)
          } else if (d.dtype == "f32") {
            val v: Float = d.atts.get("_FillValue") match {
              case Some(x: Float) => x
              case _ => Netcdf.FillFloat
            }
            val bits = java.lang.Float.floatToIntBits(v)
            Array.tabulate(4)(k => ((bits >>> (8 * k)) & 0xff).toByte)
          } else {
            val v = d.atts.get("_FillValue") match {
              case Some(x: Double) => x
              case _ => Netcdf.FillDouble
            }
            val bits = java.lang.Double.doubleToLongBits(v)
            Array.tabulate(8)(k => ((bits >>> (8 * k)) & 0xff).toByte)
          }
        var k0 = 0
        while (k0 < out.length) { out(k0) = f(k0 % elemSize); k0 += 1 }
        val chunkBytes = chunkDims.map(_.toLong).product * elemSize
        if (chunkBytes > Int.MaxValue) fail(label, s"'${d.name}': chunk too large")
        /** Decode one stored chunk (shared between the v1 B-tree and
          * fixed-array index walks): reverse the filter pipeline, then
          * scatter into the dataset lattice.
          */
        def decodeChunk(child: Long, storedSize: Long, offs: Seq[Long]): Unit = {
              if (child < 0 || child > b.length || storedSize > b.length - child)
                fail(label, s"'${d.name}': chunk [$child,+$storedSize) outside the file")
              var raw = java.util.Arrays.copyOfRange(b, child.toInt,
                (child + storedSize).toInt)
              // reverse pipeline order; a fletcher32 filter grows the
              // stream by 4 bytes at its pipeline position, so the
              // deflate target size counts the checksums still inside
              val fl = d.filters
              var fi = fl.length - 1
              while (fi >= 0) {
                val f = fl(fi)
                raw = f.id match {
                  case 1 =>
                    val expect = chunkBytes.toInt +
                      4 * fl.take(fi).count(_.id == 3)
                    inflate(raw, expect, label)
                  case 2 =>
                    val ts = f.cvals.headOption.getOrElse(elemSize)
                    if (ts != elemSize)
                      fail(label, s"shuffle element size $ts != $elemSize")
                    BloscLz4.unshuffle(raw, ts)
                  case 3 => // fletcher32: verify the trailing LE u32, strip
                    if (raw.length < 4)
                      fail(label, "fletcher32 chunk shorter than its checksum")
                    val p = raw.length - 4
                    val stored = (raw(p) & 0xffL) | ((raw(p + 1) & 0xffL) << 8) |
                      ((raw(p + 2) & 0xffL) << 16) | ((raw(p + 3) & 0xffL) << 24)
                    val computed = fletcher32(raw, p)
                    if (computed != stored)
                      fail(label, f"fletcher32 checksum mismatch in '${d.name}' " +
                        f"(stored 0x$stored%08x, computed 0x$computed%08x)")
                    java.util.Arrays.copyOfRange(raw, 0, p)
                  case other => fail(label, s"filter $other out of scope")
                }
                fi -= 1
              }
              if (raw.length != chunkBytes)
                fail(label, s"'${d.name}': chunk decodes to ${raw.length} bytes, " +
                  s"expected $chunkBytes")
              placeChunk(out, raw, d.dims, chunkDims, offs, elemSize, label)
        }

        d.layout match {
          case Chunked(btree, _, _) =>
            def walk(node: Long, depth: Int): Unit = {
              if (depth > 16) fail(label, "chunk B-tree too deep")
              if (sig4(b, node, label) != "TREE")
                fail(label, "chunk B-tree signature missing")
              if (u8(node + 4) != 1) fail(label, "group node in a chunk B-tree")
              val level = u8(node + 5)
              val n = u16(node + 6)
              val keyLen = 8 + 8L * (chunkDims.length + 1)
              var p = node + 24
              for (_ <- 0 until n) {
                val storedSize = u32(p)
                val mask = u32(p + 4)
                if (mask != 0) fail(label, "per-chunk filter masks out of scope")
                val offs = Seq.tabulate(chunkDims.length)(k => u64(p + 8 + 8L * k))
                val child = u64(p + keyLen)
                if (level > 0) walk(child, depth + 1)
                else decodeChunk(child, storedSize, offs)
                p += keyLen + 8
              }
            }
            walk(btree, 0)

          case ChunkedFixedArray(fahd, _, _) =>
            // FIXED ARRAY index (layout v4, the LIBVER_LATEST shape):
            // "FAHD" header -> "FADB" data block holding one element
            // per chunk in LINEAR chunk order; both lookup3-VERIFIED.
            // Client 0 = unfiltered (address only), client 1 =
            // filtered (address + stored size + filter mask).
            if (sig4(b, fahd, label) != "FAHD")
              fail(label, "fixed-array header signature missing")
            if (u8(fahd + 4) != 0)
              fail(label, s"fixed-array version ${u8(fahd + 4)} out of scope (0)")
            val clientId = u8(fahd + 5)
            if (clientId != 0 && clientId != 1)
              fail(label, s"fixed-array client ID $clientId out of scope")
            if (clientId == 0 && d.filters.nonEmpty)
              fail(label, s"'${d.name}': unfiltered fixed array under a filter pipeline")
            if (clientId == 1 && d.filters.isEmpty)
              fail(label, s"'${d.name}': filtered fixed array without a filter pipeline")
            val entrySize = u8(fahd + 6)
            val pageBits = u8(fahd + 7)
            val maxEntries = u64(fahd + 8)
            val dbAddr = u64(fahd + 16)
            if (fahd + 28 > b.length) fail(label, "fixed-array header outside the file")
            val storedCk = u32(fahd + 24)
            val computedCk = lookup3(b, fahd.toInt, 24).toLong & 0xffffffffL
            if (storedCk != computedCk)
              fail(label, f"FAHD checksum mismatch (stored 0x$storedCk%08x, " +
                f"computed 0x$computedCk%08x)")
            val grid = d.dims.zip(chunkDims).map { case (dim, c) => (dim + c - 1) / c }
            val nChunks = grid.map(_.toLong).product
            if (maxEntries != nChunks)
              fail(label, s"'${d.name}': fixed array holds $maxEntries entries, " +
                s"chunk grid needs $nChunks")
            if (pageBits < 1 || pageBits > 20 || maxEntries > (1L << pageBits))
              fail(label, "paged fixed array out of scope")
            val szLen = entrySize - 12
            if (clientId == 1 && (szLen < 1 || szLen > 8))
              fail(label, s"fixed-array entry size $entrySize out of scope")
            if (clientId == 0 && entrySize != 8)
              fail(label, s"fixed-array entry size $entrySize out of scope (8)")
            val elemsOff = dbAddr + 14
            val dbLen = 14 + maxEntries * entrySize
            if (dbAddr < 0 || dbAddr + dbLen + 4 > b.length)
              fail(label, "fixed-array data block outside the file")
            if (sig4(b, dbAddr, label) != "FADB")
              fail(label, "fixed-array data block signature missing")
            if (u8(dbAddr + 4) != 0)
              fail(label, s"fixed-array data block version ${u8(dbAddr + 4)} out of scope")
            if (u8(dbAddr + 5) != clientId)
              fail(label, "fixed-array data block client ID disagrees with its header")
            if (u64(dbAddr + 6) != fahd)
              fail(label, "fixed-array data block does not point back at its header")
            val storedCk2 = u32(dbAddr + dbLen)
            val computedCk2 = lookup3(b, dbAddr.toInt, dbLen.toInt).toLong & 0xffffffffL
            if (storedCk2 != computedCk2)
              fail(label, f"FADB checksum mismatch (stored 0x$storedCk2%08x, " +
                f"computed 0x$computedCk2%08x)")
            var c = 0L
            while (c < maxEntries) {
              val e = elemsOff + c * entrySize
              val addr = u64(e)
              if (addr != Undef) { // undefined address = unallocated chunk
                val storedSize =
                  if (clientId == 0) chunkBytes
                  else {
                    var v = 0L
                    var k = szLen - 1
                    while (k >= 0) { v = (v << 8) | u8(e + 8 + k); k -= 1 }
                    v
                  }
                if (clientId == 1 && u32(e + 8 + szLen) != 0)
                  fail(label, "per-chunk filter masks out of scope")
                // linear index -> chunk coords (row-major over the grid)
                val offs = new Array[Long](chunkDims.length)
                var rem = c
                var k = chunkDims.length - 1
                while (k >= 0) {
                  offs(k) = (rem % grid(k)) * chunkDims(k)
                  rem /= grid(k)
                  k -= 1
                }
                decodeChunk(addr, storedSize, offs.toSeq)
              }
              c += 1
            }

          case ChunkedSingle(addr, storedSize0, _, _) =>
            // SINGLE CHUNK (v4 type 1): the dataset must genuinely fit
            // one chunk; the filtered flag must agree with the
            // dataset's filter pipeline
            d.dims.zip(chunkDims).foreach { case (dim, c) =>
              if (dim > c)
                fail(label, s"'${d.name}': single-chunk index under a " +
                  s"${d.dims}-extent dataspace that needs more chunks")
            }
            if (storedSize0 < 0 && d.filters.nonEmpty)
              fail(label, s"'${d.name}': unfiltered single chunk under a filter pipeline")
            if (storedSize0 >= 0 && d.filters.isEmpty)
              fail(label, s"'${d.name}': filtered single chunk without a filter pipeline")
            val storedSize = if (storedSize0 < 0) chunkBytes else storedSize0
            decodeChunk(addr, storedSize, Seq.fill(chunkDims.length)(0L))

          case Contiguous(_, _) => throw new IllegalStateException("unreachable")
        }
        out
    }
  }

  /** Jenkins lookup3 `hashlittle` with init 0 — the metadata checksum
    * of every v2 object-header chunk (the HDF5 spec names lookup3 as
    * its checksum algorithm; the reference C is published public
    * domain). Spec-from-scratch; Hdf5Spec pins the published self-test
    * anchors.
    */
  private[graft] def lookup3(data: Array[Byte], off: Int, len: Int): Int = {
    def rot(x: Int, k: Int): Int = (x << k) | (x >>> (32 - k))
    var a = 0xdeadbeef + len
    var b = a
    var c = a
    var p = off
    var rem = len
    def u8l(q: Int): Int = data(q) & 0xff
    def word(q: Int): Int = u8l(q) | (u8l(q + 1) << 8) | (u8l(q + 2) << 16) | (u8l(q + 3) << 24)
    while (rem > 12) {
      a += word(p); b += word(p + 4); c += word(p + 8)
      // mix(a,b,c)
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      p += 12; rem -= 12
    }
    if (rem == 0) return c // only a zero-length input reaches this
    if (rem > 8) {
      c += ((rem - 8) match {
        case 4 => (u8l(p + 11) << 24) | (u8l(p + 10) << 16) | (u8l(p + 9) << 8) | u8l(p + 8)
        case 3 => (u8l(p + 10) << 16) | (u8l(p + 9) << 8) | u8l(p + 8)
        case 2 => (u8l(p + 9) << 8) | u8l(p + 8)
        case _ => u8l(p + 8)
      })
    }
    if (rem > 4) {
      b += (math.min(rem - 4, 4) match {
        case 4 => word(p + 4)
        case 3 => (u8l(p + 6) << 16) | (u8l(p + 5) << 8) | u8l(p + 4)
        case 2 => (u8l(p + 5) << 8) | u8l(p + 4)
        case _ => u8l(p + 4)
      })
    }
    a += (math.min(rem, 4) match {
      case 4 => word(p)
      case 3 => (u8l(p + 2) << 16) | (u8l(p + 1) << 8) | u8l(p)
      case 2 => (u8l(p + 1) << 8) | u8l(p)
      case _ => u8l(p)
    })
    // final(a,b,c)
    c ^= b; c -= rot(b, 14)
    a ^= c; a -= rot(c, 11)
    b ^= a; b -= rot(a, 25)
    c ^= b; c -= rot(b, 16)
    a ^= c; a -= rot(c, 4)
    b ^= a; b -= rot(a, 14)
    c ^= b; c -= rot(b, 24)
    c
  }

  /** HDF5's fletcher32 (filter 3) checksum over `len` bytes: 16-bit
    * BIG-endian words (odd tail byte = high byte of a zero-padded
    * word), sums folded mod-65535 with the deferred-reduction schedule
    * of the public `H5_checksum_fletcher32`; result `(sum2<<16)|sum1`,
    * stored LITTLE-endian after the data. Spec-from-scratch against the
    * published algorithm (HDF5 File Format Spec, filter 3).
    */
  private[graft] def fletcher32(data: Array[Byte], len: Int): Long = {
    var sum1 = 0L
    var sum2 = 0L
    var p = 0
    var words = len / 2
    while (words > 0) {
      var tlen = math.min(words, 360)
      words -= tlen
      while (tlen > 0) {
        sum1 += ((data(p) & 0xffL) << 8) | (data(p + 1) & 0xffL)
        sum2 += sum1
        p += 2
        tlen -= 1
      }
      sum1 = (sum1 & 0xffff) + (sum1 >>> 16)
      sum2 = (sum2 & 0xffff) + (sum2 >>> 16)
    }
    if (len % 2 == 1) {
      sum1 += (data(p) & 0xffL) << 8
      sum2 += sum1
      sum1 = (sum1 & 0xffff) + (sum1 >>> 16)
      sum2 = (sum2 & 0xffff) + (sum2 >>> 16)
    }
    sum1 = (sum1 & 0xffff) + (sum1 >>> 16)
    sum2 = (sum2 & 0xffff) + (sum2 >>> 16)
    (sum2 << 16) | sum1
  }

  private def inflate(comp: Array[Byte], expect: Int, label: String): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(comp)
    val out = new Array[Byte](expect)
    var off = 0
    try {
      while (off < expect && !inf.finished()) {
        val n = inf.inflate(out, off, expect - off)
        // n == 0 while unfinished is ALWAYS terminal here (the whole
        // chunk was set as input): truncated stream (needsInput) or a
        // crafted FDICT preset-dictionary header (needsDictionary) —
        // the latter would otherwise spin this loop forever
        if (n == 0) fail(label, "truncated or preset-dictionary deflate chunk")
        off += n
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        fail(label, s"corrupt deflate chunk — ${e.getMessage}")
    }
    if (off != expect || !inf.finished())
      fail(label, s"chunk inflates to $off bytes, expected $expect")
    inf.end()
    out
  }

  /** Copy one full-size chunk into the dataset, clipping the edge. */
  private def placeChunk(out: Array[Byte], raw: Array[Byte],
                         dims: Seq[Int], chunkDims: Seq[Int],
                         offs: Seq[Long], elemSize: Int, label: String): Unit = {
    offs.zip(dims).zip(chunkDims).foreach { case ((o, d), c) =>
      if (o < 0 || o % c != 0 || o >= d)
        fail(label, s"chunk offset $o misaligned for chunk dim $c / extent $d")
    }
    val rank = dims.length
    val n = chunkDims.map(_.toLong).product.toInt
    val strides = new Array[Long](rank)
    var acc = 1L
    var k = rank - 1
    while (k >= 0) { strides(k) = acc; acc *= dims(k); k -= 1 }
    var s = 0
    val coord = new Array[Long](rank)
    while (s < n) {
      var rem = s
      var inside = true
      var oi = 0L
      k = rank - 1
      while (k >= 0) {
        val c = rem % chunkDims(k); rem /= chunkDims(k)
        coord(k) = offs(k) + c
        if (coord(k) >= dims(k)) inside = false
        oi += coord(k) * strides(k)
        k -= 1
      }
      if (inside)
        System.arraycopy(raw, s * elemSize, out, (oi * elemSize).toInt, elemSize)
      s += 1
    }
  }

  /** COUNT of present (non-fill) cells across kept data variables —
    * the DSv2 COUNT(*) partial, without materializing a single row.
    * Fill-dropping is data-dependent (unlike GRIB2's bitmap section),
    * so kept variables' chunks still decode; what the pushdown saves is
    * the per-cell row explode and everything downstream of it, and
    * pruned variables' chunk B-trees are never walked at all. Fill
    * semantics mirror [[records]] exactly (packed space for ints,
    * float space for f32).
    */
  def countPresentCells(bytes: Array[Byte], label: String,
                        keep: String => Boolean): Long = {
    val dsets = parseDatasets(bytes, label)
    // same dims-vs-coords guard as records(): the count and row paths
    // must reject a malformed file identically, never diverge on it
    val byName = dsets.map(d => d.name -> d).toMap
    def coordLen(cn: String): Int = byName.get(cn) match {
      case Some(c) if c.dims.length == 1 => c.dims.head
      case _ => fail(label, s"no 1-d '$cn' coordinate dataset")
    }
    val (nt, nj, ni) = (coordLen("time"), coordLen("lat"), coordLen("lon"))
    var n = 0L
    dsets.filter(d => d.dims.length == 3 &&
      !Set("lat", "lon", "time").contains(d.name) && keep(d.name)).foreach { d =>
      if (d.dims != Seq(nt, nj, ni))
        fail(label, s"'${d.name}' dims ${d.dims} disagree with the " +
          s"(time=$nt, lat=$nj, lon=$ni) coordinates")
      val raw = readData(bytes, d, label)
      val cells = d.dims.map(_.toLong).product.toInt
      def i32le(k: Int): Int =
        (raw(4 * k) & 0xff) | ((raw(4 * k + 1) & 0xff) << 8) |
          ((raw(4 * k + 2) & 0xff) << 16) | ((raw(4 * k + 3) & 0xff) << 24)
      d.dtype match {
        case "i32" =>
          val fill = d.atts.get("_FillValue") match {
            case Some(i: Int) => i
            case _ => Netcdf.FillInt
          }
          var k = 0; while (k < cells) { if (i32le(k) != fill) n += 1; k += 1 }
        case "i16" =>
          val fill: Int = d.atts.get("_FillValue") match {
            case Some(s: Short) => s.toInt
            case _ => Netcdf.FillShort.toInt
          }
          var k = 0
          while (k < cells) {
            val v = (((raw(2 * k + 1) & 0xff) << 8) | (raw(2 * k) & 0xff)).toShort.toInt
            if (v != fill) n += 1
            k += 1
          }
        case "f32" =>
          val fill: Float = d.atts.get("_FillValue") match {
            case Some(x: Float) => x
            case _ => Netcdf.FillFloat
          }
          var k = 0
          while (k < cells) {
            if (java.lang.Float.intBitsToFloat(i32le(k)) != fill) n += 1
            k += 1
          }
        case _ =>
          val fill = d.atts.get("_FillValue") match {
            case Some(x: Double) => x
            case _ => Netcdf.FillDouble
          }
          var k = 0
          while (k < cells) {
            var v = 0L
            var i = 7; while (i >= 0) { v = (v << 8) | (raw(8 * k + i) & 0xffL); i -= 1 }
            if (java.lang.Double.longBitsToDouble(v) != fill) n += 1
            k += 1
          }
      }
    }
    n
  }

  /** Flatten one netCDF-4 file into present-cell rows — the same
    * contract as [[Netcdf.records]]: `value = raw / 10^decimal_scale`,
    * `_FillValue` cells drop, `time` is int32 epoch-hours.
    */
  def records(bytes: Array[Byte], label: String = "<bytes>",
              keep: String => Boolean = _ => true): Iterator[Netcdf.GridRow] = {
    val dsets = parseDatasets(bytes, label)
    val byName = dsets.map(d => d.name -> d).toMap
    def coord1d(name: String): Array[Double] = {
      val d = byName.getOrElse(name, fail(label, s"no '$name' coordinate dataset"))
      if (d.dims.length != 1 || d.dtype != "f64")
        fail(label, s"'$name' must be a 1-d float64 coordinate")
      val raw = readData(bytes, d, label)
      Array.tabulate(d.dims.head) { k =>
        var v = 0L
        var i = 7; while (i >= 0) { v = (v << 8) | (raw(8 * k + i) & 0xffL); i -= 1 }
        java.lang.Double.longBitsToDouble(v)
      }
    }
    val lat = coord1d("lat")
    val lon = coord1d("lon")
    val timeD = byName.getOrElse("time", fail(label, "no 'time' coordinate dataset"))
    if (timeD.dims.length != 1 || timeD.dtype != "i32")
      fail(label, "'time' must be a 1-d int32 epoch-hours coordinate")
    val timeRaw = readData(bytes, timeD, label)
    def i32le(raw: Array[Byte], k: Int): Int =
      (raw(4 * k) & 0xff) | ((raw(4 * k + 1) & 0xff) << 8) |
        ((raw(4 * k + 2) & 0xff) << 16) | ((raw(4 * k + 3) & 0xff) << 24)
    val times = Array.tabulate(timeD.dims.head)(k =>
      LocalDateTime.of(1970, 1, 1, 0, 0).plusHours(i32le(timeRaw, k).toLong))
    // `keep` prunes whole datasets at the metadata walk — their chunk
    // B-trees are never walked and their chunks never inflated
    val dataVars = dsets.filter(d => d.dims.length == 3 &&
      !Set("lat", "lon", "time").contains(d.name) && keep(d.name))
    dataVars.iterator.flatMap { d =>
      if (d.dims != Seq(times.length, lat.length, lon.length))
        fail(label, s"'${d.name}' dims ${d.dims} disagree with the " +
          s"(time=${times.length}, lat=${lat.length}, lon=${lon.length}) coordinates")
      val raw = readData(bytes, d, label)
      val nj = lat.length; val ni = lon.length
      val cell: Int => Option[Double] =
        if (d.dtype == "i32") {
          val scale = d.atts.get("decimal_scale") match {
            case Some(i: Int) => i
            case _ => 0
          }
          val fill = d.atts.get("_FillValue") match {
            case Some(i: Int) => i
            case _ => Netcdf.FillInt
          }
          val denom = math.pow(10, scale)
          k => { val v = i32le(raw, k); if (v == fill) None else Some(v / denom) }
        } else if (d.dtype == "i16") {
          // the CF packing convention (the int16 shape CDS netCDF-4
          // downloads ship): value = packed * scale_factor + add_offset,
          // fill compared in PACKED space
          def dblAtt(n: String, dflt: Double): Double = d.atts.get(n) match {
            case Some(x: Double) => x
            case Some(i: Int) => i.toDouble
            case _ => dflt
          }
          val sf = dblAtt("scale_factor", 1.0)
          val ao = dblAtt("add_offset", 0.0)
          val fill: Int = d.atts.get("_FillValue") match {
            case Some(s: Short) => s.toInt
            case _ => Netcdf.FillShort.toInt
          }
          k => {
            val v = (((raw(2 * k + 1) & 0xff) << 8) | (raw(2 * k) & 0xff)).toShort.toInt
            if (v == fill) None else Some(v * sf + ao)
          }
        } else if (d.dtype == "f32") {
          // stored value widened exactly to double (binary32 ⊂ binary64;
          // the classic reader's NC_FLOAT convention), fill compared in
          // FLOAT space before widening
          val fill: Float = d.atts.get("_FillValue") match {
            case Some(x: Float) => x
            case _ => Netcdf.FillFloat
          }
          k => {
            val x = java.lang.Float.intBitsToFloat(i32le(raw, k))
            if (x == fill) None else Some(x.toDouble)
          }
        } else { // f64: stored value verbatim (the NC_DOUBLE convention)
          val fill = d.atts.get("_FillValue") match {
            case Some(x: Double) => x
            case _ => Netcdf.FillDouble
          }
          k => {
            var v = 0L
            var i = 7; while (i >= 0) { v = (v << 8) | (raw(8 * k + i) & 0xffL); i -= 1 }
            val x = java.lang.Double.longBitsToDouble(v)
            if (x == fill) None else Some(x)
          }
        }
      Iterator.range(0, times.length).flatMap { r =>
        Iterator.tabulate(nj * ni) { k =>
          cell(r * nj * ni + k).map(x =>
            Netcdf.GridRow(d.name, times(r), lat(k / ni), lon(k % ni), x)).orNull
        }.filter(_ != null)
      }
    }
  }
}
