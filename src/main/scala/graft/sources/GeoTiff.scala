package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Minimal uncompressed GeoTIFF encoder/decoder — the last piece of K1:
  * the reference's downstream contract is literally a `.tif` per layer
  * (`gdal_translate`/`gdalwarp` outputs, src/file-conversions.js:57-74),
  * and this produces one with zero GDAL dependency from the public specs
  * (Adobe TIFF 6.0 baseline + OGC GeoTIFF 1.1).
  *
  * Scope: single-band Float32 grids, little-endian, one strip, no
  * compression — the shape every GIS stack (GDAL, QGIS, rasterio) opens
  * directly. Georeferencing is the standard plate-carrée trio:
  * ModelPixelScale + ModelTiepoint (raster (0,0) edge → lon/lat) +
  * a GeoKeyDirectory declaring geographic WGS-84 (EPSG 4326), plus the
  * de-facto GDAL_NODATA ASCII tag.
  */
object GeoTiff {

  // TIFF field types
  private val ASCII = 2
  private val SHORT = 3
  private val LONG = 4
  private val RATIONAL = 5
  private val DOUBLE = 12

  private val typeSize = Map(ASCII -> 1, SHORT -> 2, LONG -> 4, RATIONAL -> 8, DOUBLE -> 8)

  /** One IFD entry; `data` is the raw little-endian value bytes (placed
    * inline when they fit in 4, else in the external value area).
    */
  private final case class Entry(tag: Int, typ: Int, count: Int, data: Array[Byte])

  /** Encode a north-up row-major Float32 grid. `lonEdge`/`latEdge` are the
    * OUTER corner of the top-left pixel (cell center − half a cell), the
    * same convention as the ENVI header's map info.
    */
  def encode(width: Int, height: Int, values: Array[Float],
             lonEdge: Double, latEdge: Double, cellX: Double, cellY: Double,
             nodata: Float): Array[Byte] = {
    require(values.length == width * height,
      s"expected ${width * height} values, got ${values.length}")
    val dataBytes = values.length * 4

    def shorts(vs: Int*): Array[Byte] = {
      val b = ByteBuffer.allocate(vs.length * 2).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(v => b.putShort(v.toShort)); b.array()
    }
    def longs(vs: Int*): Array[Byte] = {
      val b = ByteBuffer.allocate(vs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(b.putInt); b.array()
    }
    def doubles(vs: Double*): Array[Byte] = {
      val b = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(b.putDouble); b.array()
    }

    val nodataAscii = {
      val s = (if (nodata == nodata.toLong.toFloat) nodata.toLong.toString
               else nodata.toString) + "\u0000"
      s.getBytes(StandardCharsets.US_ASCII)
    }
    val entries = Seq(
      Entry(256, LONG, 1, longs(width)),            // ImageWidth
      Entry(257, LONG, 1, longs(height)),           // ImageLength
      Entry(258, SHORT, 1, shorts(32)),             // BitsPerSample
      Entry(259, SHORT, 1, shorts(1)),              // Compression: none
      Entry(262, SHORT, 1, shorts(1)),              // Photometric: BlackIsZero
      Entry(273, LONG, 1, longs(8)),                // StripOffsets: data at 8
      Entry(277, SHORT, 1, shorts(1)),              // SamplesPerPixel
      Entry(278, LONG, 1, longs(height)),           // RowsPerStrip: one strip
      Entry(279, LONG, 1, longs(dataBytes)),        // StripByteCounts
      Entry(282, RATIONAL, 1, longs(72, 1)),        // XResolution (nominal)
      Entry(283, RATIONAL, 1, longs(72, 1)),        // YResolution
      Entry(284, SHORT, 1, shorts(1)),              // PlanarConfiguration
      Entry(296, SHORT, 1, shorts(2)),              // ResolutionUnit: inch
      Entry(339, SHORT, 1, shorts(3)),              // SampleFormat: IEEE float
      Entry(33550, DOUBLE, 3, doubles(cellX, cellY, 0.0)),          // ModelPixelScale
      Entry(33922, DOUBLE, 6, doubles(0, 0, 0, lonEdge, latEdge, 0)), // ModelTiepoint
      Entry(34735, SHORT, 16, shorts(                               // GeoKeyDirectory
        1, 1, 0, 3,        // version 1.1, 3 keys
        1024, 0, 1, 2,     // GTModelType: geographic
        1025, 0, 1, 1,     // GTRasterType: PixelIsArea
        2048, 0, 1, 4326)),// GeographicType: WGS-84
      Entry(42113, ASCII, nodataAscii.length, nodataAscii))          // GDAL_NODATA

    val ifdOffset = 8 + dataBytes
    val ifdBytes = 2 + entries.length * 12 + 4
    var extCursor = ifdOffset + ifdBytes
    val buf = ByteBuffer.allocate(extCursor +
      entries.map(e => e.data.length + 1).sum) // +1 slack per entry for even padding
      .order(ByteOrder.LITTLE_ENDIAN)

    buf.putShort(0x4949.toShort) // "II"
    buf.putShort(42.toShort)
    buf.putInt(ifdOffset)
    values.foreach(buf.putFloat)

    buf.putShort(entries.length.toShort)
    val external = Seq.newBuilder[Array[Byte]]
    entries.foreach { e =>
      buf.putShort(e.tag.toShort)
      buf.putShort(e.typ.toShort)
      buf.putInt(e.count)
      require(e.data.length == e.count * typeSize(e.typ), s"tag ${e.tag} size")
      if (e.data.length <= 4) {
        buf.put(e.data)
        var pad = 4 - e.data.length
        while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      } else {
        buf.putInt(extCursor)
        val padded = if (e.data.length % 2 == 0) e.data else e.data :+ 0.toByte
        external += padded
        extCursor += padded.length
      }
    }
    buf.putInt(0) // no next IFD
    external.result().foreach(buf.put)
    java.util.Arrays.copyOf(buf.array(), buf.position())
  }

  /** Decoded view: grid + georeferencing, for round-trip tests and as a
    * migration read path for existing `.tif` layers of this shape.
    */
  final case class Tiff(width: Int, height: Int, values: Array[Float],
                        cellX: Double, cellY: Double,
                        lonEdge: Double, latEdge: Double,
                        epsg: Int, nodata: Option[Float])

  /** Parse the single-band Float32 layout [[encode]] produces (and any
    * baseline-conformant equivalent: inline or external strip tables,
    * multiple strips, either byte order).
    */
  def decode(bytes: Array[Byte]): Tiff = {
    val order = (bytes(0).toChar, bytes(1).toChar) match {
      case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => ByteOrder.BIG_ENDIAN
      case _ => throw new IllegalArgumentException("not a TIFF (bad byte-order mark)")
    }
    val b = ByteBuffer.wrap(bytes).order(order)
    require(b.getShort(2) == 42, "not a TIFF (magic != 42)")
    val ifd = b.getInt(4)
    val n = b.getShort(ifd) & 0xffff
    var tags = Map.empty[Int, (Int, Int, Long, Int)] // tag -> (type, count, inlineOrOffset, entryPos)
    for (k <- 0 until n) {
      val at = ifd + 2 + k * 12
      val tag = b.getShort(at) & 0xffff
      val typ = b.getShort(at + 2) & 0xffff
      val count = b.getInt(at + 4)
      tags += tag -> (typ, count, b.getInt(at + 8).toLong & 0xffffffffL, at + 8)
    }
    def valueArea(tag: Int): (Int, Int, Int) = { // (type, count, absolute offset)
      val (typ, count, raw, entryPos) = tags(tag)
      val size = count * typeSize(typ)
      if (size <= 4) (typ, count, entryPos) else (typ, count, raw.toInt)
    }
    def intAt(typ: Int, off: Int): Long = typ match {
      case SHORT => (b.getShort(off) & 0xffff).toLong
      case LONG => b.getInt(off).toLong & 0xffffffffL
      case _ => throw new IllegalArgumentException(s"unexpected type $typ")
    }
    def ints(tag: Int): Seq[Long] = {
      val (typ, count, off) = valueArea(tag)
      (0 until count).map(k => intAt(typ, off + k * typeSize(typ)))
    }
    def dbls(tag: Int): Seq[Double] = {
      val (typ, count, off) = valueArea(tag)
      require(typ == DOUBLE, s"tag $tag: expected DOUBLE")
      (0 until count).map(k => b.getDouble(off + k * 8))
    }

    val width = ints(256).head.toInt
    val height = ints(257).head.toInt
    require(ints(258).head == 32 && ints(339).head == 3,
      "only Float32 sample format supported")
    require(ints(259).head == 1, "only uncompressed strips supported")
    val offsets = ints(273)
    val counts = ints(279)
    val values = new Array[Float](width * height)
    var v = 0
    offsets.zip(counts).foreach { case (off, len) =>
      var p = off.toInt
      val end = off.toInt + len.toInt
      while (p < end) { values(v) = b.getFloat(p); v += 1; p += 4 }
    }
    require(v == values.length, s"strip data holds $v of ${values.length} samples")

    val scale = dbls(33550)
    val tie = dbls(33922)
    val geoKeys = ints(34735)
    val epsg = geoKeys.grouped(4).collectFirst {
      case Seq(2048, 0, 1, code) => code.toInt
    }.getOrElse(0)
    val nodata = tags.get(42113).map { _ =>
      val (_, count, off) = valueArea(42113)
      new String(bytes, off, count, StandardCharsets.US_ASCII).trim
        .takeWhile(_ != '\u0000').trim.toFloat
    }
    Tiff(width, height, values, scale(0), scale(1), tie(3), tie(4), epsg, nodata)
  }
}
