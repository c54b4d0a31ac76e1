package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal ESRI shapefile (.shp) reader for Polygon (type 5) records,
  * implementing the public ESRI whitepaper format (July 1998): a 100-byte
  * header — file code 9994 big-endian at offset 0, file length in 16-bit
  * words big-endian at 24, shape type little-endian at 32 — followed by
  * records of [8-byte big-endian record header][little-endian shape body].
  *
  * Covers exactly what the reference consumes from `src/shp/africa.shp`
  * (the `gdalwarp -cutline` clip target, reference docker-compose.yml
  * `SHP_CLIP_PATH`; src/file-conversions.js:174-195): polygon rings for a
  * point-in-polygon test. Deliberately not a GIS stack — no .dbf
  * attributes, no .prj reprojection (the AOI ships as WGS-84 lon/lat), no
  * M/Z variants.
  */
object Shapefile {

  /** A ring as (x=lon, y=lat) vertex pairs; closed (first == last) as the
    * spec requires.
    */
  type Ring = Array[(Double, Double)]

  final case class Polygon(box: (Double, Double, Double, Double), rings: Array[Ring])

  private val PolygonType = 5
  private val NullType = 0

  /** Parse every Polygon record in the .shp; Null shapes are skipped (the
    * spec's placeholder records), any other shape type is rejected loudly —
    * silently ignoring, say, PolyLine records would corrupt a clip.
    */
  def readPolygons(path: String): Array[Polygon] =
    readPolygonsFromBytes(Files.readAllBytes(Paths.get(path)), path)

  /** Parse from in-memory .shp bytes (vendored fixtures, test synthesis);
    * `label` names the source in error messages.
    */
  def readPolygonsFromBytes(bytes: Array[Byte], label: String = "<bytes>"): Array[Polygon] = {
    val path = label
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(be.getInt(0) == 9994, s"not a shapefile (bad file code): $path")
    val fileLen = be.getInt(24) * 2 // header stores 16-bit words
    val out = Array.newBuilder[Polygon]
    var pos = 100
    while (pos + 8 <= fileLen) {
      val contentBytes = be.getInt(pos + 4) * 2
      val c = pos + 8 // content start
      le.getInt(c) match {
        case PolygonType =>
          val box = (le.getDouble(c + 4), le.getDouble(c + 12),
                     le.getDouble(c + 20), le.getDouble(c + 28))
          val numParts = le.getInt(c + 36)
          val numPoints = le.getInt(c + 40)
          val partsAt = c + 44
          val pointsAt = partsAt + 4 * numParts
          val parts = Array.tabulate(numParts)(k => le.getInt(partsAt + 4 * k))
          val rings = Array.tabulate(numParts) { k =>
            val start = parts(k)
            val end = if (k + 1 < numParts) parts(k + 1) else numPoints
            Array.tabulate(end - start) { i =>
              val p = pointsAt + 16 * (start + i)
              (le.getDouble(p), le.getDouble(p + 8))
            }: Ring
          }
          out += Polygon(box, rings)
        case NullType => // placeholder record, nothing to read
        case other =>
          throw new IllegalArgumentException(
            s"unsupported shape type $other at record offset $pos in $path " +
              "(only Polygon (5) and Null (0) are handled)")
      }
      pos = c + contentBytes
    }
    out.result()
  }

  /** All rings of all polygon records — the flat form a clip consumes
    * (even-odd containment over the union of rings handles islands and
    * holes without distinguishing them).
    */
  def readRings(path: String): Array[Ring] = readPolygons(path).flatMap(_.rings)

  /** Flat ring view over in-memory bytes. */
  def readRingsFromBytes(bytes: Array[Byte]): Array[Ring] =
    readPolygonsFromBytes(bytes).flatMap(_.rings)
}
