package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial predicates (reference P3 — `gdalwarp -cutline africa.shp`
  * polygon clip, src/file-conversions.js:174-195). Vanilla Spark has no
  * geospatial types, so containment is a ray-casting test against a
  * broadcast polygon ring (SURVEY.md §2.9).
  *
  * The ring is closed over as a plain Scala array inside the UDF closure —
  * Spark serializes it into the task binary once per stage, the moral
  * equivalent of a broadcast for a small (≤ a few thousand vertices) ring.
  */
object Geo {

  type Ring = Array[(Double, Double)]

  /** Even-odd ray casting; on-edge behavior is numerically arbitrary (the
    * reference inherits whatever GDAL does on edges; both are "boundary ∈
    * either side" semantics).
    */
  def contains(ring: Ring)(lon: Double, lat: Double): Boolean = {
    var inside = false
    var j = ring.length - 1
    var i = 0
    while (i < ring.length) {
      val (xi, yi) = ring(i); val (xj, yj) = ring(j)
      if ((yi > lat) != (yj > lat) &&
          lon < (xj - xi) * (lat - yi) / (yj - yi) + xi) inside = !inside
      j = i; i += 1
    }
    inside
  }

  def containsUdf(ring: Ring) = udf((lon: Double, lat: Double) => contains(ring)(lon, lat))

  /** Even-odd containment over a multi-ring polygon set (a real shapefile's
    * islands + holes): total crossings over ALL rings decide — equivalently
    * an XOR of the per-ring tests. A point inside an island ring crosses it
    * an odd number of times and every other ring an even number; a point in
    * a hole crosses both the outer ring and the hole ring oddly → even
    * total → outside. This is the same rule GDAL's cutline applies to the
    * reference's africa.shp.
    */
  def containsMulti(rings: Seq[Ring])(lon: Double, lat: Double): Boolean = {
    var inside = false
    var r = 0
    while (r < rings.length) {
      if (contains(rings(r))(lon, lat)) inside = !inside
      r += 1
    }
    inside
  }

  def containsMultiUdf(rings: Seq[Ring]) = {
    val arr = rings.toArray
    udf((lon: Double, lat: Double) => containsMulti(arr)(lon, lat))
  }

  /** Clip-to-nodata variant (gdalwarp `-dstnodata`): keep the value inside
    * the polygon, null it outside — `when(inside, value)`. Containment is
    * the codegen'd [[GeoContains]] expression (bit-identical to the UDF
    * ray cast, but stays inside WholeStageCodegen).
    */
  def clipValue(ring: Ring)(lon: Column, lat: Column, value: Column): Column =
    when(GeoContains(Seq(ring))(lon, lat), value)

  /** Simplified Africa outline (WGS-84 lon/lat): coarse continental ring
    * covering the AOI bbox [N 37, W −21.36, S −39.34, E 65.49]
    * (src/sources/era5monthly.js:34), kept as a cheap self-contained test
    * fixture. The REAL clip geometry is parsed from src/shp/africa.shp by
    * [[graft.sources.Shapefile]] and exercised end-to-end by the
    * r08_africa_clip oracle query via [[containsMulti]].
    */
  val africaOutline: Ring = Array(
    (-5.9, 35.8), (-9.8, 31.0), (-17.0, 20.9), (-16.5, 12.5),
    (-12.3, 7.0), (-7.5, 4.3), (2.1, 6.3), (8.6, 4.5),
    (9.3, -1.9), (13.8, -12.4), (11.7, -17.3), (14.5, -22.9),
    (16.5, -28.6), (18.3, -34.2), (25.7, -34.5), (32.9, -28.9),
    (35.5, -23.8), (40.5, -15.5), (40.4, -10.5), (51.4, 10.4),
    (44.0, 10.9), (43.3, 12.5), (38.5, 18.0), (37.2, 22.0),
    (34.3, 27.5), (32.3, 31.3), (25.0, 32.0), (19.3, 30.3),
    (10.1, 33.8), (5.4, 36.7), (-2.2, 35.1), (-5.9, 35.8))

  /** A small scalene triangle in (x, y) unit space used by the
    * oracle-checked clip query: vertices are off any data lattice so no
    * fixture point lands exactly on an edge (sign tests and ray casting
    * then agree everywhere).
    */
  val testTriangle: Ring = Array(
    (0.0053, 0.0071), (0.0947, 0.0151), (0.0521, 0.0933), (0.0053, 0.0071))
}
