package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vector spatial join — points against MANY polygons, the
  * points-in-polygons join every geo-enrichment pipeline runs (reverse
  * geocoding, admin-region tagging; the reference's single-region clip
  * is the one-polygon special case, src/geo.js).
  *
  * The naive form is a cartesian `contains(point, polygon)` theta join.
  * The distributed shape here is SPACE-PARTITIONED BLOCKING, the same
  * trick every spatial engine (PostGIS gist, Sedona, BigQuery GIS)
  * plays: tile the plane into fixed cells, explode each polygon to the
  * cells its bbox touches (bounded, tiny — a polygon-count-sized
  * relation that BROADCASTS), map each point to its one cell, candidate
  * pairs come from the cell EQUI-join, and the exact containment test
  * runs only on the candidate sliver.
  *
  * Exactness: integer vertices and points make the three edge
  * cross-products exact longs; strict interior (`all > 0` for CCW
  * rings) is deterministic with no epsilon — boundary points are OUT by
  * definition, the r02 clip convention.
  */
object Spatial {

  /** CCW integer triangle (ax,ay, bx,by, cx,cy). */
  type Tri = (Long, Long, Long, Long, Long, Long)

  /** Points `(id, px, py)` × triangles → containment pairs.
    * `cell` is the blocking tile size; candidates per point are bounded
    * by the polygons whose bbox shares its tile.
    */
  def containsJoin(points: DataFrame, tris: Seq[Tri], cell: Long): DataFrame = {
    require(cell >= 1, "containsJoin: cell size must be >= 1")
    tris.foreach { case (ax, ay, bx, by, cx, cy) =>
      require((bx - ax) * (cy - ay) - (by - ay) * (cx - ax) > 0,
        s"containsJoin: triangle (($ax,$ay),($bx,$by),($cx,$cy)) is not CCW")
    }
    val spark = points.sparkSession
    import spark.implicits._
    val triDf = tris.zipWithIndex
      .map { case ((ax, ay, bx, by, cx, cy), p) => (p.toLong, ax, ay, bx, by, cx, cy) }
      .toDF("poly_id", "ax", "ay", "bx", "by", "cx", "cy")
    def cellOf(v: org.apache.spark.sql.Column) =
      ((v - pmod(v, lit(cell))) / cell).cast("long")
    // polygon -> every tile its bbox touches (bounded explode on the
    // tiny polygon relation, never on the points)
    val tiles = triDf
      .withColumn("gx", explode(sequence(
        cellOf(least($"ax", $"bx", $"cx")), cellOf(greatest($"ax", $"bx", $"cx")))))
      .withColumn("gy", explode(sequence(
        cellOf(least($"ay", $"by", $"cy")), cellOf(greatest($"ay", $"by", $"cy")))))
    val pts = points.toDF("id", "px", "py")
      .withColumn("gx", cellOf($"px"))
      .withColumn("gy", cellOf($"py"))
    pts.join(broadcast(tiles), Seq("gx", "gy"))
      .withColumn("s1", ($"bx" - $"ax") * ($"py" - $"ay") - ($"by" - $"ay") * ($"px" - $"ax"))
      .withColumn("s2", ($"cx" - $"bx") * ($"py" - $"by") - ($"cy" - $"by") * ($"px" - $"bx"))
      .withColumn("s3", ($"ax" - $"cx") * ($"py" - $"cy") - ($"ay" - $"cy") * ($"px" - $"cx"))
      .where($"s1" > 0 && $"s2" > 0 && $"s3" > 0)
      .select($"id", $"poly_id", $"px", $"py")
      .orderBy($"id", $"poly_id")
  }
}
