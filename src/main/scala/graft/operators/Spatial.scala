package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.implicits._

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
  def containsJoin(points: DataFrame, tris: Seq[Tri], cell: Long): DataFrame =
    containedPairs(points.toDF("id", "px", "py"), tris, cell)
      .select($"id", $"poly_id", $"px", $"py")
      .orderBy($"id", $"poly_id")

  /** Zonal statistics (r31) — per-polygon aggregate of a point-borne
    * value: the GIS `zonal_stats` every raster-over-admin-regions
    * report runs (mean rainfall per district, population per zone —
    * the reference's single-region clip+aggregate generalized to MANY
    * zones in one pass). Same blocked candidate join as
    * [[containsJoin]], then ONE partial-aggregating shuffle keyed by
    * polygon — per-zone stats cost |candidates| map work plus a
    * zone-count-sized reduce, never a per-polygon pass over the
    * points. Only zones containing ≥ 1 point appear (inner semantics,
    * the GROUP BY contract); all-integer values keep sums exact.
    */
  def zonalStats(points: DataFrame, tris: Seq[Tri], cell: Long): DataFrame =
    containedPairs(points.toDF("id", "px", "py", "value"), tris, cell)
      .groupBy($"poly_id")
      .agg(count(lit(1)).as("n_points"),
        sum($"value").as("sum_value"),
        min($"value").as("min_value"),
        max($"value").as("max_value"))
      .orderBy($"poly_id")

  /** Shared kernel: point rows (with `px`/`py` plus any payload
    * columns) → the same rows tagged `poly_id` for every triangle that
    * strictly contains them. Tile explode on the broadcast polygon
    * side, equi-join on the tile key, exact integer containment on the
    * candidate sliver only.
    */
  private def containedPairs(points: DataFrame, tris: Seq[Tri], cell: Long): DataFrame = {
    require(cell >= 1, "containedPairs: cell size must be >= 1")
    tris.foreach { case (ax, ay, bx, by, cx, cy) =>
      require((bx - ax) * (cy - ay) - (by - ay) * (cx - ax) > 0,
        s"containedPairs: triangle (($ax,$ay),($bx,$by),($cx,$cy)) is not CCW")
    }
    val spark = points.sparkSession
    // only the Seq->DF lift: the full implicits would shadow graft's $
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
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
    val pts = points
      .withColumn("gx", cellOf($"px"))
      .withColumn("gy", cellOf($"py"))
    pts.join(broadcast(tiles), Seq("gx", "gy"))
      .withColumn("s1", ($"bx" - $"ax") * ($"py" - $"ay") - ($"by" - $"ay") * ($"px" - $"ax"))
      .withColumn("s2", ($"cx" - $"bx") * ($"py" - $"by") - ($"cy" - $"by") * ($"px" - $"bx"))
      .withColumn("s3", ($"ax" - $"cx") * ($"py" - $"cy") - ($"ay" - $"cy") * ($"px" - $"cx"))
      .where($"s1" > 0 && $"s2" > 0 && $"s3" > 0)
      .drop("gx", "gy", "ax", "ay", "bx", "by", "cx", "cy", "s1", "s2", "s3")
  }
}
