package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Raster
import graft.functions.Geo

/** Raster-domain operators on tiny synthetic grids (SURVEY.md §5.2):
  * anomaly of constant grids, de-accumulation, bbox/clip, climatology with
  * nulls excluded like `cdo -setmissval` sentinels.
  */
class RasterSpec extends SparkSpec {
  import spark.implicits._

  /** variable t2m, 2×2 grid, monthly Jan 1991..2020 + Jan 2021; value =
    * year for Jan rows so the 1991-2020 normal is mean(1991..2020) = 2005.5.
    */
  private lazy val grid: DataFrame = {
    val rows = for {
      y <- 1991 to 2021
      lat <- Seq(0.0, 1.0); lon <- Seq(10.0, 11.0)
    } yield ("t2m", f"$y-01-01 00:00:00", lat, lon, y.toDouble)
    rows.toDF("variable", "time", "lat", "lon", "value")
      .withColumn("time", $"time".cast("timestamp_ntz"))
  }

  test("anomaly drops cells with no climatology coverage (inner-join semantics)") {
    val rows = Seq(
      // cell (0,10): climatology 2019+2020 plus the target month
      ("t2m", "2019-01-01 00:00:00", 0.0, 10.0, 10.0),
      ("t2m", "2020-01-01 00:00:00", 0.0, 10.0, 20.0),
      ("t2m", "2021-01-01 00:00:00", 0.0, 10.0, 18.0),
      // cell (9,99): appears ONLY in the target month — no normal exists
      ("t2m", "2021-01-01 00:00:00", 9.0, 99.0, 7.0))
      .toDF("variable", "time", "lat", "lon", "value")
      .withColumn("time", $"time".cast("timestamp_ntz"))
    val out = Raster.anomaly(rows, "t2m", "2021-01-01 00:00:00", 2019, 2020).collect()
    out.length shouldBe 1
    out.head.getAs[Double]("lat") shouldBe 0.0
    out.head.getAs[Double]("value") shouldBe (18.0 - 15.0)
  }

  test("climatologyNormal = mean over the year range per cell, nulls excluded") {
    val out = Raster.climatologyNormal(grid, "t2m", 1, 1991, 2020).collect()
    out.length shouldBe 4
    all(out.map(_.getAs[Double]("normal"))) shouldBe 2005.5
    // nodata null rows don't contribute (cdo -setmissval semantics)
    val withNull = grid.unionByName(
      Seq(("t2m", "1999-01-01 00:00:00", 0.0, 10.0, null.asInstanceOf[java.lang.Double]))
        .toDF("variable", "time", "lat", "lon", "value")
        .withColumn("time", $"time".cast("timestamp_ntz")))
    val cell = Raster.climatologyNormal(withNull, "t2m", 1, 1991, 2020)
      .where($"lat" === 0.0 && $"lon" === 10.0).collect()
    cell(0).getAs[Double]("normal") shouldBe 2005.5
  }

  test("anomaly = actual − 30-year normal (J1)") {
    val out = Raster.anomaly(grid, "t2m", "2021-01-01 00:00:00").collect()
    out.length shouldBe 4
    all(out.map(_.getAs[Double]("value"))) shouldBe (2021.0 - 2005.5)
  }

  test("anomaly of a constant field is zero") {
    val const = grid.withColumn("value", lit(5.0))
    val out = Raster.anomaly(const, "t2m", "2021-01-01 00:00:00").collect()
    all(out.map(_.getAs[Double]("value"))) shouldBe 0.0
  }

  test("deaccumulate recovers per-step increments from a cumulative field") {
    // cumulative value = year − 1990 → every diff is exactly 1
    val cum = grid.withColumn("value", year($"time") - lit(1990.0))
    val out = Raster.deaccumulate(cum).collect()
    out.length shouldBe (30 * 4) // first timestep per cell dropped
    all(out.map(_.getAs[Double]("value"))) shouldBe 1.0
  }

  test("bbox then clip: clip is at least as selective as its bbox") {
    val pts = Raster.bbox(grid, n = 0.5, w = 9.5, s = -0.5, e = 11.5)
    pts.count() shouldBe 31 * 2 // lat 0.0 rows only
    val ring: Geo.Ring = Array((9.5, -0.5), (10.5, -0.5), (10.5, 0.5), (9.5, 0.5), (9.5, -0.5))
    val clipped = Raster.clip(grid, ring)
    clipped.count() shouldBe 31 // only lon=10, lat=0
    val nulled = Raster.clipToNull(grid, ring)
    nulled.count() shouldBe grid.count()
    nulled.where($"value".isNotNull).count() shouldBe 31
  }

  test("convertUnit applies factor and offset (F1)") {
    val out = Raster.convertUnit(grid.limit(1), 2.0, -1.0).select($"value").as[Double].head()
    out shouldBe 1991.0 * 2 - 1
  }

  test("regrid: block means, floor anchoring across zero, partial blocks visible (R11)") {
    val t0 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    val g = Seq(
      ("t2m", t0, 0.0, 0.0, 10.0),   // block (0, 0)
      ("t2m", t0, 1.0, 2.0, 20.0),   // same block
      ("t2m", t0, -1.0, -1.0, 7.0),  // block (-2, -3): floor through zero
      ("t2m", t0, 3.0, 0.0, 5.0))    // block (2, 0), partial
      .toDF("variable", "time", "lat", "lon", "value")
    val out = Raster.regrid(g, 2.0, 3.0).collect()
      .map(r => (r.getDouble(2), r.getDouble(3)) ->
        ((r.getDouble(4), r.getLong(5)))).toMap
    out shouldBe Map(
      (0.0, 0.0) -> ((15.0, 2L)),
      (-2.0, -3.0) -> ((7.0, 1L)),
      (2.0, 0.0) -> ((5.0, 1L)))
  }

  test("inventory reports temporal extent per variable (A3/A4)") {
    val inv = Raster.inventory(grid).collect()
    inv.length shouldBe 1
    inv(0).getAs[String]("variable") shouldBe "t2m"
    inv(0).get(1).toString should startWith("1991-01-01")
    inv(0).get(2).toString should startWith("2021-01-01")
    inv(0).getAs[Long]("n_months") shouldBe 31L
    inv(0).getAs[Long]("n_cells") shouldBe (31L * 4)
  }

  test("binary raster sink round-trips values, nodata holes, and georeferencing (K1)") {
    import graft.sources.RasterBinarySink
    val dir = java.nio.file.Files.createTempDirectory("graft-binsink").toString
    val layout = RasterBinarySink.Layout(latMin = 0.0, latMax = 1.0,
      lonMin = 10.0, lonMax = 11.0, cell = 1.0)
    // one month, one cell nulled (nodata), one cell absent entirely
    val jan = grid.where(year($"time") === 2021)
      .withColumn("value", when($"lat" === 1.0 && $"lon" === 11.0,
        lit(null).cast("double")).otherwise($"value"))
      .where(!($"lat" === 0.0 && $"lon" === 11.0))
    val manifest = RasterBinarySink.write(jan, dir, layout).collect()
    manifest.length shouldBe 1
    val m = manifest.head
    m.getAs[Int]("width") shouldBe 2
    m.getAs[Int]("height") shouldBe 2
    m.getAs[Long]("n_cells") shouldBe 2L // 4 minus null minus absent

    val (w, h, arr) = RasterBinarySink.read(m.getAs[String]("path"))
    (w, h) shouldBe (2, 2)
    // row-major north→south: row 0 = lat 1.0, row 1 = lat 0.0
    arr(0) shouldBe 2021.0f          // (lat 1, lon 10)
    arr(1).isNaN shouldBe true       // (lat 1, lon 11) nulled → nodata
    arr(2) shouldBe 2021.0f          // (lat 0, lon 10)
    arr(3).isNaN shouldBe true       // (lat 0, lon 11) absent → nodata

    // ENVI sidecar parses as text with the right dimensions
    val hdr = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      m.getAs[String]("path").stripSuffix(".bin") + ".hdr")), "UTF-8")
    hdr should include("samples = 2")
    hdr should include("lines = 2")
    hdr should include("data type = 4")
    hdr should include("byte order = 0")

    // the .tif sibling is a real GeoTIFF: decode it back per the TIFF spec
    // and check pixels + georeferencing + geokeys agree with the .bin
    val tif = graft.sources.GeoTiff.decode(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(m.getAs[String]("path").stripSuffix(".bin") + ".tif")))
    (tif.width, tif.height) shouldBe (2, 2)
    tif.values(0) shouldBe 2021.0f
    tif.values(1) shouldBe RasterBinarySink.DefaultNodata
    tif.epsg shouldBe 4326
    tif.nodata shouldBe Some(RasterBinarySink.DefaultNodata)
    // tiepoint is the outer NW corner (cell center + half a cell up-left)
    tif.lonEdge shouldBe 9.5
    tif.latEdge shouldBe 1.5
    (tif.cellX, tif.cellY) shouldBe (1.0, 1.0)
  }

  test("GeoTiff codec: header structure, strip data, and big-endian tolerance") {
    import graft.sources.GeoTiff
    val vals = Array.tabulate(12)(k => k * 1.5f)
    val bytes = GeoTiff.encode(4, 3, vals, -21.0, 37.0, 0.25, 0.25, -9999f)
    new String(bytes.take(2), "US-ASCII") shouldBe "II"
    val t = GeoTiff.decode(bytes)
    t.values.toSeq shouldBe vals.toSeq
    (t.width, t.height, t.cellX, t.cellY) shouldBe (4, 3, 0.25, 0.25)
    (t.lonEdge, t.latEdge) shouldBe (-21.0, 37.0)
    an[IllegalArgumentException] should be thrownBy
      GeoTiff.decode("XX".getBytes("US-ASCII") ++ bytes.drop(2))
  }

  test("binary sink writes one raster file set per (variable, time) layer") {
    import graft.sources.RasterBinarySink
    val dir = java.nio.file.Files.createTempDirectory("graft-binsink2").toString
    val layout = RasterBinarySink.Layout(0.0, 1.0, 10.0, 11.0)
    val manifest = RasterBinarySink.write(grid, dir, layout).collect()
    manifest.length shouldBe 31 // one per monthly timestep
    manifest.foreach { m =>
      new java.io.File(m.getAs[String]("path")).length() shouldBe (2 * 2 * 4)
    }
    new java.io.File(dir).listFiles().count(_.getName.endsWith(".bin")) shouldBe 31
  }

  test("writePartitioned lays out variable/year/month and prunes on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-raster").toString
    Raster.writePartitioned(grid, dir)
    val back = spark.read.parquet(dir)
    back.count() shouldBe grid.count()
    // partition pruning: one month folder per (variable, year)
    val pruned = back.where($"variable" === "t2m" && $"year" === 2021 && $"month" === 1)
    pruned.count() shouldBe 4
    new java.io.File(s"$dir/variable=t2m/year=2021/month=1").exists() shouldBe true
  }

  test("gradient: linear field has constant slope; spacing rides the quotient; edges null") {
    // value = 3*lon + 5*lat on an irregular lon lattice {0, 1, 3}
    val rows = for (lat <- Seq(0.0, 1.0); lon <- Seq(0.0, 1.0, 3.0))
      yield ("v", "2024-01-01 00:00:00", lat, lon, 3 * lon + 5 * lat)
    val g = rows.toDF("variable", "time", "lat", "lon", "value")
      .withColumn("time", $"time".cast("timestamp_ntz"))
    val out = Raster.gradient(g).collect()
      .map(r => (r.getDouble(2), r.getDouble(3)) ->
        (Option(r.get(5)).map(_.asInstanceOf[Double]),
         Option(r.get(6)).map(_.asInstanceOf[Double]))).toMap
    // ddx = 3 everywhere a lon-predecessor exists — including the 1->3
    // jump (dv=6, dx=2): non-uniform spacing divides out
    out((0.0, 1.0))._1 shouldBe Some(3.0)
    out((0.0, 3.0))._1 shouldBe Some(3.0)
    out((1.0, 3.0))._1 shouldBe Some(3.0)
    out((0.0, 0.0))._1 shouldBe None          // lon edge
    // ddy = 5 wherever a lat-predecessor exists
    out((1.0, 0.0))._2 shouldBe Some(5.0)
    out((0.0, 0.0))._2 shouldBe None          // lat edge
  }

  test("gradient: axes are independent — a lon-constant field has zero ddx, nonzero ddy") {
    val rows = for (lat <- Seq(0.0, 2.0); lon <- Seq(0.0, 1.0))
      yield ("v", "2024-01-01 00:00:00", lat, lon, 7 * lat)
    val g = rows.toDF("variable", "time", "lat", "lon", "value")
      .withColumn("time", $"time".cast("timestamp_ntz"))
    val out = Raster.gradient(g)
    out.where($"ddx".isNotNull && $"ddx" =!= 0.0).count() shouldBe 0L
    out.where($"ddy" === 7.0).count() shouldBe 2L  // dv=14 over dlat=2
  }

  test("remapBilinear: textbook interpolation, exact hits, and the partial-corner audit") {
    // dense 2x2 source: v(0,0)=10, v(0,1)=20, v(1,0)=30, v(1,1)=60;
    // plus an isolated cell at (3,3) to exercise missing corners
    val rows = Seq((0.0, 0.0, 10.0), (0.0, 1.0, 20.0),
      (1.0, 0.0, 30.0), (1.0, 1.0, 60.0), (3.0, 3.0, 8.0))
      .map { case (la, lo, v) => ("v", "2024-01-01 00:00:00", la, lo, v) }
    val g = rows.toDF("variable", "time", "lat", "lon", "value")
      .withColumn("time", $"time".cast("timestamp_ntz"))
    // lat positions k/3 for k=0..9, lon positions k/4 — covers exact
    // lattice hits (k multiple of den) and interior points
    val out = Raster.remapBilinear(g, 0L, 1L, 3L, 10, 0L, 1L, 4L, 13)
      .collect().map(r => (r.getDouble(2), r.getDouble(3)) ->
        (Option(r.get(4)).map(_.asInstanceOf[Double]),
         r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // exact corner hit: full weight on one cell
    out((0.0, 0.0)) shouldBe ((Some(10.0), 120L, 12L, 4L))
    // wait: (0,0) target has corners (0,0),(0,1),(1,0),(1,1) all present,
    // weights 12,0,0,0 -> num=120, den=12, n_src=4, value=10
    // midpoint-ish target (1/3, 1/4): fy=1, fx=1 ->
    // w = (0,0):(3-1)(4-1)=6, (0,1):2*1=2, (1,0):1*3=3, (1,1):1*1=1
    // num = 6*10 + 2*20 + 3*30 + 1*60 = 250, den = 12 -> 250/12
    out((1.0 / 3, 0.25))._1 shouldBe Some(250.0 / 12)
    // textbook check at (2/3, 2/4): fy=2, fx=2 ->
    // w = 2,2,4,4 applied as (0,0):(1)(2)... recompute: wy0=1? no:
    // wy0 = 3-2 = 1, wy1 = 2; wx0 = 4-2 = 2, wx1 = 2
    // num = (1*2)*10 + (1*2)*20 + (2*2)*30 + (2*2)*60 = 420 -> 35.0
    out((2.0 / 3, 0.5))._1 shouldBe Some(35.0)
    // partial corners: target (8/3, 11/4) has only (3,3) among its
    // corners (fy=2, fx=3 -> corner (1,1) weight 2*3=6)
    val partial = out((8.0 / 3, 2.75))
    partial._4 shouldBe 1L       // n_src audit
    partial._3 shouldBe 6L       // present weight mass
    partial._1 shouldBe Some(8.0)
    // zero present mass -> NULL value, not invented data: target (3, 11/4)
    // hits lattice row 3 exactly (fy=0) so the (3,2)/(3,3) corners carry
    // all weight; (3,2) missing, (3,3) present with weight 3 -> fine;
    // instead take (7/3, 1/4): corners (2,0),(2,1),(3,0),(3,1) all absent
    out.get((7.0 / 3, 0.25)) shouldBe None // no corner joined -> no row
  }

  test("remapConservative: partial overlaps, mass conservation, fracarea on sparse grids") {
    def g(cells: Seq[(Double, Double, Double)]): DataFrame =
      cells.map { case (la, lo, v) => ("v", "2024-01-01 00:00:00", la, lo, v) }
        .toDF("variable", "time", "lat", "lon", "value")
        .withColumn("time", $"time".cast("timestamp_ntz"))

    // 2x2 dense source, one target cell [0.5,1.5)x[0.5,1.5): each source
    // cell contributes a quarter (wy=wx=1 in half-unit scale), so the
    // value is the plain mean and coverage is full
    val dense = g(Seq((0.0, 0.0, 10.0), (0.0, 1.0, 20.0),
      (1.0, 0.0, 30.0), (1.0, 1.0, 60.0)))
    val one = Raster.remapConservative(dense, 1L, 2L, 2L, 1, 1L, 2L, 2L, 1).collect()
    one.length shouldBe 1
    one.head.getDouble(2) shouldBe 0.5
    one.head.getDouble(3) shouldBe 0.5
    one.head.getDouble(4) shouldBe 30.0          // (10+20+30+60)/4
    one.head.getLong(5) shouldBe 120L            // num
    one.head.getLong(6) shouldBe 4L              // den_eff
    one.head.getLong(7) shouldBe 4L              // n_src
    one.head.getLong(8) shouldBe 1000000L        // fully covered

    // fracarea normalization: drop (1,1) -> mean over PRESENT area only,
    // coverage audit reports the 3/4 of the target actually observed
    val sparse = g(Seq((0.0, 0.0, 10.0), (0.0, 1.0, 20.0), (1.0, 0.0, 30.0)))
    val sp = Raster.remapConservative(sparse, 1L, 2L, 2L, 1, 1L, 2L, 2L, 1).collect()
    sp.head.getDouble(4) shouldBe 20.0           // (10+20+30)/3
    sp.head.getLong(6) shouldBe 3L
    sp.head.getLong(8) shouldBe 750000L

    // conservation: a target lattice COVERING the source domain receives
    // the whole mass — sum(num) = latDen*lonDen*sum(v), regardless of
    // how the misaligned internal edges slice the cells
    val nine = g(for { la <- 0 to 2; lo <- 0 to 2 }
      yield (la.toDouble, lo.toDouble, (la * 7 + lo * 3 + 1).toDouble))
    val out = Raster.remapConservative(nine, -1L, 5L, 4L, 3, -1L, 5L, 4L, 3).collect()
    out.map(_.getLong(5)).sum shouldBe 16L * nine.agg(sum($"value")).head.getDouble(0).toLong
    // interior slicing check: target [(-0.25+1.25), (-0.25+2.5)) = [1.0, 2.25)
    // on both axes -> overlaps source rows 1 (w=4? no: [4,9) vs [4,8) -> 4)
    // and 2 ([8,9) -> 1): wy in {4,1}, wx in {4,1}
    val mid = out.find(r => r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0).get
    // v(1,1)=11 w=16, v(1,2)=14 w=4, v(2,1)=18 w=4, v(2,2)=21 w=1
    mid.getLong(5) shouldBe (16L * 11 + 4 * 14 + 4 * 18 + 21)
    mid.getLong(6) shouldBe 25L
    mid.getLong(8) shouldBe 1000000L
  }

  test("cellTrend: textbook slope/intercept per cell; single-month cells drop") {
    // cell (0,0): Jan-Mar 2000 -> t = 24001..24003, y = 10,12,14: a
    // perfect line with slope 2, intercept 10 - 2*24001 = -47992
    // cell (1,1): one month only -> dropped (n < 2)
    val rows = Seq(
      ("A", "2000-01-15 00:00:00", 0.0, 0.0, 10.0),
      ("A", "2000-02-15 00:00:00", 0.0, 0.0, 12.0),
      ("A", "2000-03-15 00:00:00", 0.0, 0.0, 14.0),
      ("A", "2000-01-15 00:00:00", 1.0, 1.0, 5.0),
      ("R", "2000-02-15 00:00:00", 1.0, 1.0, 6.0)) // other variable ignored
      .toDF("variable", "time", "lat", "lon", "value")
      .withColumn("time", $"time".cast("timestamp_ntz"))
    val out = Raster.cellTrend(rows, "A").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    out((0.0, 0.0)) shouldBe ((3L, 2.0, -47992.0))
    out.size shouldBe 1
  }

  test("vectorSpeed: 3-4-5 magnitudes, all four quadrants, missing component drops") {
    val ts = "2024-01-01 00:00:00"
    val rows = Seq( // center 25: (u,v) = (3,4), (-4,3), (-3,-4), (4,-3)
      ("A", 0.0, 0.0, 28.0), ("N", 0.0, 0.0, 29.0),
      ("A", 0.0, 1.0, 21.0), ("N", 0.0, 1.0, 28.0),
      ("A", 1.0, 0.0, 22.0), ("N", 1.0, 0.0, 21.0),
      ("A", 1.0, 1.0, 29.0), ("N", 1.0, 1.0, 22.0),
      ("A", 5.0, 5.0, 30.0),                    // v component missing -> dropped
      ("R", 0.0, 0.0, 99.0))                    // other variable: ignored
      .map { case (v, la, lo, x) => (v, ts, la, lo, x) }
    val g = rows.toDF("variable", "time", "lat", "lon", "value")
      .withColumn("time", $"time".cast("timestamp_ntz"))
    val out = Raster.vectorSpeed(g, "A", "N", 25.0).collect()
      .map(r => (r.getDouble(1), r.getDouble(2)) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toMap
    out((0.0, 0.0)) shouldBe ((3.0, 4.0, 5.0, 1L))
    out((0.0, 1.0)) shouldBe ((-4.0, 3.0, 5.0, 2L))
    out((1.0, 0.0)) shouldBe ((-3.0, -4.0, 5.0, 3L))
    out((1.0, 1.0)) shouldBe ((4.0, -3.0, 5.0, 4L))
    out.size shouldBe 4
  }

  test("focalMean: interior averages 9, edges fewer, holes skipped, no halo rows") {
    // 3x3 lattice with the center MISSING; values = 10*lat + lon
    val rows = for {
      lat <- Seq(0.0, 1.0, 2.0); lon <- Seq(0.0, 1.0, 2.0)
      if !(lat == 1.0 && lon == 1.0)
    } yield ("v", "2024-01-01 00:00:00", lat, lon, 10 * lat + lon)
    val g = rows.toDF("variable", "time", "lat", "lon", "value")
      .withColumn("time", $"time".cast("timestamp_ntz"))
    val out = Raster.focalMean(g).collect()
      .map(r => (r.getDouble(2), r.getDouble(3)) ->
        ((r.getLong(4), r.getDouble(5)))).toMap
    // corner (0,0): neighbors present = (0,0)(0,1)(1,0) -> mean of 0,1,10
    // (11/3 rounded at the operator's 4-decimal contract)
    out((0.0, 0.0)) shouldBe ((3L, 3.6667))
    // edge (0,1): 5 positions exist, center hole missing -> 0,1,2,10,12
    out((0.0, 1.0)) shouldBe ((5L, 5.0))
    // the missing center produced NO output row, and no halo ring either
    out.contains((1.0, 1.0)) shouldBe false
    out.contains((-1.0, -1.0)) shouldBe false
    out.size shouldBe 8
  }

  test("hornGradient: unit-ramp gradients exact, edges and broken windows silent") {
    // full 3x3 lattice, ramp value = 10*lat + lon: the Horn kernel's
    // weight mass is (1+2+1)*2 = 8 per axis -> gx = 8, gy = 80
    val rows = for { lat <- Seq(0.0, 1.0, 2.0); lon <- Seq(0.0, 1.0, 2.0) }
      yield ("v", "2024-01-01 00:00:00", lat, lon, 10 * lat + lon)
    val g = rows.toDF("variable", "time", "lat", "lon", "value")
      .withColumn("time", $"time".cast("timestamp_ntz"))
    val out = Raster.hornGradient(g).collect()
    out.length shouldBe 1 // only the interior cell has all 9 neighbors
    val r = out.head
    (r.getDouble(2), r.getDouble(3)) shouldBe ((1.0, 1.0))
    r.getLong(4) shouldBe 8L    // gx
    r.getLong(5) shouldBe 80L   // gy
    r.getLong(6) shouldBe (8L * 8 + 80L * 80) // slope_sq
    r.getLong(7) shouldBe 1L    // quadrant: both gradients non-negative
    // knocking out one corner breaks the only full window -> empty
    val holed = rows.filterNot(t => t._3 == 0.0 && t._4 == 0.0)
      .toDF("variable", "time", "lat", "lon", "value")
      .withColumn("time", $"time".cast("timestamp_ntz"))
    Raster.hornGradient(holed).count() shouldBe 0L
    // descending ramp flips the quadrant: value = -(10*lat + lon)
    val neg = rows.map(t => (t._1, t._2, t._3, t._4, -t._5))
      .toDF("variable", "time", "lat", "lon", "value")
      .withColumn("time", $"time".cast("timestamp_ntz"))
    val rn = Raster.hornGradient(neg).collect().head
    rn.getLong(4) shouldBe -8L
    rn.getLong(5) shouldBe -80L
    rn.getLong(7) shouldBe 3L
  }

  test("ruggedness: ramp TRI/TPI/roughness exact; constant terrain scores zero") {
    // full 3x3 lattice, ramp value = 10*lat + lon: neighbour offsets
    // from the center (11) are {-11,-10,-9,-1,1,9,10,11} ->
    // TRI_sq = 606; a linear ramp's center equals its window mean ->
    // TPI numerator exactly 0; roughness = 22 - 0
    val rows = for { lat <- Seq(0.0, 1.0, 2.0); lon <- Seq(0.0, 1.0, 2.0) }
      yield ("v", "2024-01-01 00:00:00", lat, lon, 10 * lat + lon)
    val g = rows.toDF("variable", "time", "lat", "lon", "value")
      .withColumn("time", $"time".cast("timestamp_ntz"))
    val out = Raster.ruggedness(g).collect()
    out.length shouldBe 1 // only the interior cell has the full window
    val r = out.head
    (r.getDouble(2), r.getDouble(3)) shouldBe ((1.0, 1.0))
    r.getLong(4) shouldBe 11L  // center
    r.getLong(5) shouldBe 606L // tri_sq
    r.getLong(6) shouldBe 0L   // tpi_num: ramp center IS the window mean
    r.getLong(7) shouldBe 22L  // roughness = max - min
    // constant terrain: every ruggedness measure is exactly zero
    val flat = rows.map(t => (t._1, t._2, t._3, t._4, 7.0))
      .toDF("variable", "time", "lat", "lon", "value")
      .withColumn("time", $"time".cast("timestamp_ntz"))
    val rf = Raster.ruggedness(flat).collect().head
    (rf.getLong(5), rf.getLong(6), rf.getLong(7)) shouldBe ((0L, 0L, 0L))
    // a hole anywhere breaks the only full window -> silent, not a guess
    val holed = rows.filterNot(t => t._3 == 0.0 && t._4 == 0.0)
      .toDF("variable", "time", "lat", "lon", "value")
      .withColumn("time", $"time".cast("timestamp_ntz"))
    Raster.ruggedness(holed).count() shouldBe 0L
  }

  test("landforms: two-scale TPI classes — peak, pit, local-high-on-broad-low") {
    def gridOf(v: (Int, Int) => Double) = {
      val rows = for { lat <- 0 to 4; lon <- 0 to 4 }
        yield ("v", "2024-01-01 00:00:00", lat.toDouble, lon.toDouble, v(lat, lon))
      rows.toDF("variable", "time", "lat", "lon", "value")
        .withColumn("time", $"time".cast("timestamp_ntz"))
    }
    // constant terrain: one full-5x5 cell, flat
    val flat = Raster.landforms(gridOf((_, _) => 7.0)).collect()
    flat.length shouldBe 1
    flat.head.getString(6) shouldBe "flat_slope"
    // isolated peak at the center: high at both scales -> ridge
    val peak = Raster.landforms(
      gridOf((y, x) => if (y == 2 && x == 2) 100.0 else 0.0)).collect()
    peak.head.getString(6) shouldBe "ridge"
    // inverted -> valley
    val pit = Raster.landforms(
      gridOf((y, x) => if (y == 2 && x == 2) 0.0 else 100.0)).collect()
    pit.head.getString(6) shouldBe "valley"
    // center slightly above its 3x3 ring but the 5x5 ring is higher:
    // local high on a broad low -> upper_slope (tpi3=80 -> u3=240 > 120;
    // tpi5=-240, not below -120 threshold on the joint branch)
    val bench = Raster.landforms(gridOf { (y, x) =>
      if (y == 2 && x == 2) 60.0
      else if (y >= 1 && y <= 3 && x >= 1 && x <= 3) 50.0
      else 80.0
    }).collect()
    bench.head.getLong(4) shouldBe 80L   // tpi3_num
    bench.head.getLong(5) shouldBe -240L // tpi5_num
    bench.head.getString(6) shouldBe "upper_slope"
  }

  test("strahlerOrder: a 3-way confluence bumps to 2; pass-through keeps the max") {
    // valley terrain z = 10*lat + 5*|lon-2|: row-3 interior cells all
    // drain into (2,2) (a 3-inflow confluence -> order 2), which then
    // feeds (1,2) alone (max 2, k=1 -> stays 2, the Strahler rule)
    val rows = for { lat <- 0 to 4; lon <- 0 to 4 }
      yield ("v", "2024-01-01 00:00:00", lat.toDouble, lon.toDouble,
        10.0 * lat + 5.0 * math.abs(lon - 2))
    val g = rows.toDF("variable", "time", "lat", "lon", "value")
      .withColumn("time", $"time".cast("timestamp_ntz"))
    val out = Raster.strahlerOrder(g).collect()
      .map(r => (r.getDouble(2), r.getDouble(3)) -> r.getLong(4)).toMap
    out.size shouldBe 9 // the full-window interior
    out((2.0, 2.0)) shouldBe 2L
    out((1.0, 2.0)) shouldBe 2L
    out.filterKeys(k => k != ((2.0, 2.0)) && k != ((1.0, 2.0))).values
      .foreach(_ shouldBe 1L)
  }

  test("zonalMode: the majority class per band, smallest-class tie-break") {
    // the r38 peak fixture on a 5x5 grid: only the CENTER has the full
    // 5x5 window (landforms' scope), so the zone holds one ridge cell
    val rows = for { lat <- 0 to 4; lon <- 0 to 4 }
      yield ("v", "2024-01-01 00:00:00", lat.toDouble, lon.toDouble,
        if (lat == 2 && lon == 2) 100.0 else 0.0)
    val g = rows.toDF("variable", "time", "lat", "lon", "value")
      .withColumn("time", $"time".cast("timestamp_ntz"))
    val out = Raster.zonalMode(g).collect()
    out.length shouldBe 1
    val r = out.head
    (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)) shouldBe
      (("v", 0L, "ridge", 1L, 1L))
    // tie-break: constant terrain is all flat_slope (no tie to break),
    // and the zone key floors negatives toward -inf
    val neg = rows.map(t => (t._1, t._2, t._3 - 10.0, t._4, 7.0))
      .toDF("variable", "time", "lat", "lon", "value")
      .withColumn("time", $"time".cast("timestamp_ntz"))
    val rn = Raster.zonalMode(neg).collect().head
    rn.getLong(1) shouldBe -2L // lats -10..-6 -> interior lats floor to -2
    rn.getString(2) shouldBe "flat_slope"
  }

  test("fillSinks: a pit fills to its spill level; channels drain; flats untouched") {
    def gridOf(v: (Int, Int) => Double) = {
      val rows = for { lat <- 0 to 4; lon <- 0 to 4 }
        yield ("v", "2024-01-01 00:00:00", lat.toDouble, lon.toDouble, v(lat, lon))
      rows.toDF("variable", "time", "lat", "lon", "value")
        .withColumn("time", $"time".cast("timestamp_ntz"))
    }
    def fills(g: org.apache.spark.sql.DataFrame): Map[(Double, Double), Long] =
      Raster.fillSinks(g).collect()
        .map(r => (r.getDouble(2), r.getDouble(3)) -> r.getLong(6)).toMap
    // closed pit: center 2 in a plane of 10 -> filled to the rim (8)
    val pit = fills(gridOf((y, x) => if (y == 2 && x == 2) 2.0 else 10.0))
    pit((2.0, 2.0)) shouldBe 8L
    pit.values.sum shouldBe 8L // nothing else rises
    // channel to the boundary: spill level is the channel's highest
    // step (5), so the pit fills to 5 and the channel cell to 5
    val chan = fills(gridOf { (y, x) =>
      if (y == 2 && x == 2) 2.0
      else if (y == 1 && x == 2) 4.0
      else if (y == 0 && x == 2) 5.0
      else 10.0
    })
    chan((2.0, 2.0)) shouldBe 3L // 2 -> 5
    chan((1.0, 2.0)) shouldBe 1L // 4 -> 5
    chan((0.0, 2.0)) shouldBe 0L // boundary cells never rise
    // flat terrain: zero fill everywhere
    fills(gridOf((_, _) => 7.0)).values.sum shouldBe 0L
  }

  test("flowDirection: D8 argmax with exact diagonal cross-multiply and min-code ties") {
    def gridOf(vals: Map[(Double, Double), Double]) = {
      val rows = for { lat <- Seq(-1.0, 0.0, 1.0); lon <- Seq(-1.0, 0.0, 1.0) }
        yield ("v", "2024-01-01 00:00:00", lat, lon,
          vals.getOrElse((lat, lon), 10.0))
      rows.toDF("variable", "time", "lat", "lon", "value")
        .withColumn("time", $"time".cast("timestamp_ntz"))
    }
    def flow(vals: Map[(Double, Double), Double]) = {
      val r = Raster.flowDirection(gridOf(vals)).collect()
      r.length shouldBe 1 // only the center has a full window
      (r.head.getLong(4), r.head.getLong(5), r.head.getLong(6))
    }
    // straight drop 3 beats diagonal drop 4: 2·3² = 18 > 4² = 16 —
    // the √2 distance handled without any floating point
    flow(Map((0.0, 1.0) -> 7.0, (-1.0, 1.0) -> 6.0)) shouldBe ((1L, 3L, 2L))
    // diagonal drop 5 beats straight drop 3: 5² = 25 > 2·3² = 18
    flow(Map((1.0, 1.0) -> 5.0, (0.0, 1.0) -> 7.0)) shouldBe ((128L, 5L, 2L))
    // equal keys tie to the smallest ESRI code (E=1 over S=4)
    flow(Map((0.0, 1.0) -> 8.0, (-1.0, 0.0) -> 8.0)) shouldBe ((1L, 2L, 2L))
    // a pit (all neighbors higher) routes nowhere: code 0, drop 0
    flow(Map((0.0, 0.0) -> 0.0)) shouldBe ((0L, 0L, 0L))
    // all eight codes reachable: lone low neighbor in each direction
    val dirs = Seq(((0.0, 1.0), 1L), ((-1.0, 1.0), 2L), ((-1.0, 0.0), 4L),
      ((-1.0, -1.0), 8L), ((0.0, -1.0), 16L), ((1.0, -1.0), 32L),
      ((1.0, 0.0), 64L), ((1.0, 1.0), 128L))
    dirs.foreach { case (pos, code) =>
      flow(Map(pos -> 4.0)) shouldBe ((code, 6L, 1L))
    }
  }

  test("flowAccumulation: a westward ramp chains upstream counts to the hop cap") {
    // 3x9 grid, value = lon: every interior cell's steepest descent is
    // the straight west neighbor (drop 1, key 2 beats the diagonal key 1),
    // so the flow graph is one west-flowing chain along the interior row
    val rows = for { lat <- Seq(0.0, 1.0, 2.0); lon <- (0 to 8).map(_.toDouble) }
      yield ("v", "2024-01-01 00:00:00", lat, lon, lon)
    val g = rows.toDF("variable", "time", "lat", "lon", "value")
      .withColumn("time", $"time".cast("timestamp_ntz"))
    val out = Raster.flowAccumulation(g, maxHops = 4).collect()
      .map(r => (r.getDouble(2), r.getDouble(3)) -> ((r.getLong(4), r.getLong(5)))).toMap
    // interior cells: lat 1, lon 1..7; all flow west (code 16)
    out.keySet shouldBe (1 to 7).map(c => (1.0, c.toDouble)).toSet
    for (c <- 1 to 7) {
      val (code, acc) = out((1.0, c.toDouble))
      code shouldBe 16L
      // upstream of col c are cols c+1..7, capped at 4 hops
      acc shouldBe 1L + math.min(4, 7 - c)
    }
    // hop cap 1: only the immediate upstream neighbor counts
    val one = Raster.flowAccumulation(g, maxHops = 1).collect()
      .map(r => r.getDouble(3) -> r.getLong(5)).toMap
    for (c <- 1 to 6) one(c.toDouble) shouldBe 2L
    one(7.0) shouldBe 1L
  }

  test("watershedBasins: pointer jumping = the 2^rounds absorbed walk") {
    // 3x15 westward ramp: the interior row is one west-flowing chain of
    // depth 12 — col 1 is the terminal (its west target is off-interior,
    // so it absorbs); 3 doubling rounds reach exactly 8 steps
    val rows = for { lat <- Seq(0.0, 1.0, 2.0); lon <- (0 to 14).map(_.toDouble) }
      yield ("v", "2024-01-01 00:00:00", lat, lon, lon)
    val g = rows.toDF("variable", "time", "lat", "lon", "value")
      .withColumn("time", $"time".cast("timestamp_ntz"))
    val out = Raster.watershedBasins(g, rounds = 3).collect()
      .map(r => r.getDouble(3) -> ((r.getDouble(5), r.getBoolean(6)))).toMap
    out.keySet shouldBe (1 to 13).map(_.toDouble).toSet
    for (c <- 1 to 13) {
      val expBasin = math.max(c - 8, 1).toDouble
      out(c.toDouble) shouldBe ((expBasin, expBasin == 1.0))
    }
    // one more doubling round (16 steps) drains the whole chain
    val all = Raster.watershedBasins(g, rounds = 4).collect()
      .map(r => r.getDouble(3) -> ((r.getDouble(5), r.getBoolean(6)))).toMap
    for (c <- 1 to 13) all(c.toDouble) shouldBe ((1.0, true))
  }
}
