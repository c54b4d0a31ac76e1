package graft

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import graft.operators.Raster
import graft.sources.{GeoTiff, Grib1, RasterBinarySink}

/** The reference's entire monthly dataflow replayed natively at the byte
  * level on BOTH ends: real GRIB1 bytes in (era5monthly.js download →
  * wgrib extract), long-format grid at rest, climatology + anomaly in the
  * middle (cdo timmean / sub), and a real LZW GeoTIFF out
  * (gdal_translate) — no wgrib, cdo, or GDAL anywhere.
  */
class PipelineSpec extends SparkSpec {

  // 6 monthly TMP fields on a 10×7 grid; value(i,j,month) is closed-form
  // so every downstream number is hand-checkable
  private val ni = 10; private val nj = 7
  private def scaledAt(m: Int, i: Int, j: Int): Int = 100 + 10 * m + i + j

  private def fields: Seq[Grib1.Field] =
    (0 until 6).map { m =>
      Grib1.Field(11, LocalDateTime.of(1995 + m, 3, 1, 0, 0), ni, nj,
        la1Milli = 6000, lo1Milli = 10000, diMilli = 1000, djMilli = 1000,
        decimalScale = 1,
        Array.tabulate(nj * ni)(k => Some(scaledAt(m, k % ni, k / ni))))
    }

  test("GRIB bytes -> landed grid -> climatology anomaly -> GeoTIFF, end to end") {
    val in = Files.createTempDirectory("graft-e2e-in")
    val gridDir = Files.createTempDirectory("graft-e2e-grid").resolve("grid").toString
    fields.zipWithIndex.foreach { case (f, m) =>
      Grib1.writeFile(in.resolve(s"tmp-${1995 + m}-03.grib"), Seq(f))
    }
    Grib1.landToGrid(spark, in.toString, gridDir) shouldBe 6

    val grid = spark.read.parquet(gridDir)
      .select(col("variable"), col("time"), col("lat"), col("lon"), col("value"))

    // climatology over 1995-2000 March fields: mean of value(m) over m=0..5
    // = (sum(100+10m)+i+j*10... careful: value = (100 + 10m + i + j)/10
    // → mean over m = (100 + 25 + i + j)/10 = (125 + i + j)/10
    val normal = Raster.climatologyNormal(grid, "TMP", calMonth = 3, 1995, 2000)
    val n00 = normal.where(col("lat") === 6.0 && col("lon") === 10.0)
      .select(col("normal")).head().getDouble(0)
    n00 shouldBe (125.0 / 10.0) +- 1e-9

    // anomaly of the 2000 slice: value(m=5) − mean = (100+50+i+j)/10 − (125+i+j)/10 = 2.5
    val slice = grid.where(year(col("time")) === 2000)
    val anomaly = slice.join(broadcast(normal), Seq("lat", "lon"))
      .select(col("variable"), col("time"), col("lat"), col("lon"),
        (col("value") - col("normal")).as("value"))
    val avals = anomaly.select(col("value")).collect().map(_.getDouble(0))
    avals should have length (ni * nj)
    all(avals.map(v => math.abs(v - 2.5))) should be < 1e-9

    // export the anomaly layer as the reference's downstream contract:
    // a real LZW+predictor GeoTIFF (+ ENVI pair)
    val outDir = Files.createTempDirectory("graft-e2e-out").toString
    // one extra southern row beyond the GRIB extent → lands as nodata
    val layout = RasterBinarySink.Layout(
      latMin = -1.0, latMax = 6.0, lonMin = 10.0, lonMax = 19.0, cell = 1.0)
    val manifest = RasterBinarySink.write(anomaly, outDir, layout).collect()
    manifest.length shouldBe 1

    val tifPath = manifest.head.getAs[String]("path").stripSuffix(".bin") + ".tif"
    val tif = GeoTiff.decode(Files.readAllBytes(java.nio.file.Paths.get(tifPath)))
    (tif.width, tif.height) shouldBe (10, 8)
    tif.epsg shouldBe 4326
    // top-left pixel = northernmost row (lat 6.0), lon 10.0 → anomaly 2.5
    tif.values(0) shouldBe 2.5f
    // the row below the GRIB extent is nodata
    tif.values(tif.width * (tif.height - 1)) shouldBe tif.nodata.get
  }
}
