package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import graft.functions.ZOrder
import scala.jdk.CollectionConverters._

/** Z-order layout keys (r10): bit-exact Morton arithmetic, and the thing
  * the key is FOR — written ORDER BY zkey, a bbox predicate touches a
  * fraction of the parquet row groups the unclustered layout does,
  * proven from the real footers' min/max statistics.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def refSpread(x0: Long): Long = {
    var x = x0
    for ((s, m) <- ZOrder.spreadSteps) x = (x | (x << s)) & m
    x
  }

  test("spreadBits matches the reference bit-twiddle on random 32-bit values") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(200)(rnd.nextInt(Int.MaxValue).toLong) ++
      Seq(0L, 1L, 65535L, (1L << 32) - 1)
    val got = xs.toDF("x").select(ZOrder.spreadBits($"x")).as[Long].collect()
    got shouldBe xs.map(refSpread).toArray
  }

  test("mortonKey interleaves bit-exactly (a even, b odd)") {
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (0xFFFFFFFFL, 0L))
    val got = pairs.toDF("a", "b").select(ZOrder.mortonKey($"a", $"b"))
      .as[Long].collect()
    got shouldBe pairs.map { case (a, b) => refSpread(a) | (refSpread(b) << 1) }.toArray
  }

  test("quantize clamps both edges into the boundary cells") {
    val got = Seq(-999.0, -90.0, 0.0, 89.999, 90.0, 999.0).toDF("lat")
      .select(ZOrder.quantize($"lat", -90.0, 180.0, 16)).as[Long].collect()
    got(0) shouldBe 0L     // missing-value sentinel: clamped, not negative
    got(1) shouldBe 0L
    got(2) shouldBe 32768L
    got(4) shouldBe 65535L // not 65536: clamped
    got(5) shouldBe 65535L
  }

  test("z-ordered layout prunes bbox row groups that the unclustered layout scans") {
    // bigger fixture so the file holds many row groups
    val g = operators.Raster
      .demoGrid(sources.Tables(spark, "/root/testdata/sf0.01", "lineitem"))
      .select($"lat", $"lon", $"value")
    val root = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    def write(df: org.apache.spark.sql.DataFrame, dir: String): Unit =
      df.coalesce(1).write.option("parquet.block.size", 32 * 1024)
        .mode("overwrite").parquet(dir)
    write(g, s"$root/plain")
    // repartition(1) BEFORE the sort: sorting first and coalescing after
    // would concatenate per-partition sorted runs, not a global z-order
    write(g.repartition(1).sortWithinPartitions(ZOrder.zorderLatLon($"lat", $"lon")),
      s"$root/zorder")

    // per-row-group (lat, lon) min/max boxes straight from the footers
    def boxes(dir: String): Seq[((Double, Double), (Double, Double))] = {
      val conf = new Configuration()
      new java.io.File(dir).listFiles.filter(_.getName.endsWith(".parquet")).toSeq
        .flatMap { f =>
          val rd = ParquetFileReader.open(
            HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
          try rd.getFooter.getBlocks.asScala.toSeq.map { b =>
            def mm(name: String): (Double, Double) = {
              val c = b.getColumns.asScala.find(_.getPath.toDotString == name).get
              val st = c.getStatistics
              (st.genericGetMin.toString.toDouble, st.genericGetMax.toString.toDouble)
            }
            (mm("lat"), mm("lon"))
          } finally rd.close()
        }
    }
    // a box covering ~5% of the demo grid's 20°x30° extent
    // (lat in [-5, 0], lon in [-10, -5])
    def touched(bs: Seq[((Double, Double), (Double, Double))]): Int =
      bs.count { case ((laMin, laMax), (loMin, loMax)) =>
        laMax >= -5 && laMin <= 0 && loMax >= -10 && loMin <= -5
      }
    val plain = boxes(s"$root/plain")
    val z = boxes(s"$root/zorder")
    z.size shouldBe plain.size +- 2          // same data, same granularity
    plain.size should be >= 6                // enough groups to mean anything
    touched(plain) shouldBe plain.size       // unclustered: every group spans the world
    touched(z).toDouble should be <= z.size * 0.3 // clustered: the bbox is local
  }
}
