package graft

import graft.functions.Geo

/** Point-in-polygon properties (SURVEY.md §5.3): ray casting vs an
  * independent sign test on a convex ring, and containment ⊂ bbox.
  */
class GeoSpec extends SparkSpec {

  private val rng = new scala.util.Random(7)

  /** Independent oracle for convex rings: point is inside iff all cross
    * products have the same sign (ring wound consistently).
    */
  private def convexContains(ring: Geo.Ring)(x: Double, y: Double): Boolean = {
    val edges = ring.sliding(2).toSeq
    val signs = edges.map { case Array((x1, y1), (x2, y2)) =>
      math.signum((x2 - x1) * (y - y1) - (y2 - y1) * (x - x1))
    }.filter(_ != 0)
    signs.distinct.length == 1
  }

  test("ray casting agrees with the convex sign test on the oracle triangle") {
    (1 to 2000).foreach { _ =>
      val x = rng.nextDouble() * 0.1
      val y = rng.nextDouble() * 0.1
      Geo.contains(Geo.testTriangle)(x, y) shouldBe convexContains(Geo.testTriangle)(x, y)
    }
  }

  test("containment implies bbox membership (P2 ⊇ P3)") {
    val lons = Geo.africaOutline.map(_._1)
    val lats = Geo.africaOutline.map(_._2)
    val (w, e, s, n) = (lons.min, lons.max, lats.min, lats.max)
    (1 to 2000).foreach { _ =>
      val lon = rng.nextDouble() * 120 - 40
      val lat = rng.nextDouble() * 100 - 50
      if (Geo.contains(Geo.africaOutline)(lon, lat)) {
        lon should (be >= w and be <= e)
        lat should (be >= s and be <= n)
      }
    }
  }

  test("africa outline contains obvious interior points, excludes exterior") {
    Geo.contains(Geo.africaOutline)(20.0, 5.0) shouldBe true    // central Africa
    Geo.contains(Geo.africaOutline)(25.0, -25.0) shouldBe true  // southern Africa
    Geo.contains(Geo.africaOutline)(-30.0, 40.0) shouldBe false // Atlantic
    Geo.contains(Geo.africaOutline)(60.0, -30.0) shouldBe false // Indian Ocean
  }

  test("clipValue nulls values outside the ring (gdalwarp -dstnodata analog)") {
    import spark.implicits._
    val pts = Seq((0.05, 0.05, 1.0), (0.5, 0.5, 2.0)).toDF("lon", "lat", "value")
    val out = pts.select(Geo.clipValue(Geo.testTriangle)($"lon", $"lat", $"value"))
      .collect().map(r => Option(r.get(0)))
    out shouldBe Array(Some(1.0), None)
  }
}
