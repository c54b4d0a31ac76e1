package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.functions.{Geo, PolyHash, Scalars, Vectors}

/** Property-based coverage (SURVEY.md §5.3): algebraic laws of the scalar
  * surface, geometry containment, calendar generation, hash portability,
  * and the native expressions against their spec formulations.
  */
class PropertySpec extends SparkSpec {
  import graft.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(200)
  private def check(p: Prop): Unit = assert(SCTest.check(params, p).passed)

  test("clamp: bounded, idempotent, identity inside bounds (math.js:2-5)") {
    def clamp(x: Double, lo: Double, hi: Double) = math.max(math.min(x, hi), lo)
    check(Prop.forAll(Gen.chooseNum(-1e6, 1e6), Gen.chooseNum(-1e3, 1e3), Gen.posNum[Double]) {
      (x: Double, lo: Double, w: Double) =>
        val hi = lo + w
        val c = clamp(x, lo, hi)
        c >= lo && c <= hi && clamp(c, lo, hi) == c &&
          (x < lo || x > hi || c == x)
    })
  }

  test("pmod with offset: result in [offset, offset+m), congruent mod m (math.js:7-9)") {
    check(Prop.forAll(Gen.chooseNum(-100000L, 100000L), Gen.chooseNum(1L, 1000L),
                      Gen.chooseNum(-500L, 500L)) { (x: Long, m: Long, off: Long) =>
      val r = Math.floorMod(x - off, m) + off
      r >= off && r < off + m && Math.floorMod(r - x, m) == 0
    })
  }

  test("OSCAR calendar: 72 strictly-increasing dates/year, gaps in {5,6} (oscar.js:27-34)") {
    val rows = SparkEntry.queries("q18_oscar_calendar")(spark, sf0001)
      .select($"y", $"i", to_date($"oscar_date").as("d")).collect()
    val byYear = rows.groupBy(_.getLong(0))
    byYear.foreach { case (_, rs) =>
      rs.length shouldBe 72
      val ds = rs.sortBy(_.getLong(1)).map(_.getDate(2).toLocalDate)
      ds.zip(ds.tail).foreach { case (a, b) =>
        val gap = java.time.temporal.ChronoUnit.DAYS.between(a, b)
        assert(gap == 5 || gap == 6, s"gap $gap between $a and $b")
      }
      ds.head shouldBe java.time.LocalDate.of(ds.head.getYear, 1, 1)
    }
  }

  test("polygon containment implies bbox containment (P3 subset of P2)") {
    val tri = Geo.testTriangle
    val lons = tri.map(_._1); val lats = tri.map(_._2)
    check(Prop.forAll(Gen.chooseNum(-0.1, 0.2), Gen.chooseNum(-0.1, 0.2)) {
      (x: Double, y: Double) =>
        !Geo.contains(tri)(x, y) ||
          (x >= lons.min && x <= lons.max && y >= lats.min && y <= lats.max)
    })
  }

  test("GeoContains kernel equals Geo.containsMulti on random rings and points") {
    import graft.functions.GeoContains
    val coord = Gen.chooseNum(-50.0, 50.0)
    val ringGen: Gen[Geo.Ring] = for {
      n <- Gen.chooseNum(3, 12)
      pts <- Gen.listOfN(n, Gen.zip(coord, coord))
    } yield (pts :+ pts.head).toArray
    check(Prop.forAll(Gen.listOfN(3, ringGen), coord, coord) {
      (rings: List[Geo.Ring], lon: Double, lat: Double) =>
        val (xs, ys, starts) = GeoContains.flatten(rings)
        GeoContains.inside(xs, ys, starts, lon, lat) ==
          Geo.containsMulti(rings)(lon, lat)
    })
  }

  test("thresholdHex is monotone in the fraction and anchors 0 / 1 exactly") {
    import graft.operators.Sampling.thresholdHex
    check(Prop.forAll(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0)) {
      (a: Double, b: Double) =>
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        thresholdHex(lo) <= thresholdHex(hi) // hex strings order like the values
    })
    assert(thresholdHex(0.0) == "0" * 32 && thresholdHex(1.0) == "f" * 32)
  }

  test("poly_hash: expression equals kernel equals charwise spec; empty string is 0") {
    PolyHash.hash("", 31) shouldBe 0L
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('é', 'ß', '中', ' ', '\t')))
      .map(_.mkString)
    check(Prop.forAll(gen) { s: String =>
      val spec = s.codePoints().toArray.foldLeft(0L)((a, cp) => (a * 31 + cp) % PolyHash.P)
      PolyHash.hash(s, 31) == spec
    })
    // expression path (codegen) agrees with the kernel on fixture text
    val df = table("documents").limit(64)
      .select($"text", PolyHash($"text").as("h")).collect()
    df.foreach(r => r.getLong(1) shouldBe PolyHash.hash(r.getString(0), 31))
  }

  test("vec_dot: native expression equals the higher-order-function spec") {
    val gen = Gen.listOfN(16, Gen.chooseNum(-10.0, 10.0))
    val vecs = Gen.listOfN(40, Gen.zip(gen, gen)).sample.get
    val df = spark.createDataFrame(vecs).toDF("a", "b")
    val cmp = df.select(
      Vectors.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), _ * _), lit(0.0), _ + _).as("hof")).collect()
    cmp.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("add_months clamps to end of month like temporal.js:56-83") {
    val cases = Seq(
      ("2023-01-31", 1, "2023-02-28"), ("2024-01-31", 1, "2024-02-29"),
      ("2023-03-31", 1, "2023-04-30"), ("2023-01-15", 12, "2024-01-15"),
      ("2023-11-30", 3, "2024-02-29"))
    cases.foreach { case (d, m, want) =>
      val r = spark.sql(s"SELECT CAST(add_months(DATE'$d', $m) AS STRING)").head().getString(0)
      r shouldBe want
    }
  }

  test("randlon/randlat: in-range and seed-deterministic (math.js:12-19)") {
    val df = spark.range(1000).select(
      Scalars.randLon(7).as("lon"), Scalars.randLat(11).as("lat"))
    df.where($"lon" < -180 || $"lon" > 180 || $"lat" < -90 || $"lat" > 90)
      .count() shouldBe 0
    val a = df.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val b = spark.range(1000).select(
      Scalars.randLon(7).as("lon"), Scalars.randLat(11).as("lat"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    a.toSeq shouldBe b.toSeq
  }

  test("byteranges: reassembly inverts multipart framing for arbitrary ASCII parts") {
    val partGen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '))).map(_.mkString)
    check(Prop.forAll(Gen.listOfN(3, partGen)) { parts: List[String] =>
      val boundary = "GRAFTSEP"
      val body = new StringBuilder
      parts.foreach { p =>
        body.append(s"--$boundary\r\nContent-Range: bytes x\r\n\r\n").append(p).append("\r\n")
      }
      body.append(s"--$boundary--\r\n")
      val got = new String(control.Byteranges.reassemble(
        body.toString.getBytes("ISO-8859-1"), boundary), "ISO-8859-1")
      got == parts.mkString
    })
  }
}
