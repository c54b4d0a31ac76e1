package graft

import org.apache.spark.sql.functions._
import graft.functions.Scalars

/** Scalar-function laws (SURVEY.md §5.3): clamp/pmod invariants
  * (reference src/math.js:2-9), end-of-month clamping of month-add
  * (src/temporal.js:56-83), HMAC test vector (src/utility.js:144-149),
  * rolling fingerprint vs an independent Scala reference. Property-style:
  * seeded random samples evaluated in one vectorized pass.
  */
class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(42)

  test("clamp stays in [lo, hi] and is idempotent on its own output") {
    val xs = Seq.fill(200)(rng.nextDouble() * 2000 - 1000)
    val once = xs.toDF("x").select(Scalars.clamp($"x", -5.0, 7.0).as("r")).as[Double].collect()
    all(once) should (be >= -5.0 and be <= 7.0)
    val twice = once.toSeq.toDF("x").select(Scalars.clamp($"x", -5.0, 7.0)).as[Double].collect()
    twice shouldBe once
  }

  test("pmodOffset lands in [offset, offset + m) and preserves congruence") {
    val xs = Seq(-721L, -180L, -1L, 0L, 1L, 179L, 360L, 719L) ++ Seq.fill(100)(rng.nextLong() % 100000)
    val rs = xs.toDF("x")
      .select($"x", Scalars.pmodOffset($"x", 360, -180).as("r")).as[(Long, Long)].collect()
    all(rs.map(_._2)) should (be >= -180L and be < 180L)
    rs.foreach { case (x, r) => ((x - r) % 360) shouldBe 0 }
  }

  test("monthAdd clamps end-of-month exactly like temporal.js add()") {
    val cases = Seq(
      ("1995-01-31", "1995-02-28"), // non-leap clamp
      ("1996-01-31", "1996-02-29"), // leap clamp
      ("1995-03-31", "1995-04-30"),
      ("1995-01-15", "1995-02-15"),
      ("1995-12-01", "1996-01-01"))
    val got = cases.map(_._1).toDF("d")
      .select(Scalars.monthAdd($"d".cast("date"), 1).cast("string")).as[String].collect()
    got.toSeq shouldBe cases.map(_._2)
  }

  test("daysSince is fractional days (datetime.js:33-35)") {
    val got = spark.range(1)
      .select(Scalars.daysSince(
        lit("1995-01-02 12:00:00").cast("timestamp"),
        lit("1995-01-01 00:00:00").cast("timestamp"))).as[Double].head()
    got shouldBe 1.5
  }

  test("hmacSha256 matches the published test vector") {
    Scalars.hmacSha256("key", "The quick brown fox jumps over the lazy dog") shouldBe
      "f7bc83f430538424b13298e6aa6fb143ef4d59a14946175997479dbc2d1a3cd8"
  }

  test("rollingFingerprint agrees with an independent Scala implementation") {
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toInt) % 1000000007L)
    val samples = Seq("", "a", "hello world", "The quick brown fox!") ++
      Seq.fill(50)(rng.alphanumeric.take(rng.nextInt(80) + 1).mkString)
    val nonEmpty = samples.filter(_.nonEmpty)
    val got = nonEmpty.toDF("t")
      .select($"t", Scalars.rollingFingerprint($"t").as("f")).as[(String, Long)].collect()
    got.foreach { case (s, f) => f shouldBe ref(s) }
  }

  test("layerName mangles dashes to underscores (rabbit.js:38-39)") {
    Seq("era5monthly-temperature-2-m").toDF("n")
      .select(Scalars.layerName($"n")).as[String].head() shouldBe "era5monthly_temperature_2_m"
  }

  test("kelvinToCelsius and convertUnit (F1)") {
    val r = Seq((273.15, 0.001)).toDF("k", "m")
      .select(Scalars.kelvinToCelsius($"k"), Scalars.convertUnit($"m", 1000.0))
      .as[(Double, Double)].head()
    r shouldBe ((0.0, 1.0))
  }

  test("isoFormat emits ms-precision ISO-8601 (datetime.js:29-31)") {
    Seq("2020-03-04 05:06:07.123").toDF("t")
      .select(Scalars.isoFormat($"t".cast("timestamp"))).as[String].head() shouldBe
      "2020-03-04T05:06:07.123Z"
  }

  test("roundTo: floor/ceil/halfExpand/trunc against temporal.js:89-150 semantics") {
    val t = "2020-03-04 05:36:07.000"
    def r(mode: String, unit: String): String =
      Seq(t).toDF("t")
        .select(Scalars.roundTo($"t", unit, mode).cast("string")).as[String].head()
    r("floor", "hour") shouldBe "2020-03-04 05:00:00"
    r("trunc", "hour") shouldBe "2020-03-04 05:00:00"
    r("ceil", "hour") shouldBe "2020-03-04 06:00:00"
    r("halfExpand", "hour") shouldBe "2020-03-04 06:00:00" // 36 min ≥ half
    r("halfExpand", "day") shouldBe "2020-03-04 00:00:00"  // 05:36 < noon
    // on-boundary: ceil is identity, halfExpand floors
    def b(mode: String): String =
      Seq("2020-03-04 05:00:00").toDF("t")
        .select(Scalars.roundTo($"t", "hour", mode).cast("string")).as[String].head()
    b("ceil") shouldBe "2020-03-04 05:00:00"
    b("halfExpand") shouldBe "2020-03-04 05:00:00"
    // exact half rounds away (ties-away-from-zero = halfExpand)
    Seq("2020-03-04 05:30:00").toDF("t")
      .select(Scalars.roundTo($"t", "hour", "halfExpand").cast("string")).as[String]
      .head() shouldBe "2020-03-04 06:00:00"
  }

  test("gzip/gunzip round-trips and compresses repetitive buffers (F12)") {
    val data = ("graft " * 1000).getBytes("UTF-8")
    val packed = Scalars.gzip(data)
    packed.length should be < data.length / 10
    Scalars.gunzip(packed) shouldBe data
    // column form over a binary payload
    val row = Seq("abc" * 100).toDF("t")
      .select(Scalars.gunzipCol(Scalars.gzipCol($"t".cast("binary"))).cast("string"))
      .as[String].head()
    row shouldBe "abc" * 100
  }
}
