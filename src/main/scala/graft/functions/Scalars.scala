package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.6), re-expressed as codegen'd
  * Column expressions — no UDFs on the hot path.
  */
object Scalars {

  /** F1: unit conversion by constant factor (`cdo -mulc,k`,
    * reference src/file-conversions.js:197-204); m→mm precipitation is
    * `* 1000` (src/datasets/era5monthly-precipitation-1-day.js:3-6).
    */
  def convertUnit(value: Column, factor: Double): Column = value * lit(factor)

  /** F1 variant: Kelvin→Celsius (tempK→tempC,
    * reference src/datasets/era5monthly-temperature-2-m.js:3-6).
    */
  def kelvinToCelsius(value: Column): Column = value - lit(273.15)

  /** F3: month-add with end-of-month clamping. Spark's `add_months` has
    * exactly the reference's retry-with-fewer-days semantics
    * (src/temporal.js:56-83): Jan 31 + 1 month = Feb 28/29.
    */
  def monthAdd(ts: Column, months: Int): Column = add_months(ts, months)

  /** F4: floor-to-unit (reference src/temporal.js:89-150; the used path is
    * floor-to-month in the freshness gate, src/sources/era5monthly.js:162-167).
    */
  def truncTo(ts: Column, unit: String): Column = date_trunc(unit, ts)

  /** F5: fractional days between timestamps
    * (reference src/datetime.js:33-35: ms diff / 86,400,000).
    * Computed on microsecond longs so sub-second precision survives.
    */
  def daysSince(a: Column, b: Column): Column =
    (unix_micros(a.cast("timestamp")) - unix_micros(b.cast("timestamp"))) / lit(86400e6)

  /** F6: zero-padded date parts (reference src/datetime.js:17-27). */
  def padMonth(ts: Column): Column = date_format(ts, "MM")

  /** F7: ISO-8601 formatting with milliseconds
    * (reference src/datetime.js:29-31 — `Date.toISOString()`).
    */
  def isoFormat(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")

  /** F8: bounded clamp (reference src/math.js:2-5). */
  def clamp(x: Column, lo: Double, hi: Double): Column =
    greatest(least(x, lit(hi)), lit(lo))

  /** F8: positive modulo with offset (reference src/math.js:7-9). */
  def pmodOffset(x: Column, m: Int, offset: Int): Column =
    pmod(x - lit(offset), lit(m)) + lit(offset)

  /** F9: area-uniform random globe coordinates (reference src/math.js:12-19;
    * `asin(2u−1)` latitude). Seeded `rand` keeps runs reproducible.
    */
  def randLon(seed: Long): Column = rand(seed) * lit(360.0) - lit(180.0)
  def randLat(seed: Long): Column = degrees(asin(rand(seed) * lit(2.0) - lit(1.0)))

  /** F15: layer-name mangle `-`→`_` (reference src/rabbit.js:38-39). */
  def layerName(name: Column): Column = regexp_replace(name, "-", "_")

  /** F10: MD5 content hash (reference src/utility.js:47-50 hashes module
    * bytes to version a layer).
    */
  def contentHash(c: Column): Column = md5(c.cast("binary"))

  /** F11: HMAC-SHA256 webhook signature (reference src/utility.js:144-149).
    * Spark ships sha2/md5 but no keyed MAC → javax.crypto via a UDF; used
    * only on the tiny control plane (one signature per cycle), never on the
    * 100 TB data plane.
    */
  val hmacSha256: (String, String) => String = (key: String, body: String) => {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      key.getBytes("UTF-8"), "HmacSHA256"))
    mac.doFinal(body.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  def hmacSha256Col = udf(hmacSha256)

  /** F4 full surface: round a timestamp to a unit under the reference's
    * four modes (src/temporal.js:89-150) — `floor`/`trunc` (identical for
    * positive epochs), `ceil` (next boundary unless already on one), and
    * `halfExpand` (nearer boundary, ties away). Arithmetic on epoch
    * microseconds for fixed-width units, so it stays codegen'd.
    */
  def roundTo(ts: Column, unit: String, mode: String): Column = {
    val width: Long = unit match {
      case "second" => 1000000L
      case "minute" => 60000000L
      case "hour"   => 3600000000L
      case "day"    => 86400000000L
      case other => throw new IllegalArgumentException(s"fixed-width unit expected, got $other")
    }
    val us = unix_micros(ts.cast("timestamp"))
    val floorUs = us - pmod(us, lit(width))
    val rounded = mode match {
      case "floor" | "trunc" => floorUs
      case "ceil" => when(us === floorUs, us).otherwise(floorUs + width)
      case "halfExpand" =>
        when(us - floorUs >= lit(width / 2), floorUs + width).otherwise(floorUs)
      case other => throw new IllegalArgumentException(s"unknown rounding mode $other")
    }
    timestamp_micros(rounded)
  }

  /** F12: buffer compression for control documents (reference brotli-q11,
    * src/utility.js:89-92; no JVM brotli offline → gzip, the same
    * "smallest-at-max-effort" role). Driver-side only — the data plane's
    * compression is parquet's own codec.
    */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos) {
      `def`.setLevel(java.util.zip.Deflater.BEST_COMPRESSION)
    }
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** F12 as a column function (binary → binary), for compressing payload
    * columns at a sink boundary.
    */
  def gzipCol = udf(gzip _)
  def gunzipCol = udf(gunzip _)

  /** F12-adjacent: polynomial rolling-hash document fingerprint
    * (north-star text-analysis op). Native codegen'd expression
    * ([[PolyHash]]): acc·31 + codepoint mod 1e9+7 per character — identical
    * semantics in the DuckDB oracle's list_reduce formulation.
    */
  def rollingFingerprint(text: Column): Column = PolyHash(text)
}
