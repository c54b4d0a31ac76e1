package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys — the data-LAYOUT lever for multi-
  * dimensional locality (the same mechanism as Delta's OPTIMIZE ZORDER).
  * Sorting a 100 TB grid store by the interleaved (lat, lon) key makes
  * every parquet row group a tight spatial box, so a bbox predicate
  * prunes row groups by min/max stats instead of scanning the world —
  * the at-rest complement to the GeoBboxPushdown optimizer rule
  * (ZOrderSpec proves the row-group pruning effect from real parquet
  * footers; reference spatial access: src/file-conversions.js grids).
  *
  * All integer bit arithmetic — bit-identical across engines, so the
  * key itself is DuckDB-oracle-gated (r10). [[spreadSteps]] is the ONE
  * constants table both the Column form and the oracle SQL generator
  * consume; they cannot drift.
  */
object ZOrder {

  /** (shift, mask) steps of the standard 32→64-bit Morton spread:
    * after the fold, bit i of the input sits at position 2i.
    */
  val spreadSteps: Seq[(Int, Long)] = Seq(
    16 -> 281470681808895L,     // 0x0000FFFF0000FFFF
    8  -> 71777214294589695L,   // 0x00FF00FF00FF00FF
    4  -> 1085102592571150095L, // 0x0F0F0F0F0F0F0F0F
    2  -> 3689348814741910323L, // 0x3333333333333333
    1  -> 6148914691236517205L) // 0x5555555555555555

  /** Spread the low 32 bits of a non-negative long across even bit
    * positions (whole-stage-codegen'd shift/mask chain, no UDF).
    */
  def spreadBits(x: Column): Column =
    spreadSteps.foldLeft(x) { case (c, (s, m)) =>
      c.bitwiseOR(shiftleft(c, s)).bitwiseAND(lit(m))
    }

  /** 2-D Morton interleave of two quantized non-negative ints:
    * a's bits at even positions, b's at odd.
    */
  def mortonKey(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Quantize a coordinate from [lo, lo+span) onto 2^bits cells, BOTH
    * edges clamped (out-of-range coordinates — a -999 missing-value
    * sentinel, a 90.0 top edge — land in the first/last cell instead of
    * producing a negative index whose spread is garbage). bits ≤ 31:
    * two 32-bit quantizations cannot interleave into a signed 64-bit
    * key without colliding with the sign bit.
    */
  def quantize(c: Column, lo: Double, span: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range (1..31): $bits")
    val n = 1L << bits
    greatest(
      least(floor((c - lit(lo)) / lit(span) * lit(n.toDouble)).cast("long"), lit(n - 1)),
      lit(0L))
  }

  /** The spatial layout key: 16-bit quantized lat/lon interleaved.
    * `ORDER BY zorderLatLon(lat, lon)` at write time clusters the store
    * so bbox scans touch O(box) row groups.
    */
  def zorderLatLon(lat: Column, lon: Column, bits: Int = 16): Column =
    mortonKey(quantize(lat, -90.0, 180.0, bits), quantize(lon, -180.0, 360.0, bits))

  /** Oracle-side generator: CTE steps computing the same spread/interleave
    * in portable SQL from the SAME [[spreadSteps]] constants. Emits
    * `step0 AS (...), step1 AS (...), ...` chained off `from`, carrying
    * `carry` columns through; the final CTE exposes `zkey`.
    */
  def zorderSqlCtes(from: String, latExpr: String, lonExpr: String,
                    carry: Seq[String], bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31, s"bits out of range (1..31): $bits")
    val n = 1L << bits
    val cols = carry.mkString(", ")
    val q0 =
      s"""zq0 AS (SELECT $cols,
         greatest(CAST(least(floor((($latExpr) - (-90.0)) / 180.0 * $n.0), ${n - 1}) AS BIGINT), 0) AS za,
         greatest(CAST(least(floor((($lonExpr) - (-180.0)) / 360.0 * $n.0), ${n - 1}) AS BIGINT), 0) AS zb
         FROM $from)"""
    val steps = spreadSteps.zipWithIndex.map { case ((s, m), i) =>
      s"""zq${i + 1} AS (SELECT $cols,
         ((za | (za << $s)) & $m) AS za, ((zb | (zb << $s)) & $m) AS zb
         FROM zq$i)"""
    }
    val fin = s"zfin AS (SELECT $cols, (za | (zb << 1)) AS zkey FROM zq${spreadSteps.size})"
    (q0 +: steps :+ fin).mkString(",\n")
  }
}
