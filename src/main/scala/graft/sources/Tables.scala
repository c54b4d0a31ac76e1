package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Scan layer over the driver-provided parquet fixtures (TESTDATA.md).
  *
  * Mirrors the reference's scan surface (SURVEY.md §2.1): the reference
  * selects single GRIB records out of multi-record files
  * (src/file-conversions.js:120-127); here the analogous projection/filter is
  * left to Catalyst, which pushes predicates and column pruning into the
  * parquet scan — the 100 TB-scale equivalent of "only download the records
  * you need" (src/sources/era5monthly.js:46,75-77).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one fixture table. `events.ts` lands as TIMESTAMP(NANOS), which we
    * read as long (see [[graft.Session]]) and truncate to microseconds as
    * TIMESTAMP_NTZ. DuckDB reads the same parquet at full nanosecond
    * precision (TIMESTAMP_NS), so every oracle query that touches `ts`
    * applies the identical truncation itself (`CAST(ts AS TIMESTAMP)` in the
    * shared `ev` CTE) — both sides provably see the same microsecond values
    * regardless of the fixture's sub-microsecond content.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType != TimestampNTZType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
    else df
  }
}
