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
    val df = readBase(spark, dir, name)
    val k = spark.conf.getOption("graft.scale").map(_.toInt).getOrElse(1)
    if (k <= 1) df else scaled(df, k)
  }

  /** The raw scan (+ events ns→µs fix), never synthetically scaled. */
  private def readBase(spark: SparkSession, dir: String, name: String): DataFrame = {
    val base = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && base.schema("ts").dataType != TimestampNTZType)
      base.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
    else base
  }

  /** Synthetic scale-up for bench/stress runs only (`graft.scale = k`,
    * never set on the correctness path): union k copies of the table with
    * every id/key column shifted by a copy-specific offset, preserving
    * referential integrity across tables (all foreign keys shift by the
    * same rule). Payload columns repeat — a corpus of k near-identical
    * shards, which is the ADVERSE case for the dedup family (every doc has
    * k−1 exact replicas) and a fair one for joins/aggregations.
    */
  private val idCols = Set(
    "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey", "c_nationkey",
    "s_suppkey", "s_nationkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey",
    "event_id", "user_id", "doc_id", "vec_id")

  private val IdOffset = 100000000L

  private def scaled(df: DataFrame, k: Int): DataFrame = {
    val copies = (0 until k).map { i =>
      df.schema.fieldNames.filter(idCols.contains).foldLeft(df) { (acc, c) =>
        acc.withColumn(c, col(c) + lit(i * IdOffset))
      }
    }
    copies.reduce(_ unionByName _)
  }

  /** Materialize the k×-scaled tables to parquet ONCE, so scale benches
    * read real k×-sized files through single scans.
    *
    * Rationale (round-3 scale audit): leaving `graft.scale` set makes
    * every table reference expand to a k-way union of scans inside each
    * query plan — a query that uses a table twice plans 2k scans, scan
    * reuse and codegen fusion are defeated, and the bench charges that
    * planning artifact to the operator. Several 10× ratios (q06 14×, q17
    * 11×, m01–m03 6–8×) traced to exactly this. Materializing first makes
    * the 10× run measure what it claims: the same plans over 10× the
    * bytes. Idempotent via a _GRAFT_SCALED_OK marker; `events.ts` lands
    * converted (µs ntz), which [[apply]] detects by schema and passes
    * through.
    */
  /** Memoized materialization of a DERIVED relation (an expensive shared
    * projection, e.g. the co-purchase edge lists ~16 g-gates all feed on).
    *
    * Rationale (round-9 verdict): each g gate re-derived the co-purchase
    * projection from lineitem inside its own plan — an input-bound pass
    * (~80 s at GenFixture 30×) paid ~16× per bench sweep, 26% of the whole
    * run, masking real drift. Materializing once per (source fixture,
    * variant, scale) and re-reading parquet is also the 100 TB-correct
    * shape: a shared intermediate dataset is written to storage once and
    * every consumer scans it, instead of recomputing an O(input) pass per
    * query. Content is unchanged — the projection is deterministic, so the
    * DuckDB oracle recomputing it from lineitem still hash-matches.
    *
    * Keyed like [[materializeScaled]]: the stamp carries the source dir,
    * each input's length+mtime, the `graft.scale` conf and the variant key,
    * so regenerated fixtures or a different scale re-materialize instead of
    * silently serving stale data. Synchronized: gates run sequentially in
    * Bench/Verify, but spec suites may share the JVM.
    */
  def derived(spark: SparkSession, dir: String, key: String)
             (build: => DataFrame): DataFrame = synchronized {
    val k = spark.conf.getOption("graft.scale").map(_.toInt).getOrElse(1)
    val inputs = names.map { n =>
      val f = new java.io.File(dir, s"$n.parquet")
      s"$n:${f.length}:${f.lastModified}"
    }.mkString(",")
    val stamp = s"source=$dir scale=$k key=$key inputs=$inputs"
    val hash = java.security.MessageDigest.getInstance("MD5")
      .digest(stamp.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val dst = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft-derived/$key-$hash")
    val done = new java.io.File(dst, "_GRAFT_DERIVED_OK")
    val data = new java.io.File(dst, "data.parquet")
    val fresh = done.exists() &&
      new String(java.nio.file.Files.readAllBytes(done.toPath), "UTF-8") == stamp
    if (!fresh) {
      java.nio.file.Files.deleteIfExists(done.toPath)
      dst.mkdirs()
      build.write.mode("overwrite").parquet(data.getPath)
      java.nio.file.Files.write(done.toPath, stamp.getBytes("UTF-8"))
    }
    spark.read.parquet(data.getPath)
  }

  def materializeScaled(spark: SparkSession, srcDir: String, dstDir: String, k: Int): Unit = {
    val done = new java.io.File(dstDir, "_GRAFT_SCALED_OK")
    // the marker records what was materialized, keyed by source identity
    // (path + each input's length&mtime) — regenerated fixtures or a
    // different source mapping to the same dst dir re-materialize instead
    // of silently benching stale data
    val stamp = {
      val inputs = names.map { n =>
        val f = new java.io.File(srcDir, s"$n.parquet")
        s"$n:${f.length}:${f.lastModified}"
      }.mkString(",")
      s"source=$srcDir scale=$k inputs=$inputs"
    }
    if (done.exists() &&
        new String(java.nio.file.Files.readAllBytes(done.toPath), "UTF-8") == stamp)
      return
    java.nio.file.Files.deleteIfExists(done.toPath)
    new java.io.File(dstDir).mkdirs()
    names.foreach { name =>
      scaled(readBase(spark, srcDir, name), k)
        .write.mode("overwrite").parquet(s"$dstDir/$name.parquet")
    }
    java.nio.file.Files.write(done.toPath, stamp.getBytes("UTF-8"))
  }
}
