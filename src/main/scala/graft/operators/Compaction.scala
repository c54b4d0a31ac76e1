package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance pass every long-lived
  * 100 TB corpus needs. Incremental ingest (w04's landing loop, w10's
  * per-batch snapshot versions, the reference's per-cycle file drops)
  * accretes files far below the parquet sweet spot; scans then pay
  * per-file open/footer costs and the driver pays listing time. Compaction
  * rewrites a directory into ~`targetBytes`-sized files.
  *
  * Two rewrites, deliberately different shuffle stories:
  *  - [[compact]]: `coalesce` — NO shuffle. Input partitions are
  *    bin-packed into fewer write tasks; cheapest possible rewrite and the
  *    right default for a pure file-count fix. The trade (coalesce narrows
  *    the whole stage, so the read runs at output parallelism) is
  *    acceptable precisely because a compaction job IS just read→write.
  *  - [[compactClustered]]: `repartitionByRange` + in-partition sort on a
  *    layout key — one range shuffle that buys CLUSTERING: every output
  *    file covers a tight key range, so min/max row-group stats prune
  *    scans (pairs with r10's z-order key as the key to cluster by; the
  *    ZOrderSpec footer experiment measures the effect).
  *
  * File-count planning reads ONLY the file listing (byte sizes), never the
  * data: output count = ⌈Σbytes / targetBytes⌉. Parquet re-encoding makes
  * that an estimate — good enough for the 128 MB-vs-1 KB problem
  * compaction solves.
  */
object Compaction {

  /** Total bytes of data files under `dir`, recursing into visible
    * subdirectories (hive-partitioned `key=value/` layouts measure
    * correctly) while skipping hidden/metadata entries BY PATH — a
    * `part-*.parquet` left inside a crashed writer's `_temporary/` tree
    * never inflates the plan (a basename-only filter would count it).
    */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hidden(name: String) = name.startsWith("_") || name.startsWith(".")
    def walk(p: Path): Long =
      fs.listStatus(p).iterator
        .filterNot(st => hidden(st.getPath.getName))
        .map(st => if (st.isDirectory) walk(st.getPath) else st.getLen)
        .sum
    walk(root)
  }

  /** Data files landed directly under `dir` (the flat parquet output the
    * rewrites here produce).
    */
  private def dataFileCount(spark: SparkSession, dir: String): Int = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).count(st =>
      st.isFile && !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
  }

  /** ⌈total/targetBytes⌉, floored at 1. */
  def planFileCount(totalBytes: Long, targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
  }

  /** Shuffle-free bin-pack: rewrite `inDir` into `outDir` as at most
    * ⌈bytes/targetBytes⌉ files. A file-count REDUCER: `coalesce` can only
    * merge read partitions, never split them, so when the scan yields
    * fewer partitions than the plan the output keeps that smaller count —
    * the returned value is the ACTUAL partition count written, not the
    * plan. Splitting oversized files is [[compactClustered]]'s job (its
    * range repartition both merges and splits).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long): Int = {
    val n = planFileCount(dataBytes(spark, inDir), targetBytes)
    spark.read.parquet(inDir).coalesce(n).write.mode("overwrite").parquet(outDir)
    dataFileCount(spark, outDir)
  }

  /** Range-clustered rewrite: same file-count plan, but rows are range-
    * partitioned and sorted on `sortCols`, so each output file owns a
    * disjoint key range and row-group stats become effective scan prunes.
    * Like [[compact]], returns the ACTUAL number of data files written
    * (range partitions left empty by a low-cardinality key emit none).
    */
  def compactClustered(spark: SparkSession, inDir: String, outDir: String,
                       sortCols: Seq[String], targetBytes: Long): Int = {
    require(sortCols.nonEmpty, "sortCols must be non-empty")
    val n = planFileCount(dataBytes(spark, inDir), targetBytes)
    val cols = sortCols.map(col)
    spark.read.parquet(inDir)
      .repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(outDir)
    dataFileCount(spark, outDir)
  }
}
