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

  /** Total bytes of data files directly under `dir` — deliberately
    * NON-recursive (parquet part files live flat), which also keeps
    * leftovers inside hidden work dirs (`_temporary/...` from a crashed
    * writer) out of the plan, not just top-level `_`/`.` entries.
    */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).iterator
      .filter(_.isFile)
      .filterNot(st => st.getPath.getName.startsWith("_") || st.getPath.getName.startsWith("."))
      .map(_.getLen).sum
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
    val df = spark.read.parquet(inDir).coalesce(n)
    val actual = df.rdd.getNumPartitions
    df.write.mode("overwrite").parquet(outDir)
    actual
  }

  /** Range-clustered rewrite: same file-count plan, but rows are range-
    * partitioned and sorted on `sortCols`, so each output file owns a
    * disjoint key range and row-group stats become effective scan prunes.
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
    n
  }
}
