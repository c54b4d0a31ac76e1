package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read positional delete vectors — the Iceberg v2 / Delta
  * deletion-vector shape (x10): a delete marks `(file, row position)` in
  * a side relation instead of rewriting the data file, and every read
  * applies the vectors as an anti-join. The write path of a 100 TB table
  * cannot afford copy-on-write for point deletes (GDPR erasure, late
  * corrections): a delete touching 1 row per file would rewrite the
  * whole table; a delete VECTOR is O(deletes) bytes and the rewrite is
  * deferred to compaction.
  *
  * Positional identity comes from Spark's parquet metadata columns
  * (`_metadata.file_path`, `_metadata.row_index`) — the engine never
  * smuggles a logical key through the read path, so the gate actually
  * proves the positional contract: a wrong row-index mapping surfaces as
  * the wrong ROWS surviving, not as a key mismatch.
  *
  * Scale shape: the base scan is untouched parquet (all pushdowns
  * intact; the metadata struct is generated, not read from disk); delete
  * vectors are bounded by the delete count and BROADCAST to the
  * anti-join — the Iceberg reader's in-memory bitmap, Spark-first. For
  * vectors past broadcast size the same anti-join degrades gracefully to
  * a shuffle join on `(file, pos)`.
  */
object DeleteVectors {

  /** Write `df` as the base table: `fileKey` buckets rows into files and
    * the in-file order is pinned by `sortCols` — positions are therefore
    * DETERMINISTIC, which is what lets the closed-form oracle exist at
    * all (a real table's positions are whatever the writer produced; the
    * gate needs reproducible ones).
    */
  def writeBase(df: DataFrame, dir: String, fileKey: Column,
                sortCols: Seq[Column]): Unit =
    df.repartition(4, fileKey)
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite").parquet(dir)

  /** Build the delete vector for every base row matching `predicate`:
    * `(file_path, row_index)` pairs read straight off the parquet
    * metadata columns. This is the "delete" transaction — it scans, it
    * does not rewrite.
    */
  def buildDeleteVectors(spark: SparkSession, baseDir: String,
                         predicate: Column): DataFrame =
    spark.read.parquet(baseDir)
      .where(predicate)
      .select(col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("row_index"))

  /** The merge-on-read scan: base rows minus delete-vector positions.
    * The anti-join key is `(file_path, row_index)` — purely positional —
    * and the vector side is broadcast (bounded by the delete count).
    */
  def readMergeOnRead(spark: SparkSession, baseDir: String,
                      vectors: DataFrame): DataFrame = {
    val base = spark.read.parquet(baseDir)
      .withColumn("file_path", col("_metadata.file_path"))
      .withColumn("row_index", col("_metadata.row_index"))
    base.join(broadcast(vectors), Seq("file_path", "row_index"), "left_anti")
      .drop("file_path", "row_index")
  }
}
