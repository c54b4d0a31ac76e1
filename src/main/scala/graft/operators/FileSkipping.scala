package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.implicits._

import scala.jdk.CollectionConverters._

/** File-level zone maps (min/max data skipping) — the lakehouse
  * file-pruning index (Delta/Iceberg column stats, the `PARQUET`
  * footer statistics every warehouse scan planner consults): one index
  * row per data file carrying the min/max of a clustered column, and a
  * scan planner that reads ONLY files whose [min, max] envelope
  * intersects the predicate, applying the predicate again as a residual
  * (file stats admit false positives inside a kept file, never false
  * negatives).
  *
  * Scale shape: the index build is FOOTER-ONLY I/O — each task opens a
  * parquet footer (KBs) and reads the already-materialized column-chunk
  * statistics; the data pages are never touched, so indexing 100 TB
  * costs MBs of reads distributed over the file list. The index itself
  * is file-count-sized (one row per file), so the planning collect is
  * metadata-sized by construction — the same budget every lakehouse
  * table format spends reading its manifest. Pruning effectiveness
  * tracks the physical clustering of the indexed column (hence x03/x07
  * write patterns: range-cluster on the hot filter column at write
  * time); correctness never depends on it.
  */
object FileSkipping {

  /** One index row per parquet file under `dir`: row count plus the
    * min/max envelope of `colName` folded across the file's row groups.
    * `has_stats = false` (statistics absent in some row group, or a
    * non-integral physical type) means the file can never be pruned —
    * the conservative answer, not an error. All-null files keep
    * `min_v/max_v` null with `has_stats = true`: a range predicate
    * cannot match them and they prune.
    */
  def buildIndex(spark: SparkSession, dir: String, colName: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    def walk(st: org.apache.hadoop.fs.FileStatus): Seq[String] =
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(walk)
      else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath.toString)
      else Nil
    val files = Option(fs.globStatus(root)).toSeq.flatten.flatMap(walk)
    require(files.nonEmpty, s"file-skipping index: no parquet files under $dir")
    val ser = new graft.sources.SerializableHadoopConf(conf)
    spark.createDataset(files)
      .repartition(math.min(files.size, spark.sparkContext.defaultParallelism))
      .mapPartitions { it =>
        val c = ser.value
        it.map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f), c)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            var rows = 0L
            var mn = Option.empty[Long]
            var mx = Option.empty[Long]
            var ok = true
            reader.getFooter.getBlocks.asScala.foreach { b =>
              rows += b.getRowCount
              b.getColumns.asScala.find(_.getPath.toDotString == colName) match {
                case Some(cc) =>
                  val st = cc.getStatistics
                  if (st == null || st.isEmpty) ok = false
                  else if (st.hasNonNullValue) {
                    val (lo, hi) = (st.genericGetMin, st.genericGetMax) match {
                      case (a: java.lang.Long, b2: java.lang.Long) => (a.longValue, b2.longValue)
                      case (a: java.lang.Integer, b2: java.lang.Integer) => (a.longValue, b2.longValue)
                      case other => sys.error(
                        s"file-skipping index: non-integral stats for '$colName' in $f: $other")
                    }
                    mn = Some(mn.fold(lo)(math.min(_, lo)))
                    mx = Some(mx.fold(hi)(math.max(_, hi)))
                  } // all-null chunk: contributes no envelope, stays prunable
                case None => ok = false // column absent in this file's schema
              }
            }
            (f, rows, if (ok) mn else None, if (ok) mx else None, ok)
          } finally reader.close()
        }
      }
      .toDF("file_path", "row_count", "min_v", "max_v", "has_stats")
  }

  /** The surviving file list for `lo <= col <= hi`: keep a file iff its
    * envelope intersects the range, or it carries no usable stats. The
    * collect is index-sized (one row per file).
    */
  def pruneFiles(index: DataFrame, lo: Long, hi: Long): Seq[String] =
    index.where(!$"has_stats" ||
        ($"min_v".isNotNull && $"min_v" <= hi && $"max_v" >= lo))
      .select($"file_path").collect().map(_.getString(0)).toSeq

  /** Zone-map-planned scan: prune at file granularity via the index,
    * then apply the SAME predicate as a residual row filter — identical
    * results to the full scan by construction, touching only the files
    * whose envelope admits a match.
    */
  def prunedScan(spark: SparkSession, dir: String, index: DataFrame,
                 colName: String, lo: Long, hi: Long): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val survivors = pruneFiles(index, lo, hi)
    val base =
      if (survivors.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else spark.read.schema(schema).parquet(survivors: _*)
    base.where(col(colName) >= lo && col(colName) <= hi)
  }
}
