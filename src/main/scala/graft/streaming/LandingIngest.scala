package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** S7/T1 streaming flavor: the reference watches a directory and schedules
  * work per discovered file (chokidar on `sources/`, reference
  * src/main.js:9-11), with a per-source cursor making each month
  * exactly-once (era5monthly.js:37-41). The Spark-native equivalent is a
  * file-source `readStream` over a landing directory + `foreachBatch`
  * writing idempotent month partitions, with the checkpoint directory
  * playing the role of the reference's state JSON (offsets survive
  * restarts; a re-run re-lands nothing).
  *
  * At scale: the file source lists incrementally (maxFilesPerTrigger
  * bounds a micro-batch), the write is partitioned `variable/year/month`
  * with dynamic overwrite — a replayed batch overwrites the same
  * partitions, preserving the reference's retry-idempotence (K3/T1).
  */
object LandingIngest {

  /** Start the ingest: grid-schema parquet files landing in `landingDir`
    * stream into the partitioned store at `outputDir`. `transform` is the
    * per-cycle dataflow (unit conversion, anomaly, ... — any
    * `DataFrame => DataFrame` from graft.operators).
    */
  def start(spark: SparkSession, landingDir: String, outputDir: String,
            checkpointDir: String, schema: StructType,
            transform: DataFrame => DataFrame = identity,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 32)
      .parquet(landingDir)
      .transform(transform)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          batch.sparkSession.conf
            .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
          graft.operators.Raster.writePartitioned(batch, outputDir)
        }
      }
      .start()

  /** Run one AvailableNow cycle to completion — the batch-cursor analog of
    * a single reference `forage` (SURVEY.md §3.2).
    */
  def runOnce(spark: SparkSession, landingDir: String, outputDir: String,
              checkpointDir: String, schema: StructType,
              transform: DataFrame => DataFrame = identity): Unit = {
    val q = start(spark, landingDir, outputDir, checkpointDir, schema, transform)
    q.awaitTermination()
  }
}
