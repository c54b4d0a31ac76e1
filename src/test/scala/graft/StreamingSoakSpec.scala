package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Sketches, Upsert}
import graft.streaming.SnapshotUpsert

/** Long-horizon state-store soak (round-7 verdict item 8): ≥200
  * micro-batches under the RocksDB provider for the two state shapes
  * whose BOUND is the design claim — the Misra–Gries summary (state =
  * k counters per group at ANY input cardinality) and streaming SCD2
  * (open rows = key count at ANY change volume). A state leak shows up
  * here as monotone growth; the assertions pin the plateau, not just
  * the final value.
  */
class StreamingSoakSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** 240 micro-batches × 32 shuffle partitions would spend the whole
    * soak on empty-partition state-store bookkeeping; 4 partitions keep
    * the per-batch cost on the actual state machinery.
    */
  private def withFewPartitions[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("soak: 240 MG micro-batches under RocksDB — state rows pinned at #groups, bytes plateau") {
    withRocksDb { withFewPartitions {
      val prevProg = spark.conf.getOption("spark.sql.streaming.numRecentProgressUpdates")
      spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "300")
      try {
        val tmp = Files.createTempDirectory("graft_soak_mg").toString
        val batches = 240
        val perBatch = 250
        // every user id distinct across the run: an exact streaming
        // groupBy(type, user) would grow state by 250 rows per batch
        // (60k rows by the end); the MG summary must hold 3 group rows
        // of <= 64 counters forever
        spark.range(batches.toLong * perBatch)
          .select(($"id" / perBatch).cast("long").as("b"),
            $"id".as("user_id"),
            concat(lit("t"), $"id" % 3).as("event_type"))
          .write.partitionBy("b").parquet(s"$tmp/landing")
        val leafs = new java.io.File(s"$tmp/landing").listFiles()
          .filter(_.getName.startsWith("b=")).sortBy(_.getName.drop(2).toInt)
          .flatMap(_.listFiles().filter(_.getName.startsWith("part-")))
        leafs.length shouldBe batches
        val schema = spark.read.parquet(s"$tmp/landing").schema
        val mg = Sketches.mgCounters(64)
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$tmp/landing")
          .groupBy($"event_type")
          .agg(mg($"user_id".cast("string")).as("counters"))
          .writeStream.format("memory").queryName("soak_mg")
          .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val prog = q.recentProgress.filter(_.stateOperators.nonEmpty)
        prog.length should be >= 200
        // rows plateau: one state row per GROUP at every batch, never
        // per distinct user
        prog.foreach(p => p.stateOperators.map(_.numRowsTotal).sum should be <= 3L)
        // bytes plateau: the final quarter must not outgrow the middle
        // third (1.5x slack for RocksDB bookkeeping noise)
        val bytes = prog.map(_.stateOperators.map(_.memoryUsedBytes).sum)
        val mid = bytes.slice(bytes.length / 3, 2 * bytes.length / 3).max
        bytes.takeRight(bytes.length / 4).max should be <=
          math.max((mid * 3) / 2, 64L * 1024)
        // the summary itself stays within capacity
        spark.table("soak_mg")
          .select(org.apache.spark.sql.functions.size($"counters")).as[Int]
          .collect().foreach(_ should be <= 64)
      } finally prevProg match {
        case Some(v) => spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", v)
        case None    => spark.conf.unset("spark.sql.streaming.numRecentProgressUpdates")
      }
    } }
  }

  test("soak: 200 SCD2 micro-batches — open rows pinned at key count, snapshot versions vacuumed") { withFewPartitions {
    val tmp = Files.createTempDirectory("graft_soak_scd2").toString
    val nKeys = 50L
    val batches = 200
    val seed = spark.range(nKeys).select($"id".as("custkey"),
      lit("S").as("status"), ($"id" * 100).as("cents"),
      lit(1546300800L).cast("timestamp").as("change_ts"), // 2019-01-01
      lit(false).as("del"))
    SnapshotUpsert.init(Upsert.scd2Recompute(seed, "custkey"), s"$tmp/dim")
    // batch b updates keys (3b, 3b+1, 3b+2) mod nKeys at strictly
    // increasing timestamps: 600 changes over a FIXED key set
    spark.range(batches * 3L).select(
      ($"id" / 3).cast("long").as("b"),
      ($"id" % nKeys).as("custkey"), lit("U").as("status"),
      ($"id" * 7).as("cents"),
      (lit(1577836800L) + ($"id" / 3).cast("long") * 60).cast("timestamp").as("change_ts"),
      lit(false).as("del"))
      .write.partitionBy("b").parquet(s"$tmp/landing")
    val leafs = new java.io.File(s"$tmp/landing").listFiles()
      .filter(_.getName.startsWith("b=")).sortBy(_.getName.drop(2).toInt)
      .flatMap(_.listFiles().filter(_.getName.startsWith("part-")))
    leafs.length shouldBe batches
    // mod-time order == batch order (the file source's ordering contract)
    val base = System.currentTimeMillis() - 7200000L
    leafs.zipWithIndex.foreach { case (f, i) => f.setLastModified(base + i * 2000L) }
    val schema = spark.read.parquet(s"$tmp/landing").schema
    val openCounts = scala.collection.mutable.ArrayBuffer[Long]()
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = { (df, id) =>
      SnapshotUpsert.applyScd2Batch(s"$tmp/dim", "custkey")(df.drop("b"), id)
      if (id % 25 == 24) // sampled open-row probe along the horizon
        openCounts += SnapshotUpsert.read(spark, s"$tmp/dim")
          .where($"is_current").count()
    }
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/landing")
      .writeStream.foreachBatch(sink)
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // open rows NEVER exceed the key count, at any probe or at the end
    openCounts.foreach(_ shouldBe nKeys)
    val dim = SnapshotUpsert.read(spark, s"$tmp/dim")
    dim.where($"is_current").count() shouldBe nKeys
    // full history retained: every change is one closed-or-open row
    dim.count() shouldBe nKeys + batches * 3L
    // vacuum held the on-disk version count flat (retain=2 + current)
    val versions = new java.io.File(s"$tmp/dim").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("b")).length
    versions should be <= 4
  } }
}
