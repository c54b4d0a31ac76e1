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

  test("soak: 50-cycle GRIB landing — incremental files, mid-stream corrupt-file quarantine, exactly-once replay") {
    withFewPartitions {
      import graft.sources.Grib2
      import java.time.LocalDateTime
      val tmp = Files.createTempDirectory("graft_w25_soak")
      val land = tmp.resolve("landing"); Files.createDirectories(land)
      val outDir = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      val ni = 7; val nj = 5
      def writeGood(cycle: Int): Long = {
        Grib2.writeFile(land.resolve(f"c$cycle%03d.grib2"), Seq(
          Grib2.Field(0, 0, 0, LocalDateTime.of(2006, 1, 1, 0, 0).plusHours(cycle.toLong),
            ni, nj, 40000000L, 0L, 1000000L, 1000000L, decimalScale = 1,
            Array.tabulate(nj * ni)(k => Some((k * 3 + cycle) % 400)))))
        // the cycle's exact scaled-cell sum, for the closed-form total
        (0 until nj * ni).map(k => ((k * 3 + cycle) % 400).toLong).sum
      }
      def runCycle(): Unit = {
        val q = graft.streaming.LandingIngest.gribLanding(spark, land.toString)
          .toDF()
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      var expectedSum = 0L
      var expectedRows = 0L
      for (cycle <- 0 until 50) {
        expectedSum += writeGood(cycle)
        expectedRows += nj * ni
        if (cycle == 20) {
          // a torn upstream file lands mid-stream: truncated GRIB2
          val good = java.nio.file.Files.readAllBytes(land.resolve("c020.grib2"))
          java.nio.file.Files.write(land.resolve("torn.grib2"),
            good.take(good.length / 2))
        }
        if (cycle % 10 == 3) writeGood(cycle + 1000) // two files in one cycle
        if (cycle % 10 == 3) {
          expectedSum += (0 until nj * ni).map(k => ((k * 3 + cycle + 1000) % 400).toLong).sum
          expectedRows += nj * ni
        }
        runCycle() // the stream must survive every cycle, incl. the torn file
      }
      // an idle cycle with no new files re-lands nothing (checkpoint
      // exactly-once: the reference's per-source cursor semantics)
      runCycle()
      val out = spark.read.parquet(outDir)
      val good = out.where(!col("corrupt"))
      good.count() shouldBe expectedRows
      good.agg(sum(round(col("value") * 10, 0).cast("long"))).head.getLong(0) shouldBe expectedSum
      // exactly one quarantine row, pointing at the torn file
      val bad = out.where(col("corrupt")).collect()
      bad.length shouldBe 1
      bad.head.getAs[String]("variable") shouldBe "__corrupt__"
      bad.head.getAs[String]("src") should include("torn.grib2")
      // writing the torn file's sibling again after the soak still lands
      expectedSum += writeGood(999)
      runCycle()
      spark.read.parquet(outDir).where(!col("corrupt")).count() shouldBe expectedRows + nj * ni
    }
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

  /** Run `body` with an enlarged progress ring buffer (the plateau
    * assertions need every micro-batch's state metrics).
    */
  private def withProgressWindow[A](n: Int)(body: => A): A = {
    val key = "spark.sql.streaming.numRecentProgressUpdates"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, n.toString)
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Final-quarter vs middle-third plateau assertion on a per-batch
    * metric series: a leak is monotone growth; bounded state flattens.
    */
  private def assertPlateau(series: Seq[Long], slackNum: Long = 3,
                            slackDen: Long = 2, floor: Long = 64): Unit = {
    val mid = series.slice(series.length / 3, 2 * series.length / 3).max
    series.takeRight(series.length / 4).max should be <=
      math.max((mid * slackNum) / slackDen, floor)
  }

  test("soak: 220 full-outer stream-stream join micro-batches under RocksDB — state plateaus at the watermark window") {
    withRocksDb { withFewPartitions { withProgressWindow(300) {
      val tmp = Files.createTempDirectory("graft_soak_w17").toString
      val batches = 220
      // batch b at epoch + b minutes; per-batch-unique users so every
      // click matches exactly its same-batch purchase: users b*100+{0,1,2}
      // match, b*100+{3,4,5} are left-only, b*100+9 is right-only. With a
      // 10-minute watermark the join state holds ~16 batches of rows at
      // any horizon — 220 batches of growth is what the plateau refutes
      val rows = spark.range(batches.toLong).select($"id".as("b"))
        .select($"b", explode(sequence(lit(0), lit(6))).as("i"))
        .select($"b",
          ($"b" * 100 + when($"i" === 6, 9).otherwise($"i")).as("user_id"),
          ($"b" * 1000 + $"i").as("event_id"),
          when($"i" === 6, lit("purchase"))
            .when($"i" < 3, lit("click")).otherwise(lit("click_only")).as("kind"),
          (lit(1700000000L) + $"b" * 60).cast("timestamp").as("ts"))
      // matched users need BOTH a click and a purchase row
      val both = rows.where($"kind" === "click")
        .select($"b", $"user_id", ($"event_id" + 500).as("event_id"),
          lit("purchase").as("kind"), $"ts")
      rows.unionByName(both)
        .withColumn("kind", when($"kind" === "click_only", "click").otherwise($"kind"))
        .repartition($"b") // one part file per b= dir → one file per batch
        .write.partitionBy("b").parquet(s"$tmp/landing")
      val leafs = new java.io.File(s"$tmp/landing").listFiles()
        .filter(_.getName.startsWith("b=")).sortBy(_.getName.drop(2).toInt)
        .flatMap(_.listFiles().filter(_.getName.startsWith("part-")))
      leafs.length shouldBe batches
      val base = System.currentTimeMillis() - 7200000L
      leafs.zipWithIndex.foreach { case (f, i) => f.setLastModified(base + i * 2000L) }
      val schema = spark.read.parquet(s"$tmp/landing").schema
      def src() = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$tmp/landing")
      val joined = graft.streaming.EventStream.recentPurchaseJoinFull(
        src().where($"kind" === "click"),
        src().where($"kind" === "purchase"),
        watermark = "10 minutes", toleranceSec = 300)
      val q = joined.writeStream.format("memory").queryName("soak_w17")
        .outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val prog = q.recentProgress.filter(_.stateOperators.nonEmpty)
      prog.length should be >= 200
      assertPlateau(prog.map(_.stateOperators.map(_.numRowsTotal).sum).toSeq,
        floor = 512)
      val out = spark.table("soak_w17")
      // every matched pair emitted (same-batch click+purchase per user)
      out.where($"click_id".isNotNull && $"purchase_id".isNotNull)
        .count() shouldBe batches * 3L
      // BOTH null-padded sides surfaced once the watermark passed them
      out.where($"click_id".isNull).count() should be > 0L
      out.where($"purchase_id".isNull).count() should be > 0L
      // ... and only from the young tail may rows be withheld: every
      // left-only click older than the final cut emitted
      out.where($"purchase_id".isNull).count() should be >= (batches - 20) * 3L
      out.where($"click_id".isNull).count() should be >= (batches - 20).toLong
    } } }
  }

  test("soak: 220 stream-static broadcast-enrich micro-batches — agg state pinned at dimension cardinality") {
    withRocksDb { withFewPartitions { withProgressWindow(300) {
      val tmp = Files.createTempDirectory("graft_soak_w18").toString
      val batches = 220
      val perBatch = 40
      spark.range(batches.toLong * perBatch)
        .select(($"id" / perBatch).cast("long").as("b"),
          $"id".as("user_id"), ($"id" % 97).cast("double").as("value"))
        .write.partitionBy("b").parquet(s"$tmp/landing")
      val dim = spark.range(25).select($"id".as("n_nationkey"),
        concat(lit("N"), $"id").as("n_name"))
      val schema = spark.read.parquet(s"$tmp/landing").schema
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$tmp/landing")
        .withColumn("n_nationkey", pmod($"user_id", lit(25L)))
        .join(broadcast(dim), Seq("n_nationkey"))
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
        .writeStream.format("memory").queryName("soak_w18")
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val prog = q.recentProgress.filter(_.stateOperators.nonEmpty)
      prog.length should be >= 200
      // the static broadcast side contributes NO join state; aggregation
      // state is pinned at the dimension's 25 rows at every batch
      prog.foreach(p => p.stateOperators.map(_.numRowsTotal).sum should be <= 25L)
      assertPlateau(prog.map(_.stateOperators.map(_.memoryUsedBytes).sum).toSeq,
        floor = 64L * 1024)
      val out = spark.table("soak_w18")
      out.count() shouldBe 25L
      out.agg(sum($"n")).head().getLong(0) shouldBe batches.toLong * perBatch
    } } }
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

  test("soak: 200 op-aware CDC micro-batches — snapshot bounded by keys, split equals one-shot") { withFewPartitions {
    val tmp = Files.createTempDirectory("graft_soak_cdc").toString
    val nKeys = 50L
    val batches = 200
    val base = spark.range(nKeys).select($"id".as("k"), lit("v0").as("v"))
    SnapshotUpsert.init(base, s"$tmp/snap")
    // batch b carries ops 3b..3b+2; key = seq % 50, op cycles U/D/I, so
    // every key loops through update -> delete -> resurrect hundreds of
    // times over a FIXED key universe
    spark.range(batches * 3L).select(
      ($"id" / 3).cast("long").as("b"),
      ($"id" % nKeys).as("k"),
      concat(lit("x"), $"id").as("v"),
      element_at(array(lit("U"), lit("D"), lit("I")),
        ($"id" % 3).cast("int") + 1).as("op"),
      $"id".as("seq"))
      .write.partitionBy("b").parquet(s"$tmp/landing")
    val leafs = new java.io.File(s"$tmp/landing").listFiles()
      .filter(_.getName.startsWith("b=")).sortBy(_.getName.drop(2).toInt)
      .flatMap(_.listFiles().filter(_.getName.startsWith("part-")))
    leafs.length shouldBe batches
    val mtbase = System.currentTimeMillis() - 7200000L
    leafs.zipWithIndex.foreach { case (f, i) => f.setLastModified(mtbase + i * 2000L) }
    val schema = spark.read.parquet(s"$tmp/landing").schema
    val probes = scala.collection.mutable.ArrayBuffer[Long]()
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = { (df, id) =>
      SnapshotUpsert.applyCdcBatch(s"$tmp/snap", "k")(df.drop("b"), id)
      if (id % 25 == 24)
        probes += SnapshotUpsert.read(spark, s"$tmp/snap").count()
    }
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/landing")
      .writeStream.foreachBatch(sink)
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the snapshot can never outgrow the key universe, at any horizon
    probes.foreach(_ should be <= nKeys)
    // the 200-batch split equals the one-shot automaton (the w19 law,
    // at soak length)
    val oneShot = Upsert.cdcApply(base,
        spark.read.parquet(s"$tmp/landing").drop("b"), "k")
      .as[(Long, String)].collect().sorted
    SnapshotUpsert.read(spark, s"$tmp/snap")
      .as[(Long, String)].collect().sorted shouldBe oneShot
    val versions = new java.io.File(s"$tmp/snap").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("b")).length
    versions should be <= 4
  } }

  test("soak: 240 CEP pattern micro-batches under RocksDB — state rows pinned at #users, bytes plateau") {
    withRocksDb { withFewPartitions { withProgressWindow(300) {
      val tmp = Files.createTempDirectory("graft_soak_w20").toString
      val batches = 240
      val users = 8L
      // each user completes one v,c,p match per batch, so the resumable
      // tail drains every batch — state must hold #users rows of
      // near-constant size while totals (seq_len, n_matches) grow
      spark.range(batches * users * 3L).select(
        ($"id" / (users * 3L)).cast("long").as("b"),
        $"id".as("event_id"),
        (lit(1700000000L) + $"id").cast("timestamp").as("ts"),
        (($"id" / 3L).cast("long") % users).as("user_id"),
        element_at(array(lit("view"), lit("click"), lit("purchase")),
          ($"id" % 3).cast("int") + 1).as("event_type"),
        lit(0.0).as("value"))
        .write.partitionBy("b").parquet(s"$tmp/landing")
      val leafs = new java.io.File(s"$tmp/landing").listFiles()
        .filter(_.getName.startsWith("b=")).sortBy(_.getName.drop(2).toInt)
        .flatMap(_.listFiles().filter(_.getName.startsWith("part-")))
      leafs.length shouldBe batches
      val mtbase = System.currentTimeMillis() - 7200000L
      leafs.zipWithIndex.foreach { case (f, i) => f.setLastModified(mtbase + i * 2000L) }
      val schema = spark.read.parquet(s"$tmp/landing").drop("b").schema
      val q = graft.streaming.EventStream.patternMatchStateful(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$tmp/landing")
            .as[graft.streaming.Event](
              org.apache.spark.sql.Encoders.product[graft.streaming.Event]),
          "v+c*p")
        .toDF()
        .writeStream.format("memory").queryName("soak_w20")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val prog = q.recentProgress.filter(_.stateOperators.nonEmpty)
      prog.length should be >= 200
      // one state row per user at every batch — never per event
      prog.foreach(p => p.stateOperators.map(_.numRowsTotal).sum should be <= users)
      assertPlateau(prog.map(_.stateOperators.map(_.memoryUsedBytes).sum).toSeq)
      // totals kept counting across the whole horizon: one match per
      // user per batch
      spark.table("soak_w20").groupBy($"user_id")
        .agg(max($"n_matches").as("m")).select($"m").as[Long]
        .collect().foreach(_ shouldBe batches.toLong)
    } } }
  }
}
