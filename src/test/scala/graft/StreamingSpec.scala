package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming._

/** M4: Structured Streaming surface. The streaming windowed aggregations
  * must agree with their batch (DuckDB-oracle-checked) twins on the same
  * rows — watermarking only changes *when* results emit, not their values;
  * the landing ingest must be exactly-once across restarts (the
  * reference's cursor/atomic-state contract, T1/K3).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDs = table("events")
    .select($"event_id", $"ts".cast("timestamp").as("ts"), $"user_id", $"event_type", $"value")
    .as[Event]

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
                          mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  test("streaming tumbling windows equal the batch result once all data is ingested") {
    val input = MemoryStream[Event](spark)
    input.addData(eventsDs.collect().toSeq)
    val got = runToMemory(
      EventStream.tumblingHourly(input.toDF()), "tum_all", mode = "complete")

    val want = EventStream.tumblingHourly(eventsDs.toDF())
    got.count() shouldBe want.count()
    got.except(want).count() shouldBe 0
    want.except(got).count() shouldBe 0
  }

  test("append mode with watermark emits only closed windows") {
    val input = MemoryStream[Event](spark)
    val all = eventsDs.collect().toSeq.sortBy(_.ts.getTime)
    input.addData(all)
    val got = runToMemory(EventStream.tumblingHourly(input.toDF()), "tum_append")
    // watermark = max(ts) - 2h: windows ending after it stay open/unemitted
    val cutoff = new java.sql.Timestamp(all.map(_.ts.getTime).max - 2 * 3600 * 1000)
    val want = EventStream.tumblingHourly(eventsDs.toDF())
      .where($"window_start" + expr("INTERVAL 1 HOUR") <= lit(cutoff))
    got.count() shouldBe want.count()
    got.except(want).count() shouldBe 0
  }

  test("stateful sessionization matches the batch sessionizer on closed sessions") {
    val input = MemoryStream[Event](spark)
    input.addData(eventsDs.collect().toSeq)
    val got = runToMemory(EventStream.sessionizeStateful(input.toDS()).toDF(), "sess")

    // batch twin (w03 oracle query). Sessions close two ways on the stream:
    // a newer event arrives past the gap (all but each user's last session),
    // or the event-time timeout fires once the watermark passes end+gap —
    // so assert got between those two bounds, values identical.
    val batch = operators.EventWindows.sessionize(table("events"), 30)
    val lastPerUser = batch.groupBy($"user_id").agg(max($"session_id").as("last_id"))
    val cols = Seq($"user_id", $"session_id", $"session_start", $"session_end",
                   $"n_events", $"sum_value", $"duration_sec")
    val joined = batch.join(lastPerUser, "user_id")
    val mustEmit = joined.where($"session_id" < $"last_id").select(cols: _*)
    val maxTs = eventsDs.agg(max($"ts")).head().getTimestamp(0).getTime
    // +1 ms slack: the watermark/timeout clock has ms granularity while
    // session ends carry µs
    val cutoff = new java.sql.Timestamp(maxTs - 2 * 3600 * 1000 + 1)
    val mayEmit = joined.where($"session_id" < $"last_id" ||
        $"session_end" + expr("INTERVAL 30 MINUTES") <= lit(cutoff))
      .select(cols: _*)
    val gotCmp = got.select($"user_id", $"session_id",
      $"session_start".cast("timestamp_ntz").as("session_start"),
      $"session_end".cast("timestamp_ntz").as("session_end"),
      $"n_events", $"sum_value", $"duration_sec")
    mustEmit.except(gotCmp).count() shouldBe 0 // everything closed-by-data emitted
    gotCmp.except(mayEmit).count() shouldBe 0  // nothing emitted beyond the bound
  }

  test("stream-stream time-interval join equals the batch range join") {
    val cIn = MemoryStream[Event](spark)
    val pIn = MemoryStream[Event](spark)
    val all = eventsDs.collect().toSeq
    cIn.addData(all.filter(_.event_type == "click"))
    pIn.addData(all.filter(_.event_type == "purchase"))
    val got = runToMemory(
      EventStream.recentPurchaseJoin(cIn.toDF(), pIn.toDF()), "ssjoin")

    val batch = EventStream.recentPurchaseJoin(
      eventsDs.toDF().where($"event_type" === "click"),
      eventsDs.toDF().where($"event_type" === "purchase"))
    got.count() shouldBe batch.count()
    got.except(batch).count() shouldBe 0
    batch.except(got).count() shouldBe 0
  }

  test("streaming dedup drops duplicate event_ids arriving across micro-batches") {
    val input = MemoryStream[Event](spark)
    val all = eventsDs.limit(200).collect().toSeq
    input.addData(all)
    input.addData(all.take(50))  // replayed slice (at-least-once upstream)
    input.addData(all.slice(20, 60))
    val got = runToMemory(EventStream.dedupeEvents(input.toDF()), "dedup_stream")
    got.count() shouldBe 200
    got.select($"event_id").distinct().count() shouldBe 200
  }

  test("landing ingest is exactly-once across restarts and idempotent per partition") {
    val root = Files.createTempDirectory("graft_ingest").toString
    val landing = s"$root/landing"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(landing))

    val grid = operators.Raster.demoGrid(table("lineitem"))
      .where($"variable" === "A").cache()
    val schema = grid.schema
    val m1 = grid.where(month($"time") === 1)
    val m2 = grid.where(month($"time") === 2)

    m1.write.mode("append").parquet(landing)
    LandingIngest.runOnce(spark, landing, out, ckpt, schema)
    val afterFirst = spark.read.parquet(out).count()
    afterFirst shouldBe m1.count()

    // restart with no new files: nothing re-processed (checkpoint = cursor)
    LandingIngest.runOnce(spark, landing, out, ckpt, schema)
    spark.read.parquet(out).count() shouldBe afterFirst

    // a second month lands: only it is processed, first month untouched
    m2.write.mode("append").parquet(landing)
    LandingIngest.runOnce(spark, landing, out, ckpt, schema)
    spark.read.parquet(out).count() shouldBe m1.count() + m2.count()
    grid.unpersist()
  }

  test("a partition landing across two micro-batches accumulates, not clobbers") {
    // ADVICE r2: with per-batch dynamic overwrite, the second batch touching
    // the same (variable, year, month) partition silently deleted the first
    // batch's rows. The native file sink appends under its transaction log.
    val root = Files.createTempDirectory("graft_ingest2").toString
    val landing = s"$root/landing"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(landing))

    val m1 = operators.Raster.demoGrid(table("lineitem"))
      .where($"variable" === "A" && month($"time") === 1).cache()
    val total = m1.count()
    val half1 = m1.where($"lat" < 0)
    val half2 = m1.where($"lat" >= 0)

    half1.write.mode("append").parquet(landing)
    LandingIngest.runOnce(spark, landing, out, ckpt, m1.schema)
    half2.write.mode("append").parquet(landing)
    LandingIngest.runOnce(spark, landing, out, ckpt, m1.schema)

    spark.read.parquet(out).count() shouldBe total
    m1.unpersist()
  }

  test("quality filter applies identically on a stream (row-local rules are streamable)") {
    // withQualityFlags is the composable/streamable form: no sort, no
    // shuffle — the same codegen'd rule battery runs per micro-batch
    val good = "that wind rock tree fish bird moon star lake sand " +
      "that hill wolf bear frog deer hawk dove that crab"
    val input = MemoryStream[(Long, String)](spark)
    input.addData((1L, good), (2L, "short text"), (3L, Seq.fill(20)("that").mkString(" ")))
    val flagged = operators.TextAnalysis
      .withQualityFlags(input.toDF().toDF("doc_id", "text"))
      .where($"keep").select($"doc_id")
    runToMemory(flagged, "qf_stream").as[Long].collect() shouldBe Array(1L)
  }

  test("complete-mode quality funnel merges state across micro-batches to the batch result") {
    // the w07 gate semantics under sbt test: per-source counts arriving
    // in separate micro-batches must converge to the one-shot batch
    // aggregate — the state-store merge is what's being proven
    val good = "that wind rock tree fish bird moon star lake sand " +
      "that hill wolf bear frog deer hawk dove that crab"
    val rows = Seq(
      (1L, good, "a"), (2L, "short text", "a"),
      (3L, good, "b"), (4L, Seq.fill(25)("that").mkString(" "), "b"),
      (5L, good, "b"))
    val input = MemoryStream[(Long, String, String)](spark)
    input.addData(rows.take(2)) // batch 1: source a only
    input.addData(rows.drop(2)) // batch 2: source b (+ must not clobber a)
    val funnel = operators.TextAnalysis.qualityFunnel(
      input.toDF().toDF("doc_id", "text", "source"))
    val streamed = runToMemory(funnel, "funnel_stream", mode = "complete")
      .orderBy($"source").collect().map(_.toSeq).toSeq
    val batch = operators.TextAnalysis.qualityFunnel(
      rows.toDF("doc_id", "text", "source"))
      .orderBy($"source").collect().map(_.toSeq).toSeq
    streamed shouldBe batch
    // and the counts themselves are right: a keeps 1 of 2, b keeps 2 of 3
    batch.map(r => (r.head, r(1), r.last)) shouldBe
      Seq(("a", 2L, 1L), ("b", 3L, 2L))
  }

  test("event-time timeout via the file source: no-data batch fires, boundary is strict") {
    // Pins the exact close rule the w08 oracle encodes: a pending session
    // flushes iff ceil_ms(end+gap) < final watermark (max ts ms-floored −
    // delay), fired by the trailing NO-DATA batch AvailableNow runs after
    // the last data batch. user2's timeout (08:30) < wm (11:00) → emitted;
    // user3's timeout is exactly ON the watermark (11:00 == 11:00) → NOT
    // emitted (strict <); user1's first session closes DATA-driven by an
    // event in a later micro-batch (state carried across batches, mtime
    // file order), and its last session stays open/unemitted.
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val b1 = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      Event(3, ts("2024-01-01 08:00:00"), 2, "click", 1.0),
      Event(4, ts("2024-01-01 10:30:00"), 3, "click", 1.0))
    val b2 = Seq(Event(5, ts("2024-01-01 13:00:00"), 1, "click", 1.0))
    val tmp = Files.createTempDirectory("graft_w08_sem").toString
    val base = System.currentTimeMillis() - 60000
    var stamped = Set.empty[String]
    def land(rows: Seq[Event], off: Long): Unit = {
      rows.toDS().coalesce(1).write.mode("append").parquet(s"$tmp/landing")
      stamped = StagedLanding.stampNew(
        java.nio.file.Paths.get(s"$tmp/landing"), base + off, stamped)
    }
    land(b1, 0); land(b2, 2000)
    val stream = spark.readStream.schema(b1.toDS().toDF().schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/landing")
    val q = EventStream.sessionizeStateful(stream.as[Event], 30, "2 hours").toDF()
      .writeStream.format("memory").queryName("w08_sem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("w08_sem")
      .select($"user_id", $"session_start", $"n_events")
      .orderBy($"user_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
    got shouldBe Array(
      (1L, "2024-01-01 10:00:00.0", 2L),
      (2L, "2024-01-01 08:00:00.0", 1L))
  }

  /** Two landing files forced into separate micro-batches (1100 ms apart
    * so mod-time ordering is unambiguous): a burst of old 08:xx events,
    * then one 20:00 event that drags the watermark to 18:00.
    */
  private def twoEpochLanding(): (String, Int) = {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val tmp = Files.createTempDirectory("graft_wm_state").toString
    val old = (1 to 60).map(i => Event(i.toLong,
      ts(f"2024-01-01 08:${i % 60}%02d:00"), i.toLong,
      if (i % 2 == 0) "click" else "purchase", 1.0))
    old.toDS().coalesce(1).write.mode("append").parquet(s"$tmp/landing")
    Thread.sleep(1100)
    // the fresh epoch must advance BOTH sides: the global watermark is the
    // MIN over the two inputs' (max ts − delay), so a click-only epoch
    // would leave the purchase side's watermark at 06:59 and evict nothing
    Seq(Event(1001L, ts("2024-01-01 20:00:00"), 1001L, "click", 1.0),
        Event(1002L, ts("2024-01-01 20:00:00"), 1002L, "purchase", 1.0))
      .toDS().coalesce(1).write.mode("append").parquet(s"$tmp/landing")
    (tmp, old.length)
  }

  private def epochSrc(tmp: String, t: String) =
    spark.readStream.schema(eventsDs.toDF().schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/landing")
      .where($"event_type" === t)

  private def stateTotals(q: org.apache.spark.sql.streaming.StreamingQuery) =
    q.recentProgress.toSeq.filter(_.stateOperators.nonEmpty)
      .map(p => (p.stateOperators.map(_.numRowsTotal).sum,
        p.stateOperators.map(_.numRowsRemoved).sum))

  test("w09 stream join state is watermark-BOUNDED: old state evicted, not accumulated") {
    val (tmp, nOld) = twoEpochLanding()
    val q = EventStream.recentPurchaseJoin(
        epochSrc(tmp, "click"), epochSrc(tmp, "purchase"))
      .writeStream.format("memory").queryName("w09_state")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val totals = stateTotals(q)
    // the join really held the whole old epoch at its peak...
    totals.map(_._1).max should be >= nOld.toLong
    // ...and the post-watermark no-data batch evicted it: a mis-set
    // watermark turns this ≤3 into "every event ever seen" — the leak
    // that kills a 100 TB deployment weeks in, caught here instead
    totals.last._1 should be <= 4L
    totals.map(_._2).sum should be >= (nOld - 2).toLong
  }

  test("w11 outer join state is watermark-bounded and evicts like the inner form") {
    val (tmp, nOld) = twoEpochLanding()
    val q = EventStream.recentPurchaseJoinOuter(
        epochSrc(tmp, "click"), epochSrc(tmp, "purchase"))
      .writeStream.format("memory").queryName("w11_state")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val totals = stateTotals(q)
    totals.map(_._1).max should be >= nOld.toLong
    totals.last._1 should be <= 4L
    // outer semantics on eviction: the unmatched old clicks must have
    // emitted their null-padded rows rather than vanishing
    spark.table("w11_state").where($"purchase_id".isNull).count() should be >= 25L
  }

  test("stream joins + sessionization run unchanged on the RocksDB state store") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (tmp, _) = twoEpochLanding()
      val q = EventStream.recentPurchaseJoin(
          epochSrc(tmp, "click"), epochSrc(tmp, "purchase"))
        .writeStream.format("memory").queryName("w09_rocks")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val totals = stateTotals(q)
      totals.last._1 should be <= 4L
      // value parity with the default-provider run is implied by the
      // deterministic join itself; what this pins is that the RocksDB
      // provider loads, checkpoints, and evicts on this exact surface
      spark.table("w09_rocks").count() shouldBe
        EventStream.recentPurchaseJoin(
          spark.read.parquet(s"$tmp/landing").where($"event_type" === "click"),
          spark.read.parquet(s"$tmp/landing").where($"event_type" === "purchase")).count()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("left-outer stream join: null rows gated by the global watermark, boundary strict") {
    // Pins the w11 oracle's outer-row rule: an unmatched click emits its
    // null-padded row iff its ts is STRICTLY below the global watermark
    // (min of both sides' max-ts − delay). Here wm = min(13:00, 13:30) −
    // 2 h = 11:00: user1 (08:00, unmatched) emits; user2 sits exactly ON
    // the watermark → suppressed (strict <); user3 matches its purchase;
    // user4 (13:00, unmatched) is younger than the watermark → its state
    // dies with the query, no null row.
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      Event(1, ts("2024-01-01 08:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 11:00:00"), 2, "click", 1.0),
      Event(3, ts("2024-01-01 12:00:00"), 3, "click", 1.0),
      Event(4, ts("2024-01-01 11:45:00"), 3, "purchase", 1.0),
      Event(5, ts("2024-01-01 13:00:00"), 4, "click", 1.0),
      Event(6, ts("2024-01-01 13:30:00"), 5, "purchase", 1.0))
    val tmp = Files.createTempDirectory("graft_w11_sem").toString
    rows.toDS().coalesce(1).write.parquet(s"$tmp/landing")
    def src() = spark.readStream.schema(rows.toDS().toDF().schema)
      .parquet(s"$tmp/landing")
    val q = EventStream.recentPurchaseJoinOuter(
        src().where($"event_type" === "click"),
        src().where($"event_type" === "purchase"), "2 hours", 1800)
      .writeStream.format("memory").queryName("w11_sem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("w11_sem")
      .select($"click_id", $"user_id",
        $"purchase_id", $"p_ts".cast("string"))
      .orderBy($"click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) "" else r.getString(3)))
    got shouldBe Array(
      (1L, 1L, -1L, ""),
      (3L, 3L, 4L, "2024-01-01 11:45:00"))
  }

  test("full-outer stream join: BOTH null sides gated by their own watermark cut, boundaries strict") {
    // Pins the w17 oracle's two emission rules. wm = min(13:00, 13:30) −
    // 2 h = 11:00. LEFT rule (as w11): unmatched click emits iff ts <
    // wm — u1 (08:00) emits, u2 sits exactly ON the watermark →
    // suppressed, u4 (13:00) is younger → no row. RIGHT rule: unmatched
    // purchase emits iff p_ts + tolerance < wm (its match window
    // [p_ts, p_ts+30 min] must be fully proven empty) — u6's 08:30
    // purchase (window ends 09:00) emits with null click columns, u7's
    // 10:30 purchase ends exactly ON the watermark → suppressed, u5's
    // 13:30 purchase is younger → its state dies with the query.
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      Event(1, ts("2024-01-01 08:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 11:00:00"), 2, "click", 1.0),
      Event(3, ts("2024-01-01 12:00:00"), 3, "click", 1.0),
      Event(4, ts("2024-01-01 11:45:00"), 3, "purchase", 1.0),
      Event(5, ts("2024-01-01 13:00:00"), 4, "click", 1.0),
      Event(6, ts("2024-01-01 13:30:00"), 5, "purchase", 1.0),
      Event(7, ts("2024-01-01 08:30:00"), 6, "purchase", 1.0),
      Event(8, ts("2024-01-01 10:30:00"), 7, "purchase", 1.0))
    val tmp = Files.createTempDirectory("graft_w17_sem").toString
    rows.toDS().coalesce(1).write.parquet(s"$tmp/landing")
    def src() = spark.readStream.schema(rows.toDS().toDF().schema)
      .parquet(s"$tmp/landing")
    val q = EventStream.recentPurchaseJoinFull(
        src().where($"event_type" === "click"),
        src().where($"event_type" === "purchase"), "2 hours", 1800)
      .writeStream.format("memory").queryName("w17_sem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("w17_sem")
      .select($"click_id", $"user_id", $"purchase_id", $"p_user_id")
      .orderBy($"click_id".asc_nulls_last, $"purchase_id").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    got shouldBe Array(
      (1L, 1L, -1L, -1L),  // left-only: old unmatched click
      (3L, 3L, 4L, 3L),    // the matched pair
      (-1L, -1L, 7L, 6L))  // right-only: old unmatched purchase
  }

  test("w12 semantics: a theta sketch built across micro-batches answers like one batch, exactly") {
    // 3 types x interleaved users, split across two files on event_id
    // parity — per-type state must MERGE, and below capacity the final
    // estimate is the exact distinct count
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = (1L to 120L).map { i =>
      Event(i, ts("2024-01-01 10:00:00"), i % 37, s"t${i % 3}", 1.0) }
    val tmp = Files.createTempDirectory("graft_w12_sem").toString
    rows.filter(_.event_id % 2 == 0).toDS().coalesce(1)
      .write.mode("append").parquet(s"$tmp/landing")
    rows.filter(_.event_id % 2 == 1).toDS().coalesce(1)
      .write.mode("append").parquet(s"$tmp/landing")
    val stream = spark.readStream.schema(rows.toDS().toDF().schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/landing")
    val q = stream.groupBy($"event_type")
      .agg(theta_sketch_agg($"user_id").as("sk"))
      .select($"event_type", theta_sketch_estimate($"sk").cast("long").as("n"))
      .writeStream.format("memory").queryName("w12_sem")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // two micro-batches actually ran (state merged, not single-shot)
    q.recentProgress.map(_.numInputRows).count(_ > 0) shouldBe 2
    val got = spark.table("w12_sem").as[(String, Long)].collect().toMap
    val exact = rows.toDS().groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n")).as[(String, Long)].collect().toMap
    got shouldBe exact
  }

  test("w14 semantics: a Misra-Gries summary merged across micro-batches is exact below capacity") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // 3 types, 37 users, skewed counts; capacity 64 > 37 -> exact
    val rows = (1L to 300L).map { i =>
      Event(i, ts("2024-01-01 10:00:00"), (i * i) % 37, s"t${i % 3}", 1.0) }
    val tmp = Files.createTempDirectory("graft_w14_sem").toString
    rows.filter(_.event_id % 2 == 0).toDS().coalesce(1)
      .write.mode("append").parquet(s"$tmp/landing")
    rows.filter(_.event_id % 2 == 1).toDS().coalesce(1)
      .write.mode("append").parquet(s"$tmp/landing")
    val stream = spark.readStream.schema(rows.toDS().toDF().schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/landing")
    val mg = graft.operators.Sketches.mgCounters(64)
    val q = stream.groupBy($"event_type")
      .agg(mg($"user_id".cast("string")).as("counters"))
      .writeStream.format("memory").queryName("w14_sem")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.map(_.numInputRows).count(_ > 0) shouldBe 2
    val got = spark.table("w14_sem")
      .select($"event_type", explode($"counters").as(Seq("u", "n")))
      .as[(String, String, Long)].collect()
      .map { case (t, u, n) => ((t, u.toLong), n) }.toMap
    val exact = rows.toDS().groupBy($"event_type", $"user_id")
      .agg(count(lit(1)).as("n")).as[(String, Long, Long)].collect()
      .map { case (t, u, n) => ((t, u), n) }.toMap
    got shouldBe exact
  }

  test("w20 streaming CEP equals the one-shot batch scan across the landing splits") {
    // the four time-sliced batches cut through users' sequences, so
    // resumable-scan state (tail carry, committed match ends) is
    // genuinely exercised; equality row-for-row with the batch kernel
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id", $"seq_len", $"n_matches", $"first_match")
        .as[(Long, Long, Long, String)].collect().toSeq
    rows(SparkEntry.queries("w20_stream_pattern")(spark, sf0001)) shouldBe
      rows(SparkEntry.queries("q69_pattern_match")(spark, sf0001))
    // non-portable and extension-unsafe patterns refuse loudly
    val ev = spark.emptyDataset(
      org.apache.spark.sql.Encoders.product[graft.streaming.Event])
    an[IllegalArgumentException] should be thrownBy
      graft.streaming.EventStream.patternMatchStateful(ev, "v+c*")
    an[IllegalArgumentException] should be thrownBy
      graft.streaming.EventStream.patternMatchStateful(ev, "(?=v)p")
  }

  test("w21 streaming gaps equal the batch lag window across the landing splits") {
    import org.apache.spark.sql.expressions.Window
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id",
          unix_micros($"gap_start".cast("timestamp")).as("s"),
          unix_micros($"gap_end".cast("timestamp")).as("e"), $"gap_sec")
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val batch = eventsDs.toDF()
      .withColumn("prev",
        lag($"ts", 1).over(Window.partitionBy($"user_id").orderBy($"ts", $"event_id")))
      .where($"prev".isNotNull &&
        unix_micros($"ts") - unix_micros($"prev") > 86400L * 1000000L)
      .select($"user_id", $"prev".as("gap_start"), $"ts".as("gap_end"),
        floor((unix_micros($"ts") - unix_micros($"prev")) / 1000000L)
          .cast("long").as("gap_sec"))
    val streamed = SparkEntry.queries("w21_stream_gaps")(spark, sf0001)
    rows(streamed) shouldBe rows(batch)
    rows(streamed) should not be empty
  }

  test("gapDetectStateful: a gap straddling two micro-batches emits exactly once") {
    def ev(id: Long, uid: Long, sec: Long): Event =
      Event(id, new java.sql.Timestamp(sec * 1000), uid, "click", 0.0)
    val input = MemoryStream[Event](spark)
    val q = EventStream.gapDetectStateful(input.toDS(), thresholdSec = 100).toDF()
      .writeStream.format("memory").queryName("w21_sem").outputMode("append").start()
    // batch 1: user 1 at t=0 and t=50 (no gap); user 2 at t=0
    input.addData(ev(1, 1, 0), ev(2, 1, 50))
    input.addData(ev(3, 2, 0))
    q.processAllAvailable()
    spark.table("w21_sem").count() shouldBe 0
    // batch 2: user 1 at t=500 — the 450 s gap spans the batch boundary;
    // user 2 at t=90 stays under the threshold
    input.addData(ev(4, 1, 500), ev(5, 2, 90))
    q.processAllAvailable()
    val got = spark.table("w21_sem")
      .select($"user_id", unix_micros($"gap_start").as("s"),
        unix_micros($"gap_end").as("e"), $"gap_sec")
      .as[(Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq((1L, 50000000L, 500000000L, 450L))
    q.stop()
  }

  test("w22 streaming attribution equals the batch q72 window across the landing splits") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id", $"event_id", $"conv_us", $"n_touches",
          $"first_touch", $"first_us", $"last_touch", $"last_us")
        .collect().map(_.toSeq).toSeq
    val streamed = SparkEntry.queries("w22_stream_attribution")(spark, sf0001)
    val batch = SparkEntry.queries("q72_attribution")(spark, sf0001)
    rows(streamed) shouldBe rows(batch)
    rows(streamed) should not be empty
  }

  test("attributionStateful: cross-batch touches attribute; pruned touches never return") {
    def ev(id: Long, uid: Long, sec: Long, typ: String): Event =
      Event(id, new java.sql.Timestamp(sec * 1000), uid, typ, 1.0)
    val input = MemoryStream[Event](spark)
    val q = EventStream.attributionStateful(input.toDS(), lookbackSec = 100).toDF()
      .writeStream.format("memory").queryName("w22_sem").outputMode("append").start()
    // batch 1: a touch at t=10 (inside the future window) and one at
    // t=−∞-ish that the pruner must drop before batch 2's conversion
    input.addData(ev(1, 1, 10, "click"), ev(2, 1, 60, "view"))
    q.processAllAvailable()
    // batch 2: conversion at t=80 — attributes to batch-1 state; a
    // second conversion at t=200 finds every touch pruned (organic)
    input.addData(ev(3, 1, 80, "purchase"), ev(4, 1, 200, "purchase"))
    q.processAllAvailable()
    val got = spark.table("w22_sem")
      .select($"event_id", $"n_touches", $"first_touch", $"last_touch")
      .as[(Long, Long, Option[String], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    got(3L) shouldBe ((2L, Some("click"), Some("view")))
    got(4L) shouldBe ((0L, None, None))
    q.stop()
  }

  test("funnelStateful: cross-batch chaining, strict order, single emission") {
    def ev(id: Long, uid: Long, sec: Long, typ: String): Event =
      Event(id, new java.sql.Timestamp(sec * 1000), uid, typ, 1.0)
    val input = MemoryStream[Event](spark)
    val q = EventStream.funnelStateful(input.toDS()).toDF()
      .writeStream.format("memory").queryName("w23_sem").outputMode("append").start()
    // batch 1: user 1 views then clicks (out of order in the batch —
    // the handler sorts); user 2 clicks BEFORE any view (must not count)
    input.addData(ev(2, 1, 20, "click"), ev(1, 1, 10, "view"),
      ev(3, 2, 10, "click"))
    q.processAllAvailable()
    spark.table("w23_sem").count() shouldBe 0 // nobody completed yet
    // batch 2: user 1 purchases -> completes with the batch-1 cursor;
    // user 2 views then purchases WITHOUT a click after the view
    input.addData(ev(4, 1, 30, "purchase"), ev(5, 2, 20, "view"),
      ev(6, 2, 30, "purchase"))
    q.processAllAvailable()
    // batch 3: a second purchase must NOT re-emit user 1; user 2's
    // click at t=40 then purchase at t=50 completes user 2
    input.addData(ev(7, 1, 60, "purchase"), ev(8, 2, 40, "click"),
      ev(9, 2, 50, "purchase"))
    q.processAllAvailable()
    val got = spark.table("w23_sem")
      .select($"user_id", $"step1_us", $"step2_us", $"step3_us")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    got.length shouldBe 2
    got(0) shouldBe ((1L, 10000000L, 20000000L, 30000000L))
    // user 2: view at 20, click at 40 (the pre-view click never counts),
    // purchase at 50 — NOT the t=30 purchase (no click had closed yet)
    got(1) shouldBe ((2L, 20000000L, 40000000L, 50000000L))
    q.stop()
  }
}
