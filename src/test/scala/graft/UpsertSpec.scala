package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.operators.Upsert

/** CDC merge semantics (t17) + the streaming snapshot store (w10's sink):
  * whole-row replacement, latest-wins, tombstones, inserts, and the
  * exactly-once pointer protocol.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String, String)*) =
    rows.toDF("id", "src", "text")

  private def ch(rows: (Long, String, String, Int, Boolean)*) =
    rows.toDF("id", "src", "text", "seq", "del")

  test("merge: insert, update, delete, untouched — all in one batch") {
    val s = snap((1L, "a", "one"), (2L, "a", "two"), (3L, "a", "three"))
    val c = ch(
      (2L, "a", "two'", 1, false),  // update
      (3L, "a", "x", 1, true),      // delete
      (9L, "b", "nine", 1, false))  // insert
    val out = Upsert.merge(s, c, "id").orderBy($"id")
      .as[(Long, String, String)].collect()
    out shouldBe Array((1L, "a", "one"), (2L, "a", "two'"), (9L, "b", "nine"))
  }

  test("merge: multiple queued changes per key — the highest seq wins") {
    val s = snap((1L, "a", "one"))
    val c = ch(
      (1L, "a", "v1", 1, false),
      (1L, "a", "v3", 3, false),
      (1L, "a", "v2", 2, false))
    Upsert.merge(s, c, "id").as[(Long, String, String)].collect() shouldBe
      Array((1L, "a", "v3"))
  }

  test("merge: a delete followed by a later upsert resurrects the key") {
    val s = snap((1L, "a", "one"))
    val c = ch((1L, "a", "x", 1, true), (1L, "a", "reborn", 2, false))
    Upsert.merge(s, c, "id").as[(Long, String, String)].collect() shouldBe
      Array((1L, "a", "reborn"))
  }

  test("merge: tombstone for a key the snapshot never had is a no-op row") {
    val s = snap((1L, "a", "one"))
    val c = ch((7L, "a", "x", 1, true))
    Upsert.merge(s, c, "id").as[(Long, String, String)].collect() shouldBe
      Array((1L, "a", "one"))
  }

  test("merge is whole-row: an explicit NULL in the winning change is kept, not coalesced") {
    val s = snap((1L, "a", "one"))
    val c = Seq((1L, null.asInstanceOf[String], "text'", 1, false))
      .toDF("id", "src", "text", "seq", "del")
    val row = Upsert.merge(s, c, "id").collect()(0)
    row.isNullAt(row.fieldIndex("src")) shouldBe true
    row.getAs[String]("text") shouldBe "text'"
  }

  test("merge is idempotent: re-applying the same batch changes nothing") {
    val s = snap((1L, "a", "one"), (2L, "a", "two"))
    val c = ch((1L, "a", "v2", 5, false), (2L, "a", "x", 5, true), (3L, "b", "new", 5, false))
    val once = Upsert.merge(s, c, "id")
    val twice = Upsert.merge(once, c, "id")
    twice.orderBy($"id").collect() shouldBe once.orderBy($"id").collect()
  }

  test("merge: equal-seq ties resolve deterministically (content-hash tie-break)") {
    val s = snap((1L, "a", "one"))
    val c = ch((1L, "a", "left", 7, false), (1L, "a", "right", 7, false))
    val winners = (1 to 4).map { k =>
      Upsert.merge(s, c.repartition(k), "id").as[(Long, String, String)].collect().toSeq
    }
    winners.distinct.size shouldBe 1
    // byte-identical duplicate deliveries tie harmlessly
    Upsert.merge(s, c.unionByName(c), "id").as[(Long, String, String)]
      .collect().toSeq shouldBe winners.head
  }

  test("equal-seq rows whose values shift across null columns still resolve deterministically") {
    // raw xxhash64 skips null inputs, so these two rows would collide
    // under a column-wise hash; the JSON tie-break keeps nulls positional
    val s = snap((1L, "a", "one"))
    val c = Seq((1L, "x", null.asInstanceOf[String], 7, false),
                (1L, null.asInstanceOf[String], "x", 7, false))
      .toDF("id", "src", "text", "seq", "del")
    val winners = (1 to 4).map { k =>
      Upsert.merge(s, c.repartition(k), "id")
        .collect().map(_.toSeq).toSeq
    }
    winners.distinct.size shouldBe 1
  }

  test("merge result is partition-count independent") {
    val s = snap((1L to 40L).map(i => (i, "a", s"t$i")): _*)
    val c = ch((1L to 40L by 3).map(i => (i, "a", s"u$i", 1, i % 6 == 1)): _*)
    val a = Upsert.merge(s.repartition(2), c.repartition(2), "id").orderBy($"id").collect()
    val b = Upsert.merge(s.repartition(16), c.repartition(7), "id").orderBy($"id").collect()
    a shouldBe b
  }

  test("snapshot store: init → applyBatch → read round-trips, pointer switches atomically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val s = snap((1L, "a", "one"), (2L, "a", "two"))
    graft.streaming.SnapshotUpsert.init(s, dir)
    graft.streaming.SnapshotUpsert.currentVersion(dir) shouldBe Some("b-1")
    graft.streaming.SnapshotUpsert.applyBatch(dir, "id")(
      ch((2L, "a", "two'", 1, false), (3L, "a", "three", 1, false)), 0L)
    graft.streaming.SnapshotUpsert.currentVersion(dir) shouldBe Some("b0")
    graft.streaming.SnapshotUpsert.read(spark, dir).orderBy($"id")
      .as[(Long, String, String)].collect() shouldBe
      Array((1L, "a", "one"), (2L, "a", "two'"), (3L, "a", "three"))
  }

  test("snapshot store: replaying a batch whose pointer already landed is skipped") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    graft.streaming.SnapshotUpsert.init(snap((1L, "a", "one")), dir)
    val batch = ch((1L, "a", "v2", 1, false))
    graft.streaming.SnapshotUpsert.applyBatch(dir, "id")(batch, 0L)
    // a second delivery of batch 0 must not stack another version or fail
    graft.streaming.SnapshotUpsert.applyBatch(dir, "id")(batch, 0L)
    graft.streaming.SnapshotUpsert.currentVersion(dir) shouldBe Some("b0")
    graft.streaming.SnapshotUpsert.read(spark, dir)
      .as[(Long, String, String)].collect() shouldBe Array((1L, "a", "v2"))
  }

  test("vacuum drops old versions, keeps the recent window, never touches the pointer's") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    graft.streaming.SnapshotUpsert.init(snap((1L, "a", "one")), dir)
    (0L to 3L).foreach { i =>
      // retain = 0: exercise MANUAL vacuum semantics without the apply
      // path's automatic GC collapsing the version history first
      graft.streaming.SnapshotUpsert.applyBatch(dir, "id", retain = 0)(
        ch((1L, "a", s"v$i", i.toInt, false)), i)
    }
    val deleted = graft.streaming.SnapshotUpsert.vacuum(dir, keep = 2)
    deleted.sorted shouldBe Seq("b-1", "b0", "b1")
    // the survivors: b2, b3 (pointer) — and the store still reads
    java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/b3")) shouldBe true
    java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/b0")) shouldBe false
    graft.streaming.SnapshotUpsert.read(spark, dir)
      .as[(Long, String, String)].collect() shouldBe Array((1L, "a", "v3"))
    // idempotent: nothing left to delete
    graft.streaming.SnapshotUpsert.vacuum(dir, keep = 2) shouldBe Seq.empty
  }

  test("applyBatch auto-vacuums; replayed and fresh batches still succeed after GC") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    graft.streaming.SnapshotUpsert.init(snap((1L, "a", "one")), dir)
    (0L to 3L).foreach { i =>
      graft.streaming.SnapshotUpsert.applyBatch(dir, "id")( // default retain = 2
        ch((1L, "a", s"v$i", i.toInt, false)), i)
    }
    // auto-GC along the way: only the retain window survives
    def versions() = {
      val ls = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try ls.iterator().asScala.map(_.getFileName.toString)
        .filter(_.matches("b-?\\d+")).toSeq.sorted
      finally ls.close()
    }
    versions() shouldBe Seq("b2", "b3")
    // replay of an already-published batch after its version was GC'd:
    // skipped by id, nothing read, nothing fails
    graft.streaming.SnapshotUpsert.applyBatch(dir, "id")(
      ch((1L, "a", "v1", 1, false)), 1L)
    graft.streaming.SnapshotUpsert.currentVersion(dir) shouldBe Some("b3")
    // crash between write and switch: b4 landed as a directory but the
    // pointer stayed on b3. The replayed batch must rebuild b4 from the
    // pointer's version — which retain >= 2 guarantees vacuum never ate
    val merged = graft.streaming.SnapshotUpsert.read(spark, dir)
    merged.write.mode("overwrite").parquet(s"$dir/b4") // partial publish, no switch
    graft.streaming.SnapshotUpsert.applyBatch(dir, "id")(
      ch((1L, "a", "v4", 4, false)), 4L)
    graft.streaming.SnapshotUpsert.currentVersion(dir) shouldBe Some("b4")
    graft.streaming.SnapshotUpsert.read(spark, dir)
      .as[(Long, String, String)].collect() shouldBe Array((1L, "a", "v4"))
    versions() shouldBe Seq("b3", "b4")
  }

  test("applyAggBatch validates the aggregate-vector schema up front") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    // history init'd with RAW rows, not the incrementalAgg vector
    graft.streaming.SnapshotUpsert.init(Seq((1L, 10L)).toDF("k", "cents"), dir)
    val err = intercept[IllegalArgumentException] {
      graft.streaming.SnapshotUpsert.applyAggBatch(dir, "k")(
        Seq((1L, 5L)).toDF("k", "cents"), 0L)
    }
    err.getMessage should include("history snapshot must have")
    val err2 = intercept[IllegalArgumentException] {
      graft.streaming.SnapshotUpsert.applyAggBatch(dir, "k")(
        Seq((1L, 5L)).toDF("k", "wrong"), 0L)
    }
    err2.getMessage should include("batch must have")
  }

  test("snapshot store: a re-delivered OLDER batch never moves the pointer backwards") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    graft.streaming.SnapshotUpsert.init(snap((1L, "a", "one")), dir)
    graft.streaming.SnapshotUpsert.applyBatch(dir, "id")(ch((1L, "a", "v2", 1, false)), 0L)
    graft.streaming.SnapshotUpsert.applyBatch(dir, "id")(ch((1L, "a", "v3", 2, false)), 1L)
    // stale redelivery of batch 0 (e.g. restart against an old checkpoint)
    graft.streaming.SnapshotUpsert.applyBatch(dir, "id")(ch((1L, "a", "v2", 1, false)), 0L)
    graft.streaming.SnapshotUpsert.currentVersion(dir) shouldBe Some("b1")
    graft.streaming.SnapshotUpsert.read(spark, dir)
      .as[(Long, String, String)].collect() shouldBe Array((1L, "a", "v3"))
  }

  // ---- SCD Type-2 (t34) ----

  private def chlog(rows: (Long, String, Int, Boolean)*) =
    rows.toDF("k", "attr", "ts", "del").withColumn("change_ts", $"ts").drop("ts")

  private def scd2Rows(df: org.apache.spark.sql.DataFrame) =
    df.select($"k", $"attr", $"effective_from", $"effective_to", $"is_current")
      .as[(Long, String, Int, Option[Int], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq

  test("scd2Recompute: versions chain by ts, last is current, tombstones close without inserting") {
    val ch = chlog(
      (1L, "a1", 10, false), (1L, "a2", 20, false), (1L, "a3", 30, false),
      (2L, "b1", 10, false), (2L, "b2", 20, true), (2L, "b3", 30, false), // mid-chain delete
      (3L, "c1", 10, false), (3L, "c2", 20, true)) // ends deleted
    scd2Rows(Upsert.scd2Recompute(ch, "k")) shouldBe Seq(
      (1L, "a1", 10, Some(20), false), (1L, "a2", 20, Some(30), false),
      (1L, "a3", 30, None, true),
      (2L, "b1", 10, Some(20), false), // closed BY the tombstone
      (2L, "b3", 30, None, true), // key resumes after the delete
      (3L, "c1", 10, Some(20), false)) // no current version for 3
  }

  test("scd2Apply: equals the full recompute at every history/batch split, out-of-order batches included") {
    val all = Seq(
      (1L, "a1", 10, false), (1L, "a2", 20, false), (1L, "a3", 30, false),
      (2L, "b1", 15, false), (2L, "b2", 25, true), (2L, "b3", 35, false),
      (3L, "c1", 12, false), (3L, "c2", 22, true),
      (4L, "d1", 40, false)) // key born in the batch for early cuts
    val expected = scd2Rows(Upsert.scd2Recompute(chlog(all: _*), "k"))
    val cuts = Seq(5, 12, 18, 23, 28, 33, 38, 45)
    cuts.foreach { cut =>
      val early = all.filter(_._3 < cut)
      // batch arrives ts-DESCENDING: apply must order it itself
      val late = all.filter(_._3 >= cut).sortBy(-_._3)
      val dim0 = Upsert.scd2Recompute(chlog(early: _*), "k")
      val out = Upsert.scd2Apply(dim0, chlog(late: _*), "k")
      withClue(s"cut=$cut: ") { scd2Rows(out) shouldBe expected }
    }
  }

  test("scd2Apply: untouched keys' rows pass through byte-identical, including closed history") {
    val dim0 = Upsert.scd2Recompute(chlog(
      (1L, "a1", 10, false), (1L, "a2", 20, false),
      (9L, "z1", 5, false), (9L, "z2", 6, false)), "k")
    val out = Upsert.scd2Apply(dim0, chlog((1L, "a3", 30, false)), "k")
    // key 9 untouched entirely; key 1's CLOSED version untouched
    scd2Rows(out).filter(_._1 == 9L) shouldBe scd2Rows(dim0).filter(_._1 == 9L)
    scd2Rows(out) should contain ((1L, "a1", 10, Some(20), false))
    scd2Rows(out).filter(r => r._1 == 1L && r._5) shouldBe Seq((1L, "a3", 30, None, true))
  }

  test("scd2Apply: a change at the current row's exact ts supersedes it") {
    val dim0 = Upsert.scd2Recompute(chlog((1L, "a1", 10, false)), "k")
    val out = scd2Rows(Upsert.scd2Apply(dim0, chlog((1L, "a2", 10, false)), "k"))
    // the old current closes with a zero-length interval; the change is current
    out shouldBe Seq((1L, "a1", 10, Some(10), false), (1L, "a2", 10, None, true))
  }

  test("incrementalAgg: any history/batch split merges to the full recompute (monoid law)") {
    val rows = Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L), (1L, 30L), (2L, 40L))
    def full(data: Seq[(Long, Long)]) = data.toDF("k", "cents")
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"),
        max($"cents").as("max_cents"))
    val expected = full(rows).orderBy($"k").collect().toSeq
    // every prefix split, including empty history and empty batch
    (0 to rows.length).foreach { cut =>
      val hist = full(rows.take(cut))
      val batch = rows.drop(cut).toDF("k", "cents")
      val merged = Upsert.incrementalAgg(hist, batch, "k")
        .orderBy($"k").collect().toSeq
      withClue(s"split at $cut: ") { merged shouldBe expected }
    }
  }

  test("incrementalAgg: batch-only keys insert; history-only keys pass through untouched") {
    val hist = Seq((1L, 2L, 50L, 30L)).toDF("k", "n", "sum_cents", "max_cents")
    val batch = Seq((9L, 100L)).toDF("k", "cents")
    val out = Upsert.incrementalAgg(hist, batch, "k").orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.toSeq shouldBe Seq((1L, 2L, 50L, 30L), (9L, 1L, 100L, 100L))
  }

  test("readVersion time travel: retained versions read back as-of; GC'd ids fail with the range") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tt").toString
    graft.streaming.SnapshotUpsert.init(snap((1L, "a", "v1")), dir)
    (0L to 2L).foreach { b =>
      graft.streaming.SnapshotUpsert.applyBatch(dir, "id")( // retain = 2
        ch((1L, "a", s"v${b + 2}", 1, false)), b)
    }
    // pointer on b2; retain=2 keeps b1 and b2
    graft.streaming.SnapshotUpsert.readVersion(spark, dir, 2L)
      .as[(Long, String, String)].collect() shouldBe Array((1L, "a", "v4"))
    graft.streaming.SnapshotUpsert.readVersion(spark, dir, 1L)
      .as[(Long, String, String)].collect() shouldBe Array((1L, "a", "v3"))
    val e = intercept[IllegalArgumentException] {
      graft.streaming.SnapshotUpsert.readVersion(spark, dir, 0L)
    }
    e.getMessage should include("b0 not present")
    e.getMessage should include("b1, b2")
  }

  test("scd2 store: sequential batches equal full recompute; replay and stale ids skip; GC-safe") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2").toString
    val all = Seq(
      (1L, "a1", 10, false), (1L, "a2", 20, false), (1L, "a3", 30, false),
      (2L, "b1", 10, false), (2L, "b2", 25, false))
    graft.streaming.SnapshotUpsert.init(
      Upsert.scd2Recompute(chlog(all.filter(_._3 <= 10): _*), "k"), dir)
    graft.streaming.SnapshotUpsert.applyScd2Batch(dir, "k")(
      chlog(all.filter(c => c._3 > 10 && c._3 <= 20): _*), 0L)
    graft.streaming.SnapshotUpsert.applyScd2Batch(dir, "k")(
      chlog(all.filter(_._3 > 20): _*), 1L)
    val expected = scd2Rows(Upsert.scd2Recompute(chlog(all: _*), "k"))
    scd2Rows(graft.streaming.SnapshotUpsert.read(spark, dir)) shouldBe expected
    // replay of the published batch id and of an older id: both no-ops,
    // even after auto-vacuum has GC'd versions below the retain window
    graft.streaming.SnapshotUpsert.applyScd2Batch(dir, "k")(
      chlog(all.filter(_._3 > 20): _*), 1L)
    graft.streaming.SnapshotUpsert.applyScd2Batch(dir, "k")(
      chlog((9L, "x", 5, false)), 0L)
    graft.streaming.SnapshotUpsert.currentVersion(dir) shouldBe Some("b1")
    scd2Rows(graft.streaming.SnapshotUpsert.read(spark, dir)) shouldBe expected
  }

  test("cdcApply: the existence automaton, transition by transition") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    def apply(ops: (Long, String, String, Long)*) = {
      val log = ops.map { case (id, op, v, seq) => (id, v, op, seq) }
        .toDF("id", "v", "op", "seq")
      Upsert.cdcApply(base, log, "id").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    // plain U on a base key applies; U after D is ignored; I after D
    // resurrects; a later U then applies to the resurrected row
    apply((1L, "U", "a2", 1L)) shouldBe Map(1L -> "a2", 2L -> "b", 3L -> "c")
    apply((1L, "D", "-", 1L), (1L, "U", "ghost", 2L)) shouldBe
      Map(2L -> "b", 3L -> "c")
    apply((1L, "D", "-", 1L), (1L, "I", "re", 2L), (1L, "U", "re2", 3L)) shouldBe
      Map(1L -> "re2", 2L -> "b", 3L -> "c")
    // U of a key the base never had is a no-op, not an insert; I is
    apply((9L, "U", "orphan", 1L)) shouldBe Map(1L -> "a", 2L -> "b", 3L -> "c")
    apply((9L, "I", "new", 1L)) shouldBe
      Map(1L -> "a", 2L -> "b", 3L -> "c", 9L -> "new")
    // I-then-D of a fresh key leaves nothing; D of an unknown key is inert
    apply((9L, "I", "new", 1L), (9L, "D", "-", 2L)) shouldBe
      Map(1L -> "a", 2L -> "b", 3L -> "c")
    apply((9L, "D", "-", 1L)) shouldBe Map(1L -> "a", 2L -> "b", 3L -> "c")
    // unknown ops refuse loudly
    an[Exception] should be thrownBy apply((1L, "X", "z", 1L))
  }

  test("incrementalAggRetract: subtraction identity, dirty-max rescan, zero-row drop") {
    // user 1: values 5,9,9,2 — retract one 9 (max with a surviving twin)
    // user 2: values 7,3    — retract the 7 (max falls to 3)
    // user 3: values 4      — fully retracted, leaves the MV
    // user 4: values 8,1    — untouched
    val base = Seq((1L, 5L), (1L, 9L), (1L, 9L), (1L, 2L),
      (2L, 7L), (2L, 3L), (3L, 4L), (4L, 8L), (4L, 1L))
      .toDF("user_id", "cents")
    val retract = Seq((1L, 9L), (2L, 7L), (3L, 4L)).toDF("user_id", "cents")
    val after = base.exceptAll(retract)
    val mv = base.groupBy($"user_id").agg(
      count(lit(1)).as("n"), sum($"cents").as("sum_cents"),
      max($"cents").as("max_cents"))
    val out = Upsert.incrementalAggRetract(mv, retract, after, "user_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out(1L) shouldBe ((3L, 16L, 9L)) // twin 9 survives the rescan
    out(2L) shouldBe ((1L, 3L, 3L))  // max genuinely falls
    out(4L) shouldBe ((2L, 9L, 8L))  // untouched key, no rescan needed
    out.contains(3L) shouldBe false  // retracted to zero rows
    // equals the from-scratch aggregate (the MV law)
    val fresh = after.groupBy($"user_id").agg(
      count(lit(1)).as("n"), sum($"cents").as("sum_cents"),
      max($"cents").as("max_cents"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out shouldBe fresh
  }

  test("applyCdcBatch: seq-split batches equal the one-shot apply; replays are no-ops") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val log = Seq(
      (1L, "a2", "U", 1L), (2L, "-", "D", 2L),
      (2L, "ghost", "U", 3L), (2L, "re", "I", 4L), (9L, "new", "I", 5L))
      .toDF("id", "v", "op", "seq")
    val oneShot = Upsert.cdcApply(base, log, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    graft.streaming.SnapshotUpsert.init(base, dir)
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit =
      graft.streaming.SnapshotUpsert.applyCdcBatch(dir, "id")
    sink(log.where($"seq" <= 2), 0L)
    sink(log.where($"seq" > 2), 1L)
    def state() = graft.streaming.SnapshotUpsert.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    state() shouldBe oneShot
    oneShot shouldBe Map(1L -> "a2", 2L -> "re", 3L -> "c", 9L -> "new")
    // replayed and stale batch ids never move the pointer
    sink(log.where($"seq" > 2), 1L)
    sink(log.where($"seq" <= 2), 0L)
    state() shouldBe oneShot
  }
}
