package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** As-of join semantics against a hand-computable fixture and a
  * brute-force reference formulation.
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits.{localSeqToDatasetHolder, newProductEncoder, newStringEncoder, newLongEncoder}

  test("backward as-of picks the greatest right ts <= left ts per key") {
    val left = Seq((1L, 10L, "L10"), (1L, 20L, "L20"), (2L, 5L, "L5"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 9L, "R9"), (1L, 15L, "R15"), (1L, 21L, "R21"), (2L, 99L, "R99"))
      .toDF("k", "t", "rv")
    val got = Temporal.asofJoinBackward(left, right, "k", "t", "t")
      .select(col("k"), col("t"), col("lv"), col("asof_rv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(x => (x._1, x._2))
    // (2, 5) has no prior right row → dropped (inner semantics)
    got.toSeq shouldBe Seq((1L, 10L, "L10", "R9"), (1L, 20L, "L20", "R15"))
  }

  test("equal timestamps match inclusively (right row at exactly left ts)") {
    val left = Seq((1L, 10L, "L")).toDF("k", "t", "lv")
    val right = Seq((1L, 10L, "Rsame"), (1L, 3L, "Rold")).toDF("k", "t", "rv")
    Temporal.asofJoinBackward(left, right, "k", "t", "t")
      .select(col("asof_rv")).as[String].head() shouldBe "Rsame"
  }

  test("tolerance-bounded as-of drops matches staler than the bound, keeps the rest") {
    val left = Seq((1L, 100L, "L100"), (1L, 200L, "L200")).toDF("k", "t", "lv")
    val right = Seq((1L, 95L, "R95"), (1L, 130L, "R130")).toDF("k", "t", "rv")
    // L100←R95 (5s old, within 30), L200←R130 (70s old, dropped)
    val got = Temporal.asofJoinBackwardTolerance(left, right, "k", "t", "t", 30L)
      .select(col("t"), col("asof_rv")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    got.toSeq shouldBe Seq((100L, "R95"))
  }

  test("tolerance form equals the unbounded form filtered by staleness (events fixture)") {
    val e = table("events")
    val clicks = e.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val tol = 3600L
    val bounded = Temporal.asofJoinBackwardTolerance(
      clicks, purchases, "user_id", "ts", "ts", tol, Some("event_id"))
    val filtered = Temporal.asofJoinBackward(
        clicks, purchases, "user_id", "ts", "ts", Some("event_id"))
      .where(unix_micros(col("ts").cast("timestamp")) -
             unix_micros(col("asof_ts").cast("timestamp")) <= tol * 1000000L)
    bounded.count() should be > 0L
    bounded.count() should be < Temporal.asofJoinBackward(
      clicks, purchases, "user_id", "ts", "ts", Some("event_id")).count()
    bounded.except(filtered).count() shouldBe 0
    filtered.except(bounded).count() shouldBe 0
  }

  test("agrees with the brute-force window-max formulation on the events fixture") {
    val e = table("events")
    val clicks = e.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val got = Temporal.asofJoinBackward(
        clicks, purchases.withColumnRenamed("p_id", "event_id")
          .withColumnRenamed("p_ts", "ts"),
        "user_id", "ts", "ts", Some("event_id"))
      .select(col("event_id"), col("asof_event_id"))
    // brute force: join all pairs p_ts <= ts, keep max p_ts per click
    val brute = clicks.join(purchases, Seq("user_id"))
      .where(col("p_ts") <= col("ts"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_id")).orderBy(col("p_ts").desc, col("p_id").desc)))
      .where(col("rk") === 1)
      .select(col("event_id"), col("p_id").as("asof_event_id"))
    got.count() shouldBe brute.count()
    got.except(brute).count() shouldBe 0
    brute.except(got).count() shouldBe 0
  }

  test("range join: inclusive at exact tolerance, exclusive beyond, no duplicate pairs") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val left = Seq((1L, ts(1000))).toDF("lid", "lts")
    val right = Seq(
      (10L, ts(700)),   // exactly -300 s → inclusive
      (11L, ts(1300)),  // exactly +300 s → inclusive
      (12L, ts(699)),   // just beyond
      (13L, ts(1301)),  // just beyond
      (14L, ts(1000)))  // same instant
      .toDF("rid", "rts")
    val got = Temporal.rangeJoinWithin(left, right, "lts", "rts", 300)
      .select(col("rid")).as[Long].collect().sorted
    got.toSeq shouldBe Seq(10L, 11L, 14L)
  }

  test("range join equals the brute-force theta join on the events fixture") {
    val e = table("events")
    val a = e.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts"))
    val b = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val got = Temporal.rangeJoinWithin(a, b, "ts", "p_ts", 300)
      .select(col("click_id"), col("purchase_id"))
    val brute = a.crossJoin(b)
      .where(abs(unix_micros(col("ts").cast("timestamp")) -
                 unix_micros(col("p_ts").cast("timestamp"))) <= 300000000L)
      .select(col("click_id"), col("purchase_id"))
    got.count() shouldBe brute.count()
    got.except(brute).count() shouldBe 0
    brute.except(got).count() shouldBe 0
  }

  test("mergeIntervals: overlap chains coalesce, touching intervals merge, gaps split") {
    import spark.implicits._
    val rows = Seq(
      // k1: [0,10) ∪ [5,20) ∪ [20,30) — touching (s == prev max end) merges
      ("k1", 1L, 0L, 10L), ("k1", 2L, 5L, 20L), ("k1", 3L, 20L, 30L),
      // k1: gap at 31 opens a second island
      ("k1", 4L, 31L, 40L),
      // k2: an interval CONTAINED in an earlier one must not split the
      // island even though its own end regresses the running max
      ("k2", 5L, 0L, 100L), ("k2", 6L, 10L, 20L), ("k2", 7L, 50L, 120L))
      .toDF("k", "id", "s", "e")
    val out = Temporal.mergeIntervals(rows, "k", "id", $"s", $"e")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    out(("k1", 1L)) shouldBe ((0L, 30L, 3L))
    out(("k1", 2L)) shouldBe ((31L, 40L, 1L))
    out(("k2", 1L)) shouldBe ((0L, 120L, 3L))
    out.size shouldBe 3
  }

  test("intervalOverlapJoin: equals brute force at every bin width, one row per pair") {
    // spans crossing bin boundaries, touching endpoints, containment,
    // and a span longer than several bins
    val a = Seq((1L, 0L, 10L), (2L, 63L, 65L), (3L, 100L, 300L), (4L, 50L, 50L))
      .toDF("a_id", "a_start", "a_end")
    val bs = Seq((10L, 5L, 7L), (20L, 10L, 63L), (30L, 64L, 64L),
      (40L, 290L, 310L), (50L, 301L, 302L))
    val b = bs.toDF("b_id", "b_start", "b_end")
    val brute = (for {
      (ai, as_, ae) <- Seq((1L, 0L, 10L), (2L, 63L, 65L), (3L, 100L, 300L), (4L, 50L, 50L))
      (bi, bs_, be) <- bs
      if as_ <= be && bs_ <= ae
    } yield ((ai, bi), math.min(ae, be) - math.max(as_, bs_) + 1)).toMap
    for (bin <- Seq(1L, 7L, 64L, 1000L)) {
      val got = Temporal.intervalOverlapJoin(a, b, bin)
        .select(col("a_id"), col("b_id"), col("overlap"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      got.length shouldBe got.toMap.size // exactly one row per pair
      got.toMap shouldBe brute
    }
    an[IllegalArgumentException] should be thrownBy
      Temporal.intervalOverlapJoin(a, b, 0L)
  }
}
