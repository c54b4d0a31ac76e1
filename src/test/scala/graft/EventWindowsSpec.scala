package graft

import org.apache.spark.sql.functions._
import graft.operators.EventWindows

class EventWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: (Long, String, Long, String, Double)*) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", $"ts".cast("timestamp_ntz"))

  test("tumbling hour windows partition events by floor(ts, hour)") {
    val d = events(
      (1L, "2024-01-01 10:05:00", 1L, "click", 1.0),
      (2L, "2024-01-01 10:55:00", 1L, "click", 2.0),
      (3L, "2024-01-01 11:01:00", 1L, "click", 4.0))
    val out = EventWindows.tumbling(d, "hour").collect()
    out.map(r => (r.get(0).toString.replace('T', ' ').take(13), r.getAs[Long]("n"), r.getAs[Double]("sum_value"))) shouldBe
      Array(("2024-01-01 10", 2L, 3.0), ("2024-01-01 11", 1L, 4.0))
  }

  test("sliding 1h/30m windows double-count each event") {
    val d = events((1L, "2024-01-01 10:05:00", 1L, "click", 1.0))
    val out = EventWindows.sliding1h30m(d).collect()
    // event at 10:05 lands in windows starting 10:00 and 09:30
    out.map(_.get(0).toString.replace('T', ' ').take(16)).toSet shouldBe
      Set("2024-01-01 10:00", "2024-01-01 09:30")
    all(out.map(_.getAs[Long]("n"))) shouldBe 1L
  }

  test("sessionize splits on gaps > threshold (gaps-and-islands)") {
    val d = events(
      (1L, "2024-01-01 10:00:00", 1L, "e", 1.0),
      (2L, "2024-01-01 10:10:00", 1L, "e", 1.0),  // same session (10 min gap)
      (3L, "2024-01-01 11:00:00", 1L, "e", 1.0),  // new session (50 min gap)
      (4L, "2024-01-01 10:00:00", 2L, "e", 1.0))  // other user
    val out = EventWindows.sessionize(d, 30).collect()
    out.length shouldBe 3
    val u1 = out.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    u1.map(_.getAs[Long]("n_events")).toSeq shouldBe Seq(2L, 1L)
    u1(0).getAs[Double]("duration_sec") shouldBe 600.0
    u1(1).getAs[Double]("duration_sec") shouldBe 0.0
  }

  test("funnel: steps must be reached strictly in order; depth cascades") {
    val d = events(
      // user 1 converts fully in order
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "click", 0.0),
      (3L, "2024-01-01 10:02:00", 1L, "purchase", 0.0),
      // user 2's only click precedes the first view → stuck at depth 1,
      // and the later purchase cannot rescue the broken chain
      (4L, "2024-01-01 09:00:00", 2L, "click", 0.0),
      (5L, "2024-01-01 09:30:00", 2L, "view", 0.0),
      (6L, "2024-01-01 09:45:00", 2L, "purchase", 0.0),
      // user 3 never views → depth 0, all steps null
      (7L, "2024-01-01 08:00:00", 3L, "purchase", 0.0),
      // user 4: purchase between view and click doesn't count; the one
      // after the click does
      (8L, "2024-01-01 07:00:00", 4L, "view", 0.0),
      (9L, "2024-01-01 07:10:00", 4L, "purchase", 0.0),
      (10L, "2024-01-01 07:20:00", 4L, "click", 0.0),
      (11L, "2024-01-01 07:30:00", 4L, "purchase", 0.0))
    val out = EventWindows.funnel(d, Seq("view", "click", "purchase")).collect()
    def ldt(h: Int, m: Int) = java.time.LocalDateTime.of(2024, 1, 1, h, m)
    val byUser = out.map(r => r.getLong(0) ->
      ((1 to 3).map(i => Option(r.get(i))), r.getAs[Long]("depth"))).toMap
    byUser(1L)._2 shouldBe 3L
    byUser(2L) shouldBe ((Seq(Some(ldt(9, 30)), None, None), 1L))
    byUser(3L) shouldBe ((Seq(None, None, None), 0L))
    byUser(4L)._1(2) shouldBe Some(ldt(7, 30))
    byUser(4L)._2 shouldBe 3L
  }

  test("funnel: a step at exactly the previous step's timestamp does not count") {
    val d = events(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:00:00", 1L, "click", 0.0)) // same instant: not after
    val out = EventWindows.funnel(d, Seq("view", "click")).collect()
    out.length shouldBe 1
    out(0).isNullAt(2) shouldBe true
    out(0).getAs[Long]("depth") shouldBe 1L
  }

  test("funnel result is input-order and partitioning independent") {
    val fixture = table("events")
    val a = EventWindows.funnel(fixture, Seq("view", "click", "purchase"))
      .collect().map(_.toSeq).toSeq
    val b = EventWindows.funnel(fixture.repartition(7).orderBy(rand(42)),
      Seq("view", "click", "purchase")).collect().map(_.toSeq).toSeq
    a shouldBe b
  }

  test("transitions: successor counts per user order, top-k with (n DESC, next) ties") {
    val d = events(
      // user 1: a→b, b→a, a→b  (so a→b twice, b→a once)
      (1L, "2024-01-01 10:00:00", 1L, "a", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "b", 0.0),
      (3L, "2024-01-01 10:02:00", 1L, "a", 0.0),
      (4L, "2024-01-01 10:03:00", 1L, "b", 0.0),
      // user 2: a→c; the trailing c has no successor and is dropped
      (5L, "2024-01-01 09:00:00", 2L, "a", 0.0),
      (6L, "2024-01-01 09:05:00", 2L, "c", 0.0))
    val out = EventWindows.transitions(d, 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n"), r.getAs[Long]("rank")))
    out shouldBe Array(
      ("a", "b", 2L, 1L), ("a", "c", 1L, 2L), ("b", "a", 1L, 1L))
  }

  test("transitions: same-instant events break ties on event_id; k cuts per source") {
    val d = events(
      (2L, "2024-01-01 10:00:00", 1L, "y", 0.0), // same ts: event_id orders y after x
      (1L, "2024-01-01 10:00:00", 1L, "x", 0.0),
      (3L, "2024-01-01 10:01:00", 1L, "z", 0.0),
      (4L, "2024-01-01 11:00:00", 2L, "x", 0.0),
      (5L, "2024-01-01 11:01:00", 2L, "w", 0.0))
    val out = EventWindows.transitions(d, 1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("rank")))
    // x's successors are y (id 1→2) and w (id 4→5): k=1 keeps only the
    // lexically-first of the tied pair
    out.filter(_._1 == "x") shouldBe Array(("x", "w", 1L))
    out.filter(_._1 == "y") shouldBe Array(("y", "z", 1L))
  }

  test("transitions is partitioning independent") {
    val fixture = table("events")
    val a = EventWindows.transitions(fixture, 3).collect().map(_.toSeq).toSeq
    val b = EventWindows.transitions(fixture.repartition(7).orderBy(rand(42)), 3)
      .collect().map(_.toSeq).toSeq
    a shouldBe b
  }

  test("rollingRange: trailing 2h frame includes peers and exact-boundary rows") {
    val d = events(
      (1L, "2024-01-01 10:00:00", 1L, "e", 1.50),
      (2L, "2024-01-01 11:59:59", 1L, "e", 2.25),
      (3L, "2024-01-01 12:00:00", 1L, "e", 0.10), // exactly 2h after id 1: in frame
      (4L, "2024-01-01 12:00:00", 1L, "e", 0.40), // peer of id 3: same frame
      (5L, "2024-01-01 14:00:01", 1L, "e", 9.99), // frame starts 12:00:01 → ids 3,4 (12:00:00) just out
      (6L, "2024-01-01 10:30:00", 2L, "e", 5.00))
    val out = EventWindows.rollingRange(d, 2).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("trailing_n"), r.getAs[Long]("trailing_cents")))).toMap
    out(1L) shouldBe ((1L, 150L))
    out(2L) shouldBe ((2L, 375L))
    // RANGE frames include ALL peer rows (equal ts): ids 3 and 4 see each
    // other regardless of evaluation order
    out(3L) shouldBe ((4L, 425L))
    out(4L) shouldBe ((4L, 425L))
    out(5L) shouldBe ((1L, 999L))
    out(6L) shouldBe ((1L, 500L))
  }

  test("rollingRange is partitioning independent") {
    val fixture = table("events")
    val a = EventWindows.rollingRange(fixture, 2).collect().map(_.toSeq).toSeq
    val b = EventWindows.rollingRange(fixture.repartition(7).orderBy(rand(42)), 2)
      .collect().map(_.toSeq).toSeq
    a shouldBe b
  }

  test("rollingDistinctUsers: trailing 7-day distinct, multi-day users counted once") {
    val d = events(
      (1L, "2024-01-01 10:00:00", 1L, "e", 0.0),
      (2L, "2024-01-03 10:00:00", 1L, "e", 0.0), // same user, 2 active days
      (3L, "2024-01-03 11:00:00", 2L, "e", 0.0),
      (4L, "2024-01-20 10:00:00", 3L, "e", 0.0)) // outside any 7-day reach
    val out = EventWindows.rollingDistinctUsers(d, 7).collect()
      .map(r => (r.getDate(0).toString, r.getAs[Long]("n_active"))).toMap
    out("2024-01-01") shouldBe 1L
    // Jan 3 window [Dec 28, Jan 3]: user1 (twice, counted once) + user2
    out("2024-01-03") shouldBe 2L
    out("2024-01-20") shouldBe 1L
    // report days exist only where there is activity
    out.keySet shouldBe Set("2024-01-01", "2024-01-03", "2024-01-20")
  }

  test("forwardFill: gaps carry the last reading; leading nulls stay null") {
    val d = events(
      (7L, "2024-01-01 10:00:00", 1L, "e", 1.23),  // 7 % 7 == 0 -> null, nothing before
      (8L, "2024-01-01 10:01:00", 1L, "e", 2.50),
      (14L, "2024-01-01 10:02:00", 1L, "e", 9.99), // nulled, carries 2.50
      (15L, "2024-01-01 10:03:00", 1L, "e", 4.00),
      (21L, "2024-01-01 09:00:00", 2L, "e", 5.55)) // other user, nulled, leading
    val out = EventWindows.forwardFill(d).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(4)) None else Some(r.getAs[Double]("filled")))).toMap
    out(7L) shouldBe None
    out(8L) shouldBe Some(2.50)
    out(14L) shouldBe Some(2.50)
    out(15L) shouldBe Some(4.00)
    out(21L) shouldBe None
  }

  test("retentionMatrix: day-offset counts against each user's first-seen day") {
    val d = events(
      (1L, "2024-01-01 10:00:00", 1L, "e", 0.0),  // cohort Jan 1
      (2L, "2024-01-01 23:00:00", 1L, "e", 0.0),  // same day → one offset-0 row
      (3L, "2024-01-03 01:00:00", 1L, "e", 0.0),  // offset 2
      (4L, "2024-01-02 09:00:00", 2L, "e", 0.0),  // cohort Jan 2
      (5L, "2024-01-03 09:00:00", 2L, "e", 0.0))  // offset 1
    val out = EventWindows.retentionMatrix(d).collect()
      .map(r => (r.get(0).toString.take(10), r.getLong(1), r.getLong(2)))
    out shouldBe Array(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-02", 0L, 1L), ("2024-01-02", 1L, 1L))
  }

  test("retentionMatrix: every cohort has an offset-0 row covering its full cohort size") {
    val fixture = table("events")
    val out = EventWindows.retentionMatrix(fixture).collect()
    val cohortSizes = out.filter(_.getLong(1) == 0L)
      .map(r => r.get(0).toString -> r.getLong(2)).toMap
    cohortSizes.values.sum shouldBe
      fixture.select($"user_id").distinct().count()
    // no offset exceeds the fixture's day span; none negative
    all(out.map(_.getLong(1))) should (be >= 0L and be <= 60L)
  }

  test("activityStreaks: runs split on gaps; duplicate same-day events collapse") {
    val d = events(
      (1L, "2024-01-01 10:00:00", 1L, "e", 0.0),
      (2L, "2024-01-01 22:00:00", 1L, "e", 0.0),  // same day, no new streak day
      (3L, "2024-01-02 09:00:00", 1L, "e", 0.0),
      (4L, "2024-01-03 09:00:00", 1L, "e", 0.0),  // 3-day run
      (5L, "2024-01-05 09:00:00", 1L, "e", 0.0),  // gap -> second run (len 1)
      (6L, "2024-02-01 09:00:00", 2L, "e", 0.0))  // other user, singleton
    val out = EventWindows.activityStreaks(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    out(1L) shouldBe ((2L, 3L, 4L))  // 2 streaks, longest 3, 4 active days
    out(2L) shouldBe ((1L, 1L, 1L))
  }

  test("activityStreaks: active_days sums the streak lengths and matches the distinct day count") {
    val fixture = table("events")
    val out = EventWindows.activityStreaks(fixture)
    val total = out.agg(sum($"active_days")).as[Long].head()
    total shouldBe fixture
      .select($"user_id", date_trunc("day", $"ts")).distinct().count()
    // a longest streak can never exceed the user's active-day count
    out.where($"longest_streak" > $"active_days").count() shouldBe 0L
  }

  test("timeWeightedAverage: hand series with exact integer numerator; singleton span is 0") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "view", 100.0),
      (2L, ts("2024-01-01 00:00:10"), 7L, "view", 200.0),
      (3L, ts("2024-01-01 00:00:30"), 7L, "view", 50.0),
      (4L, ts("2024-01-01 00:00:00"), 9L, "view", 42.0)) // single event
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventWindows.timeWeightedAverage(ev).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // user 7: 100.00 held 10s + 200.00 held 20s, last reading weightless:
    // num = 10000c*1e7us + 20000c*2e7us = 5e11; span 3e7; twap 166.66...
    out(7L)._1 shouldBe 3L
    out(7L)._2 shouldBe 30000000L
    out(7L)._3 shouldBe 500000000000L
    out(7L)._4 shouldBe (500000000000L.toDouble / 30000000L / 100.0)
    // a single reading holds zero time: defined as 0, not NaN
    out(9L) shouldBe ((1L, 0L, 0L, 0.0))
  }

  test("cumulativeReach: returning users never recount; zero-new days carry the curve") {
    val d = events(
      (1L, "2024-01-01 10:00:00", 1L, "a", 0.0),
      (2L, "2024-01-01 11:00:00", 2L, "a", 0.0),
      (3L, "2024-01-02 10:00:00", 1L, "a", 0.0),  // returning only -> 0 new
      (4L, "2024-01-03 10:00:00", 3L, "a", 0.0))
    val out = EventWindows.cumulativeReach(d)
      .collect().map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    out("2024-01-01") shouldBe ((2L, 2L))
    out("2024-01-02") shouldBe ((0L, 2L))
    out("2024-01-03") shouldBe ((1L, 3L))
  }

  test("linearInterpolate: midpoint, uneven spacing, edge fallbacks, all-null user") {
    import org.apache.spark.sql.functions.{col, when, lit}
    val d = events(
      (1L, "2024-01-01 00:00:00", 1L, "r", 100.0),
      (2L, "2024-01-01 00:00:10", 1L, "gap", 0.0),
      (3L, "2024-01-01 00:00:20", 1L, "r", 200.0),
      (4L, "2024-01-01 00:00:25", 1L, "gap", 0.0),  // uneven: 5s of a 10s span... no: next at 30
      (5L, "2024-01-01 00:00:30", 1L, "r", 300.0),
      (6L, "2024-01-01 00:00:40", 1L, "gap", 0.0),  // trailing -> carry 300
      (7L, "2024-01-01 00:00:00", 2L, "gap", 0.0),  // leading -> backfill 500
      (8L, "2024-01-01 00:00:10", 2L, "r", 500.0),
      (9L, "2024-01-01 00:00:00", 3L, "gap", 0.0))  // no neighbors -> null
    val reading = when(col("event_type") === "gap", lit(null).cast("long"))
      .otherwise(col("value").cast("long"))
    val out = EventWindows.linearInterpolate(d, reading)
      .collect().map(r => r.getLong(0) -> Option(r.get(4)).map(_.asInstanceOf[Double])).toMap
    out(1L) shouldBe Some(100.0)
    out(2L) shouldBe Some(150.0)   // midpoint of 100..200
    out(4L) shouldBe Some(250.0)   // 200 + 100 * 5/10
    out(6L) shouldBe Some(300.0)   // trailing carry
    out(7L) shouldBe Some(500.0)   // leading backfill
    out(9L) shouldBe None          // no neighbor at all
  }

  test("sessionPaths: trigrams never cross a session boundary") {
    val d = events(
      (1L, "2024-01-01 10:00:00", 1L, "a", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "b", 0.0),
      (3L, "2024-01-01 10:02:00", 1L, "c", 0.0),
      // 43-minute gap: new session
      (4L, "2024-01-01 10:45:00", 1L, "d", 0.0),
      (5L, "2024-01-01 10:46:00", 1L, "e", 0.0),
      (6L, "2024-01-01 10:47:00", 1L, "f", 0.0),
      // another user, too short for any trigram
      (7L, "2024-01-01 10:00:00", 2L, "a", 0.0),
      (8L, "2024-01-01 10:01:00", 2L, "b", 0.0))
    val out = EventWindows.sessionPaths(d, 30)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    out shouldBe Map(("a", "b", "c") -> 1L, ("d", "e", "f") -> 1L)
  }

  test("patternMatches: greedy non-overlapping count, first match, order by ts") {
    // user 1 stream in time order: v v p c v c p  -> matches 'vvp','vcp'
    // (the ts values are deliberately out of insertion order)
    val d = events(
      (3L, "2024-01-01 10:02:00", 1L, "purchase", 0.0),
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "view", 0.0),
      (4L, "2024-01-01 10:03:00", 1L, "click", 0.0),
      (5L, "2024-01-01 10:04:00", 1L, "view", 0.0),
      (6L, "2024-01-01 10:05:00", 1L, "click", 0.0),
      (7L, "2024-01-01 10:06:00", 1L, "purchase", 0.0),
      // user 2: no purchase -> zero matches, empty first_match
      (8L, "2024-01-01 10:00:00", 2L, "view", 0.0))
    val out = EventWindows.patternMatches(d, "v+c*p").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    out(1L) shouldBe ((7L, 2L, "vvp"))
    out(2L) shouldBe ((1L, 0L, ""))
    // ts tie broken by event_id: two same-ts events stay deterministic
    val tie = events(
      (2L, "2024-01-01 10:00:00", 3L, "purchase", 0.0),
      (1L, "2024-01-01 10:00:00", 3L, "view", 0.0))
    EventWindows.patternMatches(tie, "vp").collect()
      .map(r => (r.getLong(2), r.getString(3))).toSeq shouldBe Seq((1L, "vp"))
    // non-portable regex syntax refuses loudly
    an[IllegalArgumentException] should be thrownBy
      EventWindows.patternMatches(d, "(?=v)p")
    an[IllegalArgumentException] should be thrownBy
      EventWindows.patternMatches(d, "(v)\\1")
  }

  test("attribution: first/last touch in the lookback, organic nulls, window edges") {
    val d = events(
      (1L, "2024-01-01 10:00:00", 1L, "click", 0.0),
      (2L, "2024-01-01 10:10:00", 1L, "view", 0.0),
      (3L, "2024-01-01 10:20:00", 1L, "purchase", 9.5),
      // same-µs touch must NOT attribute (frame ends at −1 µs)
      (4L, "2024-01-01 12:00:00", 2L, "view", 0.0),
      (5L, "2024-01-01 12:00:00", 2L, "purchase", 1.0),
      // touch older than the lookback is out of window
      (6L, "2024-01-01 08:00:00", 3L, "click", 0.0),
      (7L, "2024-01-01 10:00:00", 3L, "purchase", 2.0),
      // errors/signups are not touches
      (8L, "2024-01-01 09:59:00", 4L, "error", 0.0),
      (9L, "2024-01-01 10:00:00", 4L, "purchase", 3.0))
    val out = EventWindows.attribution(d, lookbackSec = 3600)
      .collect().map(r => r.getLong(1) -> ((
        r.getLong(4),
        Option(r.getString(5)), Option(r.getString(7))))).toMap
    out(3L) shouldBe ((2L, Some("click"), Some("view")))
    out(5L) shouldBe ((0L, None, None))
    out(7L) shouldBe ((0L, None, None))
    out(9L) shouldBe ((0L, None, None))
    // widen the lookback: user 3's old click re-enters the window
    val wide = EventWindows.attribution(d, lookbackSec = 7200 + 1)
      .collect().map(r => r.getLong(1) -> Option(r.getString(5))).toMap
    wide(7L) shouldBe Some("click")
    // tie at the same µs breaks on event_id via the padded string order
    val tie = events(
      (11L, "2024-01-01 10:00:00", 9L, "view", 0.0),
      (10L, "2024-01-01 10:00:00", 9L, "click", 0.0),
      (12L, "2024-01-01 10:30:00", 9L, "purchase", 0.0))
    val tr = EventWindows.attribution(tie, lookbackSec = 3600).collect().head
    (tr.getString(5), tr.getString(7)) shouldBe (("click", "view"))
  }
}
