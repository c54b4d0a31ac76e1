package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.implicits._

/** Time-window operators over the events stream fixture — the batch
  * equivalents of the Structured Streaming surface (SURVEY.md §2.8, M4):
  * tumbling / sliding / session windows. The same expressions run under
  * `readStream` + `withWatermark` in [[graft.streaming]]; batch form here is
  * what the DuckDB oracle can check.
  */
object EventWindows {

  /** Tumbling window aggregate (streaming T1 analog — the reference's
    * monthly cursor processes exactly one calendar window per cycle,
    * src/sources/era5monthly.js:37-41).
    */
  def tumbling(events: DataFrame, unit: String): DataFrame =
    events
      .groupBy(date_trunc(unit, $"ts").cast("timestamp_ntz").as("window_start"), $"event_type")
      .agg(count(lit(1)).as("n"),
           round(sum($"value"), 2).as("sum_value"),
           // mean = agreed-rounded sum / count, emitted UNROUNDED: the
           // operands are bit-identical on both engines, so IEEE division
           // matches exactly — while any further decimal rounding can land
           // on a tie the engines' round() implementations break differently
           (round(sum($"value"), 2) / count(lit(1))).as("avg_value"))
      .orderBy($"window_start", $"event_type")

  /** Sliding window (1 h window, 30 min slide): each event lands in two
    * windows — expressed as a union of two phase-shifted tumbling windows,
    * which is exactly how Spark's `window()` explodes it.
    */
  def sliding1h30m(events: DataFrame): DataFrame = {
    val micros = unix_micros($"ts".cast("timestamp"))
    def bucket(offsetMin: Int) =
      timestamp_micros(((micros - lit(offsetMin * 60000000L)) / lit(3600000000L)).cast("long") * lit(3600000000L) + lit(offsetMin * 60000000L))
        .cast("timestamp_ntz")
    val w0 = events.withColumn("window_start", bucket(0))
    val w1 = events.withColumn("window_start", bucket(30))
    w0.unionByName(w1)
      .groupBy($"window_start")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .orderBy($"window_start")
  }

  /** Session windows per user with a fixed inactivity gap: gaps-and-islands
    * via lag + cumulative sum — one shuffle on user_id, sorted scan after.
    * (Streaming form: `flatMapGroupsWithState`, see graft.streaming.)
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gapUs = gapMinutes * 60000000L
    events
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ts".isNull ||
          unix_micros($"ts".cast("timestamp")) - unix_micros($"prev_ts".cast("timestamp")) > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum($"new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts").as("session_start"),
           max($"ts").as("session_end"),
           count(lit(1)).as("n_events"),
           round(sum($"value"), 2).as("sum_value"))
      .withColumn("duration_sec",
        (unix_micros($"session_end".cast("timestamp")) -
         unix_micros($"session_start".cast("timestamp"))) / lit(1000000.0))
      .orderBy($"user_id", $"session_id")
  }

  /** Ordered-step funnel (q37): per user, the first time each step was
    * reached STRICTLY AFTER the previous step — the product-analytics
    * conversion query (view → click → purchase). Step i+1's candidate
    * events are gated on `ts > step_i_ts`; a null previous step
    * null-propagates through the comparison, so unreached steps cascade
    * to null and `depth` (number of reached steps) falls out as a sum of
    * null checks.
    *
    * Scale shape: ONE shuffle on user_id, then k chained unbounded
    * window aggregates and a same-key groupBy — the sequential
    * dependency between steps rides the already-partitioned data, never
    * a self-join (the naive k-way self-join shape shuffles the event
    * table k times). The per-user collapse is exchange-free because the
    * grouping key equals the window partition key.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val byUser = Window.partitionBy($"user_id")
    val withSteps = steps.zipWithIndex
      .foldLeft(events.select($"user_id", $"event_type", $"ts")) {
        case (df, (step, i)) =>
          val hit =
            if (i == 0) $"event_type" === step
            else $"event_type" === step && $"ts" > col(s"step${i}_ts")
          df.withColumn(s"step${i + 1}_ts", min(when(hit, $"ts")).over(byUser))
      }
    val stepCols = steps.indices.map(i => col(s"step${i + 1}_ts"))
    withSteps
      .groupBy($"user_id")
      .agg(min(stepCols.head).as("step1_ts"),
           stepCols.tail.zipWithIndex.map { case (c, i) =>
             min(c).as(s"step${i + 2}_ts") }: _*)
      .withColumn("depth",
        steps.indices.map(i =>
          when(col(s"step${i + 1}_ts").isNotNull, 1L).otherwise(0L))
          .reduce(_ + _))
      .orderBy($"user_id")
  }

  /** Next-event transition counts (q39): the Markov-chain view of the
    * event stream — for each event type, the top-k next event types by
    * frequency (the "what do users do after X" product question).
    *
    * Scale shape: ONE shuffle on user_id gives every user's ordered
    * event sequence; `lead` is a row-local window over it. The
    * transition aggregate collapses to at most |types|² rows with
    * map-side combine, and the per-source top-k window runs over that
    * metadata-sized relation — never the event table. No join operator
    * anywhere (plan-guarded).
    *
    * Ordering within a user is (ts, event_id) — a total order, so the
    * successor of every event is deterministic under any partitioning.
    * The last event of each user has no successor and is dropped.
    */
  def transitions(events: DataFrame, k: Int): DataFrame = {
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val perSource = Window.partitionBy($"event_type")
      .orderBy($"n".desc, $"next_event")
    events
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("next_event", lead($"event_type", 1).over(byUser))
      .where($"next_event".isNotNull)
      .groupBy($"event_type", $"next_event")
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(perSource).cast("long"))
      .where($"rank" <= k)
      .orderBy($"event_type", $"rank")
  }

  /** Trailing time-RANGE rolling aggregate (q40): per user, the event
    * count and value sum over the trailing `hours`-hour window ending at
    * (and including) each event — the value-based RANGE frame q29's
    * ROWS-based running window doesn't exercise. RANGE frames include
    * all PEER rows (equal order value), so ties in ts need no
    * tie-breaker: the frame is defined by value bounds, identical in any
    * engine.
    *
    * Scale shape: one shuffle on user_id, then a sorted scan with a
    * sliding frame — Spark evaluates the bounded-preceding RANGE frame
    * with a moving two-pointer over the sorted partition, never
    * re-scanning the window per row. Sum portability: the summand is
    * `floor(value·100)` as a long (one IEEE multiply + floor, identical
    * bits in any engine), so the frame sum is exact integer arithmetic —
    * no summation-order dependence (double sums over sliding frames are
    * evaluated in different orders by different engines).
    */
  def rollingRange(events: DataFrame, hours: Int): DataFrame = {
    val micros = unix_micros($"ts".cast("timestamp"))
    val frame = Window.partitionBy($"user_id").orderBy($"ts_us")
      .rangeBetween(-hours * 3600000000L, 0L)
    events
      .select($"event_id", $"user_id", $"ts",
        micros.as("ts_us"), floor($"value" * 100).as("cents"))
      .withColumn("trailing_n", count(lit(1)).over(frame))
      .withColumn("trailing_cents", sum($"cents").over(frame))
      .select($"event_id", $"user_id", $"ts", $"trailing_n", $"trailing_cents")
      .orderBy($"event_id")
  }

  /** Cohort retention matrix (q38): users bucketed by first-seen day,
    * counted on each subsequent active day offset — the
    * "retention triangle" every growth dashboard renders. All day
    * arithmetic is date-truncated integer day differences; the count is
    * exact (distinct users per (cohort, offset)).
    *
    * Scale shape: the cohort day is `min(active_day)` as an unbounded
    * window over user_id — NOT an aggregate joined back. The
    * aggregate+join formulation scans and shuffles the fact table twice
    * (the two exchanges cannot collapse: the aggregate side ships
    * partial-min states, the probe side ships rows — map-side combine
    * de-canonicalizes them by construction); the window formulation
    * scans events ONCE and shuffles it ONCE, with no join operator at
    * all (plan-guarded). The distinct then runs on (cohort, offset,
    * user) with map-side partial dedup, and the final rollup is a
    * counting aggregate — the x02 two-level countDistinct shape, which
    * scales where a naive count(DISTINCT) single-pass would hotspot.
    * min(active_day) == day-truncated min(ts): date_trunc is monotone.
    */
  def retentionMatrix(events: DataFrame): DataFrame = {
    events
      .select($"user_id",
        date_trunc("day", $"ts").cast("timestamp_ntz").as("active_day"))
      .withColumn("cohort_day",
        min($"active_day").over(Window.partitionBy($"user_id")))
      .select($"cohort_day",
        datediff($"active_day", $"cohort_day").cast("long").as("day_offset"),
        $"user_id")
      .distinct()
      .groupBy($"cohort_day", $"day_offset")
      .agg(count(lit(1)).as("n_active"))
      .orderBy($"cohort_day", $"day_offset")
  }

  /** Rolling N-day distinct actives (q45) — the DAU/WAU/MAU family.
    * COUNT(DISTINCT) isn't expressible over a window frame (in Spark or
    * any mainstream engine), so the distributed shape is: collapse to
    * distinct (user, day) pairs first — THE cardinality reducer, a fact
    * table becomes at most |users|·|days| rows — then explode each pair
    * into the `windowDays` report days it contributes to, and count per
    * day. Explosion factor is the window length (7 here), bounded and
    * shuffle-friendly; the alternative day-range self-join re-scans the
    * pair table per day.
    *
    * Report days are restricted to days with actual activity (the spine
    * join for gap-free calendars is q35's job).
    */
  def rollingDistinctUsers(events: DataFrame, windowDays: Int): DataFrame =
    events
      .select($"user_id", date_trunc("day", $"ts").cast("date").as("day"))
      .distinct()
      .withColumn("report_day",
        explode(sequence($"day", date_add($"day", windowDays - 1))))
      .groupBy($"report_day")
      .agg(countDistinct($"user_id").as("n_active"),
        // a report day is real iff some contributor IS that day — checked
        // inline so the activity-day filter costs no second scan or join
        max(($"day" === $"report_day").cast("int")).as("has_self"))
      .where($"has_self" === 1)
      .select($"report_day", $"n_active")
      .orderBy($"report_day")

  /** Forward-fill gap interpolation (q46): carry each user's last known
    * reading forward across null gaps — `last_value IGNORE NULLS` over an
    * unbounded-preceding frame, the canonical sensor/tick gap-fill. One
    * user_id shuffle, one sorted pass; rows before a user's first reading
    * stay null (nothing to carry). The fixture nulls every 7th event's
    * value deterministically so the oracle reproduces the gaps exactly.
    */
  /** Time-weighted average (q60) — the irregular-series mean every
    * billing/TWAP/sensor pipeline computes: each reading holds until the
    * next one, so it weighs by its holding DURATION, not by row count
    * (a plain avg over-weights bursts). The last reading of a user holds
    * zero time (no successor) — the standard right-open convention.
    *
    * Exactness: value cents (decimal-exact long) × µs durations sum to
    * an exact BIGINT numerator per user; the time span is an exact µs
    * BIGINT; the presented ratio is two IEEE divisions of those exact
    * integers in a fixed order — bit-identical in any engine (the
    * q51/g03 exact-fraction discipline; cents·µs over a month-long span
    * peaks ~10¹⁷, inside long range).
    *
    * Scale shape: one hash exchange on user_id feeds the lead() window,
    * and the per-user aggregate reuses that clustering (grouping key =
    * partitioning key ⇒ EnsureRequirements inserts nothing) — raw events
    * shuffle exactly once, output is user-sized.
    */
  def timeWeightedAverage(events: DataFrame): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val tus = unix_micros($"ts".cast("timestamp"))
    events
      .select($"event_id", $"user_id", $"ts",
        ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("t_us", tus)
      .withColumn("next_us", lead($"t_us", 1).over(w))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        (max($"t_us") - min($"t_us")).as("span_us"),
        sum(when($"next_us".isNull, 0L)
          .otherwise($"cents" * ($"next_us" - $"t_us"))).as("twap_num"))
      .select($"user_id", $"n_events", $"span_us", $"twap_num",
        when($"span_us" === 0L, lit(0.0))
          .otherwise($"twap_num".cast("double") / $"span_us" / lit(100.0))
          .as("twap"))
      .orderBy($"user_id")
  }

  def forwardFill(events: DataFrame): DataFrame = {
    val gapped = events
      .select($"event_id", $"user_id", $"ts",
        when($"event_id" % 7 === 0, lit(null).cast("double"))
          .otherwise(floor($"value" * 100) / 100).as("reading"))
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gapped
      .withColumn("filled", last($"reading", ignoreNulls = true).over(w))
      .orderBy($"event_id")
  }

  /** Two-sided LINEAR interpolation of a gapped series (q67) — the other
    * half of [[forwardFill]]: a null reading takes
    * `prev + (next − prev)·(t − tₚ)/(tₙ − tₚ)` between its time-nearest
    * non-null neighbors, falls back to the single existing neighbor at
    * the series edges, and keeps the previous value on a (degenerate)
    * zero-width time span. Sensor/metric pipelines prefer this over
    * carry-forward whenever the quantity drifts between observations.
    *
    * One shuffle: both IGNORE NULLS frames (strictly-before and
    * strictly-after) ride the same (user, ts, id)-sorted window pass.
    * Inputs are exact integers (cents, epoch µs); the interpolation is a
    * fixed IEEE expression tree evaluated on exact operands, so every
    * engine rounds identically at each of its four ops — no summation-
    * order nondeterminism anywhere.
    */
  def linearInterpolate(events: DataFrame, reading: Column): DataFrame = {
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val before = byUser.rowsBetween(Window.unboundedPreceding, -1)
    val after = byUser.rowsBetween(1, Window.unboundedFollowing)
    events
      .select($"event_id", $"user_id", $"ts", reading.as("reading"))
      .withColumn("t", unix_micros($"ts".cast("timestamp")))
      .withColumn("pv", last($"reading", ignoreNulls = true).over(before))
      .withColumn("pt", last(when($"reading".isNotNull, $"t"), ignoreNulls = true).over(before))
      .withColumn("nv", first($"reading", ignoreNulls = true).over(after))
      .withColumn("nt", first(when($"reading".isNotNull, $"t"), ignoreNulls = true).over(after))
      .select($"event_id", $"user_id", $"ts", $"reading",
        when($"reading".isNotNull, $"reading".cast("double"))
          .when($"pv".isNull, $"nv".cast("double"))
          .when($"nv".isNull, $"pv".cast("double"))
          .when($"nt" === $"pt", $"pv".cast("double"))
          .otherwise(round(
            $"pv" + ($"nv" - $"pv").cast("double") * ($"t" - $"pt") / ($"nt" - $"pt"), 6))
          .as("filled"))
      .orderBy($"event_id")
  }

  /** Consecutive-day activity streaks (q50) — the gaps-and-islands
    * pattern: engagement pipelines ask "how long is each user's longest
    * run of consecutive active days, and how many runs do they have".
    *
    * Island detection is the classic anchor trick: within each user's
    * date-ordered distinct activity days, `day - row_number()` is
    * CONSTANT across a consecutive run and distinct between runs (each
    * gap advances `day` by more than it advances the row number), so the
    * anchor date itself is the island key — no self-join, no recursion.
    *
    * Scale shape: TWO exchanges, both carrying the collapsed pair table,
    * never raw events. The distinct is an aggregate with map-side
    * partials, so its shuffle moves each mapper's deduped (user, day)
    * pairs — bounded by |users|·|days| — not the fact table; the
    * row_number window then re-shuffles those pairs on user_id. After
    * that, zero further exchanges: the island aggregate groups by
    * (user_id, anchor) and the per-user rollup by user_id, and
    * hash-partitioning on user_id satisfies both ClusteredDistributions
    * (partitioning exprs ⊆ grouping keys), so EnsureRequirements inserts
    * nothing. PlanGuardSpec pins the two-exchange plan. Windowing the
    * raw fact table first would be ONE exchange but would shuffle every
    * event — the wrong trade at any scale.
    */
  def activityStreaks(events: DataFrame): DataFrame = {
    val days = events
      .select($"user_id", date_trunc("day", $"ts").cast("date").as("day"))
      .distinct()
    val w = Window.partitionBy($"user_id").orderBy($"day")
    days
      .withColumn("anchor", date_sub($"day", row_number().over(w)))
      .groupBy($"user_id", $"anchor")
      .agg(count(lit(1)).as("len"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_streaks"),
        max($"len").as("longest_streak"),
        sum($"len").as("active_days"))
      .orderBy($"user_id")
  }

  /** Cumulative reach (q68) — distinct users EVER seen, by day: the
    * launch-curve metric. Cumulative COUNT DISTINCT is inexpressible as
    * a window frame, and re-scanning history per day is quadratic; the
    * standard reduction is first-seen day per user (one map-side-
    * combined aggregate), a per-day new-user count, and a running sum
    * over the DAY SPINE — the only window in the plan runs over
    * calendar-day rows, metadata-sized at any corpus scale. Days with
    * no new users still appear (the spine is the distinct active-day
    * set), carrying the previous cumulative value.
    */
  def cumulativeReach(events: DataFrame): DataFrame = {
    val days = events.select(to_date($"ts").as("day"))
    val firstSeen = events.groupBy($"user_id")
      .agg(min(to_date($"ts")).as("day"))
      .groupBy($"day").agg(count(lit(1)).as("new_users"))
    days.distinct()
      .join(firstSeen, Seq("day"), "left")
      .withColumn("new_users", coalesce($"new_users", lit(0L)))
      .withColumn("cum_users",
        sum($"new_users").over(Window.orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy($"day")
  }

  /** Session-scoped path mining (q64): the corpus-wide frequency of
    * length-3 event-type journeys, counted only WITHIN a session (the
    * [[sessionize]] gap rule) — the "what do users actually do in one
    * sitting" report. Crossing a session boundary is exactly the
    * transition q39's global Markov chain over-counts; scoping the
    * trigram to the session island is what makes it a journey.
    *
    * One shuffle on user_id serves the island derivation AND both
    * `lead`s (same window partitioning); the trigram aggregate is
    * |types|³-bounded, so everything after the window is metadata-sized.
    */
  def sessionPaths(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gapUs = gapMinutes * 60000000L
    val bySession = Window.partitionBy($"user_id", $"session_id")
      .orderBy($"ts", $"event_id")
    events
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ts".isNull ||
          unix_micros($"ts".cast("timestamp")) -
            unix_micros($"prev_ts".cast("timestamp")) > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum($"new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("s2", lead($"event_type", 1).over(bySession))
      .withColumn("s3", lead($"event_type", 2).over(bySession))
      .where($"s3".isNotNull)
      .groupBy($"event_type".as("s1"), $"s2", $"s3")
      .agg(count(lit(1)).as("n"))
      .orderBy($"s1", $"s2", $"s3")
  }

  /** Event-sequence pattern matching (q69) — the MATCH_RECOGNIZE seat:
    * each user's event stream collapses to a type-initial string in
    * (ts, event_id) order, and a regex over that string counts
    * non-overlapping pattern occurrences and returns the first match —
    * "views then clicks then a purchase" expressed as `v+c*p` instead
    * of hand-chained `lead`s (q37's funnel is the fixed-length special
    * case; this takes arbitrary quantified patterns).
    *
    * Both engines run leftmost greedy non-overlapping regex scans, so
    * counts and match texts are identical as long as the pattern stays
    * in the POSIX-ish common core (no backrefs/lookaround — document,
    * don't translate). Scale shape: ONE user-keyed shuffle; the string
    * build is array_sort over the collected group (bounded by per-user
    * event counts — the q64 contract), the regex is row-local codegen.
    */
  def patternMatches(events: DataFrame, pattern: String): DataFrame = {
    requirePortablePattern(pattern)
    events
      .groupBy($"user_id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct($"ts", $"event_id", $"event_type"))),
          s => substring(s.getField("event_type"), 1, 1)), "").as("seq"))
      .select($"user_id",
        length($"seq").cast("long").as("seq_len"),
        size(regexp_extract_all($"seq", lit(pattern), lit(0))).cast("long")
          .as("n_matches"),
        regexp_extract($"seq", pattern, 0).as("first_match"))
      .orderBy($"user_id")
  }

  /** The ONE cross-engine regex-portability rule, shared by the batch
    * (q69) and streaming (w20) pattern kernels so the two gates that
    * share an oracle can never drift into accepting different pattern
    * languages: no lookaround/inline flags (`(?`), no backreferences —
    * the constructs whose semantics differ between java.util.regex and
    * RE2-family engines.
    */
  private[graft] def requirePortablePattern(pattern: String): Unit =
    require(!pattern.contains("(?") && !pattern.matches(""".*\\\d.*"""),
      s"pattern matching: lookaround/backref syntax is not cross-engine portable: $pattern")

  /** Q72: first/last-touch attribution — for every conversion event,
    * the earliest and latest touch (click/view) within the trailing
    * lookback window, plus the touch count: the standard marketing-
    * attribution join, expressed WITHOUT a join. Each touch encodes as
    * a lexicographically sortable string `us#event_id#type` (zero-padded
    * fixed widths, so string order = (time, id) order and the tie-break
    * is explicit); first/last touch are then plain `min`/`max` over a
    * RANGE frame `[−lookback, −1µs]` on the user's µs-ordered timeline —
    * one pass, one user-keyed exchange, no self-join, frames bounded by
    * the lookback. Conversions with no touch in window keep nulls (the
    * "organic" signal). µs-exact end to end.
    */
  def attribution(events: DataFrame, lookbackSec: Long = 604800L,
                  touchTypes: Seq[String] = Seq("click", "view"),
                  conversionType: String = "purchase"): DataFrame = {
    require(lookbackSec >= 1, "attribution: lookback must be >= 1 s")
    val us = unix_micros($"ts".cast("timestamp"))
    val touch = $"event_type".isin(touchTypes: _*)
    val tstr = when(touch, concat(
      lpad(us.cast("string"), 20, "0"), lit("#"),
      lpad($"event_id".cast("string"), 10, "0"), lit("#"), $"event_type"))
    val w = Window.partitionBy($"user_id").orderBy(us)
      .rangeBetween(-lookbackSec * 1000000L, -1L)
    events
      .withColumn("us", us)
      .withColumn("first_t", min(tstr).over(w))
      .withColumn("last_t", max(tstr).over(w))
      .withColumn("n_touches", count(tstr).over(w))
      .where($"event_type" === conversionType)
      .select($"user_id", $"event_id", $"us".as("conv_us"), $"value",
        $"n_touches",
        element_at(split($"first_t", "#"), 3).as("first_touch"),
        element_at(split($"first_t", "#"), 1).cast("long").as("first_us"),
        element_at(split($"last_t", "#"), 3).as("last_touch"),
        element_at(split($"last_t", "#"), 1).cast("long").as("last_us"))
      .orderBy($"user_id", $"conv_us", $"event_id")
  }
}
