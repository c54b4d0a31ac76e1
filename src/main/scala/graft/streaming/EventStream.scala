package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.implicits._

/** Typed event record for stateful streaming ops (micro-batch `events`
  * fixture rows; TESTDATA.md).
  */
case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                 event_type: String, value: Double)

/** Per-user session accumulator for [[EventStream.sessionizeStateful]];
  * `start`/`end` in epoch microseconds (the fixture's ts precision).
  */
case class SessionState(sessionId: Long, start: Long, end: Long,
                        nEvents: Long, sumValue: Double)

/** Emitted session row (mirrors the batch EventWindows.sessionize shape). */
case class SessionOut(user_id: Long, session_id: Long,
                      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
                      n_events: Long, sum_value: Double, duration_sec: Double)

/** Per-user resumable-scan state for [[EventStream.patternMatchStateful]]:
  * totals so far plus the unconsumed suffix since the last completed
  * match (`tail`) — the only text a future match can still use.
  */
case class PatternState(seqLen: Long, nMatches: Long, firstMatch: String,
                        hasFirst: Boolean, tail: String)

/** Emitted pattern row (mirrors the batch q69 EventWindows.patternMatches
  * shape; `first_match` empty until a first match completes).
  */
case class PatternOut(user_id: Long, seq_len: Long, n_matches: Long,
                      first_match: String)

/** Per-user last-seen cursor for [[EventStream.gapDetectStateful]]:
  * epoch microseconds of the latest event processed so far — the ONLY
  * state a cross-batch gap detector needs (one long per user).
  */
case class GapState(lastUs: Long)

/** Emitted heartbeat-loss row: a consecutive-event pair further apart
  * than the threshold (mirrors the batch lag-window shape).
  */
case class GapOut(user_id: Long, gap_start: java.sql.Timestamp,
                  gap_end: java.sql.Timestamp, gap_sec: Long)

/** Per-user touch buffer for [[EventStream.attributionStateful]]: the
  * (us, event_id, type) touches within the lookback of the latest event
  * seen — the ONLY history a future conversion can still attribute to,
  * so state is bounded by touch rate × lookback, never the stream.
  */
case class AttribState(touches: List[(Long, Long, String)])

/** Per-user funnel cursor for [[EventStream.funnelStateful]]: the min
  * timestamp (µs) at which each step's chained condition was first
  * satisfied (−1 = not yet), plus the emitted latch — three longs and a
  * boolean per user, the whole state a cross-batch funnel needs.
  */
case class FunnelState(stepUs: List[Long], emitted: Boolean)

/** Emitted funnel-completion row: one per user, the moment the last
  * step closes (mirrors q37's full-depth rows in µs).
  */
case class FunnelOut(user_id: Long, step1_us: Long, step2_us: Long,
                     step3_us: Long)

/** Emitted conversion row (mirrors the batch q72 attribution shape;
  * organic conversions keep nulls).
  */
case class AttribOut(user_id: Long, event_id: Long, conv_us: Long,
                     value: Double, n_touches: Long,
                     first_touch: Option[String], first_us: Option[Long],
                     last_touch: Option[String], last_us: Option[Long])

/** Structured Streaming surface (SURVEY.md M4): the reference's incremental
  * cycle semantics (monthly cursor = offset tracking, T1) re-expressed as
  * streaming queries over an event source. Each transform is a pure
  * `DataFrame => DataFrame` usable on both a batch frame and a
  * `readStream` frame — the batch EventWindows results double as the
  * oracle-checked goldens for these (w01-w03).
  *
  * Scale notes: watermark + windowed aggregation is the standard bounded-
  * state shape — state is pruned as the watermark advances, so a
  * 1000-executor cluster holds only in-flight windows, not history.
  */
object EventStream {

  /** w01 streaming flavor: 1-hour tumbling windows with a 2-hour watermark.
    * On a stream, rows older than the watermark are dropped and closed
    * windows are emitted exactly once (append mode).
    */
  def tumblingHourly(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"),
           round(sum($"value"), 2).as("sum_value"),
           // same derived-mean formulation as the batch twin (EventWindows)
           (round(sum($"value"), 2) / count(lit(1))).as("avg_value"))
      .select($"w.start".as("window_start"), $"event_type", $"n", $"sum_value", $"avg_value")

  /** w02 streaming flavor: 1-hour windows sliding every 30 minutes. */
  def sliding1h30m(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window($"ts", "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .select($"w.start".as("window_start"), $"n", $"sum_value")

  /** w03 streaming flavor via the built-in session window (30-minute gap). */
  def sessionWindow(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy($"user_id", session_window($"ts", gap).as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
      .select($"user_id", $"w.start".as("session_start"), $"w.end".as("session_end"),
              $"n_events", $"sum_value")

  /** Streaming exact dedup: drop event_id duplicates arriving within the
    * watermark horizon — the streaming flavor of Dedup.exact. State holds
    * one key per event inside the horizon and is pruned as the watermark
    * advances (at-least-once upstreams → effectively-once downstream).
    */
  def dedupeEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Stream-stream inner join with a time-range condition: each click
    * joined to the same user's purchases within the trailing `tolerance`.
    * Watermarks on BOTH sides bound the join state — Spark retains only
    * rows younger than watermark + tolerance, so state is O(rate × window)
    * regardless of stream age. The batch twin of this shape is
    * [[graft.operators.Temporal.rangeJoinWithin]]/q26.
    */
  def recentPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                         watermark: String = "2 hours",
                         toleranceSec: Long = 300): DataFrame =
    purchaseJoin(clicks, purchases, watermark, toleranceSec, "inner")

  /** LEFT OUTER stream-stream join (w11): clicks with no purchase in the
    * trailing window still emit — with null purchase columns — but only
    * once the watermark proves no match can still arrive (Spark emits the
    * null-padded row when the click's state is evicted). The outer row
    * set is therefore watermark-gated: on a closed input, clicks younger
    * than the final watermark that never matched do NOT surface (their
    * state dies with the query) — the oracle applies the same rule, the
    * w08 precedent. Conversion-funnel semantics ("clicks WITHOUT a
    * purchase") need exactly this shape; state bounds are identical to
    * the inner form.
    */
  def recentPurchaseJoinOuter(clicks: DataFrame, purchases: DataFrame,
                              watermark: String = "2 hours",
                              toleranceSec: Long = 300): DataFrame =
    purchaseJoin(clicks, purchases, watermark, toleranceSec, "left_outer")

  /** LEFT SEMI stream-stream join (w16): each click emits AT MOST ONCE,
    * when its first qualifying purchase arrives — the "did this click
    * convert?" shape where the inner join's per-pair fanout is noise.
    * Matched rows emit immediately (no watermark gating on emission, the
    * inner-join rule); the watermark still bounds both sides' state.
    * Completes the stream-join matrix alongside w09 (inner) and w11
    * (left outer).
    */
  def recentPurchaseJoinSemi(clicks: DataFrame, purchases: DataFrame,
                             watermark: String = "2 hours",
                             toleranceSec: Long = 300): DataFrame =
    purchaseJoin(clicks, purchases, watermark, toleranceSec, "left_semi")

  /** FULL OUTER stream-stream join (w17) — completes the w09/w11/w16
    * matrix: matched pairs emit immediately; unmatched CLICKS null-pad on
    * the left rule (state evicted once the watermark passes the click's
    * ts, as in w11); unmatched PURCHASES null-pad on the symmetric right
    * rule — a purchase at p_ts can match clicks with ts ∈ [p_ts,
    * p_ts + tolerance], so its state lives until the watermark passes
    * p_ts + tolerance and only then emits with null click columns. The
    * CDC-reconciliation shape ("which side is missing what, and when can
    * we say so") — both cuts are watermark-gated, so on a closed input
    * unmatched rows younger than their side's cut do NOT surface; the
    * oracle applies both cuts explicitly. State bounds identical to the
    * inner form on both sides.
    */
  def recentPurchaseJoinFull(clicks: DataFrame, purchases: DataFrame,
                             watermark: String = "2 hours",
                             toleranceSec: Long = 300): DataFrame =
    purchaseJoin(clicks, purchases, watermark, toleranceSec, "full_outer")

  private def purchaseJoin(clicks: DataFrame, purchases: DataFrame,
                           watermark: String, toleranceSec: Long,
                           joinType: String): DataFrame = {
    val c = clicks.select($"event_id".as("click_id"), $"user_id", $"ts")
      .withWatermark("ts", watermark)
    val p = purchases.select($"event_id".as("purchase_id"),
        $"user_id".as("p_user_id"), $"ts".as("p_ts"))
      .withWatermark("p_ts", watermark)
    val j = c.join(p,
      $"user_id" === $"p_user_id" &&
        $"p_ts" >= $"ts" - expr(s"INTERVAL $toleranceSec SECONDS") &&
        $"p_ts" <= $"ts",
      joinType)
    if (joinType == "left_semi") j.select($"click_id", $"user_id", $"ts")
    else if (joinType == "full_outer")
      // right-only rows carry the purchase's own user — keep both sides'
      // user columns so null-padded rows stay attributable
      j.select($"click_id", $"user_id", $"ts",
        $"purchase_id", $"p_user_id", $"p_ts")
    else j.select($"click_id", $"user_id", $"ts", $"purchase_id", $"p_ts")
  }

  /** Custom sessionization with explicit state — the
    * `flatMapGroupsWithState` shape for semantics the built-in session
    * window can't express (here: emit *closed* sessions with ids assigned
    * in arrival order). Idle sessions close via event-time timeout when the
    * watermark passes session end + gap — fully deterministic, no
    * wall-clock timers. State per user is one small accumulator → bounded
    * by |users|, pruned by the watermark.
    */
  def sessionizeStateful(events: Dataset[Event], gapMinutes: Long = 30,
                         watermark: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L

    // epoch micros ↔ Timestamp, preserving the fixture's µs precision
    def us(t: java.sql.Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    def ts(u: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(u / 1000000 * 1000)
      t.setNanos((u % 1000000).toInt * 1000)
      t
    }
    // same rounding as Spark's round(col, 2): HALF_UP on the binary value
    def round2(x: Double): Double =
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

    def flush(userId: Long, s: SessionState): SessionOut =
      SessionOut(userId, s.sessionId, ts(s.start), ts(s.end),
        s.nEvents, round2(s.sumValue), (s.end - s.start) / 1e6)

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val out = state.getOption.map(flush(userId, _))
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (us(e.ts), e.event_id))
            val closed = Seq.newBuilder[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = us(e.ts)
              cur match {
                case Some(s) if t - s.end <= gapUs =>
                  cur = Some(s.copy(end = math.max(s.end, t),
                    nEvents = s.nEvents + 1, sumValue = s.sumValue + e.value))
                case Some(s) =>
                  closed += flush(userId, s)
                  cur = Some(SessionState(s.sessionId + 1, t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(1, t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when the event-time watermark passes the idle gap
              // (ceil to ms — the watermark's granularity)
              state.setTimeoutTimestamp((s.end + gapUs + 999) / 1000)
            }
            closed.result().iterator
          }
        })
  }

  /** Streaming event-sequence pattern matching (w20) — the CEP twin of
    * the batch q69 `patternMatches`: per user, count non-overlapping
    * occurrences of a quantified regex over the type-initial stream and
    * keep the first matched substring, maintained incrementally with
    * `mapGroupsWithState`.
    *
    * The kernel is a RESUMABLE scan: `java.util.regex` non-overlapping
    * matching commits each match's end position (Matcher.find resumes
    * there), so state only carries the unconsumed suffix since the last
    * completed match — a completed match can never be re-opened by
    * future input. That requires match ends to be input-extension-proof,
    * hence the guard: no alternation (`pv|p` would prefer the longer
    * branch once the next batch arrives) and nothing but a plain atom
    * at the pattern tail — a trailing quantifier (`v+`), counted
    * repeat, or group (`v(c*)` hides one behind `)`) could absorb the
    * next batch's input and move a committed end. With that contract,
    * per-batch apply over any time-ordered batch split is bit-equal to
    * the one-shot batch scan — gated by sharing q69's oracle string
    * verbatim.
    *
    * State honesty (the real CEP caveat): `tail` is bounded by the gap
    * between matches, not by the pattern — a user who never completes a
    * match accumulates their suffix, exactly as an NFA with counters
    * would have to retain the same information for `first_match`
    * reconstruction. Totals ride as integers; output mode is Update
    * (latest totals per user), materialized by an upsert sink.
    */
  def patternMatchStateful(events: Dataset[Event], pattern: String): Dataset[PatternOut] = {
    graft.operators.EventWindows.requirePortablePattern(pattern)
    require(!pattern.contains("|") && !pattern.matches(""".*[+*?})]$"""),
      s"patternMatchStateful: alternation or a quantifier/group at the " +
        s"pattern tail makes match ends batch-dependent: $pattern")
    // compiled ONCE per task via closure capture, not per group per batch
    val compiled = java.util.regex.Pattern.compile(pattern)
    import events.sparkSession.implicits._
    def us(t: java.sql.Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[PatternState]) => {
          val appended = rows.toSeq.sortBy(e => (us(e.ts), e.event_id))
            .map(_.event_type.substring(0, 1)).mkString
          val prev = state.getOption.getOrElse(PatternState(0L, 0L, "", false, ""))
          val text = prev.tail + appended
          val m = compiled.matcher(text)
          var n = prev.nMatches
          var first = prev.firstMatch
          var has = prev.hasFirst
          var lastEnd = 0
          while (m.find()) {
            n += 1
            if (!has) { first = m.group(); has = true }
            lastEnd = m.end()
          }
          val next = PatternState(prev.seqLen + appended.length, n, first, has,
            text.substring(lastEnd))
          state.update(next)
          PatternOut(userId, next.seqLen, next.nMatches, if (has) first else "")
        })
  }

  /** W21: heartbeat-loss / silence detection — emit every consecutive
    * event pair per user whose spacing exceeds `thresholdSec` (the
    * monitoring primitive behind "sensor went dark" alerts; the
    * reference's staleness monitor T11 asks the same question of its
    * layer feed, here per key over the stream). Because a gap is a fact
    * about ONE consecutive pair, the streaming answer equals the batch
    * lag-window answer as long as landing batches respect per-user
    * event-time order (the landEventsSliced contract the other w-gates
    * share) — the only cross-batch memory needed is the last-seen
    * timestamp, carried in [[GapState]].
    *
    * Microsecond-exact: comparisons and the floored `gap_sec` both use
    * epoch-µs integers (the fixture has sub-second spacing), so the
    * DuckDB oracle's `epoch_us` arithmetic reproduces every value.
    * Scale: state is 8 bytes per user; each batch is one shuffle on
    * user_id; emission is append-only (a gap is immutable once seen).
    */
  def gapDetectStateful(events: Dataset[Event], thresholdSec: Long): Dataset[GapOut] = {
    require(thresholdSec >= 1, s"gapDetectStateful: threshold must be >= 1 s")
    import events.sparkSession.implicits._
    val thresholdUs = thresholdSec * 1000000L
    def us(t: java.sql.Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    def ts(u: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(u / 1000000 * 1000)
      t.setNanos((u % 1000000).toInt * 1000)
      t
    }
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[GapState]) => {
          val sorted = rows.toSeq.sortBy(e => (us(e.ts), e.event_id))
          var last = state.getOption.map(_.lastUs)
          val out = Seq.newBuilder[GapOut]
          sorted.foreach { e =>
            val t = us(e.ts)
            last.foreach { lt =>
              if (t - lt > thresholdUs)
                out += GapOut(userId, ts(lt), ts(t), (t - lt) / 1000000L)
            }
            last = Some(math.max(last.getOrElse(Long.MinValue), t))
          }
          last.foreach(lt => state.update(GapState(lt)))
          out.result().iterator
        })
  }

  /** W22: q72's first/last-touch attribution as a streaming operator —
    * conversions attribute the moment they arrive, against the touch
    * buffer carried in [[AttribState]]. The buffer prunes to the
    * lookback of the latest event processed (future events are
    * later, so their windows can never reach a pruned touch), which
    * is what bounds state on an unbounded stream. Batch equality
    * holds under the landEventsSliced ordering contract; the gate
    * shares q72's oracle string verbatim so the two kernels cannot
    * drift. µs-exact; the same-µs touch is excluded (the batch RANGE
    * frame's −1 µs end bound).
    */
  /** W23: q37's ordered funnel as a streaming operator — each user
    * carries only the per-step min-timestamp cursor ([[FunnelState]],
    * three longs), and a completion row emits THE MOMENT the last step
    * closes (append-only, immutable — the fact "user converted through
    * the full funnel at these times" never retracts). Greedy first-set
    * chaining equals the batch min-chain because events are processed
    * in (ts, event_id) order within a batch and the landing slices are
    * time-ordered across batches (the w21/w22 ordering contract): the
    * first step-i event after step-(i−1) closed IS the min. Strict
    * `>` between steps mirrors q37; the oracle is q37's chain filtered
    * to full depth, in µs.
    */
  def funnelStateful(events: Dataset[Event],
                     steps: Seq[String] = Seq("view", "click", "purchase"))
      : Dataset[FunnelOut] = {
    require(steps.length == 3, "funnelStateful: the gate form is 3 steps")
    import events.sparkSession.implicits._
    def us(t: java.sql.Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) => {
          val st = state.getOption.getOrElse(
            FunnelState(List.fill(steps.length)(-1L), emitted = false))
          val cur = st.stepUs.toArray
          var emitted = st.emitted
          val out = Seq.newBuilder[FunnelOut]
          rows.toSeq.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            val t = us(e.ts)
            var i = 0
            while (i < steps.length) {
              if (e.event_type == steps(i) && cur(i) < 0 &&
                  (i == 0 || (cur(i - 1) >= 0 && t > cur(i - 1)))) {
                cur(i) = t
                if (i == steps.length - 1 && !emitted) {
                  out += FunnelOut(userId, cur(0), cur(1), cur(2))
                  emitted = true
                }
              }
              i += 1
            }
          }
          state.update(FunnelState(cur.toList, emitted))
          out.result().iterator
        })
  }

  def attributionStateful(events: Dataset[Event], lookbackSec: Long = 604800L,
                          touchTypes: Set[String] = Set("click", "view"),
                          conversionType: String = "purchase"): Dataset[AttribOut] = {
    require(lookbackSec >= 1, "attributionStateful: lookback must be >= 1 s")
    val lookUs = lookbackSec * 1000000L
    import events.sparkSession.implicits._
    def us(t: java.sql.Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[AttribState]) => {
          var touches = state.getOption.map(_.touches).getOrElse(Nil)
          val out = Seq.newBuilder[AttribOut]
          rows.toSeq.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            val t = us(e.ts)
            if (e.event_type == conversionType) {
              val win = touches.filter(x => x._1 >= t - lookUs && x._1 <= t - 1)
              if (win.isEmpty)
                out += AttribOut(userId, e.event_id, t, e.value, 0L,
                  None, None, None, None)
              else {
                val first = win.minBy(x => (x._1, x._2))
                val last = win.maxBy(x => (x._1, x._2))
                out += AttribOut(userId, e.event_id, t, e.value, win.size.toLong,
                  Some(first._3), Some(first._1), Some(last._3), Some(last._1))
              }
            }
            if (touchTypes(e.event_type))
              touches = touches :+ ((t, e.event_id, e.event_type))
            touches = touches.dropWhile(_._1 < t - lookUs)
          }
          state.update(AttribState(touches))
          out.result().iterator
        })
  }
}
