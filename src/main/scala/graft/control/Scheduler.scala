package graft.control

import scala.util.{Failure, Success, Try}

/** Deterministic clock abstraction so scheduler semantics (retry sleeps,
  * timeouts, keepalives) are unit-testable with a virtual clock — the
  * reference tests nothing and relies on wall time (SURVEY.md §5).
  */
trait Clock {
  def nowMillis(): Long
  def sleep(ms: Long): Unit
}

object SystemClock extends Clock {
  def nowMillis(): Long = System.currentTimeMillis()
  def sleep(ms: Long): Unit = Thread.sleep(ms)
}

/** Virtual clock for tests: `sleep` advances time instantly. */
final class VirtualClock(start: Long = 0L) extends Clock {
  private var t = start
  def nowMillis(): Long = t
  def sleep(ms: Long): Unit = t += ms
  def advance(ms: Long): Unit = t += ms
}

/** T2: upstream-freshness gate (reference verify_update_needed,
  * src/sources/era5monthly.js:159-170): skip the cycle when the upstream
  * publication date hasn't moved AND the cursor has already consumed the
  * published month. Expressed as a pure predicate; the cycle turns a
  * `false` into a retryable no-op failure, as the reference throws.
  */
object Freshness {
  /** @param cursor          next month to ingest (ISO-8601)
    * @param lastUpdated     upstream update date seen on the last success
    * @param upstreamUpdate  upstream's current update date
    */
  def updateNeeded(cursor: String, lastUpdated: Option[String], upstreamUpdate: String): Boolean = {
    // True month floor: drop the time-of-day entirely (the reference floors
    // update_date to the month start before comparing, era5monthly.js:162-167).
    val monthFloor = upstreamUpdate.take(7) + "-01T00:00:00.000Z"
    !(lastUpdated.contains(upstreamUpdate) && cursor >= monthFloor)
  }
}

/** T4 enforcement: run a cycle body under a Spark job group that a watchdog
  * thread cancels when the keepalive deadline lapses — the engine-side
  * equivalent of the reference killing its worker thread
  * (src/rabbit-sanctuary.js:75-102). [[Scheduler.run]]'s post-hoc TimedOut
  * detection composes with this: a guarded body surfaces the cancellation
  * as a Failure, the scheduler logs/sleeps/retries.
  *
  * Wall-clock by necessity — a real watchdog must fire while the body
  * blocks, which a virtual clock cannot do.
  */
object Watchdog {
  def guarded[A](spark: org.apache.spark.sql.SparkSession, timeoutMillis: Long,
                 label: String)(body: (() => Unit) => A): Try[A] = {
    val group = s"graft-$label-${System.nanoTime()}"
    @volatile var deadline = System.currentTimeMillis() + timeoutMillis
    @volatile var done = false
    val keepalive: () => Unit =
      () => deadline = System.currentTimeMillis() + timeoutMillis
    val watcher = new Thread(() => {
      while (!done && System.currentTimeMillis() <= deadline) Thread.sleep(20)
      // keep canceling until the body returns: a one-shot cancel can fire
      // while the query is still planning (no active job yet) and be lost
      while (!done) {
        spark.sparkContext.cancelJobGroup(group)
        Thread.sleep(100)
      }
    }, s"$group-watchdog")
    watcher.setDaemon(true)
    spark.sparkContext.setJobGroup(group, s"graft cycle $label", interruptOnCancel = true)
    watcher.start()
    try Try(body(keepalive))
    finally {
      done = true
      spark.sparkContext.clearJobGroup()
    }
  }
}

/** T3/T4: the reference's rabbit-sanctuary scheduling semantics
  * (src/rabbit-sanctuary.js:47-102):
  *
  *  - a cycle that fails → log, sleep `retryMillis`, requeue;
  *  - a cycle that succeeds → requeue immediately (bounded by the T2 gate);
  *  - a cycle is killed when it runs past `timeoutMillis` without posting a
  *    keepalive; each keepalive resets the deadline (the CDS poll loop posts
  *    one per poll, src/sources/era5monthly.js:185).
  *
  * The Spark analog runs cycles as driver-side jobs in one long-lived
  * session; "kill" interrupts the job group rather than a worker thread.
  */
final class Scheduler(clock: Clock, retryMillis: Long, timeoutMillis: Long) {

  sealed trait Outcome
  case object Succeeded extends Outcome
  case class Retried(error: String) extends Outcome
  case class TimedOut(afterMillis: Long) extends Outcome

  /** Run up to `maxCycles` cycles of `cycle`, which receives a keepalive
    * callback. Returns the outcome log. Deterministic under VirtualClock.
    */
  def run(maxCycles: Int)(cycle: (() => Unit) => Try[Unit]): Seq[Outcome] = {
    val log = Seq.newBuilder[Outcome]
    var i = 0
    while (i < maxCycles) {
      var deadline = clock.nowMillis() + timeoutMillis
      val keepalive: () => Unit = () => deadline = clock.nowMillis() + timeoutMillis
      val started = clock.nowMillis()
      val result = cycle(keepalive)
      val elapsedPastDeadline = clock.nowMillis() > deadline
      log += (result match {
        case _ if elapsedPastDeadline =>
          // A timed-out cycle sleeps like a failed one — otherwise a
          // consistently slow-failing source requeues in a hot loop. NOTE:
          // the deadline is detected post-hoc; actually interrupting a
          // running cycle requires executing it under a Spark job group
          // that a watchdog cancels at the deadline (T4's worker kill).
          val ranFor = clock.nowMillis() - started
          clock.sleep(retryMillis)
          TimedOut(ranFor)
        case Success(_) => Succeeded
        case Failure(e) =>
          clock.sleep(retryMillis)
          Retried(Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
      })
      i += 1
    }
    log.result()
  }

  /** T8: exponential-backoff polling — sleep ×1.5 per attempt capped at
    * `capMillis` (reference src/sources/era5monthly.js:178-185), posting a
    * keepalive per poll. Returns the first `Some` from `poll`.
    */
  def pollBackoff[A](initialMillis: Long = 1000, capMillis: Long = 120000,
                     maxPolls: Int = 1000, keepalive: () => Unit = () => ())
                    (poll: () => Option[A]): Option[A] = {
    var waitMs = initialMillis
    var i = 0
    while (i < maxPolls) {
      keepalive()
      poll() match {
        case some @ Some(_) => return some
        case None =>
          clock.sleep(waitMs)
          waitMs = math.min(waitMs * 3 / 2, capMillis)
      }
      i += 1
    }
    None
  }
}
