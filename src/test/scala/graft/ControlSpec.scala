package graft

import java.nio.file.{Files, Paths}
import scala.util.{Failure, Success, Try}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.control._

class ControlSpec extends AnyFunSuite with Matchers {

  private def tmpDir(): String =
    Files.createTempDirectory("graft-control").toString

  test("state store: default on absent file, atomic round-trip") {
    val dir = tmpDir()
    val p = s"$dir/state/grid.json"
    StateStore.readJson(p, SourceState()) shouldBe SourceState()
    val st = SourceState(date = Some("1995-02-01T00:00:00.000Z"),
      normals = Map("A" -> Map("03" -> "/x")))
    StateStore.writeJsonAtomic(p, st)
    StateStore.readJson(p, SourceState()) shouldBe st
    // no temp litter left behind by the atomic move
    Files.list(Paths.get(s"$dir/state")).count() shouldBe 1
  }

  test("extent merge is a running min/max and idempotent across retries") {
    val s1 = StateStore.mergeExtent(DatasetState(), "1995-03-01T00:00:00.000Z",
      "1995-03-01T00:00:00.000Z")
    val s2 = StateStore.mergeExtent(s1, "1995-01-01T00:00:00.000Z",
      "1995-01-01T00:00:00.000Z")
    s2.start shouldBe Some("1995-01-01T00:00:00.000Z")
    s2.end shouldBe Some("1995-03-01T00:00:00.000Z")
    StateStore.mergeExtent(s2, "1995-01-01T00:00:00.000Z",
      "1995-01-01T00:00:00.000Z") shouldBe s2
  }

  test("freshness gate: skip only when upstream unchanged AND cursor past its month") {
    val upstream = "2024-05-17T00:00:00.000Z"
    // upstream moved → update needed regardless of cursor
    Freshness.updateNeeded("2024-06-01T00:00:00.000Z", Some("2024-04-10T00:00:00.000Z"),
      upstream) shouldBe true
    // unchanged but cursor behind the published month → still needed
    Freshness.updateNeeded("2024-04-01T00:00:00.000Z", Some(upstream), upstream) shouldBe true
    // unchanged and cursor at/past the published month → no update needed
    Freshness.updateNeeded("2024-05-01T00:00:00.000Z", Some(upstream), upstream) shouldBe false
    // first run (no last_updated) → needed
    Freshness.updateNeeded("1959-01-01T00:00:00.000Z", None, upstream) shouldBe true
  }

  test("scheduler: failure sleeps retry interval, success requeues immediately") {
    val clock = new VirtualClock()
    val sched = new Scheduler(clock, retryMillis = 300000, timeoutMillis = 600000)
    var n = 0
    val log = sched.run(3) { _ =>
      n += 1
      if (n == 2) Failure(new RuntimeException("boom")) else Success(())
    }
    log(0).toString shouldBe "Succeeded"
    log(1).toString should startWith("Retried")
    log(2).toString shouldBe "Succeeded"
    clock.nowMillis() shouldBe 300000 // exactly one retry sleep
  }

  test("scheduler: cycle exceeding timeout without keepalive is reported killed") {
    val clock = new VirtualClock()
    val sched = new Scheduler(clock, retryMillis = 1000, timeoutMillis = 5000)
    val log = sched.run(1) { _ => clock.advance(10000); Success(()) }
    log.head.toString should startWith("TimedOut")
  }

  test("scheduler: keepalive resets the timeout deadline") {
    val clock = new VirtualClock()
    val sched = new Scheduler(clock, retryMillis = 1000, timeoutMillis = 5000)
    val log = sched.run(1) { keepalive =>
      (1 to 4).foreach { _ => clock.advance(3000); keepalive() }
      Success(())
    }
    log.head.toString shouldBe "Succeeded"
  }

  test("poll backoff: 1s ×1.5 capped, keepalive per poll") {
    val clock = new VirtualClock()
    val sched = new Scheduler(clock, 1000, 600000)
    var polls = 0
    var beats = 0
    val r = sched.pollBackoff[String](initialMillis = 1000, capMillis = 120000,
      keepalive = () => beats += 1) { () =>
      polls += 1
      if (polls == 5) Some("done") else None
    }
    r shouldBe Some("done")
    beats shouldBe 5
    // slept 1000 + 1500 + 2250 + 3375 before the fifth (successful) poll
    clock.nowMillis() shouldBe (1000 + 1500 + 2250 + 3375)
  }

  test("webhook: signed header present, transport errors swallowed") {
    var sent: Option[(String, String, Map[String, String])] = None
    val ok = Webhook.fire("http://tiles/refresh", "s3cret",
      Map("layer" -> "grid_temp"), (u, b, h) => sent = Some((u, b, h)))
    ok shouldBe true
    val (_, body, headers) = sent.get
    headers("X-Gsky-Signature") shouldBe Webhook.signature("s3cret", body)
    Webhook.fire("http://tiles/refresh", "s3cret", Map.empty,
      (_, _, _) => throw new RuntimeException("down")) shouldBe false
  }
}
