package graft

import java.nio.file.{Files, Path}
import scala.util.{Success, Try}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.control._

/** S1 async-job protocol + S7/T6 registry watch, deterministic clock. */
class AsyncJobSpec extends AnyFunSuite with Matchers {

  private final class FakeApi(pollsUntilDone: Int, finalStatus: String = "completed")
      extends AsyncJobApi {
    var polls = 0
    var fetched: Option[String] = None
    def submit(request: Map[String, String]): String = "task-1"
    def status(taskId: String): String = {
      polls += 1
      if (polls < pollsUntilDone) (if (polls % 2 == 0) "running" else "queued")
      else finalStatus
    }
    def location(taskId: String): String = "loc://result"
    def fetch(location: String, dest: Path): Path = {
      fetched = Some(location)
      Files.writeString(dest, "GRIB-bytes")
      dest
    }
  }

  test("submit -> poll (queued/running, backoff x1.5, keepalive per poll) -> fetch") {
    val clock = new VirtualClock()
    val sched = new Scheduler(clock, retryMillis = 1000, timeoutMillis = 600000)
    val api = new FakeApi(pollsUntilDone = 5)
    var keepalives = 0
    val dest = Files.createTempFile("graft-dl", ".grib")
    val got = AsyncJobClient.download(api, Map("month" -> "1995-01"), dest,
      sched, () => keepalives += 1)
    got shouldBe Success(dest)
    api.fetched shouldBe Some("loc://result")
    keepalives shouldBe 5
    // four incomplete polls slept 1000, 1500, 2250, 3375 ms (x1.5 backoff)
    clock.nowMillis() shouldBe (1000 + 1500 + 2250 + 3375)
    new String(Files.readAllBytes(dest), "UTF-8") shouldBe "GRIB-bytes"
  }

  test("failed task surfaces as retryable Failure, no fetch") {
    val sched = new Scheduler(new VirtualClock(), 1000, 600000)
    val api = new FakeApi(pollsUntilDone = 3, finalStatus = "failed")
    val got = AsyncJobClient.download(api, Map.empty,
      Files.createTempFile("graft-dl2", ".grib"), sched)
    got.isFailure shouldBe true
    api.fetched shouldBe None
  }

  test("registry watch fires add on appearance and remove on unlink (chokidar analog)") {
    val dir = Files.createTempDirectory("graft-sources")
    val log = Seq.newBuilder[String]
    val reg = new SourceRegistry(dir, n => log += s"add:$n", n => log += s"rm:$n")

    reg.tick()
    Files.writeString(dir.resolve("era5monthly.source"), "{}")
    Files.writeString(dir.resolve("notes.txt"), "ignored")
    reg.tick()
    Files.writeString(dir.resolve("oscar.source"), "{}")
    reg.tick()
    Files.delete(dir.resolve("era5monthly.source"))
    reg.tick()
    reg.tick() // steady state: no repeated events

    log.result() shouldBe Seq("add:era5monthly", "add:oscar", "rm:era5monthly")
    reg.current shouldBe Set("oscar")
  }
}
