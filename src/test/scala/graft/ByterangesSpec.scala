package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.control.{Byteranges, Clock, Cycle, Status, StateStore, VirtualClock}

/** S2: multipart/byteranges reassembly (reference src/download.js:58-94)
  * and T11: staleness monitor (reference src/scripts/status.js).
  */
class ByterangesSpec extends AnyFunSuite with Matchers {

  private def multipart(boundary: String, parts: Seq[(String, String)]): Array[Byte] = {
    val sb = new StringBuilder
    parts.foreach { case (range, body) =>
      sb.append(s"--$boundary\r\n")
      sb.append("Content-Type: application/octet-stream\r\n")
      sb.append(s"Content-Range: bytes $range\r\n\r\n")
      sb.append(body)
      sb.append("\r\n")
    }
    sb.append(s"--$boundary--\r\n")
    sb.toString.getBytes("ISO-8859-1")
  }

  test("boundary parsing: quoted, bare, and non-multipart") {
    Byteranges.boundaryOf("multipart/byteranges; boundary=SEP_X") shouldBe Some("SEP_X")
    Byteranges.boundaryOf("""multipart/byteranges; boundary="q b"""") shouldBe Some("q b")
    Byteranges.boundaryOf("application/octet-stream") shouldBe None
  }

  test("reassembly concatenates part bodies in order, strips headers") {
    val body = multipart("XYZ", Seq("0-4/20" -> "HELLO", "5-10/20" -> " WORLD"))
    new String(Byteranges.reassemble(body, "XYZ"), "ISO-8859-1") shouldBe "HELLO WORLD"
  }

  test("payloadOf passes non-multipart bodies through untouched") {
    val raw = Array[Byte](1, 2, 3, 0, -1)
    Byteranges.payloadOf(raw, "application/grib") shouldBe raw
  }

  test("binary-safe: part bodies containing CRLF and dashes survive") {
    val tricky = "AB\r\nCD--notboundary\r\nEF"
    val body = multipart("B0UND", Seq("0-21/22" -> tricky))
    new String(Byteranges.reassemble(body, "B0UND"), "ISO-8859-1") shouldBe tricky
  }

  test("status: fresh heartbeat passes, stale one violates the 5-minute SLO") {
    val dir = java.nio.file.Files.createTempDirectory("graft_status").toString
    val clock = new VirtualClock(1700000000000L)
    Cycle.heartbeat(dir, clock)
    Status.check(dir, clock) shouldBe empty
    clock.advance(Status.HeartbeatSloMillis + 1)
    val v = Status.check(dir, clock)
    v.map(_.what) shouldBe Seq("heartbeat")
  }

  test("status: per-dataset freshness budget against published coverage") {
    val dir = java.nio.file.Files.createTempDirectory("graft_status2").toString
    val clock = new VirtualClock(java.time.Instant.parse("2024-03-10T00:00:00Z").toEpochMilli)
    Cycle.heartbeat(dir, clock)
    StateStore.writeJsonAtomic(s"$dir/outputs/layer-a/metadata.json",
      graft.control.DatasetMeta("layer-a", "outputs/layer-a",
        Some("2024-01-01T00:00:00.000Z"), Some("2024-03-09T18:00:00.000Z"), Nil, "mm", "m"))
    // 18h budget (status.js:34): coverage is 6h old → fresh
    Status.check(dir, clock, Map("layer-a" -> 18 * 3600 * 1000L)) shouldBe empty
    // 1h budget → violation
    Status.check(dir, clock, Map("layer-a" -> 3600 * 1000L)).map(_.what) shouldBe Seq("layer-a")
    // unknown dataset → violation
    Status.check(dir, clock, Map("ghost" -> 1000L)).map(_.what) shouldBe Seq("ghost")
  }
}
