package graft.control

/** S2: multipart/byteranges reassembly (reference src/download.js:58-94):
  * an HTTP 206 response carrying several ranges arrives as a multipart body
  * — boundary declared in Content-Type — and the usable payload is the
  * concatenation of the part bodies in order. The reference parses the
  * boundary, walks the parts, and strips each part's headers; this is that
  * exact algorithm as a pure function over bytes (driver-side connector
  * code — data lands before Spark reads it, so no executor involvement).
  */
object Byteranges {

  private val CRLF = "\r\n".getBytes("ISO-8859-1")

  /** Extract `boundary=...` from a Content-Type header value; None when the
    * response is not multipart (callers then use the body as-is, matching
    * the reference's 200/206-without-multipart path).
    */
  def boundaryOf(contentType: String): Option[String] = {
    val m = """multipart/byteranges\s*;\s*boundary=("?)([^";]+)\1""".r
    m.findFirstMatchIn(contentType).map(_.group(2))
  }

  /** Reassemble a multipart/byteranges body: for each part delimited by
    * `--boundary`, drop its headers (terminated by a blank line) and
    * concatenate the bodies in order. Trailing `--boundary--` closes the
    * stream. Binary-safe (no charset decoding of the payload).
    */
  def reassemble(body: Array[Byte], boundary: String): Array[Byte] = {
    val delim = ("--" + boundary).getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream()
    var pos = indexOf(body, delim, 0)
    while (pos >= 0) {
      val afterDelim = pos + delim.length
      // closing delimiter "--boundary--"?
      if (afterDelim + 1 < body.length &&
          body(afterDelim) == '-'.toByte && body(afterDelim + 1) == '-'.toByte) {
        pos = -1
      } else {
        // part headers end at the first blank line (CRLFCRLF)
        val headerEnd = indexOf(body, (new String(CRLF, "ISO-8859-1") * 2).getBytes("ISO-8859-1"), afterDelim)
        if (headerEnd < 0) pos = -1
        else {
          val bodyStart = headerEnd + 2 * CRLF.length
          val nextDelim = indexOf(body, delim, bodyStart)
          val bodyEnd = if (nextDelim < 0) body.length else nextDelim - CRLF.length
          out.write(body, bodyStart, math.max(0, bodyEnd - bodyStart))
          pos = nextDelim
        }
      }
    }
    out.toByteArray
  }

  /** Reassemble when multipart, else pass through — the complete S2
    * download tail.
    */
  def payloadOf(body: Array[Byte], contentType: String): Array[Byte] =
    boundaryOf(contentType).map(reassemble(body, _)).getOrElse(body)

  private def indexOf(haystack: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    val limit = haystack.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && haystack(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}

/** T11: staleness monitor (reference src/scripts/status.js:7-40): assert
  * the heartbeat is fresh and every dataset's coverage end is within its
  * source's freshness budget; violations exit non-zero. Pure function of
  * (stateDir, clock) → violation list, so a cron/ops wrapper is one line.
  */
object Status {

  val HeartbeatSloMillis: Long = 5 * 60 * 1000L // status.js:33

  case class Violation(what: String, detail: String)

  def check(rootDir: String, clock: Clock,
            freshnessBudgets: Map[String, Long] = Map.empty): Seq[Violation] = {
    val now = clock.nowMillis()
    val v = Seq.newBuilder[Violation]

    val heart = StateStore.readJson[Map[String, String]](s"$rootDir/heart.json", Map.empty)
    heart.get("last_beat") match {
      case None => v += Violation("heartbeat", "heart.json missing or unreadable")
      case Some(iso) =>
        val age = now - java.time.Instant.parse(iso).toEpochMilli
        if (age >= HeartbeatSloMillis)
          v += Violation("heartbeat", s"last beat ${age / 1000}s ago (SLO ${HeartbeatSloMillis / 1000}s)")
    }

    // one listing serves every dataset check (ADVICE r2: don't re-list and
    // re-parse the metadata dir once per budget entry)
    val metas =
      if (freshnessBudgets.isEmpty) Nil
      else graft.control.Cycle.listMetadata(s"$rootDir/outputs")
    freshnessBudgets.foreach { case (dataset, budgetMillis) =>
      metas.find(_.name == dataset) match {
        case None => v += Violation(dataset, "no metadata published")
        case Some(m) => m.end match {
          case None => v += Violation(dataset, "no coverage yet")
          case Some(endIso) =>
            val age = now - java.time.Instant.parse(endIso).toEpochMilli
            if (age > budgetMillis)
              v += Violation(dataset, s"coverage end ${age / 3600000}h old (budget ${budgetMillis / 3600000}h)")
        }
      }
    }
    v.result()
  }
}
