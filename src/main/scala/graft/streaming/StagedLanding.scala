package graft.streaming

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

/** Deterministic file-source replay: the file stream orders batches by
  * modification time, so staging a landing as time-sliced files with
  * MONOTONE stamps makes batch order equal event-time order even when
  * the writes land within one clock tick. Shared by the w08/w09 gates
  * and the StreamingSpec semantics pin — the ordering contract is subtle
  * enough that two copies would drift.
  */
object StagedLanding {

  /** Stamp every not-yet-stamped parquet part file under `dir` with
    * `mtimeMs`; returns the updated stamped-name set.
    */
  def stampNew(dir: Path, mtimeMs: Long, stamped: Set[String]): Set[String] = {
    var out = stamped
    val ls = Files.list(dir)
    try ls.forEach { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".parquet") && !out.contains(n)) {
        Files.setLastModifiedTime(p, FileTime.fromMillis(mtimeMs))
        out += n
      }
    } finally ls.close()
    out
  }
}
