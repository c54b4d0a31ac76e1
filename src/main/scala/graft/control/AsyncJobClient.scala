package graft.control

import java.nio.file.Path
import scala.util.{Failure, Success, Try}

/** S1: the CDS-style async retrieval protocol (reference
  * src/sources/era5monthly.js:172-195): POST a request → task id; poll the
  * task with exponential backoff while it reports `queued`/`running`,
  * posting a keepalive per poll (resets the cycle timeout, T4/T8); on
  * `completed`, follow the result location and download. Abstracted behind
  * an API trait so tests (and the offline engine) drive it with a stub —
  * the network transport is the only unimplemented piece in this
  * environment.
  */
trait AsyncJobApi {
  def submit(request: Map[String, String]): String
  /** `queued` | `running` | `completed` | `failed` (era5monthly.js:181-188). */
  def status(taskId: String): String
  /** Result URL/path, valid once status is `completed`. */
  def location(taskId: String): String
  def fetch(location: String, dest: Path): Path
}

object AsyncJobClient {

  /** Submit, poll to completion with the reference's backoff (1 s × 1.5
    * capped 120 s), then fetch. Any `failed` status or poll exhaustion is a
    * Failure — the cycle treats it as retryable (T3).
    */
  def download(api: AsyncJobApi, request: Map[String, String], dest: Path,
               scheduler: Scheduler, keepalive: () => Unit = () => ()): Try[Path] = {
    Try(api.submit(request)).flatMap { taskId =>
      val done = scheduler.pollBackoff[Try[String]](keepalive = keepalive) { () =>
        api.status(taskId) match {
          case "completed" => Some(Success(api.location(taskId)))
          case "failed" => Some(Failure(new RuntimeException(s"task $taskId failed")))
          case _ => None // queued | running → keep polling
        }
      }
      done match {
        case Some(loc) => loc.flatMap(l => Try(api.fetch(l, dest)))
        case None => Failure(new RuntimeException(s"task $taskId: poll budget exhausted"))
      }
    }
  }
}

/** S7 + T6: the sources-directory watch (reference chokidar on `sources/`,
  * src/main.js:9-11) as a poll-diff registry: each tick lists the source
  * descriptor files, fires `onAdd` for new ones and `onRemove` for deleted
  * ones (the reference's `unlink` → doomed-job removal,
  * src/rabbit-sanctuary.js:28-44). Poll-diff rather than inotify keeps it
  * deterministic and portable; the driver loop calls `tick()` between
  * cycles.
  */
final class SourceRegistry(dir: Path,
                           onAdd: String => Unit,
                           onRemove: String => Unit,
                           suffix: String = ".source") {
  private var known = Set.empty[String]

  def current: Set[String] = known

  def tick(): Unit = {
    val present: Set[String] =
      if (!java.nio.file.Files.isDirectory(dir)) Set.empty
      else {
        val s = java.nio.file.Files.list(dir)
        try {
          val b = Set.newBuilder[String]
          s.iterator().forEachRemaining { p =>
            val n = p.getFileName.toString
            if (n.endsWith(suffix)) b += n.stripSuffix(suffix)
          }
          b.result()
        } finally s.close()
      }
    (present -- known).toSeq.sorted.foreach(onAdd)
    (known -- present).toSeq.sorted.foreach(onRemove)
    known = present
  }
}
