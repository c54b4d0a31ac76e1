package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Collects state-store metrics from finished streaming queries so the
  * bench can report them per run: at scale the state store (not the
  * micro-batch compute) is what grows, and "rows held / bytes used" is the
  * number that decides executor sizing for w04-style windowed aggregation
  * and w05-style dedup horizons.
  */
object StateMetrics {

  private val metrics =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, Long]]

  /** Harvest peak state rows/memory (+ rows processed) from a query's
    * progress history; queries with no stateful operator (e.g. a
    * stream-static join) record rows only.
    */
  def record(name: String, q: StreamingQuery): Unit = {
    val progress = q.recentProgress
    val ops = progress.flatMap(_.stateOperators)
    val rowsIn = progress.map(_.numInputRows).sum
    val base = Map("input_rows" -> rowsIn)
    metrics(name) =
      if (ops.isEmpty) base
      else base ++ Map(
        "state_rows" -> ops.map(_.numRowsTotal).max,
        "state_bytes" -> ops.map(_.memoryUsedBytes).max)
  }

  def snapshot: Map[String, Map[String, Long]] = metrics.toMap

  /** JSON object fragment for the bench artifact, stable key order. */
  def toJson: String =
    snapshot.toSeq.sortBy(_._1).map { case (q, m) =>
      "\"" + q + "\":" + m.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
}
