package graft.operators

import org.apache.spark.sql.DataFrame
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
}
