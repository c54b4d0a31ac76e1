package graft

import org.apache.spark.sql.functions._
import graft.operators.EventWindows

class EventWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: (Long, String, Long, String, Double)*) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", $"ts".cast("timestamp_ntz"))

  test("tumbling hour windows partition events by floor(ts, hour)") {
    val d = events(
      (1L, "2024-01-01 10:05:00", 1L, "click", 1.0),
      (2L, "2024-01-01 10:55:00", 1L, "click", 2.0),
      (3L, "2024-01-01 11:01:00", 1L, "click", 4.0))
    val out = EventWindows.tumbling(d, "hour").collect()
    out.map(r => (r.get(0).toString.replace('T', ' ').take(13), r.getAs[Long]("n"), r.getAs[Double]("sum_value"))) shouldBe
      Array(("2024-01-01 10", 2L, 3.0), ("2024-01-01 11", 1L, 4.0))
  }

  test("sliding 1h/30m windows double-count each event") {
    val d = events((1L, "2024-01-01 10:05:00", 1L, "click", 1.0))
    val out = EventWindows.sliding1h30m(d).collect()
    // event at 10:05 lands in windows starting 10:00 and 09:30
    out.map(_.get(0).toString.replace('T', ' ').take(16)).toSet shouldBe
      Set("2024-01-01 10:00", "2024-01-01 09:30")
    all(out.map(_.getAs[Long]("n"))) shouldBe 1L
  }

  test("sessionize splits on gaps > threshold (gaps-and-islands)") {
    val d = events(
      (1L, "2024-01-01 10:00:00", 1L, "e", 1.0),
      (2L, "2024-01-01 10:10:00", 1L, "e", 1.0),  // same session (10 min gap)
      (3L, "2024-01-01 11:00:00", 1L, "e", 1.0),  // new session (50 min gap)
      (4L, "2024-01-01 10:00:00", 2L, "e", 1.0))  // other user
    val out = EventWindows.sessionize(d, 30).collect()
    out.length shouldBe 3
    val u1 = out.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    u1.map(_.getAs[Long]("n_events")).toSeq shouldBe Seq(2L, 1L)
    u1(0).getAs[Double]("duration_sec") shouldBe 600.0
    u1(1).getAs[Double]("duration_sec") shouldBe 0.0
  }
}
