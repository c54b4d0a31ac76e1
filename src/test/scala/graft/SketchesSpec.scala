package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def events = table("events")

  test("per-group HLL estimate lands within 5% of exact countDistinct") {
    val approx = Sketches.hllDistinct(events, "event_type", "user_id")
      .select($"event_type", $"approx_distinct")
      .as[(String, Long)].collect().toMap
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    approx.keySet shouldBe exact.keySet
    for ((k, e) <- exact) {
      val a = approx(k)
      math.abs(a - e).toDouble / e should be < 0.05
    }
  }

  test("merging per-group sketches equals sketching the whole dataset directly") {
    val merged = Sketches.hllMerge(
      Sketches.hllDistinct(events, "event_type", "user_id"))
      .head.getLong(0)
    val direct = events
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(12))))
      .head.getLong(0)
    merged shouldBe direct
  }

  test("estimates are insertion-order and partitioning independent") {
    val a = Sketches.hllDistinct(events, "event_type", "user_id")
      .select($"event_type", $"approx_distinct").collect().map(_.toSeq).toSeq
    val b = Sketches.hllDistinct(
        events.repartition(17, $"user_id"), "event_type", "user_id")
      .select($"event_type", $"approx_distinct").collect().map(_.toSeq).toSeq
    val c = Sketches.hllDistinct(
        events.orderBy($"ts".desc), "event_type", "user_id")
      .select($"event_type", $"approx_distinct").collect().map(_.toSeq).toSeq
    a shouldBe b
    a shouldBe c
  }
}
