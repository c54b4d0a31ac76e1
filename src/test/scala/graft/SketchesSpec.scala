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

  test("theta estimates are exact below sketch capacity and order/partition independent") {
    // fixture cardinalities (~150 users/type at sf0.001) sit far below the
    // nominal capacity, so the sketch is in exact mode: estimate == exact
    val approx = Sketches.thetaDistinct(events, "event_type", "user_id")
      .select($"event_type", $"approx_distinct".cast("long"))
      .as[(String, Long)].collect().toMap
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    approx shouldBe exact
    val reparted = Sketches.thetaDistinct(
        events.repartition(17, $"user_id").orderBy($"ts".desc),
        "event_type", "user_id")
      .select($"event_type", $"approx_distinct".cast("long"))
      .as[(String, Long)].collect().toMap
    reparted shouldBe approx
  }

  test("theta overlap recovers controlled intersections from sketches alone") {
    // groups with engineered overlaps: a∩b = 50, a∩c = 0, b∩c = 25
    val rows =
      (1 to 100).map(i => ("a", i.toLong)) ++
      (51 to 150).map(i => ("b", i.toLong)) ++
      (200 to 249).map(i => ("c", i.toLong)) ++
      (126 to 150).map(i => ("c", i.toLong))
    val df = rows.toDF("grp", "uid")
    val got = Sketches.thetaOverlap(df, "grp", "uid")
      .select($"group_a", $"group_b", $"approx_overlap".cast("long"))
      .as[(String, String, Long)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    got shouldBe Map(("a", "b") -> 50L, ("a", "c") -> 0L, ("b", "c") -> 25L)
  }

  test("theta overlap on the fixture matches the exact distinct-join answer") {
    val got = Sketches.thetaOverlap(events, "event_type", "user_id")
      .select($"group_a", $"group_b", $"approx_overlap".cast("long"))
      .as[(String, String, Long)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    val users = events.select($"event_type", $"user_id").distinct()
    val nonZero = users.as("x").join(users.as("y"),
        $"x.user_id" === $"y.user_id" && $"x.event_type" < $"y.event_type")
      .groupBy($"x.event_type".as("ga"), $"y.event_type".as("gb"))
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    // thetaOverlap emits EVERY unordered pair (zero-overlap included);
    // complete the inner-join answer with explicit zeros
    val types = events.select($"event_type").distinct().as[String].collect().sorted
    val exact = (for {
      a <- types; b <- types if a < b
    } yield (a, b) -> nonZero.getOrElse((a, b), 0L)).toMap
    got shouldBe exact
  }

  test("KLL quantiles land within the rank-error bound of the exact distribution") {
    val got = Sketches.kllQuantiles(events, "event_type", "value",
      Seq(0.1, 0.5, 0.9)).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val byType = events.select($"event_type", $"value")
      .as[(String, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    got.keySet.map(_._1) shouldBe byType.keySet
    for (((tpe, q), est) <- got) {
      val xs = byType(tpe)
      // the realized rank of the estimate must sit near q (k=200 → ~1.65%
      // normalized rank error; 5% absorbs the randomized compaction)
      val rank = xs.count(_ <= est).toDouble / xs.length
      math.abs(rank - q) should be < 0.05
    }
  }

  test("KLL merge of half-sketches answers like the whole-data sketch (mergeability)") {
    val lo = events.where($"event_id" % 2 === 0)
    val hi = events.where($"event_id" % 2 =!= 0)
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.agg(kll_sketch_agg_double($"value".cast("double"), lit(200)).as("s"))
    val merged = sk(lo).crossJoin(sk(hi).withColumnRenamed("s", "s2"))
      .select(kll_sketch_get_quantile_double(
        kll_sketch_merge_double($"s", $"s2"), lit(0.5)).as("m"))
      .head.getDouble(0)
    val all = events.select($"value".cast("double")).as[Double].collect().sorted
    val rank = all.count(_ <= merged).toDouble / all.length
    math.abs(rank - 0.5) should be < 0.05
  }

  test("Misra-Gries is exact (and partition-invariant) when distinct items fit the counters") {
    val rows = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(7)("c")
    for (parts <- Seq(1, 7)) {
      val df = rows.map(("g", _)).toDF("grp", "item").repartition(parts)
      val out = Sketches.freqItems(df, "grp", "item", k = 4)
        .select($"item", $"est_count").as[(String, Long)].collect().toMap
      out shouldBe Map("a" -> 50L, "b" -> 30L, "c" -> 7L)
    }
  }

  test("Misra-Gries guarantee: heavy hitters survive, estimates never overcount, undercount <= n/(k+1)") {
    // n = 112, k = 4 -> threshold n/(k+1) = 22.4: "a" (50) and "b" (30)
    // MUST be present under any partitioning; "c" (12) and the singletons
    // may or may not survive, but no estimate may exceed its true count
    // or undershoot it by more than the threshold
    val rows = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(12)("c") ++
      (0 until 20).map(i => s"rare$i")
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = rows.size.toDouble / 5
    for (parts <- Seq(1, 3, 16)) {
      val df = rows.map(("g", _)).toDF("grp", "item").repartition(parts)
      val out = Sketches.freqItems(df, "grp", "item", k = 4)
        .select($"item", $"est_count").as[(String, Long)].collect().toMap
      out.size should be <= 4
      out.keySet should contain allOf ("a", "b")
      for ((item, est) <- out) {
        est should be <= truth(item)
        (truth(item) - est).toDouble should be <= bound
      }
    }
  }

  test("Misra-Gries skips nulls and groups independently") {
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", null), ("g2", "y"))
      .toDF("grp", "item")
    val out = Sketches.freqItems(df, "grp", "item", k = 2)
      .as[(String, String, Long)].collect().toSet
    out shouldBe Set(("g1", "x", 2L), ("g2", "y", 1L))
  }

  test("bitmapDistinct: exact per group, __all__ OR-merge dedupes cross-group overlap") {
    // ids straddle bucket boundaries (63|64) and repeat within AND
    // across groups; user 64 appears in both groups so the sum of
    // per-group distincts (3+3=6) exceeds the true global 5
    val df = Seq(
      ("a", 1L), ("a", 1L), ("a", 63L), ("a", 64L),
      ("b", 64L), ("b", 65L), ("b", 130L)).toDF("grp", "uid")
    for (parts <- Seq(1, 7)) {
      val out = Sketches.bitmapDistinct(df.repartition(parts), "grp", "uid")
        .as[(String, Long)].collect().toMap
      out shouldBe Map("a" -> 3L, "b" -> 3L, "__all__" -> 5L)
    }
  }

  test("bitmapDistinct matches countDistinct on the events table, including the roll-up") {
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap +
      ("__all__" -> events.select(countDistinct($"user_id")).as[Long].head)
    val out = Sketches.bitmapDistinct(events, "event_type", "user_id")
      .as[(String, Long)].collect().toMap
    out shouldBe exact
  }
}
