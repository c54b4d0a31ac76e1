package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salting correctness: the skew-dispersal rewrites must be result-
  * equivalent to their plain formulations (only shuffle layout differs).
  */
class SkewSpec extends SparkSpec {
  import graft.implicits._

  test("saltedJoin equals the plain join on a degenerate 3-value key") {
    val big = table("lineitem")
      .select($"l_returnflag".as("flag"), $"l_orderkey", $"l_quantity")
    val small = table("lineitem").select($"l_returnflag".as("flag")).distinct()
      .withColumn("code", concat(lit("F-"), $"flag"))
    val plain = big.join(small, "flag")
    val salted = Skew.saltedJoin(big, small, "flag", 8)
    salted.count() shouldBe plain.count()
    salted.except(plain).count() shouldBe 0
    plain.except(salted).count() shouldBe 0
  }

  test("saltedDistinctCount equals countDistinct per group") {
    val want = table("events").groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_distinct"))
    val got = Skew.saltedDistinctCount(table("events"), "event_type", "user_id", 16)
    got.count() shouldBe want.count()
    got.except(want).count() shouldBe 0
  }

  test("aqeSkewJoin: OptimizeSkewedJoin splits the hot partition under local tuning") {
    // 99% of a 200k-row side lands on key 1 -> one ~multi-MB shuffle
    // partition, far beyond the tuned 128 KiB threshold
    val big = spark.range(0, 200000).select(
      when($"id" % 100 =!= 0, lit(1L)).otherwise(pmod($"id", lit(50L))).as("k"),
      $"id".as("v"))
    val small = spark.range(0, 50).select($"id".as("k"), ($"id" * 10).as("w"))
    // sum(v) keeps a non-degenerate payload in the shuffle (an
    // all-constant column would compress below the skew threshold)
    val joined = Skew.aqeSkewJoin(big, small, "k")
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("sv"))
    val (rows, executed) = Skew.withConfs(spark, Skew.localSkewTuning: _*) {
      val r = joined.collect()
      (r, joined.queryExecution.executedPlan.toString.split("== Initial Plan ==").head)
    }
    executed should include("skew=true")
    executed should include("SortMergeJoin")
    // splitting is invisible to results: the hot key keeps every row
    rows.map(_.getLong(1)).sum shouldBe 200000L
    rows.find(_.getLong(0) == 1L).get.getLong(1) shouldBe 198000L
  }

  test("withConfs restores previous values and unsets fresh keys") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val before = spark.conf.get(key)
    Skew.withConfs(spark, key -> "-1", "spark.graft.test.novel" -> "x") {
      spark.conf.get(key) shouldBe "-1"
      spark.conf.get("spark.graft.test.novel") shouldBe "x"
    }
    spark.conf.get(key) shouldBe before
    spark.conf.getOption("spark.graft.test.novel") shouldBe None
  }
}
