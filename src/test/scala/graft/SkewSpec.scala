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
    val (rows, executed) = Skew.withConfs(spark, Skew.localSkewTuning: _*) { s2 =>
      val j2 = Skew.rebind(joined, s2)
      val r = j2.collect()
      (r, j2.queryExecution.executedPlan.toString.split("== Initial Plan ==").head)
    }
    executed should include("skew=true")
    executed should include("SortMergeJoin")
    // splitting is invisible to results: the hot key keeps every row
    rows.map(_.getLong(1)).sum shouldBe 200000L
    rows.find(_.getLong(0) == 1L).get.getLong(1) shouldBe 198000L
  }

  test("skewReport: hand-computed ppm, flag threshold, salt recommendation") {
    import spark.implicits.{localSeqToDatasetHolder, newLongEncoder}
    // 10 keys: key 0 has 82 rows, keys 1..9 have 2 each -> total 100,
    // mean 10; key 0 is 8.2x the mean -> flagged at factor 4 with
    // salt_rec = ceil(82*10/100) = ceil(8.2) = 9
    val rows = Seq.fill(82)(0L) ++ (1L to 9L).flatMap(k => Seq(k, k))
    val df = rows.toDS().toDF("k")
    val out = Skew.skewReport(df, "k", flagFactor = 4L, minCount = 2L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(4), r.getBoolean(5), r.getLong(6))).toMap
    out(0L) shouldBe ((82L, 820000L, true, 9L))   // 82/100 = 820000 ppm
    out(5L) shouldBe ((2L, 20000L, false, 1L))
    out.size shouldBe 10
    // exactly-integer ceil boundary: 80 rows, 10 keys, total 98 ->
    // 80*10/98 = 8.16 -> 9; and a key below minCount is not reported
    val df2 = (Seq.fill(80)(0L) ++ (1L to 8L).flatMap(k => Seq(k, k)) ++ Seq(99L)).toDS().toDF("k")
    val out2 = Skew.skewReport(df2, "k", 4L, 2L).collect().map(_.getLong(0))
    out2 should not contain 99L
  }

  test("withConfs isolates overrides to the cloned session; the parent never observes them") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val before = spark.conf.get(key)
    Skew.withConfs(spark, key -> "-1", "spark.graft.test.novel" -> "x") { s2 =>
      s2.conf.get(key) shouldBe "-1"
      s2.conf.get("spark.graft.test.novel") shouldBe "x"
      // a query planned CONCURRENTLY on the parent session sees the
      // parent's conf, not the overrides — the foot-gun the cloned
      // session removes
      spark.conf.get(key) shouldBe before
      spark.conf.getOption("spark.graft.test.novel") shouldBe None
    }
    spark.conf.get(key) shouldBe before
    spark.conf.getOption("spark.graft.test.novel") shouldBe None
  }

  test("rebind executes a parent-built plan under the clone's conf and drops its scaffolding view") {
    val df = spark.range(0, 10).toDF("id")
    val out = Skew.withConfs(spark, "spark.sql.shuffle.partitions" -> "3") { s2 =>
      val r = Skew.rebind(df, s2)
      r.sparkSession.conf.get("spark.sql.shuffle.partitions") shouldBe "3"
      r.groupBy($"id" % 2).count().collect().map(_.getLong(1)).sum
    }
    out shouldBe 10L
    // the global temp view used for the re-bind does not leak
    spark.catalog.listTables("global_temp").collect()
      .map(_.name).exists(_.startsWith("graft_rebind_")) shouldBe false
  }
}
