package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The co-located-join lever from SCALE.md: tables bucketed on the join
  * key join WITHOUT any shuffle exchange — at 100 TB this turns the
  * recurring fact⋈dim shuffle (the single largest cost of a repeated
  * analytics workload) into local per-bucket merges. Local proof: the
  * executed plan of a bucketed join contains no Exchange at all.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key tables join with zero shuffle exchanges") {
    val wh = Files.createTempDirectory("graft_bucketed").toString
    table("orders").write.format("parquet")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    table("customer").write.format("parquet")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_b").saveAsTable("customer_b")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the merge-join path: broadcast would hide the shuffle question.
      // AQE off so the executed plan prints as one plain tree (its stage
      // wrappers and "Initial Plan" dump would defeat the string asserts).
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      val rows = joined.collect() // executes; AQE finalizes the plan
      rows.map(_.getLong(1)).sum shouldBe table("orders").count()

      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      // the join itself reads co-located buckets: the ONLY exchange left is
      // the one-row aggregation shuffle after the join, never a join-input
      // repartition of either table
      val joinSubtree = plan.substring(plan.indexOf("SortMergeJoin"))
      joinSubtree should not include "Exchange"

      // and the unbucketed twin DOES shuffle both join inputs — the lever is real
      val plain = table("orders")
        .join(table("customer"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      plain.collect()
      val plainSub = plain.queryExecution.executedPlan.toString
      plainSub.substring(plainSub.indexOf("SortMergeJoin"))
        .split("\n").count(_.contains("Exchange hashpartitioning")) should be >= 2
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
