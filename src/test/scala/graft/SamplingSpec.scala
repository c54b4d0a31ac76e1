package graft

import graft.operators.Sampling

/** Reproducible sampling + token-budget sharding (pipeline plumbing). */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("thresholdHex maps fractions onto the 128-bit hex scale") {
    Sampling.thresholdHex(0.0) shouldBe "0" * 32
    Sampling.thresholdHex(1.0) shouldBe "f" * 32
    Sampling.thresholdHex(0.5) should startWith("80")
    Sampling.thresholdHex(1.0 / 16) should startWith("10")
  }

  test("hash sampling is deterministic, partition-independent, and near the target rate") {
    val docs = table("documents")
    val a = Sampling.byContentHash(docs, 0.2).collect()
    val b = Sampling.byContentHash(docs.repartition(7), 0.2).collect()
    a.map(_.getLong(0)).toSeq shouldBe b.map(_.getLong(0)).toSeq.sorted
    val rate = a.length.toDouble / docs.count()
    rate shouldBe 0.2 +- 0.08 // md5 is uniform; fixture is 500 docs
  }

  test("sampling at a larger fraction is a superset of the smaller one") {
    val docs = table("documents")
    val small = Sampling.byContentHash(docs, 0.1).select($"doc_id").as[Long].collect().toSet
    val large = Sampling.byContentHash(docs, 0.3).select($"doc_id").as[Long].collect().toSet
    small.subsetOf(large) shouldBe true
  }

  test("token shards: exclusive prefix sum over doc_id order, budget respected") {
    val docs = Seq(
      (1L, "w", "a b c"),        // 3 tokens, cum_before 0  -> shard 0
      (2L, "w", "d e f g"),      // 4 tokens, cum_before 3  -> shard 0
      (3L, "w", "h i"),          // 2 tokens, cum_before 7  -> shard 1
      (4L, "w", "j k l m n o"),  // 6 tokens, cum_before 9  -> shard 1
      (5L, "w", "p"))            // 1 token,  cum_before 15 -> shard 3
      .toDF("doc_id", "source", "text")
    val out = Sampling.tokenShards(docs, budgetTokens = 5L).collect()
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) shouldBe Array(
      (1L, 3L, 0L), (2L, 4L, 0L), (3L, 2L, 1L), (4L, 6L, 1L), (5L, 1L, 3L))
  }

  test("distributed prefix sum equals the single-window formulation on the fixture") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = table("documents")
    val got = Sampling.tokenShards(docs, 10000L, partitions = 8)
    val w = Window.orderBy($"doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val want = docs
      .select($"doc_id",
        org.apache.spark.sql.functions.size(
          regexp_extract_all($"text", lit("\\S+"), lit(0))).cast("long").as("n_tokens"))
      .withColumn("shard_id",
        floor(coalesce(sum($"n_tokens").over(w), lit(0L)) / lit(10000L)).cast("long"))
      .orderBy($"doc_id")
    got.except(want).count() shouldBe 0
    want.except(got).count() shouldBe 0
  }

  test("a single over-budget document occupies its own shard") {
    val docs = Seq(
      (1L, "w", Seq.fill(12)("t").mkString(" ")), // 12 > budget 5
      (2L, "w", "a b"))
      .toDF("doc_id", "source", "text")
    val out = Sampling.tokenShards(docs, 5L).collect()
    out.map(r => (r.getLong(0), r.getLong(2))) shouldBe Array((1L, 0L), (2L, 2L))
  }
}
