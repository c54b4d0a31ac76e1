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

  test("dsirSelect: budget prefix-cut in importance order, flags for all docs") {
    // target is pure "x y"; corpus docs share bigram mass with it to
    // different degrees, so importance strictly orders 1 > 2 > 3
    val corpus = Seq(
      (1L, "x y x y x y"),          // 5 bigrams, all target-like
      (2L, "x y a b c d"),          // 1 of 5 bigrams target-like
      (3L, "p q r s t u v w"))      // none
      .toDF("doc_id", "text")
    val target = Seq((10L, "x y x y")).toDF("doc_id", "text")

    val out = Sampling.dsirSelect(corpus, target, tokenBudget = 12L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getBoolean(4))).toMap

    out.keySet shouldBe Set(1L, 2L, 3L)           // every doc gets a flag
    // rank order 1, 2, 3 → cum_before 0, 6, 12
    out(1L) shouldBe ((6L, 0L, true))             // 0 + 6 <= 12
    out(2L) shouldBe ((6L, 6L, true))             // 6 + 6 <= 12
    out(3L) shouldBe ((8L, 12L, false))           // 12 + 8 > 12
  }

  test("dsirSelect prefix sum is partition-count independent") {
    val docs = table("documents")
    val corpus = docs.where($"doc_id" % 10 =!= 0)
    val target = docs.where($"doc_id" % 10 === 0)
    val a = Sampling.dsirSelect(corpus, target, 3000L, partitions = 2)
      .collect().map(_.toSeq).toSeq
    val b = Sampling.dsirSelect(corpus, target, 3000L, partitions = 16)
      .collect().map(_.toSeq).toSeq
    a shouldBe b
    // the budget actually bites on the fixture: both selected and
    // rejected docs exist
    a.map(_(4).asInstanceOf[Boolean]).toSet shouldBe Set(true, false)
  }

  test("domainCap keeps at most cap docs per source with consecutive hash-order ranks") {
    val docs = table("documents")
    val out = Sampling.domainCap(docs, 12).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3).toInt))
    val bySource = out.groupBy(_._2)
    // every source capped; ranks are 1..k; priority ascends with rank
    bySource.values.foreach { rows =>
      rows.length should be <= 12
      rows.map(_._4).sorted shouldBe (1 to rows.length).toArray
      rows.sortBy(_._4).map(_._3) shouldBe rows.map(_._3).sorted
    }
    // the cap actually bites on the fixture (some source has > cap docs)
    val counts = docs.groupBy($"source").count().as[(String, Long)].collect().toMap
    counts.values.max should be > 12L
    bySource.map { case (s, rows) => s -> rows.length.toLong } shouldBe
      counts.map { case (s, n) => s -> math.min(n, 12L) }
  }

  test("domainCap verdicts are content-defined: partition-count independent") {
    val docs = table("documents")
    val a = Sampling.domainCap(docs, 12).collect().map(_.toSeq).toSeq
    val b = Sampling.domainCap(docs.repartition(7), 12).collect().map(_.toSeq).toSeq
    a shouldBe b
  }

  test("trainValTestSplit: exhaustive, exclusive, near the asked fractions") {
    val docs = table("documents")
    val out = Sampling.trainValTestSplit(docs, 0.1, 0.2)
    out.count() shouldBe docs.count()
    val byLabel = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLabel.keySet shouldBe Set("train", "val", "test")
    val n = docs.count().toDouble
    byLabel("test") / n shouldBe 0.1 +- 0.05
    byLabel("val") / n shouldBe 0.2 +- 0.06
  }

  test("trainValTestSplit is content-defined: identical text always lands in one split") {
    import spark.implicits._
    val d = Seq((1L, "a", "same body"), (2L, "b", "same body"), (3L, "a", "other body"))
      .toDF("doc_id", "source", "text")
    val out = Sampling.trainValTestSplit(d, 0.4, 0.3).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    out(1L) shouldBe out(2L)
    // and membership survives arbitrary repartitioning
    Sampling.trainValTestSplit(d.repartition(5), 0.4, 0.3).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap shouldBe out
  }

  test("packSequences: chunk manifest with straddles, empty docs dropped") {
    // seqLen 4; doc token spans: 1→[0,3), 2→[3,5) STRADDLES the 4-cut,
    // 3 is empty (no chunk), 4→[5,10) straddles the 8-cut and ends the
    // final partial chunk
    val d = Seq(
      (1L, "w", "a b c"),
      (2L, "w", "d e"),
      (3L, "w", ""),
      (4L, "w", "f g h i j"))
      .toDF("doc_id", "source", "text")
    val out = Sampling.packSequences(d, seqLen = 4L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out shouldBe Array(
      (0L, 2L, 2L, 4L),  // docs 1+2 touch, both start here, full 4 tokens
      (1L, 2L, 1L, 4L),  // doc 2's tail + doc 4's head, only 4 starts
      (2L, 1L, 0L, 2L))  // doc 4's tail: partial final chunk
  }

  test("packSequences conserves tokens and fills every non-final chunk exactly") {
    import org.apache.spark.sql.functions._
    val docs = table("documents")
    val out = Sampling.packSequences(docs, 256L).collect()
    val total = out.map(_.getLong(3)).sum
    val want = docs.select(
      sum(org.apache.spark.sql.functions.size(
        regexp_extract_all($"text", lit("\\S+"), lit(0))).cast("long")))
      .head.getLong(0)
    total shouldBe want
    // every chunk but the last holds exactly seqLen tokens
    out.dropRight(1).foreach(_.getLong(3) shouldBe 256L)
    out.last.getLong(3) should be <= 256L
    // chunk ids are dense from 0
    out.map(_.getLong(0)).toSeq shouldBe (0L until out.length.toLong)
  }

  test("packSequences manifest is partition-count independent") {
    val docs = table("documents")
    val a = Sampling.packSequences(docs, 256L, partitions = 2).collect().map(_.toSeq).toSeq
    val b = Sampling.packSequences(docs, 256L, partitions = 16).collect().map(_.toSeq).toSeq
    a shouldBe b
  }

  test("temperatureMix: α=1/2 weights are exact on perfect-square token masses") {
    val d = Seq(
      (1L, "big", Seq.fill(8)("t").mkString(" ")),
      (2L, "big", Seq.fill(8)("t").mkString(" ")),   // 16 tokens → √16 = 4
      (3L, "small", "a b c d"))                      //  4 tokens → √4  = 2
      .toDF("doc_id", "source", "text")
    val out = Sampling.temperatureMix(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getAs[Double]("rel_weight"), r.getAs[Double]("upsample"))).toMap
    out("big") shouldBe ((2L, 16L, 1.0, 1.0))
    out("small") shouldBe ((1L, 4L, 0.5, 2.0))
  }

  test("temperatureMix drops zero-token domains instead of emitting infinite upsample") {
    val d = Seq((1L, "full", "a b c d"), (2L, "empty", "   "))
      .toDF("doc_id", "source", "text")
    val out = Sampling.temperatureMix(d).collect()
    out.map(_.getString(0)).toSeq shouldBe Seq("full")
  }

  test("temperatureMix on the fixture: weights in (0,1], largest domain is the anchor") {
    val out = Sampling.temperatureMix(table("documents")).collect()
    val rel = out.map(r => r.getLong(2) -> r.getAs[Double]("rel_weight"))
    all(rel.map(_._2)) should (be > 0.0 and be <= 1.0)
    // exactly the max-token domain(s) sit at rel_weight 1
    val maxTok = rel.map(_._1).max
    rel.filter(_._2 == 1.0).map(_._1) should contain(maxTok)
    // upsample is the exact inverse
    out.foreach { r =>
      r.getAs[Double]("upsample") * r.getAs[Double]("rel_weight") shouldBe 1.0 +- 1e-12
    }
  }
}
