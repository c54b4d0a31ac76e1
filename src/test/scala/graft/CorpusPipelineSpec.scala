package graft

import graft.operators.CorpusPipeline

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  // 20-token texts that pass every quality rule (mean word length 4,
  // 'that' supplies the stopword hits, high distinct ratio)
  private val goodA = "that wind rock tree fish bird moon star lake sand " +
    "that hill wolf bear frog deer hawk dove that crab"
  private val goodC = "this that when then lake pond hill dale moon star " +
    "wind rain fish bird tree rock sand dust that mist"

  private def corpus = Seq(
    (1L, goodA, "w"),
    (2L, goodA, "w"),          // exact duplicate of 1 -> dropped at dedup
    (3L, goodC, "w"),          // contained in the benchmark -> decontaminated
    (4L, "short text", "w")    // fails the quality filter
  ).toDF("doc_id", "text", "source")

  // the benchmark doc starts with goodC, so every 5-gram of doc 3 occurs
  // in it (contamination 1.0); goodA shares no 5-gram with it
  private def benchmark = Seq(
    (10L, goodC + " extra words appended here now", "b")
  ).toDF("doc_id", "text", "source")

  test("attritionReport counts the funnel stage by stage") {
    val report = CorpusPipeline.attritionReport(
      corpus, benchmark, maxContamination = 0.5, sampleFraction = 1.0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    report shouldBe Array(
      (0L, "input", 4L),
      (1L, "quality_filter", 3L),
      (2L, "exact_dedup", 2L),
      (3L, "decontaminate", 1L),
      (4L, "hash_sample", 1L))
  }

  test("refined keeps the smallest-id copy and drops contaminated docs") {
    val kept = CorpusPipeline.refined(
      corpus, benchmark, maxContamination = 0.5, sampleFraction = 1.0)
      .select($"doc_id").as[Long].collect().sorted
    kept shouldBe Array(1L)
  }

  test("stageFlags one-pass form agrees with the staged chain doc by doc") {
    val flags = CorpusPipeline.stageFlags(corpus, benchmark,
        maxContamination = 0.5, sampleFraction = 1.0).collect()
      .map(r => r.getLong(0) ->
        Seq(r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))).toMap
    val surviving = CorpusPipeline.stages(corpus, benchmark,
        maxContamination = 0.5, sampleFraction = 1.0)
      .map(_._2.select($"doc_id").as[Long].collect().toSet)
    flags.keySet shouldBe surviving(0)
    flags.foreach { case (id, fs) =>
      fs shouldBe (1 to 4).map(surviving(_).contains(id))
    }
  }

  test("sampleFraction 0 empties the final stage but not the earlier ones") {
    val report = CorpusPipeline.attritionReport(
      corpus, benchmark, maxContamination = 0.5, sampleFraction = 0.0)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    report("decontaminate") shouldBe 1L
    report("hash_sample") shouldBe 0L
  }

  test("dataCard: rollup levels, grouping markers, shares sum to 1 per level") {
    val docs = Seq(
      (1L, "a b c", "en", "s1", 5L),
      (2L, "d e", "en", "s1", 3L),
      (3L, "f g h i", "fr", "s1", 7L),
      (4L, "j", "en", "s2", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val card = CorpusPipeline.dataCard(docs).collect()

    // grand total row first (g_source=1, g_lang=1), NULL dims
    val total = card.head
    total.getInt(2) shouldBe 1
    total.getInt(3) shouldBe 1
    total.isNullAt(0) shouldBe true
    total.getLong(4) shouldBe 4L       // n_docs
    total.getLong(5) shouldBe 10L      // n_tokens: 3+2+4+1
    total.getLong(6) shouldBe 16L      // n_chars
    total.getDouble(7) shouldBe 1.0    // token_share of the whole corpus

    // per-source level: g_lang=1, g_source=0
    val perSource = card.filter(r => r.getInt(2) == 0 && r.getInt(3) == 1)
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    perSource shouldBe Map("s1" -> 9L, "s2" -> 1L)

    // leaf level (source, lang)
    val leaves = card.filter(r => r.getInt(2) == 0 && r.getInt(3) == 0)
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    leaves shouldBe Map(("s1", "en") -> 2L, ("s1", "fr") -> 1L, ("s2", "en") -> 1L)

    // shares within each level sum to 1 (IEEE sums of exact ratios)
    val leafShare = card.filter(r => r.getInt(2) == 0 && r.getInt(3) == 0)
      .map(_.getDouble(7)).sum
    leafShare shouldBe (1.0 +- 1e-12)
  }
}
