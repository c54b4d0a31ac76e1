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
}
