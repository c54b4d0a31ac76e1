package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.toDF("doc_id", "text", "lang", "source")

  test("tokenCounts: whitespace and BPE-ish segmentation") {
    val d = docs((1L, "Hello, world!", "en", "w"))
    val out = TextAnalysis.tokenCounts(d).as[(Long, Long, Long)].head()
    // ws: ["Hello,", "world!"]; bpe-ish: Hell|o|,|worl|d|! = 6
    out shouldBe ((1L, 2L, 6L))
  }

  test("stats computes token counts and ratios") {
    val d = docs((1L, "one two three two one", "en", "w"))
    val r = TextAnalysis.stats(d).collect()(0)
    r.getAs[Long]("n_tokens") shouldBe 5L
    r.getAs[Long]("n_distinct_tokens") shouldBe 3L
    r.getAs[Double]("avg_token_len") shouldBe 3.4 // 17 chars / 5 tokens
    r.getAs[Double]("distinct_ratio") shouldBe 0.6
  }

  test("quality score rewards a clean mid-length document") {
    val good = (1 to 30).map(i => s"word$i").mkString(" ")
    val d = docs((1L, good, "en", "w"))
    TextAnalysis.stats(d).collect()(0).getAs[Double]("quality_score") shouldBe 1.0
  }

  test("languageId predicts the dominant marker language") {
    val d = docs(
      (1L, "the cat and the dog is in that house for now", "en", "w"),
      (2L, "der Hund und die Katze ist nicht ein Problem mit", "de", "w"),
      (3L, "el perro y la casa es que los gatos de madrid", "es", "w"),
      (4L, "qqq zzz xxx", "und", "w"))
    val out = TextAnalysis.languageId(d).collect()
    out.map(_.getAs[String]("pred_lang")).toSeq shouldBe Seq("en", "de", "es", "und")
  }

  test("fingerprints are whitespace-normalization invariant") {
    val d = docs((1L, "Hello   world", "en", "w"), (2L, "hello world", "en", "w"))
    val f = TextAnalysis.fingerprints(d).as[(Long, Long)].collect().toMap
    f(1L) shouldBe f(2L)
  }
}
