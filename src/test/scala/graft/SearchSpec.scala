package graft

import graft.operators.Search

class SearchSpec extends SparkSpec {
  import spark.implicits._

  // tf: d1(spark=2, join=1), d2(spark=1, merge=2), d3(join=1, merge=1),
  // d4 has no query term and must not appear in any result
  private def corpus = Seq(
    (1L, "spark spark join table"),
    (2L, "spark merge merge row"),
    (3L, "join merge filter"),
    (4L, "window sort order")
  ).toDF("doc_id", "text")

  test("keywordSearch: integer tf-idf scores, rank and tiebreak") {
    val out = Search.keywordSearch(corpus, Seq("spark", "join", "merge"), 10,
      scale = 12L).collect()
    // df: spark=2, join=2, merge=2 → idf = 12/2 = 6 each
    // d1 = 2*6 + 1*6 = 18, d2 = 1*6 + 2*6 = 18, d3 = 1*6 + 1*6 = 12
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) shouldBe
      Array((1L, 2L, 18L), (2L, 2L, 18L), (3L, 2L, 12L))
  }

  test("keywordSearch: rarer terms weigh more (integer idf)") {
    val c = Seq(
      (1L, "common rare"),
      (2L, "common x"),
      (3L, "common y"),
      (4L, "common z")
    ).toDF("doc_id", "text")
    // df: common=4, rare=1, scale=100 → idf(common)=25, idf(rare)=100
    val out = Search.keywordSearch(c, Seq("common", "rare"), 10, scale = 100L)
      .collect()
    out.head.getLong(0) shouldBe 1L
    out.head.getLong(2) shouldBe 125L
    out.tail.map(_.getLong(2)).toSet shouldBe Set(25L)
  }

  test("keywordSearch: terms are case-folded and k caps the result") {
    val out = Search.keywordSearch(corpus, Seq("SPARK"), 1, scale = 10L).collect()
    out.map(_.getLong(0)) shouldBe Array(1L) // tf 2 beats tf 1
  }

  test("bm25Search matches a reference computation on a hand corpus") {
    val terms = Seq("spark", "merge")
    val out = Search.bm25Search(corpus, terms, 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap

    // reference BM25 computed directly from the same definitions
    val docs = Map(1L -> "spark spark join table", 2L -> "spark merge merge row",
                   3L -> "join merge filter", 4L -> "window sort order")
    val nDocs = docs.size.toDouble
    val avgdl = docs.values.map(_.split("\\s+").length).sum / nDocs
    val dfT = terms.map(t => t -> docs.values.count(_.split("\\s+").contains(t)).toDouble).toMap
    def score(text: String): Double = {
      val toks = text.split("\\s+")
      terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) 0.0
        else {
          val idf = math.log(1.0 + (nDocs - dfT(t) + 0.5) / (dfT(t) + 0.5))
          idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * toks.length / avgdl))
        }
      }.sum
    }
    for ((id, got) <- out)
      got shouldBe (score(docs(id)) +- 1e-6) // engine rounds to 6 decimals
    // d4 contains no query term: absent, not zero-scored
    out.keySet shouldBe Set(1L, 2L, 3L)
  }

  test("keywordSearch requires a non-empty term list") {
    an[IllegalArgumentException] should be thrownBy
      Search.keywordSearch(corpus, Nil, 5)
  }

  test("prefilter is a superset, matching stays token-exact: substrings don't score") {
    val c = Seq(
      (1L, "sparkly things glitter"),   // 'spark' only as a substring
      (2L, "spark engine"),             // exact token
      (3L, "no relation here")
    ).toDF("doc_id", "text")
    // doc 1 passes the rlike prefilter but must NOT match (token != term)
    val out = Search.keywordSearch(c, Seq("spark"), 10).collect()
    out.map(_.getLong(0)) shouldBe Array(2L)
  }

  test("regex metacharacters in terms are treated literally") {
    val c = Seq(
      (1L, "c++ is compiled"),
      (2L, "cxx is not matched"), // 'c++' as a naive regex would match 'c'
      (3L, "count the c")
    ).toDF("doc_id", "text")
    val out = Search.keywordSearch(c, Seq("c++"), 10).collect()
    out.map(_.getLong(0)) shouldBe Array(1L)
  }

  test("bm25ExactSearch: independent integer recompute + BM25 ranking laws") {
    val c = Seq(
      (1L, "apple banana apple"),
      (2L, "apple"),
      (3L, "banana banana banana banana"),
      (4L, "cherry cherry cherry")
    ).toDF("doc_id", "text")
    val out = Search.bm25ExactSearch(c, Seq("apple", "banana"), 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the staged integer formula replayed independently in Scala
    val dls = Map(1L -> 3L, 2L -> 1L, 3L -> 4L, 4L -> 3L)
    val nDocs = 4L; val sumDl = 11L
    val avgdlMilli = 1000L * sumDl / nDocs
    def w(tf: Long, dl: Long, df: Long): Long = {
      val bpart = 250L + 750000L * dl / avgdlMilli
      val den = 1000L * tf + 1200L * bpart / 1000L
      val tfnorm = 2200L * tf * 1000000L / den
      val idf = 1000L * (2 * nDocs - 2 * df + 1) / (2 * df + 1)
      idf * tfnorm / 1000L
    }
    out(1L) shouldBe ((2L, w(2, dls(1L), 2) + w(1, dls(1L), 2)))
    out(2L) shouldBe ((1L, w(1, dls(2L), 2)))
    out(3L) shouldBe ((1L, w(4, dls(3L), 2)))
    out.contains(4L) shouldBe false // no query term -> never a candidate
    // BM25's two laws on the fixture: more matched terms beat fewer at
    // comparable length, and tf saturates (doc 3's 4x banana does not
    // quadruple doc 2's single-term score)
    out(1L)._2 should be > out(3L)._2
    out(3L)._2 should be < 4L * out(2L)._2
  }
}
