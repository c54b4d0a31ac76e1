package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.toDF("doc_id", "text", "lang", "source")

  test("chunked: overlap windows tile the text; boundaries and empty doc exact") {
    val text = "a" * 10 // chunk 4, overlap 1 -> stride 3
    val d = docs((1L, text, "en", "w"), (2L, "", "en", "w"), (3L, "xy", "en", "w"))
    val out = TextAnalysis.chunked(d, 4, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // len 10: ceil((10-1)/3) = 3 chunks at offsets 0,3,6 -> lengths 4,4,4
    out.filter(_._1 == 1L) shouldBe Array((1L, 0L, 4L), (1L, 1L, 4L), (1L, 2L, 4L))
    // empty doc still yields its (empty) chunk row
    out.filter(_._1 == 2L) shouldBe Array((2L, 0L, 0L))
    out.filter(_._1 == 3L) shouldBe Array((3L, 0L, 2L))
    // consecutive chunks share exactly `overlap` characters
    val t2 = "0123456789abcdef"
    val chunks = TextAnalysis.chunked(docs((9L, t2, "en", "w")), 6, 2).collect()
    val starts = chunks.map(_.getLong(1) * 4).map(_.toInt)
    starts.sliding(2).foreach { case Array(a, b) =>
      t2.substring(a, a + 6).takeRight(2) shouldBe t2.substring(b, math.min(b + 6, t2.length)).take(2)
    }
  }

  test("tokenCounts: whitespace and BPE-ish segmentation") {
    val d = docs((1L, "Hello, world!", "en", "w"))
    val out = TextAnalysis.tokenCounts(d).as[(Long, Long, Long)].head()
    // ws: ["Hello,", "world!"]; bpe-ish: Hell|o|,|worl|d|! = 6
    out shouldBe ((1L, 2L, 6L))
  }

  test("adaptive tokenizer: an all-CJK doc no longer collapses to one token") {
    // whitespace-free text -> code-point tokens: n_tokens = char count,
    // distinct counts per character; the pre-fallback behavior was
    // n_tokens = 1, which silently skewed every downstream consumer
    val cjk = "一二三四一二" // 一二三四一二
    val r = TextAnalysis.stats(docs((1L, cjk, "zh", "w"))).collect()(0)
    r.getAs[Long]("n_tokens") shouldBe 6L
    r.getAs[Long]("n_distinct_tokens") shouldBe 4L
    r.getAs[Double]("avg_token_len") shouldBe 1.0
    // quality rules see the same tokens (t10 path)
    val q = TextAnalysis.qualityFilter(docs((1L, cjk, "zh", "w"))).collect()(0)
    q.getAs[Long]("n_tokens") shouldBe 6L
    // mixed corpus: whitespace-bearing text is bit-identical to the old
    // split — the fallback NEVER fires when any whitespace exists
    val r2 = TextAnalysis.stats(docs((2L, "a 一二 b", "zh", "w"))).collect()(0)
    r2.getAs[Long]("n_tokens") shouldBe 3L // ["a", "一二", "b"]
    // degenerate whitespace-free shapes keep the single-token contract
    TextAnalysis.stats(docs((3L, "x", "en", "w"))).collect()(0)
      .getAs[Long]("n_tokens") shouldBe 1L
  }

  test("cjkMapped: zh docs become whitespace-free CJK, others untouched") {
    val d = docs((1L, "spark data spark join", "zh", "w"), (2L, "spark data", "en", "w"))
    val out = TextAnalysis.cjkMapped(d).orderBy($"doc_id").collect()
    val zh = out(0).getAs[String]("text")
    zh.length shouldBe 4 // one CJK char per word
    zh.forall(c => c >= 0x4e00 && c < 0x5600) shouldBe true
    zh(0) shouldBe zh(2) // word identity -> character identity
    out(1).getAs[String]("text") shouldBe "spark data"
    // the twin corpus pairs each zh doc with its last-char-dropped copy
    val corpus = TextAnalysis.cjkNearDupCorpus(d).orderBy($"doc_id").collect()
    corpus.length shouldBe 3
    corpus(2).getAs[Long]("doc_id") shouldBe 1000001L
    corpus(2).getAs[String]("text") shouldBe zh.substring(0, 3)
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

  test("contaminationReport: overlap fraction against a benchmark set") {
    val bench = docs((100L, "the quick brown fox jumps over the lazy dog", "en", "w"))
    val corpus = docs(
      // contains the benchmark's "quick brown fox" trigram verbatim
      (1L, "a quick brown fox appeared in the garden today", "en", "w"),
      // shares no trigram with the benchmark
      (2L, "completely different words in every position here now", "en", "w"))
    val out = TextAnalysis.contaminationReport(corpus, bench, n = 3).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_grams"), r.getAs[Long]("n_matched"),
       r.getAs[Double]("contamination"))).toMap
    // EVERY corpus doc reports — a clean doc must say 0, not vanish
    // (the downstream filter keeps exactly the uncontaminated docs)
    byId.keySet shouldBe Set(1L, 2L)
    byId(1L) shouldBe ((7L, 1L, 1.0 / 7.0)) // 9 tokens → 7 trigrams; "quick brown fox" matches
    byId(2L) shouldBe ((6L, 0L, 0.0))
  }

  test("repetitionStats: duplicate and top-gram shares") {
    val d = docs(
      (1L, "spam spam spam spam spam", "en", "w"), // 4 bigrams, all identical
      (2L, "all words are unique here", "en", "w")) // 4 distinct bigrams
    val out = TextAnalysis.repetitionStats(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    out(1L).getAs[Long]("n_grams") shouldBe 4L
    out(1L).getAs[Long]("n_distinct") shouldBe 1L
    out(1L).getAs[Double]("dup_share") shouldBe 0.75
    out(1L).getAs[Double]("top_share") shouldBe 1.0
    out(2L).getAs[Double]("dup_share") shouldBe 0.0
    out(2L).getAs[Double]("top_share") shouldBe 0.25
  }

  test("importanceScores: target-heavy docs score above target-absent docs") {
    // corpus doc 1 repeats the target's bigram; doc 2 shares nothing.
    // Single-bucket masses are hand-computable: doc 1's grams all live in
    // buckets the target populates, doc 2's in buckets it doesn't.
    val corpus = Seq(
      (1L, "alpha beta alpha beta alpha beta", "en", "w"),
      (2L, "gamma delta gamma delta gamma delta", "en", "w"))
      .toDF("doc_id", "text", "lang", "source")
    val target = Seq((10L, "alpha beta alpha beta", "en", "w"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.importanceScores(corpus, target).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Long]("n_grams") shouldBe 5L
    out(2L).getAs[Long]("target_mass") shouldBe 0L
    out(2L).getAs[Double]("importance") shouldBe 0.0
    out(1L).getAs[Long]("target_mass") should be > 0L
    out(1L).getAs[Double]("importance") should be >
      out(2L).getAs[Double]("importance")
  }

  test("qualityFilter: each rule fires independently and keep is their conjunction") {
    val good = "that wind rock tree fish bird moon star lake sand " +
      "that hill wolf bear frog deer hawk dove that crab"
    val longWords = (1 to 20).map(i => f"verylongword$i%02d").mkString(" ")
    val symbols = Seq.fill(20)("####").mkString(" ")
    val repeated = Seq.fill(20)("that").mkString(" ")
    val d = Seq(
      (1L, good), (2L, "short text"), (3L, symbols), (4L, repeated), (5L, longWords)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityFilter(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    out(1L).getAs[Boolean]("keep") shouldBe true
    out(2L).getAs[Boolean]("r_len") shouldBe false
    out(3L).getAs[Boolean]("r_symbol") shouldBe false
    out(3L).getAs[Boolean]("r_stopwords") shouldBe false
    out(4L).getAs[Boolean]("r_distinct") shouldBe false
    out(4L).getAs[Boolean]("r_stopwords") shouldBe true // 'that' is a marker
    out(5L).getAs[Boolean]("r_word_len") shouldBe false
    Seq(2L, 3L, 4L, 5L).foreach(i => out(i).getAs[Boolean]("keep") shouldBe false)
  }

  test("piiScrub redacts emails, IPs, and long digit runs with per-class counts") {
    val d = docs(
      (1L, "mail me at jo.doe+x@sub.example.org or 192.168.1.44 acct 12345678", "en", "w"),
      (2L, "short code 123456 stays; 10.0.0.1 goes", "en", "w"),
      (3L, "nothing sensitive here", "en", "w"))
    val out = TextAnalysis.piiScrub(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    out(1L) shouldBe ((1L, 1L, 1L, "mail me at <EMAIL> or <IP> acct <NUMBER>"))
    // 6 digits is below the 7-digit floor; the IP must be gone before the
    // number pass so its octets are never seen as digit runs
    out(2L) shouldBe ((0L, 1L, 0L, "short code 123456 stays; <IP> goes"))
    out(3L) shouldBe ((0L, 0L, 0L, "nothing sensitive here"))
  }

  test("piiScrub pass order: an email's digits never leak into the number count") {
    val d = docs((1L, "reach 9876543210@phone-mail.example.com now", "en", "w"))
    val r = TextAnalysis.piiScrub(d).collect()(0)
    (r.getLong(2), r.getLong(3), r.getLong(4)) shouldBe ((1L, 0L, 0L))
    r.getString(5) shouldBe "reach <EMAIL> now"
  }

  test("lmScores: hand-computed conditional bigram probabilities") {
    // corpus bigrams: "a b"×3, "b a"×1, "a c"×1; contexts: a→4, b→1.
    // tokens a/b/c hash to distinct ctx buckets (97/98/99 mod 512) and the
    // two a-context grams to distinct pair buckets, so no hashed-space
    // collision folds these counts together.
    val d = docs(
      (1L, "a b a b", "en", "w"),  // terms: ¾, 1, ¾ → mean 5/6
      (2L, "a b", "en", "w"),      // ¾
      (3L, "a c", "en", "w"))      // ¼
    val out = TextAnalysis.lmScores(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    out(1L) shouldBe ((3L, 5.0 / 6.0))
    out(2L) shouldBe ((1L, 0.75))
    out(3L) shouldBe ((1L, 0.25))
  }

  test("lmScores: sub-bigram docs emit zero rows, scores stay in [0,1], partition-invariant") {
    val d = docs(
      (1L, "only", "en", "w"), (2L, "", "en", "w"),
      (3L, "x y x y", "en", "w"), (4L, "x y", "en", "w"))
    val out = TextAnalysis.lmScores(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    out(1L) shouldBe ((0L, 0L, 0.0))
    out(2L) shouldBe ((0L, 0L, 0.0))
    // every term is ⌊scale·c_pair/c_ctx⌋ with c_pair ≤ c_ctx, so scores
    // never leave [0,1]
    out.values.foreach { case (_, _, s) => s should (be >= 0.0 and be <= 1.0) }
    val a = TextAnalysis.lmScores(d).collect().map(_.toSeq).toSeq
    val b = TextAnalysis.lmScores(d.repartition(7)).collect().map(_.toSeq).toSeq
    a shouldBe b
  }

  test("pplBuckets: balanced rank bands, fluent head in bucket 1") {
    val fixture = table("documents")
    val out = TextAnalysis.pplBuckets(fixture, buckets = 3).collect()
    out.length.toLong shouldBe fixture.count()
    // (3·r) DIV n + 1 bands differ in size by at most one
    val sizes = out.groupBy(_.getLong(2)).map { case (b, rs) => b -> rs.length }
    sizes.keySet shouldBe Set(1L, 2L, 3L)
    (sizes.values.max - sizes.values.min) should be <= 1
    // bucket is monotone along the (score desc, doc_id) rank order
    val ranked = out.sortBy(r => (-r.getDouble(1), r.getLong(0)))
    ranked.map(_.getLong(2)).toSeq shouldBe ranked.map(_.getLong(2)).toSeq.sorted
    // the head band's worst score is no worse than the tail band's best
    val byBucket = ranked.groupBy(_.getLong(2))
    byBucket(1L).map(_.getDouble(1)).min should be >= byBucket(3L).map(_.getDouble(1)).max
  }

  test("pplBuckets is partition-count independent") {
    val fixture = table("documents")
    val a = TextAnalysis.pplBuckets(fixture, 3, partitions = 2).collect().map(_.toSeq).toSeq
    val b = TextAnalysis.pplBuckets(fixture, 3, partitions = 16).collect().map(_.toSeq).toSeq
    a shouldBe b
  }

  test("classifierScore: exact integer logit, JVM-replayed weights, keep = logit>0") {
    val d = docs((1L, "alpha beta alpha", "en", "w"), (2L, "gamma", "en", "w"))
    val out = TextAnalysis.classifierScore(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    // replay the model in plain Scala: bucket = poly_hash % 1024,
    // w = LCG(bucket) shifted to [-2^20, 2^20)
    def w(tok: String): Long = {
      val b = graft.functions.PolyHash.hash(tok, 31L) % 1024L
      (b * 2654435761L + 1013904223L) % (1L << 21) - (1L << 20)
    }
    val l1 = 2 * w("alpha") + w("beta")
    val l2 = w("gamma")
    out shouldBe Seq((1L, 3L, l1, l1 > 0), (2L, 1L, l2, l2 > 0))
  }

  test("classifierScore logits are bounded by n_tokens * 2^20 (weight range)") {
    val out = TextAnalysis.classifierScore(table("documents")).collect()
    out.foreach { r =>
      math.abs(r.getLong(2)) should be <= (r.getLong(1) * (1L << 20))
    }
    // a fixed pretrained model must not degenerate to all-keep/all-drop
    // on a 500-doc corpus
    out.map(_.getBoolean(3)).toSet shouldBe Set(true, false)
  }

  test("vocabProfile: per-source and corpus type/hapax/mode on a hand corpus") {
    import spark.implicits._
    val docs = Seq(
      ("A", "a a b"), ("A", "c"),     // A: a:2 b:1 c:1
      ("B", "a d d"),                 // B: a:1 d:2
      ("C", "x y"))                   // C: tie -> larger token wins
      .toDF("source", "text")
    val out = TextAnalysis.vocabProfile(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getLong(5))).toMap
    out("A") shouldBe ((4L, 3L, 2L, "a", 2L))
    out("B") shouldBe ((3L, 2L, 1L, "d", 2L))
    out("C") shouldBe ((2L, 2L, 2L, "y", 1L))
    // corpus row re-collapses across sources first: token a has corpus
    // count 3 (hapax in B alone, NOT a corpus hapax)
    out("ALL") shouldBe ((9L, 6L, 4L, "a", 3L))
  }

  test("tfidfKeywords: tf/df rank, term tie break, top-k cut on a hand corpus") {
    val d = docs(
      (1L, "apple banana apple", "en", "w"),   // tf: apple 2, banana 1
      (2L, "banana cherry", "en", "w"),
      (3L, "cherry cherry durian", "en", "w")) // df: apple 1, banana 2, cherry 2, durian 1
    val out = TextAnalysis.tfidfKeywords(d, 2).collect()
      .map(r => (r.getLong(0), r.getLong(5)) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    out((1L, 1L)) shouldBe (("apple", 2L, 1L, 2.0))
    out((1L, 2L)) shouldBe (("banana", 1L, 2L, 0.5))
    // doc 2: banana and cherry tie at 0.5 -> term ASC orders banana first
    out((2L, 1L)) shouldBe (("banana", 1L, 2L, 0.5))
    out((2L, 2L)) shouldBe (("cherry", 1L, 2L, 0.5))
    // doc 3: cherry 2/2 and durian 1/1 tie at 1.0 -> cherry first
    out((3L, 1L)) shouldBe (("cherry", 2L, 2L, 1.0))
    out((3L, 2L)) shouldBe (("durian", 1L, 1L, 1.0))
    out.size shouldBe 6
  }

  test("noveltyCurve: occurrence-level staleness vs earlier docs, floor-division ppm") {
    val d = docs(
      (1L, "a b c d", "en", "w"),             // both trigrams first here
      (2L, "a b c x", "en", "w"),             // one stale, one fresh
      (3L, "a b c d", "en", "w"),             // exact repeat: fully stale
      (4L, "q r", "en", "w"),                 // < 3 tokens: no grams, no row
      (5L, "a b c a b c a b c", "en", "w"))   // 7 grams, 3 stale "a b c" occurrences
    val out = TextAnalysis.noveltyCurve(d, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    out(1L) shouldBe ((2L, 0L, 1000000L))
    out(2L) shouldBe ((2L, 1L, 500000L))
    out(3L) shouldBe ((2L, 2L, 0L))
    out(5L) shouldBe ((7L, 3L, 571428L)) // 4e6 div 7 floors
    out.contains(4L) shouldBe false
    out.size shouldBe 4
  }

  test("keywordTagCounts: non-overlapping greedy counts, case folding, exact totals") {
    val docs = Seq(
      (1L, "Spark spark and more SPARK vector"),
      (2L, "aaa"),   // 'aa' matches once under leftmost non-overlap
      (3L, "nothing here")).toDF("doc_id", "text")
    val out = TextAnalysis.keywordTagCounts(docs, Seq("spark", "vector", "aa"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // columns sort: n_aa, n_spark, n_vector, then n_tags
    out(1L) shouldBe ((0L, 3L, 1L, 4L))
    out(2L) shouldBe ((1L, 0L, 0L, 1L))
    out(3L) shouldBe ((0L, 0L, 0L, 0L))
  }

  test("keyword tagging: trie path ≡ expression path on random overlapping keyword sets") {
    // a 3-letter alphabet forces the adversarial shapes: keywords that
    // nest ("a" in "aba"), share prefixes/suffixes, and self-overlap
    // ("aa" in "aaaa" counts 2 non-overlapping) — the trie must
    // reproduce the replace-length identity's greedy-leftmost counts
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 4) {
      val kws = (1 to 14).map(_ =>
        (1 to (1 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
        .distinct
      val d = docs((1L to 8L).map(i =>
        (i, (1 to 60).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString, "en", "w")): _*)
      val expr = TextAnalysis.keywordTagCounts(d, kws).collect().map(_.toSeq)
      val trie = TextAnalysis.keywordTagCountsTrie(d, kws).collect().map(_.toSeq)
      trie shouldBe expr
    }
    // pinned anchors for the non-overlapping contract
    val d2 = docs((1L, "aaaa abab aba", "en", "w"))
    val r = TextAnalysis.keywordTagCountsTrie(d2, Seq("aa", "aba", "ba")).collect()(0)
    r.getAs[Long]("n_aa") shouldBe 2L   // aaaa -> [aa][aa]
    r.getAs[Long]("n_aba") shouldBe 2L  // [aba]b and the standalone [aba]
    r.getAs[Long]("n_ba") shouldBe 2L   // a[ba]b and a[ba]
  }

  test("keyword tagging: auto-selection flips to the trie above the K threshold") {
    // K = 10^4 distinct keywords — the blocklist shape; the expression
    // chain would be 10^4 full-text passes per row, the trie is one
    val kws = (0 until 10000).map(k => f"kw$k%04d")
    val d = docs((1L, "kw0007 kw9999 and kw0007 again", "en", "w"),
      (2L, "none of those", "en", "w"))
    val out = TextAnalysis.keywordTagCounts(d, kws).collect()
    out(0).getAs[Long]("n_kw0007") shouldBe 2L
    out(0).getAs[Long]("n_kw9999") shouldBe 1L
    out(0).getAs[Long]("n_tags") shouldBe 3L
    out(1).getAs[Long]("n_tags") shouldBe 0L
    out(0).length shouldBe 10002 // doc_id + 10^4 keyword columns + n_tags
  }

  test("kAnonymity: small quasi-identifier groups suppress, sizes exact") {
    val rows = Seq(
      (1L, "a", "en", "w", 150L), (2L, "b", "en", "w", 199L), // bucket 1, size 2
      (3L, "c", "en", "w", 250L), (4L, "d", "en", "w", 260L),
      (5L, "e", "en", "w", 299L),                             // bucket 2, size 3
      (6L, "f", "fr", "w", 250L))                             // lone group
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.kAnonymity(rows, 3L, 100L).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getBoolean(5))).toMap
    out(1L) shouldBe ((2L, false))
    out(2L) shouldBe ((2L, false))
    out(3L) shouldBe ((3L, true))
    out(5L) shouldBe ((3L, true))
    out(6L) shouldBe ((1L, false))
  }

  test("scriptProfile: class counts exact, dominance precedence, mixed flag") {
    val d = docs(
      (1L, "abc 12 一二三", "zh", "w"), // 3 latin, 2 digit, 3 cjk, 2 space
      (2L, "hello world", "en", "w"),
      (3L, "一二三四", "zh", "w"),
      (4L, "!!!", "en", "w"),
      (5L, "ab一二", "zh", "w")) // tie latin=2 cjk=2 -> cjk wins (precedence)
    val out = TextAnalysis.scriptProfile(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    (r1.getLong(1), r1.getLong(2), r1.getLong(3), r1.getLong(4), r1.getLong(5),
      r1.getLong(6)) shouldBe ((10L, 3L, 2L, 3L, 2L, 0L))
    r1.getString(7) shouldBe "cjk" // 3 cjk ties 3 latin -> cjk precedence
    r1.getBoolean(8) shouldBe true
    out(2L).getString(7) shouldBe "latin"
    out(2L).getBoolean(8) shouldBe false
    out(3L).getString(7) shouldBe "cjk"
    out(4L).getString(7) shouldBe "other"
    out(5L).getString(7) shouldBe "cjk"
    out(5L).getBoolean(8) shouldBe true
  }

  test("sourceDivergence: hand-computed TV, zero for identical, one for disjoint") {
    val docs = Seq(
      (1L, "x x y", "A"), (2L, "x z", "B"),   // TV(A,B) = 1/2
      (3L, "x x y", "C"),                     // C identical to A -> 0
      (4L, "p q", "D"))                       // D disjoint from A -> 1
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceDivergence(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    out(("A", "B")) shouldBe ((3L, 2L, 6L, 0.5))
    out(("A", "C")) shouldBe ((3L, 3L, 0L, 0.0))
    out(("A", "D")) shouldBe ((3L, 2L, 12L, 1.0))
    out.size shouldBe 6 // all pairs present via the spine
  }

  test("collocations: counts and lift from a hand-built corpus") {
    // corpus: "x y" twice in doc1, once in doc2; total tokens 6
    val docs = Seq((1L, "x y x y"), (2L, "x y")).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // bigrams: doc1 -> (x y)(y x)(x y), doc2 -> (x y); n_x=3, n_y=3, N=6
    out(("x", "y")) shouldBe ((3L, 3L, 3L, 2.0)) // 3*6/(3*3)
    out.contains(("y", "x")) shouldBe false      // n_xy=1 < minCount
  }

  test("htmlExtract: hazards — script '<', comment markup, entities, double-escape") {
    def ext(h: String): String = Seq(h).toDF("html")
      .select(TextAnalysis.htmlExtract($"html")).head.getString(0)
    // script payload with a bare '<' inside code must vanish entirely
    ext("<p>a</p><script>if (1 < 2) alert('x')</script><p>b</p>") shouldBe "a\nb"
    // comments removed first, even when they contain markup
    ext("x<!-- <script>evil</script> -->y") shouldBe "x y"
    // boilerplate containers go WITH contents; inline tags go to spaces
    ext("<nav><a href='/'>Home</a></nav><p>keep <b>bold</b> text</p>") shouldBe
      "keep bold text"
    // entity decode order: amp LAST keeps double-escaped text escaped
    ext("&amp;lt; is written &lt;") shouldBe "&lt; is written <"
    ext("a&nbsp;b &quot;c&quot; &apos;d&apos; x &gt; y") shouldBe
      "a b \"c\" 'd' x > y"
    // block structure to newlines, whitespace runs collapsed, ends trimmed
    ext("  <div> a </div>\n\n<br/>b<h2>t</h2>") shouldBe "a\nb\nt"
    // numeric entities are out of scope and pass through (documented)
    ext("<p>&#60;x</p>") shouldBe "&#60;x"
    // the full fixture page round-trips to its closed-form expectation
    val docs = Seq((7L, "hello world", "en", "w")).toDF("doc_id", "text", "lang", "source")
    TextAnalysis.htmlCorpus(docs)
      .select(TextAnalysis.htmlExtract($"html")).head.getString(0) shouldBe
      "Doc 7\nhello world\nTail &a <b> \"q\" x y"
  }

  test("outlinks: boilerplate links dropped, order kept, href/host/anchor parsed") {
    def links(h: String): Seq[(Long, String, String, String)] =
      TextAnalysis.outlinks(Seq((1L, h)).toDF("doc_id", "html"), "html")
        .select($"link_pos", $"href", $"host", $"anchor")
        .as[(Long, String, String, String)].collect().toSeq
    // nav/footer/comment links never surface; content order is kept
    links("""<nav><a href="/n">N</a></nav><p><a href="https://a.com/1">one</a>
             <!-- <a href="https://x.com/z">gone</a> -->
             and <a href="https://b.org/2/3">two words</a></p>
             <footer><a href="https://ads.com/y">Ad</a></footer>""") shouldBe Seq(
      (0L, "https://a.com/1", "a.com", "one"),
      (1L, "https://b.org/2/3", "b.org", "two words"))
    // relative hrefs keep an empty host; no-link docs emit nothing
    links("""<p><a href="/local/page">rel</a></p>""") shouldBe Seq(
      (0L, "/local/page", "", "rel"))
    links("<p>plain text only</p>") shouldBe Seq()
    // the fixture corpus round-trips: doc 7 -> 2 content links, closed form
    val docs = Seq((7L, "body", "en", "w")).toDF("doc_id", "text", "lang", "source")
    TextAnalysis.outlinks(TextAnalysis.linkCorpus(docs), "html")
      .select($"link_pos", $"href", $"anchor")
      .as[(Long, String, String)].collect().toSeq shouldBe Seq(
      (0L, "https://h4.example.com/p7/0", "ref 7-0"),
      (1L, "https://h0.example.com/p7/1", "ref 7-1"))
  }

  test("scriptSegments: alternating runs tile the string, classes and samples exact") {
    val d = docs(
      (1L, "abc 一二 xyz", "fr", "w"),  // other|cjk|other
      (2L, "一丁丂", "zh", "w"),     // one cjk run
      (3L, "plain latin text here", "en", "w"))  // one other run
    val out = TextAnalysis.scriptSegments(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getString(4)))).toMap
    out((1L, 1L)) shouldBe (("other", 4L, "abc "))
    out((1L, 2L)) shouldBe (("cjk", 2L, "一二"))
    out((1L, 3L)) shouldBe (("other", 4L, " xyz"))
    out((2L, 1L)) shouldBe (("cjk", 3L, "一丁丂"))
    out((3L, 1L)) shouldBe (("other", 21L, "plain la")) // 8-char sample
    out.size shouldBe 5
    // reassembly law: concatenating runs in seg order restores the text
    val runs = TextAnalysis.scriptSegments(d).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1)))
    runs(1L).map(_.getLong(3)).sum shouldBe 10L
  }

  test("linedCorpus: token slices of 8 + deterministic footers") {
    val d = docs(
      (0L, Array.tabulate(10)(i => s"w$i").mkString(" "), "en", "w"), // %3 footer
      (1L, "a b c", "en", "w"), // %7 footer
      (2L, "solo", "en", "w"))
    val out = TextAnalysis.linedCorpus(d).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    out(0L) shouldBe Seq("w0 w1 w2 w3 w4 w5 w6 w7", "w8 w9",
      TextAnalysis.BoilerFooter3)
    out(1L) shouldBe Seq("a b c", TextAnalysis.BoilerFooter7)
    out(2L) shouldBe Seq("solo")
  }

  test("readability: hand-computed Flesch micro-units, clamps, and bands") {
    val d = docs(
      // 4 words, 2 sentence runs ("Go." + "now!!"), syllables: o|e|o|a|o|u|i|o = runs
      (1L, "Go now. See the cat run!!", "en", "w"),
      (2L, "", "en", "w"),              // empty: every count 0, clamps hold
      (3L, "一二三", "zh", "w"))          // no vowels/sentences: clamps only
    val out = TextAnalysis.readability(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    r1.getLong(1) shouldBe 6L  // n_words
    r1.getLong(2) shouldBe 2L  // n_sents: ". " and "!!"
    // vowel runs in "go now. see the cat run!!": o,o,ee,e,a,u = 6
    r1.getLong(3) shouldBe 6L
    r1.getLong(4) shouldBe 3000L // wps_milli = 6*1000 div 2
    r1.getLong(5) shouldBe 1000L // spw_milli = 6*1000 div 6
    r1.getLong(6) shouldBe (206835000L - 1015L * 3000L - 84600L * 1000L)
    r1.getString(7) shouldBe "easy"
    val r2 = out(2L)
    (1 to 5).foreach(i => r2.getLong(i) shouldBe 0L)
    r2.getLong(6) shouldBe 206835000L // no penalty terms
    r2.getString(7) shouldBe "easy"
    val r3 = out(3L)
    r3.getLong(1) shouldBe 1L
    r3.getLong(3) shouldBe 0L
    r3.getLong(4) shouldBe 1000L // 1 word div clamped 1 sentence
    // band thresholds are exact integer comparisons
    r3.getString(7) shouldBe (if (r3.getLong(6) >= 60000000L) "easy"
                              else if (r3.getLong(6) >= 30000000L) "medium" else "hard")
  }

  test("lineDedupScrub: shared lines scrubbed, document order restored, empty survivor") {
    val lined = Seq(
      (1L, Seq("keep one", "SHARED", "keep two")),
      (2L, Seq("SHARED", "other text")),
      (3L, Seq("SHARED")), // all lines boilerplate -> empty text_clean
      (4L, Seq("unique here"))).toDF("doc_id", "lines")
    val out = TextAnalysis.lineDedupScrub(lined, minDocs = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    out(1L) shouldBe ((3L, 1L, "keep one\nkeep two"))
    out(2L) shouldBe ((2L, 1L, "other text"))
    out(3L) shouldBe ((1L, 1L, "")) // doc survives with empty text
    out(4L) shouldBe ((1L, 0L, "unique here"))
    // a line repeated WITHIN one doc only does not cross the distinct-doc bar
    val within = Seq((1L, Seq("dup", "dup")), (2L, Seq("x"))).toDF("doc_id", "lines")
    val o2 = TextAnalysis.lineDedupScrub(within, minDocs = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    o2(1L) shouldBe 0L
  }

  test("lexicalDiversity: TTR/hapax milli-exact, case-folded, empty docs absent") {
    val docs = Seq(
      (1L, "The the THE cat"),      // 4 tokens, 2 types, 1 hapax (cat)
      (2L, "a b c"),                // all hapax: ttr = hapax = 1000
      (3L, "spam spam spam spam"),  // 1 type, 0 hapax
      (4L, "   "),                  // whitespace only -> no row
      (5L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.lexicalDiversity(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 5L)
    out(1L) shouldBe ((4L, 2L, 1L, 500L, 250L))
    out(2L) shouldBe ((3L, 3L, 3L, 1000L, 1000L))
    out(3L) shouldBe ((4L, 1L, 0L, 250L, 0L))
    out(5L) shouldBe ((1L, 1L, 1L, 1000L, 1000L))
    // laws on the real corpus: hapax <= types <= tokens, ratios in [0, 1000]
    val real = TextAnalysis.lexicalDiversity(table("documents")).collect()
    real should not be empty
    real.foreach { r =>
      r.getLong(3) should be <= r.getLong(2)
      r.getLong(2) should be <= r.getLong(1)
      r.getLong(4) should (be >= 1L and be <= 1000L)
      r.getLong(5) should (be >= 0L and be <= 1000L)
    }
  }

  test("codeDetect: the code twin separates cleanly; prose quoting 'if' stays prose") {
    import spark.implicits._
    // the fixture corpus: every doc_id % 4 == 1 carries the code block,
    // everything else must stay prose (signals measured zero on raw text)
    val out = TextAnalysis.codeDetect(
        TextAnalysis.codeCorpus(table("documents"))).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(6))))
    out should not be empty
    out.foreach { case (id, (kw, indent, isCode)) =>
      isCode shouldBe (id % 4 == 1)
      if (id % 4 == 1) { kw should be >= 2L; indent shouldBe 3L }
    }
    // structure AND vocabulary are both required: prose with keywords but
    // no indentation (or indented poetry with no keywords) is not code
    val hand = Seq(
      (1L, "if you return home, import nothing and define class acts"),
      (2L, "    roses are red\n    violets are blue\n    sugar is sweet"),
      (3L, "def g(x):\n    if x > 0:\n        return x\n    return -x")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.codeDetect(hand).collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    got shouldBe Map(1L -> false, 2L -> false, 3L -> true)
  }

  test("markdownExtract: hazards — fence payload, link URL, bullets vs hrule") {
    val md = "# Title\n```\n- fake bullet * in fence\n```\n" +
      "real **bold** [x](http://u) `c`\n* starred item\n1. numbered\n___\nend"
    val got = Seq((1L, md)).toDF("doc_id", "md")
      .select(TextAnalysis.markdownExtract($"md")).head.getString(0)
    got shouldBe "Title\nreal bold x c\nstarred item\nnumbered\nend"
    // the image keeps its alt text while the sibling link keeps anchor
    // text — and an emphasis span spanning the URL must not fire
    val md2 = "see ![alt text](i.png) and [go*al](http://a*b) done"
    Seq((1L, md2)).toDF("doc_id", "md")
      .select(TextAnalysis.markdownExtract($"md")).head.getString(0) shouldBe
      "see alt text and go*al done"
    // an unterminated fence is NOT a fence (the pair rule) — the text
    // after it survives instead of being eaten to end-of-doc
    val md3 = "start ``` not a fence\nplain text"
    Seq((1L, md3)).toDF("doc_id", "md")
      .select(TextAnalysis.markdownExtract($"md")).head.getString(0) should
      include("plain text")
  }

  test("fimTransform: PSM reassembly is lossless and the cuts are deterministic") {
    val docs = Seq((7L, "abcdefghijklmnopqrstuvwxyz"), (8L, "0123456789"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.fimTransform(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // doc 7: L=26, L div 3 = 8, c1 = 1 + 7%8 = 8, c2 = 16
    out(7L) shouldBe (("<PRE>abcdefgh<SUF>qrstuvwxyz<MID>ijklmnop", 8L, 8L, 10L))
    // doc 8: L=10, L div 3 = 3, c1 = 1 + 8%3 = 3, c2 = 6
    out(8L) shouldBe (("<PRE>012<SUF>6789<MID>345", 3L, 3L, 4L))
    // the lossless law on the real corpus: n_pre + n_mid + n_suf = L and
    // the three spans reassemble the original text
    val real = TextAnalysis.fimTransform(table("documents"))
      .join(table("documents"), "doc_id")
      .select($"doc_id", $"fim", $"n_pre", $"n_mid", $"n_suf", $"text")
      .collect()
    real should not be empty
    real.foreach { r =>
      val (fim, text) = (r.getString(1), r.getString(5))
      (r.getLong(2) + r.getLong(3) + r.getLong(4)) shouldBe text.length.toLong
      val pre = fim.substring(5, fim.indexOf("<SUF>"))
      val suf = fim.substring(fim.indexOf("<SUF>") + 5, fim.indexOf("<MID>"))
      val mid = fim.substring(fim.indexOf("<MID>") + 5)
      (pre + mid + suf) shouldBe text
    }
  }

  test("spanCorruption: spans and sentinels reassemble losslessly; short docs excluded") {
    // L=40: sl = 5, a = 1 + 9%10 = 10, b = 10 + 5 + 10 = 25
    val text40 = "0123456789abcdefghijklmnopqrstuvwxyzABCD"
      .substring(0, 40)
    val docs = Seq((9L, text40), (10L, "too short")).toDF("doc_id", "text")
    val out = TextAnalysis.spanCorruption(docs).collect()
    out.length shouldBe 1 // the 9-char doc is excluded
    val r = out.head
    r.getLong(0) shouldBe 9L
    // prefix [1,9], span1 [10,14], mid [15,24], span2 [25,29], tail [30,40]
    r.getString(1) shouldBe
      text40.substring(0, 9) + "<X>" + text40.substring(14, 24) + "<Y>" +
        text40.substring(29)
    r.getString(2) shouldBe
      "<X>" + text40.substring(9, 14) + "<Y>" + text40.substring(24, 29) + "<Z>"
    r.getLong(3) shouldBe 10L
    // the lossless law on the real corpus: corrupted's three segments
    // interleaved with targets' two spans rebuild the original text
    val real = TextAnalysis.spanCorruption(table("documents"))
      .join(table("documents"), "doc_id")
      .select($"corrupted", $"targets", $"text").collect()
    real should not be empty
    real.foreach { row =>
      val (cor, tgt, text) = (row.getString(0), row.getString(1), row.getString(2))
      val Array(pre, mid, tail) = cor.split("<[XY]>", -1)
      val spans = tgt.stripPrefix("<X>").stripSuffix("<Z>").split("<Y>", -1)
      (pre + spans(0) + mid + spans(1) + tail) shouldBe text
    }
  }

  test("curationRoute: the verdict composes the t50/t51 kernels without drift") {
    // composition law on the real corpus: the route's signal columns
    // EQUAL the source gates' outputs joined on doc_id, and the verdict
    // is the documented rule over them
    val route = TextAnalysis.curationRoute(table("documents")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    val flesch = TextAnalysis.readability(table("documents")).collect()
      .map(r => r.getLong(0) -> r.getLong(6)).toMap
    val ttr = TextAnalysis.lexicalDiversity(table("documents")).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    route should not be empty
    for ((id, (nChars, fm, tm, verdict)) <- route) {
      fm shouldBe flesch(id)
      tm shouldBe ttr.getOrElse(id, 0L)
      verdict shouldBe (if (nChars < 100) "drop"
        else if (fm < 30000000L || tm < 300) "review" else "keep")
    }
    // the corpus exercises at least two verdicts
    route.values.map(_._4).toSet.size should be >= 2
  }

  test("garbleDetect: prose clean, consonant runs and vowel drought both fire") {
    val hand = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // prose: clean
      (2L, "intro qzwxqzwx more xkcdxkcd end"),            // two runs >= 5
      (3L, "bcd fgh jkl mnp qrst vwxz"),                   // no vowels at all
      (4L, "the strength of the through train is enormous"), // 4-runs only
      (5L, "qzwxqzwx only one run here") // one run is not enough alone
    ).toDF("doc_id", "text")
    val out = TextAnalysis.garbleDetect(hand).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4),
        r.getBoolean(5)))).toMap
    out(1L)._3 shouldBe false
    out(2L) shouldBe ((2L, out(2L)._2, true))
    out(3L)._3 shouldBe true  // vowel_milli = 0 < 200
    out(3L)._2 shouldBe 0L
    out(4L)._3 shouldBe false // "ngth" is a 4-run, below the 5 threshold
    out(5L)._3 shouldBe false // one run, healthy vowel share elsewhere
    // the twin-corpus law: the detector fires exactly on the injected tail
    val twin = TextAnalysis.garbleDetect(
      TextAnalysis.garbleCorpus(table("documents"))).collect()
    twin should not be empty
    twin.foreach { r =>
      r.getBoolean(5) shouldBe (r.getLong(0) % 5 == 2)
    }
  }
}
