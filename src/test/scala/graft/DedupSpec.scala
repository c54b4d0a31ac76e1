package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("exact dedup groups identical texts, keeps the smallest id") {
    val d = docs((1L, "web", "same text"), (2L, "web", "same text"), (3L, "web", "other"))
    val out = Dedup.exact(d).collect()
    out.length shouldBe 2
    val dup = out.filter(_.getAs[Long]("dup_count") == 2L)
    dup.length shouldBe 1
    dup(0).getAs[Long]("keep_id") shouldBe 1L
  }

  test("exactSurvivors returns one id per distinct text") {
    val d = docs((5L, "a", "x"), (2L, "a", "x"), (9L, "a", "y"))
    Dedup.exactSurvivors(d).as[Long].collect() shouldBe Array(2L, 9L)
  }

  test("exact Jaccard refuses hot-gram corpora loudly instead of exploding") {
    // the gram "x y" is shared by all 4 docs: with maxHotDocFreq = 2 the
    // guard must throw (pointing at the pruned form), never attempt the
    // c² within-group join
    val hot = docs((1L, "web", "x y a"), (2L, "web", "x y b"),
      (3L, "web", "x y c"), (4L, "web", "x y d"))
    val e = intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairsExact(hot, 2, 0.1, maxHotDocFreq = 2).collect()
    }
    e.getMessage should include("Pruned")
    // under the limit the same corpus runs fine
    Dedup.ngramJaccardPairsExact(hot, 2, 0.1, maxHotDocFreq = 4)
      .collect().length should be >= 1
  }

  test("ngramJaccard: bigrams of 'a b c d' vs 'a b c e' = 0.5") {
    // grams A = {a b, b c, c d}, B = {a b, b c, c e}; |∩|=2, |∪|=4
    val d = docs((1L, "web", "a b c d"), (2L, "web", "a b c e"))
    val out = Dedup.ngramJaccardPairs(d, 2, 0.4).collect()
    out.length shouldBe 1
    out(0).getAs[Double]("jaccard") shouldBe 0.5
  }

  test("ngramJaccard blocks by source: identical texts in different sources don't pair") {
    val d = docs((1L, "web", "a b c d"), (2L, "books", "a b c d"))
    Dedup.ngramJaccardPairs(d, 2, 0.1).count() shouldBe 0L
  }

  test("minhashLsh finds identical docs with estimate 1.0 and skips disjoint docs") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different words nowhere near the first document at all"
    val d = docs((1L, "web", text), (2L, "web", text), (3L, "web", other))
    val out = Dedup.minhashLshPairs(d).collect()
    out.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((1L, 2L))
    out(0).getAs[Double]("est_jaccard") shouldBe 1.0
  }

  test("minhash estimate tracks true Jaccard within banding tolerance") {
    // 12 shared tokens, 4 swapped → trigram sets overlap heavily but not fully
    val base = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12 t13 t14 t15 t16"
    val variant = base.replace("t16", "x16").replace("t15", "x15")
    val d = docs((1L, "w", base), (2L, "w", variant))
    // true trigram jaccard: base has 14 trigrams, variant differs in last 3 → |∩|=11,|∪|=17 ≈ 0.647
    val out = Dedup.minhashLshPairs(d, shingleN = 3, bands = 8, rows = 4, threshold = 0.3)
      .collect()
    out.length shouldBe 1
    out(0).getAs[Double]("est_jaccard") should (be >= 0.4 and be <= 0.9)
  }

  test("dedupClusters: transitive chains collapse to one component, min id is canonical") {
    // A≈B and B≈C but A,C may or may not pair directly — the component
    // must still be {A, B, C} via transitivity; D is disjoint
    val text = "the quick brown fox jumps over the lazy dog again and again and once more"
    val d = docs(
      (7L, "w", text),
      (3L, "w", text),          // exact dup of 7 → same component
      (5L, "w", text + " tail"),// near-dup of both
      (9L, "w", "completely different words nowhere near the first document at all"))
    val out = Dedup.dedupClusters(d, threshold = 0.3).collect()
    out.length shouldBe 4
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_canonical"))).toMap
    byId(3L) shouldBe ((3L, true))   // min id of {3,5,7}
    byId(5L) shouldBe ((3L, false))
    byId(7L) shouldBe ((3L, false))
    byId(9L) shouldBe ((9L, true))   // singleton component
  }

  test("dedupClusters under a reliable checkpoint dir produces identical clusters") {
    val text = "the quick brown fox jumps over the lazy dog again and again and once more"
    val d = docs(
      (7L, "w", text), (3L, "w", text), (5L, "w", text + " tail"),
      (9L, "w", "completely different words nowhere near the first document at all"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set("spark.graft.checkpointDir", ckpt)
    try {
      val out = Dedup.dedupClusters(d, threshold = 0.3).collect()
      out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap shouldBe
        Map(3L -> 3L, 5L -> 3L, 7L -> 3L, 9L -> 9L)
      // the barrier really used reliable storage, not executor-local blocks
      new java.io.File(ckpt).listFiles() should not be empty
    } finally spark.conf.unset("spark.graft.checkpointDir")
  }

  test("dedupClusters on a pairless corpus: every doc is its own canonical cluster") {
    val d = docs((1L, "w", "alpha beta gamma delta"), (2L, "w", "epsilon zeta eta theta"))
    val out = Dedup.dedupClusters(d, threshold = 0.9).collect()
    out.length shouldBe 2
    all(out.map(_.getAs[Boolean]("is_canonical"))) shouldBe true
  }

  test("simhash: identical texts share a signature, token order is irrelevant") {
    val d = docs((1L, "w", "alpha beta gamma"), (2L, "w", "gamma alpha beta"), (3L, "w", "delta epsilon zeta"))
    val sig = Dedup.simhash(d).as[(Long, Long)].collect().toMap
    sig(1L) shouldBe sig(2L)
    sig(1L) should not be sig(3L)
  }

  test("simhashDuplicates buckets equal signatures") {
    val d = docs((1L, "w", "same words here"), (2L, "w", "same words here"), (3L, "w", "unique"))
    val out = Dedup.simhashDuplicates(d).collect()
    out.length shouldBe 1
    out(0).getAs[Long]("keep_id") shouldBe 1L
    out(0).getAs[Long]("bucket_size") shouldBe 2L
  }

  test("duplicatedSpans: interval union of cross-doc duplicated n-gram spans") {
    // docs 1 and 2 share the passage "a b c d"; doc 3 is unique.
    // With n=3, doc 1's grams: [a b c][b c d][c d x][d x y] — positions
    // 0,1 are duplicated (present in doc 2), covering tokens a..d = 4 of 6.
    val d = docs(
      (1L, "w", "a b c d x y"),
      (2L, "w", "p q a b c d"),
      (3L, "w", "u v w m n o"))
    val out = Dedup.duplicatedSpans(d, n = 3).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Long]("n_tokens") shouldBe 6L
    out(1L).getAs[Long]("n_dup_grams") shouldBe 2L
    out(1L).getAs[Long]("covered_tokens") shouldBe 4L // 3 for pos0 + gap 1
    out(1L).getAs[Double]("dup_span_share") shouldBe 4.0 / 6.0
    out(2L).getAs[Long]("covered_tokens") shouldBe 4L // passage sits at the end
    out(3L).getAs[Long]("n_dup_grams") shouldBe 0L
    out(3L).getAs[Double]("dup_span_share") shouldBe 0.0
  }

  test("duplicatedSpans: non-overlapping duplicated grams count n tokens each") {
    // "a b c" appears in docs 1,2 at two separated positions in doc 1:
    // spans don't overlap, each contributes the full n
    val d = docs(
      (1L, "w", "a b c z z z a b c"),
      (2L, "w", "a b c q q q q q q"))
    val out = Dedup.duplicatedSpans(d, n = 3).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Long]("n_dup_grams") shouldBe 2L
    out(1L).getAs[Long]("covered_tokens") shouldBe 6L
  }

  test("duplicatedSpans matches a local brute force on random corpora") {
    val rnd = new scala.util.Random(19)
    val vocab = Array("a", "b", "c", "d", "e", "f", "g", "h")
    val corpus = (1L to 15L).map { i =>
      val len = 5 + rnd.nextInt(26)
      (i, "w", Array.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val n = 3
    val toks = corpus.map { case (id, _, text) => id -> text.split(" ") }.toMap
    val grams = toks.view.mapValues(t =>
      t.sliding(n).filter(_.length == n).map(_.mkString(" ")).toVector).toMap
    // toSeq first: flatMapping the Map directly would rebuild a Map keyed
    // by gram and silently collapse the per-doc occurrences being counted
    val dup = grams.toSeq.flatMap { case (id, gs) => gs.distinct.map(g => (g, id)) }
      .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
    val expected = corpus.map { case (id, _, _) =>
      val pos = grams(id).zipWithIndex.collect { case (g, p) if dup(g) => p }
      val covered = pos.foldLeft((0L, -1)) { case ((acc, prev), p) =>
        (acc + math.min(n, if (prev < 0) n else p - prev), p)
      }._1
      id -> (toks(id).length.toLong, pos.size.toLong, covered)
    }.toMap
    val out = Dedup.duplicatedSpans(corpus.toDF("doc_id", "source", "text"), n)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    out shouldBe expected
  }

  test("semDedup drops exactly the vectors dominated by a smaller-id same-bucket near-dup") {
    import graft.functions.Vectors
    val rnd = new scala.util.Random(11)
    val base = (0L until 20L).map { i =>
      (i, Array.fill(64)((rnd.nextInt(9) - 4).toFloat), (i % 2).toInt)
    }
    // positive-scaled copies: same direction (cos 1) and same bucket by
    // construction, so they MUST come back dropped
    val copies = (0 until 5).map(k => (20L + k, base(k)._2.map(x => x * 2.0f), 0))
    val rows = base ++ copies
    val d = rows.toDF("vec_id", "embedding", "label")
    val buckets = d.select($"vec_id", Vectors.hyperplaneBucket($"embedding", 4).as("b"))
      .as[(Long, Long)].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var i = 0; var s = 0.0; var na = 0.0; var nb = 0.0
      while (i < 64) {
        s += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      s / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = rows.map { case (id, v, _) =>
      id -> rows.exists(o =>
        o._1 < id && buckets(o._1) == buckets(id) && cos(o._2, v) >= 0.5)
    }.toMap
    val out = Dedup.semDedup(d, 0.5).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("dropped")).toMap
    out shouldBe expected
    (20L until 25L).foreach(id => out(id) shouldBe true)
  }

  test("incremental dedup flags history dups, in-batch dups, and fresh docs") {
    val history = Seq((1L, "a", "alpha"), (2L, "a", "beta"))
      .toDF("doc_id", "source", "text")
    val batch = Seq(
      (10L, "w", "alpha"), // content already in the corpus
      (11L, "w", "gamma"), // fresh, first occurrence
      (12L, "w", "gamma"), // in-batch duplicate of 11
      (13L, "w", "delta"), // fresh
      (14L, "w", "alpha")) // both: history dup AND in-batch dup of 10
      .toDF("doc_id", "source", "text")
    val out = Dedup.incrementalDedup(history, batch).collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    out shouldBe Map( //        (keep, dup_of_history, dup_in_batch)
      10L -> ((false, true, false)),
      11L -> ((true, false, false)),
      12L -> ((false, false, true)),
      13L -> ((true, false, false)),
      14L -> ((false, true, true)))
  }

  test("incrementalMinhash: identical, near, and fresh batch docs vs the history index") {
    val base = "the quick brown fox jumps over the lazy dog near the riverbank today"
    val history = Seq((1L, "a", base), (2L, "a", "completely unrelated text about spark plans and shuffles everywhere"))
      .toDF("doc_id", "source", "text")
    val batch = Seq(
      (10L, "w", base),                  // exact copy → est 1.0
      (11L, "w", base + " v2"),          // near-dup: one trailing shingle differs
      (12L, "w", "totally fresh content with no overlap whatsoever in any shingle window"),
      (13L, "w", "a b"))                 // < 3 tokens → no signature, zero candidates
      .toDF("doc_id", "source", "text")
    val out = Dedup.incrementalMinhash(history, batch).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    out(10L) shouldBe ((1L, 1.0, true))
    out(11L)._3 shouldBe true            // near-dup crosses the 0.5 default
    out(11L)._2 should (be >= 0.5 and be < 1.0)
    out(12L) shouldBe ((0L, 0.0, false))
    out(13L) shouldBe ((0L, 0.0, false))
    // partitioning invariance: signatures and band joins are deterministic
    val rep = Dedup.incrementalMinhash(history.repartition(5), batch.repartition(3))
      .collect().map(_.toSeq).toSeq
    Dedup.incrementalMinhash(history, batch).collect().map(_.toSeq).toSeq shouldBe rep
  }

  test("scrubDuplicatedSpans removes exactly the cross-doc duplicated passage") {
    val d = docs(
      (1L, "w", "a b c d e f"),
      (2L, "w", "x y a b c z"))
    val out = Dedup.scrubDuplicatedSpans(d, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    // shared 3-gram "a b c": doc1 tokens 0-2 covered, doc2 tokens 2-4 covered
    out shouldBe Map(1L -> ((3L, "d e f")), 2L -> ((3L, "x y z")))
  }

  test("scrubDuplicatedSpans merges overlapping duplicated grams into one span") {
    val d = docs(
      (1L, "w", "p q r s t"),
      (2L, "w", "q r s t u"))
    // shared grams "q r s" and "r s t" overlap; the union covers q..t
    val out = Dedup.scrubDuplicatedSpans(d, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    out shouldBe Map(1L -> ((5L, 1L, "p")), 2L -> ((5L, 1L, "u")))
  }

  test("scrubDuplicatedSpans: a fully-duplicated doc becomes the empty string, unique docs pass through") {
    val d = docs(
      (1L, "w", "same three tokens"),
      (2L, "w", "same three tokens"),
      (3L, "w", "entirely unrelated text here"))
    val out = Dedup.scrubDuplicatedSpans(d, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    out(1L) shouldBe ((0L, ""))
    out(2L) shouldBe ((0L, ""))
    out(3L) shouldBe ((4L, "entirely unrelated text here"))
  }

  test("bloom-prefiltered incremental dedup is row-identical to the exact form") {
    val history = (1L to 60L).map(i => (i, "a", s"hist text $i")).toDF("doc_id", "source", "text")
    val batch = (
      (100L to 120L).map(i => (i, "w", s"hist text ${i - 99}")) ++ // history dups
        (200L to 230L).map(i => (i, "w", s"fresh text $i")) ++      // fresh
        Seq((300L, "w", "fresh text 200"), (301L, "w", "fresh text 200")) // in-batch dups
      ).toDF("doc_id", "source", "text")
    val exact = Dedup.incrementalDedup(history, batch).collect()
    Dedup.incrementalDedupBloom(history, batch, expectedItems = 1000L, fpp = 0.01)
      .collect() shouldBe exact
  }

  test("bloom prefilter routes NULL text like the exact form's left join (no UDF NPE)") {
    val history = Seq((1L, "a", "alpha"), (2L, "a", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text")
    val batch = Seq((10L, "w", "alpha"), (11L, "w", null.asInstanceOf[String]), (12L, "w", "fresh"))
      .toDF("doc_id", "source", "text")
    val exact = Dedup.incrementalDedup(history, batch).collect()
    Dedup.incrementalDedupBloom(history, batch, expectedItems = 100L, fpp = 0.01)
      .collect() shouldBe exact
  }

  test("bloom prefilter stays exact even when the filter is saturated with false positives") {
    val history = (1L to 50L).map(i => (i, "a", s"h$i")).toDF("doc_id", "source", "text")
    val batch = (60L to 120L).map(i => (i, "w", if (i % 2 == 0) s"h${i % 40 + 1}" else s"f$i"))
      .toDF("doc_id", "source", "text")
    val exact = Dedup.incrementalDedup(history, batch).collect()
    // undersized filter + huge fpp: nearly everything "might" be in history —
    // the exact join must clear every false positive
    Dedup.incrementalDedupBloom(history, batch, expectedItems = 10L, fpp = 0.5)
      .collect() shouldBe exact
  }

  test("canonicalByQuality: the fullest cluster member is the keeper, not the min id") {
    // same chain fixture as dedupClusters: component {3,5,7}, but 5 has
    // one more token than the exact dups 3 and 7 — quality election must
    // pick 5 where min-id canonicalization picks 3
    val text = "the quick brown fox jumps over the lazy dog again and again and once more"
    val d = docs(
      (7L, "w", text),
      (3L, "w", text),
      (5L, "w", text + " tail"),
      (9L, "w", "completely different words nowhere near the first document at all"))
    val out = Dedup.canonicalByQuality(d, threshold = 0.3).collect()
    out.length shouldBe 4
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Boolean]("keep"))).toMap
    byId(5L) shouldBe ((3L, 16L, true))   // most tokens wins
    byId(3L) shouldBe ((3L, 15L, false))
    byId(7L) shouldBe ((3L, 15L, false))
    byId(9L) shouldBe ((9L, 10L, true))   // singleton keeps itself
  }

  test("canonicalByQuality elects exactly one keeper per cluster on the fixture corpus") {
    val out = Dedup.canonicalByQuality(table("documents")).collect()
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (_, rows) =>
      rows.count(_.getAs[Boolean]("keep")) shouldBe 1
      // the keeper is a max-token member (doc_id breaks exact ties)
      val keeper = rows.find(_.getAs[Boolean]("keep")).get
      keeper.getAs[Long]("n_tokens") shouldBe rows.map(_.getAs[Long]("n_tokens")).max
    }
  }

  test("containmentPairs: a truncated copy scores ~1 containment while Jaccard stays low") {
    val full = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3).trim
    val half = full.split(" ").take(10).mkString(" ")
    val d = Seq(
      (1L, full, "w"), (2L, half, "w"),        // contained pair
      (3L, "one two three four five", "w"),    // unrelated
      (4L, "one two three four five", "w"))    // exact twin of 3
      .toDF("doc_id", "text", "source")
    val out = Dedup.containmentPairs(d, 2, 0.6, 128).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (cab, cba, j) = out((1L, 2L))
    cba shouldBe 1.0   // every bigram of the half is in the full text
    cab should be < 1.0
    j should be < 1.0  // asymmetric: jaccard alone would undersell this pair
    // the exact twins are symmetric: both containments and jaccard all 1
    out((3L, 4L)) shouldBe ((1.0, 1.0, 1.0))
    out.keySet shouldBe Set((1L, 2L), (3L, 4L))
  }

  test("containmentPairs: threshold prunes below-floor overlaps") {
    val d = Seq(
      (1L, "a b c d e f g h", "w"),
      (2L, "a b x y z q r s", "w"))  // shares only the 'a b' bigram
      .toDF("doc_id", "text", "source")
    Dedup.containmentPairs(d, 2, 0.6, 128).count() shouldBe 0L
  }

  test("simhashHammingPairs: pigeonhole candidates are COMPLETE vs the brute-force join") {
    import org.apache.spark.sql.functions._
    val docs = table("documents").limit(200)
    val got = Dedup.simhashHammingPairs(docs, 3)
    val sig = Dedup.simhash(docs)
    val brute = sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .where(col("hamming") <= 3)
    got.count() should be > 0L
    got.except(brute).count() shouldBe 0    // no false pair
    brute.except(got).count() shouldBe 0    // pigeonhole misses nothing
  }

  test("simhashHammingPairs rejects a band count that does not split the signature") {
    an[IllegalArgumentException] should be thrownBy
      Dedup.simhashHammingPairs(table("documents"), 6) // 7 bands, 60 % 7 != 0
  }

  test("simhashHammingPairs hot-band cap: subset of exact, identity at a generous cap") {
    val docs = table("documents").limit(200)
    val exact = Dedup.simhashHammingPairs(docs, 3)
    val generous = Dedup.simhashHammingPairs(docs, 3, maxBandFreq = Some(1000000))
    generous.collect().toSeq shouldBe exact.collect().toSeq
    val capped = Dedup.simhashHammingPairs(docs, 3, maxBandFreq = Some(4))
    capped.except(exact).count() shouldBe 0 // never invents a pair
  }

  test("minhashCalibration: identical docs measure exactly; near-dups carry a consistent error") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = docs(
      (1L, "w", base),
      (2L, "w", base),                    // exact twin: est = exact = 1.0
      (3L, "w", base + " extra"),         // near-dup of 1/2
      (4L, "w", "totally different words nothing shared here at all"))
    val out = Dedup.minhashCalibration(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    // the twin pair: full signature agreement AND exact Jaccard 1
    out((1L, 2L)) shouldBe ((1.0, 8L, 8L, 1.0, 0.0))
    // near-dup: 10 tokens -> 8 trigrams; +1 token adds one trigram ->
    // inter 8, union 9; the estimate may differ but the EXACT side is law
    val (_, ni, nu, exact, err) = out((1L, 3L))
    (ni, nu, exact) shouldBe ((8L, 9L, 0.8889))
    err should be < 0.35 // |est - 8/9| bounded: est >= some bands agreeing
    // the unrelated doc shares no band with anyone
    out.keySet.flatMap(k => Set(k._1, k._2)) should not contain 4L
  }

  test("dedupWeights: cluster mass splits as 1000000 div size, singletons keep all") {
    val text = "the quick brown fox jumps over the lazy dog again and again and once more"
    val d = docs(
      (7L, "w", text),
      (3L, "w", text),
      (5L, "w", text + " tail"),
      (9L, "w", "completely different words nowhere near the first document at all"))
    val out = Dedup.dedupWeights(d, threshold = 0.3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out(3L) shouldBe ((3L, 3L, 333333L))
    out(5L) shouldBe ((3L, 3L, 333333L))
    out(7L) shouldBe ((3L, 3L, 333333L))
    out(9L) shouldBe ((9L, 1L, 1000000L))
    // floor law on the real corpus: per-cluster mass lands within
    // [1000000 − size + 1, 1000000] — soft dedup conserves weight
    val real = Dedup.dedupWeights(docs((1L, "w", "a b c"), (2L, "w", "a b c"),
      (4L, "w", "z y x w v"))).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    real.groupBy(_._1).foreach { case (_, rows) =>
      val size = rows.head._2
      val mass = rows.map(_._3).sum
      rows.length.toLong shouldBe size
      mass should (be >= 1000000L - size + 1 and be <= 1000000L)
    }
  }

  test("dedupReport: the one-row summary agrees with the clusters it describes") {
    val d = docs(
      (1L, "w", "the quick brown fox jumps over the lazy dog again today"),
      (2L, "w", "the quick brown fox jumps over the lazy dog again today"),
      (3L, "w", "the quick brown fox jumps over the lazy dog again tonight"),
      (5L, "w", "an entirely different sentence about spark shuffles and joins"),
      (9L, "w", "yet another unrelated line of text with new words throughout"))
    val r = Dedup.dedupReport(d).collect().head
    val (nDocs, nCl, nClGe2, nDup, maxCl, dupPpm) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    nDocs shouldBe 5L
    // consistency law vs the clustering kernel itself
    val sizes = Dedup.dedupClusters(d).groupBy("cluster_id").count().collect()
      .map(_.getLong(1))
    nCl shouldBe sizes.length.toLong
    maxCl shouldBe sizes.max
    nDup shouldBe sizes.filter(_ >= 2).sum
    nClGe2 shouldBe sizes.count(_ >= 2).toLong
    dupPpm shouldBe 1000000L * nDup / nDocs
    // the near-dup trio clusters; the two singletons stay apart
    maxCl shouldBe 3L
    nClGe2 shouldBe 1L
  }

  test("tokenBudget: duplicated trio discounts to one page of tokens") {
    val d = docs(
      (1L, "a", "the quick brown fox jumps over the lazy dog again today"),
      (2L, "a", "the quick brown fox jumps over the lazy dog again today"),
      (3L, "b", "the quick brown fox jumps over the lazy dog again today"),
      (9L, "b", "an entirely different sentence about spark shuffles and joins"))
    val out = Dedup.tokenBudget(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // trio of 11-token dups: each weighted 333333 ppm -> 3 tokens each
    out("a") shouldBe ((2L, 22L, 6L))
    out("b") shouldBe ((2L, 20L, 12L)) // 3 (dup member) + 9 (unique)
    out("__all__") shouldBe ((4L, 42L, 18L))
    // budget law: effective never exceeds raw, per source and total
    out.values.foreach { case (_, raw, eff) => eff should be <= raw }
  }

  test("lshPairsAcross: id-ordered incremental batches union to the one-shot answer") {
    // the w24 streaming contract, proven on the kernel: a pair emits in
    // the batch where its LARGER doc arrives, and the union equals d03
    val d = docs(
      (1L, "w", "the quick brown fox jumps over the lazy dog again today"),
      (2L, "w", "the quick brown fox jumps over the lazy dog again tonight"),
      (5L, "w", "an entirely different sentence about spark shuffles and joins"),
      (6L, "w", "an entirely different sentence about spark shuffles and joins"),
      (9L, "w", "the quick brown fox jumps over the lazy dog again today"))
    val oneShot = Dedup.minhashLshPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    oneShot should not be empty
    // batch 1 = ids < 5, batch 2 = the rest (arrival order = id order)
    val b1 = Dedup.bandRowsFor(d.where($"doc_id" < 5))
    val b2 = Dedup.bandRowsFor(d.where($"doc_id" >= 5))
    val p1 = Dedup.lshPairsAcross(b1, b1, 32, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val p2 = Dedup.lshPairsAcross(b1.unionByName(b2), b2, 32, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // no pair emits twice, and the union is exactly the one-shot set
    (p1.toSet intersect p2.toSet) shouldBe empty
    (p1 ++ p2).toSet shouldBe oneShot
    // the cross-batch pair (1, 9) arrives in batch 2
    p2.toSet should contain((1L, 9L))
  }
}
