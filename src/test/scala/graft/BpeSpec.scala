package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  /** Independent single-machine reference: same BPE dialect (no
    * end-of-word marker, greedy left-to-right apply, ties by
    * (count DESC, left, right)), separately coded over plain lists.
    */
  /** Greedy left-to-right rewrite, coded independently of the engine's. */
  private def refApply(syms: List[String], l: String, r: String): List[String] =
    syms match {
      case a :: b :: rest if a == l && b == r => (l + r) :: refApply(rest, l, r)
      case a :: rest => a :: refApply(rest, l, r)
      case Nil => Nil
    }

  private def refTrain(corpus: Seq[String], numMerges: Int): Seq[(String, String)] = {
    var words: Vector[(List[String], Long)] = corpus
      .flatMap(_.toLowerCase(java.util.Locale.ROOT).split("\\s+"))
      .filter(w => w.codePointCount(0, w.length) >= 2)
      .groupBy(identity).view.mapValues(_.size.toLong).toVector
      // code-point split, matching the engine (and surviving astral chars)
      .map { case (w, n) =>
        (w.codePoints().toArray.toList.map(cp => new String(Character.toChars(cp))), n)
      }
    val out = Seq.newBuilder[(String, String)]
    var continue = true
    var round = 0
    while (continue && round < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- words; Seq(a, b) <- syms.sliding(2))
        counts((a, b)) = counts.getOrElse((a, b), 0L) + n
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= 2 =>
          out += ((l, r))
          words = words.map { case (syms, n) => (refApply(syms, l, r), n) }
          round += 1
        case _ => continue = false
      }
    }
    out.result()
  }

  test("learned merges equal the independent reference on the Sennrich-style corpus") {
    val corpus = Seq(
      "low low low low low",
      "lower lower newest newest newest",
      "newest newest newest widest widest widest")
    val merges = Bpe.train(docs(corpus: _*), 8)
    merges.map(m => (m.left, m.right)) shouldBe refTrain(corpus, 8)
    merges.map(_.rank) shouldBe (0 until merges.size)
  }

  test("training is partitioning-independent (deterministic tie-break)") {
    val corpus = Seq("aa ab aa ab ba", "ab aa ba ba bb", "bb ab aa ba")
    val d = docs(corpus: _*)
    val a = Bpe.train(d, 6).map(m => (m.left, m.right))
    val b = Bpe.train(d.repartition(7), 6).map(m => (m.left, m.right))
    a shouldBe b
    a shouldBe refTrain(corpus, 6)
  }

  test("training stops early when no pair repeats") {
    Bpe.train(docs("ab cd"), 10) shouldBe empty
  }

  test("encode: tokens concatenate back to the words; more merges never add tokens") {
    val corpus = Seq("banana bandana", "banana banana cabana")
    val d = docs(corpus: _*)
    val merges = Bpe.train(d, 10)
    val enc = Bpe.encode(d, merges).collect()
    val texts = corpus
    for (r <- enc) {
      val toks = r.getSeq[String](2)
      toks.mkString shouldBe texts(r.getLong(0).toInt)
        .toLowerCase(java.util.Locale.ROOT).split("\\s+").mkString
      r.getLong(1) shouldBe toks.length.toLong
    }
    // zero merges degrade to the character split, an upper bound on length
    val chars = Bpe.encode(d, Nil).collect()
    for ((a, b) <- enc.sortBy(_.getLong(0)).zip(chars.sortBy(_.getLong(0))))
      a.getLong(1) should be <= b.getLong(1)
  }

  test("astral (non-BMP) characters stay whole code points through train and encode") {
    // 𝕏 (U+1D54F) and 😀 (U+1F600) are surrogate PAIRS in UTF-16: a
    // char-level split would learn merges over unpaired halves and emit
    // invalid strings
    val corpus = Seq("𝕏a 𝕏a 𝕏a",
      "😀b 😀b")
    val d = docs(corpus: _*)
    val merges = Bpe.train(d, 4)
    merges.map(m => (m.left, m.right)) shouldBe refTrain(corpus, 4)
    // the top merge glues the WHOLE astral char to its tail
    merges.head shouldBe Bpe.Merge(0, "𝕏", "a")
    val enc = Bpe.encode(d, merges).collect()
    for (r <- enc; tok <- r.getSeq[String](2)) {
      // every emitted token is valid UTF-16: no unpaired surrogates
      val cps = tok.codePoints().toArray
      new String(cps, 0, cps.length) shouldBe tok
      tok.foreach { c =>
        if (Character.isHighSurrogate(c))
          Character.isLowSurrogate(tok.charAt(tok.indexOf(c) + 1)) shouldBe true
      }
    }
    enc.map(_.getSeq[String](2).mkString).sorted shouldBe
      corpus.map(_.split(" ").mkString).sorted
  }

  test("fixture smoke: merges learn on the documents table and encode runs") {
    val d = table("documents").limit(100)
    val merges = Bpe.train(d, 5)
    merges should not be empty
    // frequent English digraphs dominate the fixture word soup; the top
    // merge must be a two-character token
    (merges.head.left + merges.head.right).length shouldBe 2
    val enc = Bpe.encode(d, merges)
    enc.count() shouldBe 100
  }
}
