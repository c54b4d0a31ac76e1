package graft

import graft.operators.Similarity
import graft.functions.Vectors
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** 64-dim basis-ish vectors (the fixture embedding dimension). */
  private def vec(axis: Int, scale: Float = 1.0f): Array[Float] = {
    val a = Array.fill(64)(0.0f); a(axis) = scale; a
  }

  private def emb(rows: (Long, Array[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("binaryHammingTopK: hamming = sign flips, shortlist cut, cosine rerank") {
    def flipped(k: Int): Array[Float] =
      Array.tabulate(64)(i => if (i < k) -1.0f else 1.0f)
    val d = emb(
      (0L, flipped(0), 0),   // query: all positive
      (1L, flipped(2), 1),   // 2 sign flips
      (2L, flipped(5), 2),   // 5 flips
      (3L, flipped(40), 3),  // 40 flips — outside shortlist=2
      (4L, flipped(33), 4))  // 33 flips (bits straddle both halves)
    val out = Similarity.binaryHammingTopK(d, 0L, k = 2, shortlist = 2)
      .select($"vec_id", $"hamming").as[(Long, Long)].collect()
    // shortlist keeps the 2 closest by hamming; rerank orders by cosine
    // (fewer flips = higher cosine here), so order is 1 then 2
    out shouldBe Array((1L, 2L), (2L, 5L))
    // flips crossing the 32-bit half boundary still count exactly
    val wide = Similarity.binaryHammingTopK(d, 0L, k = 4, shortlist = 4)
      .select($"vec_id", $"hamming").as[(Long, Long)].collect().toMap
    wide(4L) shouldBe 33L
    wide(3L) shouldBe 40L
    an[IllegalArgumentException] should be thrownBy
      Similarity.binaryHammingTopK(d, 0L, k = 5, shortlist = 4)
  }

  test("retrievalMetrics: hand-ranked fixture — MRR, precision/recall ppm, the no-hit path") {
    def v2(x: Float, y: Float): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(0) = x; a(1) = y; a
    }
    // query 0 = (1,0); ranking by cosine then id: 1 (cos 1), 2 (cos 1,
    // tie -> id), 4 (cos .707), 3 (cos 0)
    val e = emb(
      (0L, v2(1, 0), 0), (1L, v2(1, 0), 0), (2L, v2(2, 0), 0),
      (3L, v2(0, 1), 0), (4L, v2(1, 1), 0))
    // relMod 2: evens relevant to query 0; class {0,2,4} -> total 2
    val r = Similarity.retrievalMetrics(e, queryMod = 100L, relMod = 2L, k = 3).collect()
    r.length shouldBe 1
    val m = r.head
    m.getLong(0) shouldBe 0L
    m.getLong(1) shouldBe 2L            // 2 and 4 in the top-3
    m.getLong(2) shouldBe 2L            // first relevant at rank 2
    m.getDouble(3) shouldBe 0.5         // MRR = 1/2 exactly
    m.getLong(4) shouldBe 666666L       // floor(2e6/3)
    m.getLong(5) shouldBe 1000000L      // both relevant docs retrieved
    // no relevant hit: relMod 5 leaves residue-0 = {0} (the query alone)
    val miss = Similarity.retrievalMetrics(e, 100L, 5L, 3).collect().head
    miss.getLong(1) shouldBe 0L
    miss.isNullAt(2) shouldBe true      // no first rank
    miss.getDouble(3) shouldBe 0.0      // MRR honest zero
    miss.isNullAt(5) shouldBe true      // recall undefined: empty class
  }

  test("cosine: parallel = 1, orthogonal = 0, antiparallel = -1") {
    val df = Seq(
      (vec(0), vec(0, 5.0f)),
      (vec(0), vec(1)),
      (vec(0), vec(0, -2.0f))
    ).toDF("a", "b")
    val out = df.select(round(Vectors.cosine($"a", $"b"), 6)).as[Double].collect()
    out shouldBe Array(1.0, 0.0, -1.0)
  }

  test("cosineTopK ranks by similarity with id tiebreak, excludes the query") {
    val d = emb(
      (0L, vec(0), 0),                                  // query
      (1L, vec(0, 2.0f), 0),                            // cos 1.0
      (2L, Array.tabulate(64)(i => if (i <= 1) 1.0f else 0.0f), 0), // cos ~0.707
      (3L, vec(1), 1))                                  // cos 0
    val out = Similarity.cosineTopK(d, 0L, 2).collect()
    out.map(_.getLong(0)) shouldBe Array(1L, 2L)
    out(0).getAs[Double]("cos_sim") shouldBe 1.0
  }

  test("cosineTopKPerLabel: per-group ranking, small groups keep all their rows") {
    // query = axis 0; label 1 has 3 candidates at distinct sims, label 2
    // has ONE candidate — a global top-k would starve it, the filtered
    // ranking must keep it at rk=1
    val df = emb(
      (0L, vec(0), 0),
      (1L, vec(0, 2.0f), 1),                         // cos 1.0
      (2L, Array.tabulate(64)(i => if (i <= 1) 1.0f else 0f), 1), // cos ~0.707
      (3L, vec(1), 1),                               // cos 0
      (4L, vec(5), 1),                               // cos 0 (tiebreak by id)
      (5L, vec(0, 0.5f), 2))                         // cos 1.0, lone tenant
    val out = Similarity.cosineTopKPerLabel(df, 0L, 3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    out.filter(_._1 == 1).map(t => (t._2, t._3)) shouldBe Array((1L, 1L), (2L, 2L), (3L, 3L))
    out.filter(_._1 == 2) shouldBe Array((2, 1L, 5L, 1.0))
    // k cuts within the big group only: vec 4 (cos 0, higher id) is out
    out.map(_._3) should not contain 4L
  }

  test("kmeansAssignExact refuses clusters past the exactness envelope, loudly") {
    // dim 2, |x'| = 5e5 after milli-quantization: dim·n²·A² <= 2^52
    // caps membership near 95 — 200 co-located vectors must trip the
    // guard instead of silently losing the bit-exact score contract
    // vec_id 1 is the lone far point so the two seeds (smallest ids 0
    // and 1) anchor DIFFERENT clusters — the failure must be the
    // envelope, not an emptied cluster
    val big = ((0L to 200L).filter(_ != 1L).map(i => (i, Array(500.0f, 500.0f), 0)) :+
      ((1L, Array(-500.0f, -500.0f), 1)))
    val df = big.toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException](
      Similarity.kmeansAssignExact(df, 2, 1).collect())
    e.getMessage should include("exact-score envelope")
    // well inside the envelope the same call succeeds
    val small = ((0L to 20L).filter(_ != 1L).map(i => (i, Array(500.0f, 500.0f), 0)) :+
      ((1L, Array(-500.0f, -500.0f), 1)))
    Similarity.kmeansAssignExact(small.toDF("vec_id", "embedding", "label"), 2, 1)
      .count() shouldBe 21L
  }

  test("kmeansAssignAuto: inside the envelope it IS the exact path, exact=1") {
    val small = ((0L to 20L).filter(_ != 1L).map(i => (i, Array(500.0f, 500.0f), 0)) :+
      ((1L, Array(-500.0f, -500.0f), 1))).toDF("vec_id", "embedding", "label")
    val auto = Similarity.kmeansAssignAuto(small, 2, 1).collect()
    auto.map(_.getLong(2)).toSet shouldBe Set(1L)
    auto.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
      Similarity.kmeansAssignExact(small, 2, 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("kmeansAssignAuto: past the envelope it reroutes to the float path, exact=0 — the switch point") {
    // the SAME fixture kmeansAssignExact refuses (200 co-located
    // members trip dim·n²·A² > 2^52 in round 1): auto must return a
    // full valid assignment instead of aborting, flagged inexact
    val big = ((0L to 200L).filter(_ != 1L).map(i => (i, Array(500.0f, 500.0f), 0)) :+
      ((1L, Array(-500.0f, -500.0f), 1))).toDF("vec_id", "embedding", "label")
    val out = Similarity.kmeansAssignAuto(big, 2, 1).collect()
    out.length shouldBe 201
    out.map(_.getLong(0)).toSet shouldBe (0L to 200L).toSet
    out.map(_.getLong(2)).toSet shouldBe Set(0L)                // float path
    val clusters = out.map(_.getLong(1)).toSet
    clusters.size shouldBe 2
    clusters.foreach(c => assert(c >= 0L && c < 2L))
    // the two antipodal blobs land in different clusters even on the
    // float path — the geometry is unambiguous
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    byId(1L) should not be byId(0L)
    (0L to 200L).filter(_ != 1L).map(byId).toSet.size shouldBe 1
  }

  test("cosineAboveThreshold filters strictly below threshold") {
    val d = emb((0L, vec(0), 0), (1L, vec(0), 0), (2L, vec(1), 1))
    val out = Similarity.cosineAboveThreshold(d, 0L, 0.5).collect()
    out.map(_.getLong(0)) shouldBe Array(1L)
  }

  test("hyperplaneBucket is deterministic and groups identical vectors") {
    val d = emb((1L, vec(3), 0), (2L, vec(3), 0), (3L, vec(7, -1f), 1))
    val b = d.select($"vec_id", Vectors.hyperplaneBucket($"embedding", 8).as("b"))
      .as[(Long, Long)].collect().toMap
    b(1L) shouldBe b(2L)
    val again = d.select(Vectors.hyperplaneBucket($"embedding", 8)).as[Long].collect()
    again.toSet should contain(b(1L))
  }

  test("lshNearNeighboursFixed finds identical vectors (same bucket, cos 1)") {
    val d = emb((1L, vec(5), 0), (2L, vec(5, 3f), 0), (3L, vec(9, -2f), 1))
    val out = Similarity.lshNearNeighboursFixed(d, 4, 0.9).collect()
    out.map(r => (r.getLong(0), r.getLong(1))) should contain((1L, 2L))
  }

  test("lshNearNeighbours (plain name) is the adaptive rule: equals the fixed form at adaptiveNbits") {
    val d = emb((1L, vec(5), 0), (2L, vec(5, 3f), 0), (3L, vec(9, -2f), 1))
    val nbits = Similarity.adaptiveNbits(3L)
    Similarity.lshNearNeighbours(d, 0.9).collect().map(_.toSeq).toSeq shouldBe
      Similarity.lshNearNeighboursFixed(d, nbits, 0.9).collect().map(_.toSeq).toSeq
  }

  test("ivfTopK searches only the query's bucket") {
    val d = emb((0L, vec(2), 0), (1L, vec(2, 4f), 0), (2L, vec(2, 0.5f), 0))
    val out = Similarity.ivfTopK(d, 0L, 4, 10).collect()
    out.map(_.getLong(0)).toSet shouldBe Set(1L, 2L)
    all(out.map(_.getAs[Double]("cos_sim"))) shouldBe 1.0
  }

  test("labelCentroids: cohesion of a label whose members are identical is 1") {
    val d = emb((1L, vec(0), 0), (2L, vec(0, 2f), 0), (3L, vec(1), 1))
    val out = Similarity.labelCentroids(d).collect()
    val l0 = out.filter(_.getInt(0) == 0)
    l0.length shouldBe 1
    l0(0).getAs[Double]("cohesion") shouldBe 1.0
  }

  test("ivfTrained: probing every list is exact; probing one list is a subset of it") {
    val embeddings = table("embeddings")
    val exact = Similarity.cosineTopK(embeddings, 0L, 10)
      .select($"vec_id", $"cos_sim").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val full = Similarity.ivfTrained(embeddings, 0L, nlist = 4, nprobe = 4, k = 10)
      .select($"vec_id", $"cos_sim").collect().map(r => (r.getLong(0), r.getDouble(1)))
    full.toSeq shouldBe exact.toSeq

    val one = Similarity.ivfTrained(embeddings, 0L, nlist = 4, nprobe = 1, k = 10)
      .select($"list_id").distinct().collect()
    one.length shouldBe 1 // all hits from the single probed list
  }

  test("pqTopK is exact when codebooks can represent every subvector") {
    // 4 prototypes, codebookSize 4: each subspace has <= 4 distinct
    // subvectors, so KMeans centroids land ON the points, quantization
    // error is zero, and ADC == true squared L2 — PQ must equal exact
    // euclidean top-k including tie order
    val rnd = new scala.util.Random(3)
    val protos = Array.fill(4)(Array.fill(64)((rnd.nextInt(9) - 4).toFloat))
    val rows = (0L until 28L).map(i => (i, protos((i % 4).toInt), (i % 4).toInt))
    val d = emb(rows: _*)
    def sq(a: Array[Float], b: Array[Float]): Double =
      (0 until 64).map(i => (a(i) - b(i)).toDouble * (a(i) - b(i))).sum
    val expected = rows.filter(_._1 != 0L)
      .map { case (id, v, _) => (id, sq(v, protos(0))) }
      .sortBy { case (id, dist) => (dist, id) }.take(5).map(_._1)
    val out = Similarity.pqTopK(d, 0L, k = 5, m = 8, codebookSize = 4)
      .select($"vec_id").as[Long].collect()
    out.toSeq shouldBe expected
  }

  test("pqTopK is deterministic on the fixture corpus") {
    val embeddings = table("embeddings")
    val a = Similarity.pqTopK(embeddings, 0L, k = 10).collect()
    val b = Similarity.pqTopK(embeddings, 0L, k = 10).collect()
    a.length shouldBe 10
    a.map(_.toString).toSeq shouldBe b.map(_.toString).toSeq
  }

  test("ivfAdcTopK with nprobe=nlist and exact codebooks equals euclidean top-k") {
    // same zero-quantization-error fixture as the pqTopK gate: probing
    // every list removes the pruning error, exact codebooks remove the
    // PQ error — IVF-ADC must reduce to exact squared-L2 order
    val rnd = new scala.util.Random(3)
    val protos = Array.fill(4)(Array.fill(64)((rnd.nextInt(9) - 4).toFloat))
    val rows = (0L until 28L).map(i => (i, protos((i % 4).toInt), (i % 4).toInt))
    val d = emb(rows: _*)
    def sq(a: Array[Float], b: Array[Float]): Double =
      (0 until 64).map(i => (a(i) - b(i)).toDouble * (a(i) - b(i))).sum
    val expected = rows.filter(_._1 != 0L)
      .map { case (id, v, _) => (id, sq(v, protos(0))) }
      .sortBy { case (id, dist) => (dist, id) }.take(5).map(_._1)
    val out = Similarity.ivfAdcTopK(d, 0L, nlist = 4, nprobe = 4, k = 5,
        m = 8, codebookSize = 4)
      .select($"vec_id").as[Long].collect()
    out.toSeq shouldBe expected
  }

  test("ivfAdcTopK pruning: nprobe=1 results come from one list and keep full-probe order") {
    val embeddings = table("embeddings")
    // k larger than the corpus -> the full probe is the complete ADC
    // ranking; the pruned run must be its restriction to the probed list
    val full = Similarity.ivfAdcTopK(embeddings, 0L, nlist = 4, nprobe = 4, k = 1000)
      .select($"vec_id", $"list_id").as[(Long, Int)].collect()
    val pruned = Similarity.ivfAdcTopK(embeddings, 0L, nlist = 4, nprobe = 1, k = 40)
      .select($"vec_id", $"list_id").as[(Long, Int)].collect()
    val probedList = pruned.map(_._2).toSet
    probedList.size shouldBe 1
    val fullRestricted = full.filter(r => probedList(r._2)).map(_._1).take(40).toSeq
    pruned.map(_._1).toSeq shouldBe fullRestricted
  }

  test("recallAtK: probing every IVF list is total recall; LSH recall in [0,1]") {
    val embeddings = table("embeddings")
    // ivfTrained with nprobe=nlist degrades to exact search → recall 1
    val exhaustive = Similarity.ivfTrained(embeddings, 0L, nlist = 4, nprobe = 4, k = 10)
    Similarity.recallAtK(embeddings, 0L, 10, exhaustive) shouldBe 1.0
    // bucketed probe trades recall for scanned lists — still a valid rate
    val bucketed = Similarity.ivfTopK(embeddings, 0L, nbits = 4, k = 10)
    val r = Similarity.recallAtK(embeddings, 0L, 10, bucketed)
    r should (be >= 0.0 and be <= 1.0)
  }

  test("mmrRerank: lambda=1 is pure relevance; diversity stops duplicate crowding") {
    // query 0; ids 1,2 duplicates of the near-query direction; id 3 is a
    // distinct direction with lower relevance; id 4 orthogonal-ish
    val q = Array.fill(8)(1.0f)
    val nearDup = Array.tabulate(8)(i => if (i == 7) 0.9f else 1.0f)
    // modest relevance to q but nearly orthogonal to nearDup: the
    // diversity penalty must separate it from the duplicate twin
    val other = Array.tabulate(8)(i => if (i < 4) 1.0f else if (i == 7) 0.5f else -1.0f)
    val ortho = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val d = emb((0L, q, 0), (1L, nearDup, 0), (2L, nearDup, 0),
      (3L, other, 0), (4L, ortho, 0))
    // pure relevance: same order as cosineTopK
    val pure = Similarity.mmrRerank(d, 0L, 4, 3, lambda = 1.0)
      .orderBy($"rank").select($"vec_id").as[Long].collect()
    val topk = Similarity.cosineTopK(d, 0L, 3)
      .select($"vec_id").as[Long].collect()
    pure shouldBe topk
    // diversified: after picking one near-dup, its twin (max-sim 1.0 to
    // the pick) must lose to the distinct direction
    val div = Similarity.mmrRerank(d, 0L, 4, 3, lambda = 0.3)
      .orderBy($"rank").select($"vec_id").as[Long].collect()
    // most-relevant first; then the orthogonal direction (max diversity),
    // then the other distinct one — the duplicate twin (penalty 1.0
    // against its picked sibling) falls out of the top-3 entirely
    div shouldBe Array(1L, 4L, 3L)
  }

  test("mmrRerank matches an independent local reference on random pools") {
    val rnd = new scala.util.Random(41)
    val rows = (0L until 20L).map(i =>
      (i, Array.fill(16)((rnd.nextInt(9) - 4).toFloat), 0))
    val d = emb(rows: _*)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val s = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na == 0 || nb == 0) 0.0 else s / (na * nb)
    }
    val lambda = 0.7
    val qv = rows.head._2
    // reference: same greedy, coded independently over plain collections.
    // Relevance enters at cosineTopK's 4-decimal rounding, as in the
    // engine's pool
    val pool = rows.tail
      .map { case (id, v, _) => (id,
        BigDecimal(cos(qv, v)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, v) }
      .sortBy { case (id, rel, _) => (-rel, id) }.take(8)
    var sel = Vector.empty[(Long, Array[Float])]
    var rem = pool
    while (sel.length < 4 && rem.nonEmpty) {
      val best = rem.map { case (id, rel, v) =>
        val pen = if (sel.isEmpty) 0.0 else sel.map(s => cos(v, s._2)).max
        (id, lambda * rel - (1 - lambda) * pen, v)
      }.minBy { case (id, m, _) => (-m, id) }
      sel :+= ((best._1, best._3))
      rem = rem.filterNot(_._1 == best._1)
    }
    val got = Similarity.mmrRerank(d, 0L, 8, 4, lambda)
      .orderBy($"rank").select($"vec_id").as[Long].collect().toSeq
    got shouldBe sel.map(_._1)
  }

  test("knnJoin: duplicate cliques rank each other by id, identical to brute force") {
    // 5 copies of vector A (ids 0-4), 3 copies of B (10-12), one C (20):
    // the dedup-first path must reproduce the direct all-member ranking,
    // where copies are each other's nearest at the self-cosine with ties
    // broken on the smallest neighbour id
    val a = Array.fill(64)(1.0f)
    val b = Array.tabulate(64)(i => if (i < 60) 1.0f else -1.0f)
    val c = Array.tabulate(64)(i => (i % 5 - 2).toFloat)
    val rows = (0L to 4L).map(i => (i, a, 0)) ++
      (10L to 12L).map(i => (i, b, 0)) ++ Seq((20L, c, 0))
    val d = emb(rows: _*)
    val out = Similarity.knnJoin(d, 4, 3)
      .select($"vec_id", $"neighbor_id", $"nn_rank")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    // id 0's top-3 are its duplicate siblings 1,2,3 (cos 1 > anything)
    out.filter(_._1 == 0L).map(t => (t._2, t._3)) shouldBe
      Seq((1L, 1L), (2L, 2L), (3L, 3L))
    // id 4 prefers siblings 0,1,2 over the near-identical B clique
    out.filter(_._1 == 4L).map(_._2) shouldBe Seq(0L, 1L, 2L)
    // B copies: two siblings first, then (if bucketed together) an A copy
    out.filter(_._1 == 11L).map(_._2).take(2) shouldBe Seq(10L, 12L)
  }

  test("knnJoin matches a local brute force over the same buckets") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 30L).map { i =>
      (i, Array.fill(64)((rnd.nextInt(9) - 4).toFloat), (i % 3).toInt)
    }
    val d = emb(rows: _*)
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
    val expected = rows.flatMap { case (id, v, _) =>
      rows.filter(o => o._1 != id && buckets(o._1) == buckets(id))
        .map(o => (o._1, cos(v, o._2)))
        .sortBy { case (oid, c) => (-c, oid) }
        .take(3).zipWithIndex
        .map { case ((oid, _), k) => (id, oid, (k + 1).toLong) }
    }.sorted
    val out = Similarity.knnJoin(d, 4, 3)
      .select($"vec_id", $"neighbor_id", $"nn_rank")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    out shouldBe expected
  }

  test("knnJoinAdaptive applies the adaptiveNbits rule to the corpus count") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 40L).map { i =>
      (i, Array.fill(64)((rnd.nextInt(9) - 4).toFloat), (i % 3).toInt)
    }
    val d = emb(rows: _*)
    // 40 vectors -> nbits = 4 (the floor); must equal the explicit call
    val fixed = Similarity.knnJoin(d, Similarity.adaptiveNbits(40L), 3)
      .select($"vec_id", $"neighbor_id", $"nn_rank")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val adaptive = Similarity.knnJoinAdaptive(d, 3)
      .select($"vec_id", $"neighbor_id", $"nn_rank")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    adaptive shouldBe fixed
  }

  test("adaptiveNbits: mean bucket size stays bounded, bits grow with log2(n)") {
    // rule: smallest b in [min,max] with n <= target << b
    Similarity.adaptiveNbits(1L) shouldBe 4
    Similarity.adaptiveNbits(256L) shouldBe 4      // 16 << 4 = 256, boundary
    Similarity.adaptiveNbits(257L) shouldBe 5
    Similarity.adaptiveNbits(500L) shouldBe 5      // sf0.001/0.01 fixture
    Similarity.adaptiveNbits(2000L) shouldBe 7     // sf0.1 fixture
    Similarity.adaptiveNbits(Long.MaxValue) shouldBe 16 // capped
    // the bound itself: n / 2^nbits <= target whenever uncapped
    for (n <- Seq(1L, 100L, 10000L, 1000000L)) {
      val b = Similarity.adaptiveNbits(n)
      (n.toDouble / (1L << b)) should be <= 16.0
    }
  }

  test("int8Quantize: codes are scale-invariant, bounded, zero-safe") {
    val v = Array.tabulate(64)(d => (math.sin(d + 1) * 0.8).toFloat)
    val scaled = v.map(_ * 3.0f)
    val d = emb((0L, v, 0), (1L, scaled, 0), (2L, Array.fill(64)(0.0f), 1))
    val q = Similarity.int8Quantize(d).orderBy($"vec_id").collect()
    val codes = q.map(_.getSeq[Byte](3))
    // per-vector normalization cancels a global scalar: 3·v codes == v codes
    codes(1) shouldBe codes(0)
    codes(0).foreach(c => math.abs(c.toInt) should be <= 127)
    codes(0).map(c => math.abs(c.toInt)).max shouldBe 127 // max component saturates
    codes(2).forall(_ == 0) shouldBe true                 // zero vector, no 0/0
  }

  test("int8TopK: high recall vs exact float cosine on the fixture embeddings") {
    val e = table("embeddings")
    val approx = Similarity.int8TopK(Similarity.int8Quantize(e), 0L, 10)
    approx.collect().foreach(r => r.getDouble(2) should (be >= -1.0001 and be <= 1.0001))
    Similarity.recallAtK(e, 0L, 10, approx) should be >= 0.8
  }

  test("lshPairsAdaptive equals lshNearNeighboursFixed at the derived nbits") {
    val rows = (0L until 40L).map { i =>
      val a = Array.tabulate(64)(d => math.sin(i * 64 + d).toFloat)
      (i, a, (i % 4).toInt)
    }
    val d = emb(rows: _*)
    // 40 vecs → nbits = 4 (40 <= 16<<4); adaptive must equal the fixed form
    val fixed = Similarity.lshNearNeighboursFixed(d, 4, 0.1)
      .collect().map(_.toSeq).toSeq
    val adaptive = Similarity.lshPairsAdaptive(d, 0.1)
      .drop("nbits").collect().map(_.toSeq).toSeq
    adaptive shouldBe fixed
  }

  test("lshRerankTopK at maxHamming=nbits probes every bucket and equals exact top-k") {
    val embeddings = table("embeddings")
    val exact = Similarity.cosineTopK(embeddings, 0L, 10)
      .select($"vec_id").as[Long].collect().toSeq
    val all = Similarity.lshRerankTopK(embeddings, 0L, nbits = 4, k = 10,
      maxHamming = 4).select($"vec_id").as[Long].collect().toSeq
    all shouldBe exact
  }

  test("lshRerankTopK default probe: candidates within Hamming 1, ranked by cosine") {
    val embeddings = table("embeddings")
    val out = Similarity.lshRerankTopK(embeddings, 0L, nbits = 4, k = 10).collect()
    out.length shouldBe 10
    all(out.map(_.getAs[Int]("hamming"))) should be <= 1
    val sims = out.map(_.getAs[Double]("cos_sim")).toSeq
    sims shouldBe sims.sorted.reverse
    // the probe widens single-bucket IVF: its candidates are a superset
    val ivf = Similarity.ivfTopK(embeddings, 0L, 4, 10)
      .select($"vec_id").as[Long].collect().toSet
    val probe = Similarity.lshRerankTopK(embeddings, 0L, nbits = 4, k = 500)
      .select($"vec_id").as[Long].collect().toSet
    ivf.subsetOf(probe) shouldBe true
  }

  test("labelCentroidDistances: hand-computed milli distances, floor on negative sums") {
    val rows = Seq(
      (0L, 0, Array(1.0f, 1.0f)),
      (1L, 0, Array(2.0f, 2.0f)),      // label 0 centroid (1500, 1500) milli
      (2L, 1, Array(-1.0f, 0.0f)),
      (3L, 1, Array(-2.0f, 1.0f)))     // sums (-3000, 1000), n=2 -> floor (-1500, 500)
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.labelCentroidDistances(rows).collect()
    out.length shouldBe 1
    val r = out.head
    (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)) shouldBe ((0, 1, 2L, 2L))
    // d = (1500-(-1500), 1500-500) = (3000, 1000) -> 9e6 + 1e6
    r.getLong(4) shouldBe 10000000L
  }

  test("kmeansAssignExact: separated blobs recover their generating cluster") {
    // two tight blobs far apart in a 4-dim space; seeds 0 and 1 land one
    // in each blob, so a single Lloyd step must split them perfectly
    val rows = Seq(
      (0L, Array(1.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(1.1f, 0.9f, 0.0f, 0.0f)),
      (4L, Array(0.9f, 1.1f, 0.0f, 0.0f)),
      (1L, Array(-1.0f, -1.0f, 0.0f, 0.0f)),
      (3L, Array(-1.1f, -0.9f, 0.0f, 0.0f)),
      (5L, Array(-0.9f, -1.2f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansAssignExact(rows, k = 2, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(0L) shouldBe out(2L)
    out(0L) shouldBe out(4L)
    out(1L) shouldBe out(3L)
    out(1L) shouldBe out(5L)
    out(0L) should not be out(1L)
  }

  test("kmeansAssignExact: equidistant point breaks the score tie toward the smaller cluster id") {
    val rows = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(-1.0f, 0.0f)),
      (2L, Array(0.0f, 5.0f))) // exactly equidistant from both seeds
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansAssignExact(rows, k = 2, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(2L) shouldBe 0L
  }

  test("kmeansAssignExact matches the fixture oracle's cluster balance invariants") {
    val out = Similarity.kmeansAssignExact(table("embeddings"), k = 4, iterations = 2)
    val sizes = out.groupBy($"cluster").count()
      .collect().map(_.getLong(1))
    sizes.sum shouldBe table("embeddings").count()
    sizes.length shouldBe 4
    all(sizes) should be > 0L
  }

  test("matryoshkaTopK equals a two-stage brute force over the fixture") {
    val emb = table("embeddings").select($"vec_id", $"label", $"embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val q = emb.find(_._1 == 0L).get._3
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val qp = q.take(16)
    val short = emb.filter(_._1 != 0L)
      .map { case (id, lb, v) => (id, lb, v, cos(v.take(16), qp)) }
      .sortBy { case (id, _, _, c) => (-c, id) }.take(50)
    val expected = short
      .map { case (id, lb, v, c) => (id, lb, c, cos(v, q)) }
      .sortBy { case (id, _, _, f) => (-f, id) }.take(10) // unrounded rank
      .map { case (id, lb, c, f) => (id, lb, r4(c), r4(f)) }
      .sortBy { case (id, _, _, f) => (-f, id) } // rounded presentation sort
    val out = Similarity.matryoshkaTopK(table("embeddings"), 0L, 16, 50, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    out.toSeq shouldBe expected.toSeq
    // the coarse stage genuinely reorders vs the full-width ranking
    // (otherwise the gate would not witness the two-stage shape)
    val fullTop = emb.filter(_._1 != 0L)
      .map { case (id, _, v) => (id, cos(v, q)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
    out.map(_._1).toSeq should not be fullTop.toSeq
  }

  test("matryoshkaTopK: shortlist >= corpus degrades to exact full top-k") {
    val n = table("embeddings").count().toInt
    val exactTop = Similarity.cosineTopK(table("embeddings"), 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val mrl = Similarity.matryoshkaTopK(table("embeddings"), 0L, 16, n, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    mrl.sortBy(_._1).toSeq shouldBe exactTop.sortBy(_._1).toSeq
  }

  test("rrfFusion: fused scores recompute from independently ranked legs") {
    // poolK spans the sf0.001 corpus so leg overlap is structural (every
    // doc id shares the embedding id domain), exercising the both-leg path
    val poolK = 60; val k = 30; val kappa = 60
    // keyword leg ground truth: the (already oracle-gated) tf-idf top-20
    val kwLeg = graft.operators.Search
      .keywordSearch(table("documents"), Seq("vector", "spark", "window", "hash"), poolK)
      .select($"doc_id").as[Long].collect() // already (score desc, id) ordered
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    // dense leg ground truth: exact cosine in plain Scala
    val embRows = table("embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val q = embRows.find(_._1 == 0L).get._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecLeg = embRows.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(v, q)) }
      .sortBy { case (id, c) => (-c, id) }.take(poolK)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val expected = (kwLeg.keySet ++ vecLeg.keySet).toSeq
      .map { id =>
        val score = kwLeg.get(id).map(r => 1000000L / (kappa + r)).getOrElse(0L) +
          vecLeg.get(id).map(r => 1000000L / (kappa + r)).getOrElse(0L)
        (id, kwLeg.get(id), vecLeg.get(id), score)
      }
      .sortBy { case (id, _, _, s) => (-s, id) }.take(k)
    val out = Similarity
      .rrfFusion(table("documents"), table("embeddings"),
        Seq("vector", "spark", "window", "hash"), 0L, poolK, k)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3)))
    out.toSeq shouldBe expected
    // the two legs genuinely disagree (otherwise the gate degenerates
    // to a single ranking and fusion is vacuous)
    kwLeg.keySet should not be vecLeg.keySet
    out.exists(r => r._2.nonEmpty && r._3.nonEmpty) shouldBe true
  }

  test("rrfFusion: single-leg docs keep a null rank and one-term score") {
    // doc 7 matches the keyword but has no vector; vec 9 has a vector
    // but no text — each must surface with the OTHER leg's rank null
    val docs = Seq((7L, "spark spark spark"), (8L, "nothing relevant"))
      .toDF("doc_id", "text")
    val e = emb((0L, vec(0), 0), (9L, vec(0, 2.0f), 1), (8L, vec(1), 2))
    val out = Similarity.rrfFusion(docs, e, Seq("spark"), 0L, poolK = 5, k = 5)
      .collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3)))).toMap
    // doc 7: kw rank 1, no vector leg → score is the kw term alone
    out(7L) shouldBe ((Some(1L), None, 1000000L / 61))
    // vec 9: cosine 1.0 → rank 1 in the dense leg, no keyword hit
    out(9L) shouldBe ((None, Some(1L), 1000000L / 61))
    // doc/vec 8 appears once per leg it belongs to — orthogonal vector
    // ranks 2, no 'spark' in text so no kw rank
    out(8L) shouldBe ((None, Some(2L), 1000000L / 62))
  }
}
