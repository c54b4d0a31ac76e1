package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors
import graft.implicits._

/** Similarity search over an embedding column (north-star extension).
  *
  * Scale path: brute-force cosine is the correctness baseline (a single
  * narrow pass when the query side is broadcast). The LSH-bucketed variant
  * is the 100 TB shape: hyperplane bucketing turns top-k search into a
  * bucket-equi-join, trading recall for a shuffle bounded by bucket size.
  */
object Similarity {

  /** All vectors within cosine ≥ threshold of the query vector (the vector
    * with `queryId`). The 1-row query side is a broadcast cross join: the
    * big side streams through codegen once, no shuffle.
    */
  def cosineAboveThreshold(embeddings: DataFrame, queryId: Long, threshold: Double): DataFrame = {
    val q = embeddings.where($"vec_id" === queryId).select($"embedding".as("q"))
    embeddings.where($"vec_id" =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos_sim", Vectors.cosine($"embedding", $"q"))
      .where($"cos_sim" >= threshold)
      .select($"vec_id", $"label", round($"cos_sim", 4).as("cos_sim"))
      .orderBy($"vec_id")
  }

  /** Brute-force top-k nearest neighbours to the query vector, deterministic
    * tiebreak on vec_id. k is tiny → TakeOrderedAndProject, no full sort.
    */
  def cosineTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = embeddings.where($"vec_id" === queryId).select($"embedding".as("q"))
    embeddings.where($"vec_id" =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos_sim", Vectors.cosine($"embedding", $"q"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(k)
      .select($"vec_id", $"label", round($"cos_sim", 4).as("cos_sim"))
  }

  /** Filtered / per-group top-k (s13): the "per-tenant ANN" production
    * shape — top-k nearest neighbours WITHIN each metadata group
    * (label), the pre-filtered search every multi-tenant vector store
    * serves (filtering after a global top-k starves small tenants; the
    * filter must partition the ranking). One broadcast of the 1-row
    * query, one window partitioned by the filter key — the rank is a
    * WindowGroupLimit plan (per-partition map-side top-k trim before
    * the exchange), so at 100 TB each group ships only k candidates.
    * Deterministic tiebreak on vec_id.
    */
  def cosineTopKPerLabel(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    require(k >= 1, "cosineTopKPerLabel: k must be >= 1")
    val q = embeddings.where($"vec_id" === queryId).select($"embedding".as("q"))
    val w = Window.partitionBy($"label").orderBy($"cos_sim".desc, $"vec_id")
    embeddings.where($"vec_id" =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos_sim", Vectors.cosine($"embedding", $"q"))
      .withColumn("rk", row_number().over(w))
      .where($"rk" <= k)
      .select($"label", $"rk".cast("long").as("rk"), $"vec_id",
        round($"cos_sim", 4).as("cos_sim"))
      .orderBy($"label", $"rk")
  }

  /** 1-bit binary-quantized search (s16) — the sign-bit sketch pass
    * (the Hamming-prefilter regime faiss's binary indexes and RaBitQ
    * descend from): each 64-dim vector collapses to TWO BIGINT
    * signatures, candidate ranking is `bit_count(xor)` — 16 bytes and
    * a handful of ALU ops per vector instead of 256 bytes and 64
    * FMAs — and the exact cosine runs only on a fixed shortlist. The
    * 100 TB shape: the sketch pass reads 1/16 of the vector bytes
    * (with a materialized signature column, 1/16 of the scan), the
    * shortlist cut is a TakeOrdered (per-partition top-N, no global
    * sort), and the rerank cost is `shortlist`, not corpus-sized.
    * Deterministic: both cuts tie-break on vec_id.
    */
  def binaryHammingTopK(embeddings: DataFrame, queryId: Long, k: Int,
                        shortlist: Int = 40): DataFrame = {
    require(k >= 1 && shortlist >= k,
      s"binaryHammingTopK: need 1 <= k ($k) <= shortlist ($shortlist)")
    // Horner fold of 32 sign bits per half: sig = Σ bit_i · 2^(32−i) —
    // two BIGINTs, never touching the 64th bit, so the oracle's shift
    // arithmetic can replay it without signed-overflow divergence
    def half(off: Int) =
      aggregate(sequence(lit(off + 1), lit(off + 32)), lit(0L),
        (acc, i) => acc * 2 +
          when(element_at($"embedding", i) > lit(0f), lit(1L)).otherwise(lit(0L)))
    val sigs = embeddings.select($"vec_id", $"label", $"embedding",
      half(0).as("sig_a"), half(32).as("sig_b"))
    val q = sigs.where($"vec_id" === queryId)
      .select($"embedding".as("q"), $"sig_a".as("qa"), $"sig_b".as("qb"))
    sigs.where($"vec_id" =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("hamming",
        (bit_count($"sig_a".bitwiseXOR($"qa")) +
          bit_count($"sig_b".bitwiseXOR($"qb"))).cast("long"))
      .orderBy($"hamming", $"vec_id").limit(shortlist)
      .withColumn("cos_sim", Vectors.cosine($"embedding", $"q"))
      .orderBy($"cos_sim".desc, $"vec_id").limit(k)
      .select($"vec_id", $"label", $"hamming", round($"cos_sim", 4).as("cos_sim"))
  }

  /** Retrieval-evaluation harness (s15) — the IR metrics every search
    * stack reports against a judged query set: per query, MRR (one IEEE
    * division of the first-relevant rank), precision@k and recall@k as
    * exact integer ppm. The ranking under evaluation is the exact
    * brute-force cosine top-k (the s02 baseline generalized to a query
    * SET); relevance is the caller's residue-class qrels (`did % relMod
    * == qid % relMod`, self excluded) so ground truth is independent of
    * the geometry being ranked. Queries with no relevant hit in the
    * top-k report `mrr = 0` and a null first rank — the honest miss.
    *
    * Scale shape: the query set broadcasts (a handful of judged
    * queries against any corpus size); the corpus scans once; the
    * per-query top-k trims map-side (row_number + rank filter → Spark's
    * WindowGroupLimit, the s13 lever); relevance totals come from a
    * relMod-sized residue histogram, broadcast back — never a second
    * corpus pass.
    */
  def retrievalMetrics(embeddings: DataFrame, queryMod: Long, relMod: Long,
                       k: Int): DataFrame = {
    require(queryMod >= 1 && relMod >= 2 && k >= 1,
      "retrievalMetrics: degenerate query/relevance parameters")
    val e = embeddings.select($"vec_id", $"embedding")
    val q = e.where($"vec_id" % queryMod === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qv"),
        Vectors.norm($"embedding").as("qn"))
    val c = e.select($"vec_id".as("did"), $"embedding".as("dv"),
      Vectors.norm($"embedding").as("dn"))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"did")
    val top = c.crossJoin(broadcast(q)).where($"did" =!= $"qid")
      .withColumn("cos", Vectors.cosineWithNorms($"dv", $"qv", $"dn", $"qn"))
      .withColumn("rnk", row_number().over(w))
      .where($"rnk" <= k)
      .withColumn("rel",
        ($"did" % relMod === $"qid" % relMod).cast("long"))
    val hist = e.groupBy(($"vec_id" % relMod).as("rc"))
      .agg(count(lit(1)).as("class_n"))
    val agg = top.groupBy($"qid").agg(
      sum($"rel").as("n_rel"),
      min(when($"rel" === 1L, $"rnk")).cast("long").as("first_rel_rank"))
    def floorDiv(a: org.apache.spark.sql.Column,
                 b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      ((a - pmod(a, b)) / b).cast("long")
    agg.join(broadcast(hist), agg("qid") % relMod === hist("rc"))
      .select($"qid", $"n_rel", $"first_rel_rank",
        coalesce(lit(1.0) / $"first_rel_rank", lit(0.0)).as("mrr"),
        floorDiv($"n_rel" * 1000000L, lit(k.toLong)).as("precision_ppm"),
        // total relevant excludes the query itself (always in its class)
        floorDiv($"n_rel" * 1000000L, $"class_n" - 1L).as("recall_ppm"))
      .orderBy($"qid")
  }

  /** Matryoshka truncate-then-rerank top-k (s14): the two-stage search
    * shape MRL-trained embeddings exist for (Kusupati et al. 2022,
    * NeurIPS) — score EVERY vector on only its first `prefixDims`
    * dimensions (a prefix of an MRL embedding is itself a usable
    * embedding), keep a `shortlist`, and rerank just the shortlist at
    * full dimensionality. At 100 TB the corpus-wide pass reads a
    * `prefixDims/dims` fraction of the vector bytes (with a sliced
    * column the scan itself shrinks; here the slice drops the FLOPs and
    * the sort keys), and the full-width cosine — the expensive kernel —
    * runs on `shortlist` rows, not the corpus. Both stages are
    * TakeOrdered plans (per-partition top-N trim before a single-reduce
    * merge, never a global sort), deterministic tiebreak on vec_id.
    */
  def matryoshkaTopK(embeddings: DataFrame, queryId: Long, prefixDims: Int,
                     shortlist: Int, k: Int): DataFrame = {
    require(prefixDims >= 1, s"prefixDims must be >= 1, got $prefixDims")
    require(k >= 1 && shortlist >= k,
      s"need shortlist >= k >= 1, got shortlist=$shortlist k=$k")
    val q = embeddings.where($"vec_id" === queryId)
      .select($"embedding".as("q"),
        slice($"embedding", 1, prefixDims).as("qp"))
    embeddings.where($"vec_id" =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("coarse",
        Vectors.cosine(slice($"embedding", 1, prefixDims), $"qp"))
      .orderBy($"coarse".desc, $"vec_id")
      .limit(shortlist)
      .withColumn("cos_sim", Vectors.cosine($"embedding", $"q"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(k)
      .select($"vec_id", $"label", round($"coarse", 4).as("coarse_sim"),
        round($"cos_sim", 4).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
  }

  /** Maximal-Marginal-Relevance rerank (Carbonell & Goldstein 1998,
    * SIGIR — the diversity rerank every retrieval pipeline bolts onto its
    * ANN top-N): greedily pick k of the `poolSize` most query-similar
    * candidates, each pick maximizing
    * `λ·sim(q,d) − (1−λ)·max_{s∈picked} sim(d,s)`, so near-duplicate
    * candidates stop crowding out coverage.
    *
    * Scale shape: the DISTRIBUTED part is the candidate pool retrieval
    * (cosineTopK — TakeOrdered over the full store); the greedy loop runs
    * on the driver over the collected pool, which is metadata-sized by
    * definition (poolSize ≤ a few hundred — rerank exists precisely
    * because you only refine a small candidate set; the recallAtK
    * precedent). Pairwise pool similarities are computed once, O(N²·dims)
    * on N ≪ corpus. Deterministic: ties break on vec_id.
    *
    * Iterative argmax is not SQL-expressible → spec-gated against an
    * independent reference (the ivfTrained/Bpe precedent).
    */
  def mmrRerank(embeddings: DataFrame, queryId: Long, poolSize: Int, k: Int,
                lambda: Double): DataFrame = {
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    require(k <= poolSize, s"k=$k exceeds poolSize=$poolSize")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val pool = cosineTopK(embeddings, queryId, poolSize)
      .join(embeddings.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("vec_id"), col("cos_sim"), col("embedding"))
      .as[(Long, Double, Array[Float])]
      .collect()
      .sortBy { case (id, rel, _) => (-rel, id) }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var i = 0; var s = 0.0; var na = 0.0; var nb = 0.0
      while (i < a.length) {
        s += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else s / (math.sqrt(na) * math.sqrt(nb))
    }
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    val pickedVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val remaining = scala.collection.mutable.ArrayBuffer(pool: _*)
    while (picked.length < k && remaining.nonEmpty) {
      val scored = remaining.map { case (id, rel, v) =>
        val maxSim = if (pickedVecs.isEmpty) 0.0
          else pickedVecs.iterator.map(cos(v, _)).max
        (id, rel, lambda * rel - (1 - lambda) * maxSim, v)
      }
      val best = scored.minBy { case (id, _, mmr, _) => (-mmr, id) }
      picked += ((best._1, best._2, best._3))
      pickedVecs += best._4
      remaining.remove(remaining.indexWhere(_._1 == best._1))
    }
    picked.zipWithIndex.map { case ((id, rel, mmr), i) =>
      (i + 1L, id, math.floor(rel * 10000 + 0.5) / 10000,
        math.floor(mmr * 10000 + 0.5) / 10000)
    }.toSeq.toDF("rank", "vec_id", "relevance", "mmr_score")
  }

  /** LSH-bucketed approximate all-pairs: the DEFAULT entry point, with
    * the bucket bit count derived from the corpus size via
    * [[adaptiveNbits]] so the mean bucket stays `targetBucket`-bounded at
    * any scale. The fixed-width form is [[lshNearNeighboursFixed]], an
    * explicit opt-in (the d08 discipline): SCALE.md's 100× leg measured
    * fixed 4-bit banding at 265× (bucket occupancy grows with the
    * corpus, so the within-bucket join goes quadratic) versus 11× for
    * this adaptive rule.
    */
  def lshNearNeighbours(embeddings: DataFrame, threshold: Double,
                        targetBucket: Long = 16L): DataFrame =
    lshNearNeighboursFixed(embeddings,
      adaptiveNbits(embeddings.count(), targetBucket), threshold)

  /** Fixed-width LSH all-pairs: bucket by `nbits` random hyperplanes,
    * compare only within buckets, keep pairs above threshold. The
    * candidate join shuffles on bucket id. EXPLICIT OPT-IN: with `nbits`
    * frozen, bucket occupancy grows linearly with the corpus and the
    * within-bucket self-join quadratically — a measured scale-killer
    * (SCALE.md 100× leg: 265×). Use [[lshNearNeighbours]] (adaptive)
    * unless a protocol pins the bit width.
    */
  def lshNearNeighboursFixed(embeddings: DataFrame, nbits: Int, threshold: Double): DataFrame = {
    // Norms are hoisted out of the pair loop: computed once per row before
    // the self-join, not once per candidate pair.
    val bucketed = embeddings
      .withColumn("bucket", Vectors.hyperplaneBucket($"embedding", nbits))
      .withColumn("nrm", Vectors.norm($"embedding"))
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos_sim", Vectors.cosineWithNorms(
        col("a.embedding"), col("b.embedding"), col("a.nrm"), col("b.nrm")))
      .where($"cos_sim" >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
              round($"cos_sim", 4).as("cos_sim"))
      .orderBy($"vec_a", $"vec_b")
  }

  /** The corpus-size-aware bit count for hyperplane bucketing: the
    * smallest `nbits` in [minBits, maxBits] with
    * `n ≤ targetBucket · 2^nbits`, i.e. the MEAN bucket size is bounded by
    * `targetBucket` at any corpus size. Integer-exact by construction
    * (shift-and-compare, no log2 float knife edges) so the oracle applies
    * the identical rule. This is SCALE.md's production lever for the LSH
    * family: fixed nbits makes bucket joins grow quadratically with the
    * corpus; nbits growing with log₂(n) keeps per-bucket work constant.
    */
  def adaptiveNbits(n: Long, targetBucket: Long = 16L,
                    minBits: Int = 4, maxBits: Int = 16): Int =
    (minBits to maxBits).find(b => n <= (targetBucket << b)).getOrElse(maxBits)

  /** [[lshNearNeighboursFixed]] with `nbits` derived from the corpus size via
    * [[adaptiveNbits]] — the shape that survives 100 TB: the count is one
    * metadata-cheap aggregate, and the derived bit count rides into the
    * plan as a literal. Because plane weights depend only on the bit
    * index, the adaptive bucket is exactly the low `nbits` bits of the
    * maxBits-plane bucket — which is how the SQL oracle recomputes it
    * (full 16-bit bucket mod 2^nbits) without dynamic SQL.
    *
    * Recall note: more bits ⇒ fewer collisions per table (the standard
    * (1 − θ/π)^nbits trade-off); production systems counter with multiple
    * hash tables (band OR-ing, as [[Dedup.minhashLshPairs]] does for
    * Jaccard), not by letting buckets grow with the corpus.
    */
  def lshPairsAdaptive(embeddings: DataFrame, threshold: Double,
                       targetBucket: Long = 16L): DataFrame = {
    val nbits = adaptiveNbits(embeddings.count(), targetBucket)
    lshNearNeighboursFixed(embeddings, nbits, threshold)
      .withColumn("nbits", lit(nbits))
  }

  /** IVF-style probe: assign every vector to its nearest of `nlist`
    * deterministic "centroid" buckets (hyperplane prefix), then search only
    * the query's bucket — the coarse-quantizer skeleton of an IVF index,
    * with the codebook step left to MLlib KMeans when a trained codebook is
    * warranted.
    */
  def ivfTopK(embeddings: DataFrame, queryId: Long, nbits: Int, k: Int): DataFrame = {
    val bucketed = embeddings
      .withColumn("bucket", Vectors.hyperplaneBucket($"embedding", nbits))
    val q = bucketed.where($"vec_id" === queryId)
      .select($"embedding".as("q"), $"bucket".as("qbucket"))
    bucketed.where($"vec_id" =!= queryId)
      .join(broadcast(q), $"bucket" === $"qbucket")
      .withColumn("cos_sim", Vectors.cosine($"embedding", $"q"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(k)
      .select($"vec_id", $"label", $"bucket", round($"cos_sim", 4).as("cos_sim"))
  }

  /** Multi-probe LSH retrieval with exact re-rank (s10) — the two-stage
    * shape production vector search actually runs: a cheap recall stage
    * (the query's hyperplane bucket PLUS every bucket at Hamming distance
    * ≤ `maxHamming`, the multi-probe trick that recovers the recall a
    * single bucket loses) followed by exact cosine over the candidate
    * sliver only. Compared to [[ivfTopK]]'s single-bucket probe this
    * trades a (nbits+1)× candidate set for near-exact recall on
    * boundary-straddling neighbours.
    *
    * Scale shape: the query side is ONE broadcast row; the Hamming
    * predicate `bit_count(bucket ⊕ q) ≤ h` evaluates inside the scan
    * against that broadcast (a 1-row nested-loop is a filter, not a
    * join explosion), norms are hoisted per row, and the top-k is a
    * TakeOrdered — no shuffle join anywhere. On a bucket-partitioned
    * store the same probe set becomes `bucket IN (probe list)` partition
    * pruning: nbits+1 of 2^nbits partitions read, the rest untouched.
    */
  def lshRerankTopK(embeddings: DataFrame, queryId: Long, nbits: Int, k: Int,
                    maxHamming: Int = 1): DataFrame = {
    val bucketed = embeddings
      .withColumn("bucket", Vectors.hyperplaneBucket($"embedding", nbits))
      .withColumn("nrm", Vectors.norm($"embedding"))
    val q = bucketed.where($"vec_id" === queryId)
      .select($"embedding".as("q_emb"), $"bucket".as("q_bucket"),
              $"nrm".as("q_nrm"))
    bucketed.where($"vec_id" =!= queryId)
      .join(broadcast(q),
        bit_count($"bucket".bitwiseXOR($"q_bucket")) <= maxHamming)
      .withColumn("hamming",
        bit_count($"bucket".bitwiseXOR($"q_bucket")).cast("int"))
      .withColumn("cos_sim", Vectors.cosineWithNorms(
        $"embedding", $"q_emb", $"nrm", $"q_nrm"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(k)
      .select($"vec_id", $"label", $"hamming",
              round($"cos_sim", 4).as("cos_sim"))
  }

  /** IVF with a *trained* codebook: MLlib KMeans learns `nlist` centroids
    * (fixed seed → deterministic), every vector is assigned to its nearest
    * list, and a query probes only the `nprobe` nearest lists, brute-forcing
    * cosine inside them. `nprobe = nlist` degrades to exact search — the
    * recall/latency knob of a real IVF index. The codebook is tiny and
    * rides to executors as a literal; assignment is one narrow ML transform
    * (no shuffle); the probe is a pushed-down `isin` filter + top-k.
    */
  def ivfTrained(embeddings: DataFrame, queryId: Long, nlist: Int, nprobe: Int,
                 k: Int, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = embeddings.withColumn("fv",
      array_to_vector(transform($"embedding", _.cast("double"))))
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("list_id").fit(vecs)
    val assigned = model.transform(vecs)

    val q = assigned.where($"vec_id" === queryId)
      .select($"embedding", $"fv").head()
    val qEmb = q.getSeq[Float](0)
    val qVec = q.getAs[org.apache.spark.ml.linalg.Vector](1)
    val probeLists = model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        (i, org.apache.spark.ml.linalg.Vectors.sqdist(c, qVec)) }
      .sortBy(_._2).take(nprobe).map(_._1)

    assigned.where($"vec_id" =!= queryId && $"list_id".isin(probeLists: _*))
      .withColumn("cos_sim",
        Vectors.cosine($"embedding", typedLit(qEmb)))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(k)
      .select($"vec_id", $"label", $"list_id", round($"cos_sim", 4).as("cos_sim"))
  }

  /** Product-quantization ANN (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011): split the space into `m`
    * subspaces, learn a `codebookSize`-entry codebook per subspace (MLlib
    * KMeans, fixed seeds → deterministic), encode every vector as `m`
    * small codes, and answer a query by asymmetric distance computation
    * (ADC): the query stays full-precision, a tiny m×codebookSize table
    * of query↔centroid distances is computed once, and each database
    * vector's distance is `m` table lookups summed.
    *
    * This is the memory-bound scale regime the LSH/IVF paths don't cover:
    * the scan reads m byte-ish codes per vector instead of `dims` floats
    * (64-dim float corpus at m=8: 32× less data), so a 100 TB embedding
    * store probes from a few TB of codes. The distance table rides into
    * codegen as a literal; scoring is row-local lookups + a TakeOrdered
    * top-k — no shuffle, no join. Combine with [[ivfTrained]]'s list
    * pruning for IVF-ADC. Approximate by construction (quantization
    * error), hence spec-gated against exact search rather than
    * SQL-oracle-gated, like [[ivfTrained]].
    */
  def pqTopK(embeddings: DataFrame, queryId: Long, k: Int,
             m: Int = 8, codebookSize: Int = 16, seed: Long = 42L): DataFrame = {
    val sub = pqSubDims(embeddings, m)
    // persist across the m iterative fits + encode + query probe — without
    // it every KMeans pass re-derives the subvector projection from source
    val withSubs = embeddings.select(($"vec_id" +: $"label" +: pqSubCols(m, sub)): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val models = pqFit(withSubs, m, codebookSize, seed)
      // encode: m narrow transforms, no shuffle; at rest only (vec_id, codes)
      // need persisting — the 32×-smaller index a real deployment scans
      val encoded = models.foldLeft(withSubs) { case (df, mod) => mod.transform(df) }
      val qRow = withSubs.where($"vec_id" === queryId)
        .select((0 until m).map(s => col(s"sv_$s")): _*).head()
      // materialize the k-row answer before releasing the cache the plan
      // reads from (the barrier keeps the returned frame self-contained)
      graft.Session.barrier(
        encoded.where($"vec_id" =!= queryId)
          .withColumn("adc_dist", pqAdcDistance(models, qRow, m))
          .orderBy($"adc_dist".asc, $"vec_id")
          .limit(k)
          .select($"vec_id", $"label", round($"adc_dist", 4).as("adc_dist")))
    } finally withSubs.unpersist(blocking = false)
  }

  /** IVF-ADC (the composition [[pqTopK]]'s scaladoc promises): the coarse
    * quantizer of [[ivfTrained]] prunes candidate LISTS, and within the
    * probed lists distances are PQ table lookups over the encoded corpus.
    * At 100 TB this is the standard billion-scale ANN serving shape
    * (FAISS IVFADC): the scan touches only nprobe/nlist of the code
    * table, which is itself ~32× smaller than the float corpus —
    * list pruning and code compression multiply. Codebooks are global
    * (trained on the full corpus, coarse seed ≠ PQ seeds so the
    * quantizers are independent); `nprobe = nlist` removes the pruning
    * error and leaves pure PQ quantization error — the spec gate.
    */
  def ivfAdcTopK(embeddings: DataFrame, queryId: Long, nlist: Int, nprobe: Int,
                 k: Int, m: Int = 8, codebookSize: Int = 16,
                 seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val sub = pqSubDims(embeddings, m)
    val vecs = embeddings.withColumn("fv",
      array_to_vector(transform($"embedding", _.cast("double"))))
    val coarse = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("list_id").fit(vecs)
    val withSubs = coarse.transform(vecs)
      .select(($"vec_id" +: $"label" +: $"list_id" +: pqSubCols(m, sub)): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // PQ seeds offset from the coarse seed: independent quantizers
      val models = pqFit(withSubs, m, codebookSize, seed + 7919L)
      val encoded = models.foldLeft(withSubs) { case (df, mod) => mod.transform(df) }
      val qRow = withSubs.where($"vec_id" === queryId)
        .select((0 until m).map(s => col(s"sv_$s")): _*).head()
      val qFv = vecs.where($"vec_id" === queryId).select($"fv").head()
        .getAs[org.apache.spark.ml.linalg.Vector](0)
      val probeLists = coarse.clusterCenters.zipWithIndex
        .map { case (c, i) => (i, org.apache.spark.ml.linalg.Vectors.sqdist(c, qFv)) }
        .sortBy(_._2).take(nprobe).map(_._1)
      graft.Session.barrier(
        encoded.where($"vec_id" =!= queryId && $"list_id".isin(probeLists: _*))
          .withColumn("adc_dist", pqAdcDistance(models, qRow, m))
          .orderBy($"adc_dist".asc, $"vec_id")
          .limit(k)
          .select($"vec_id", $"label", $"list_id", round($"adc_dist", 4).as("adc_dist")))
    } finally withSubs.unpersist(blocking = false)
  }

  /** Recall@k of an approximate result against exact brute-force cosine —
    * the evaluation every ANN deployment tracks. Driver-side set compare
    * of two ≤k-row results (an eval utility, not a data-plane operator).
    * The approx frame must carry `vec_id` in rank order.
    */
  def recallAtK(embeddings: DataFrame, queryId: Long, k: Int,
                approx: DataFrame): Double = {
    val exact = cosineTopK(embeddings, queryId, k)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    val got = approx.select($"vec_id").collect().map(_.getLong(0)).take(k).toSet
    if (exact.isEmpty) 1.0 else (exact & got).size.toDouble / exact.size
  }

  /** dims/m with the divisibility check — one-row metadata probe. */
  private def pqSubDims(embeddings: DataFrame, m: Int): Int = {
    val dims = embeddings.select(size($"embedding")).head.getInt(0)
    require(dims % m == 0, s"dims=$dims not divisible into m=$m subspaces")
    dims / m
  }

  /** Subvector projections `sv_0..sv_{m-1}` as ML vectors. */
  private def pqSubCols(m: Int, sub: Int): Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.ml.functions.array_to_vector
    (0 until m).map { s =>
      array_to_vector(transform(slice($"embedding", s * sub + 1, sub), _.cast("double")))
        .as(s"sv_$s")
    }
  }

  /** One `codebookSize`-entry KMeans codebook per subspace (seed + s →
    * deterministic, distinct per subspace).
    */
  private def pqFit(withSubs: DataFrame, m: Int, codebookSize: Int,
                    seed: Long): Seq[org.apache.spark.ml.clustering.KMeansModel] = {
    import org.apache.spark.ml.clustering.KMeans
    (0 until m).map { s =>
      new KMeans().setK(codebookSize).setSeed(seed + s)
        .setFeaturesCol(s"sv_$s").setPredictionCol(s"code_$s").fit(withSubs)
    }
  }

  /** Asymmetric distance: the m×codebookSize query↔centroid table rides
    * into codegen as a literal; each row's distance is m lookups summed.
    */
  private def pqAdcDistance(models: Seq[org.apache.spark.ml.clustering.KMeansModel],
                            qRow: org.apache.spark.sql.Row, m: Int)
      : org.apache.spark.sql.Column = {
    val dtable: Seq[Seq[Double]] = (0 until m).map { s =>
      val qv = qRow.getAs[org.apache.spark.ml.linalg.Vector](s)
      models(s).clusterCenters.toSeq
        .map(c => org.apache.spark.ml.linalg.Vectors.sqdist(c, qv))
    }
    (0 until m)
      .map(s => element_at(typedLit(dtable(s)), col(s"code_$s") + 1))
      .reduce(_ + _)
  }

  /** All-pairs top-k similarity JOIN: every vector gets its k nearest
    * neighbours among candidates sharing its hyperplane bucket — the
    * corpus-wide "kNN graph" a semantic-dedup or retrieval-mixing pipeline
    * builds, as opposed to the single-query probes above.
    *
    * Scale shape, the e01 lesson applied to vectors: bit-identical
    * embeddings collapse to one representative FIRST (real corpora and
    * the bench's scale copies both carry heavy exact duplication, and a
    * clique of c duplicates otherwise pays c² bucket-join rows — measured
    * 40.8× at the 30× scale leg). The bucket equi-join then runs over
    * DISTINCT vectors (work bounded per bucket, the standard
    * (1 − θ/π)^nbits LSH trade-off), and members expand back with a
    * per-candidate-group k+1 cut so no stage exceeds output size. The
    * top-k cut is a `row_number` window on vec_id. Ordering ties break on
    * neighbour id; the per-group cut keeps exactly the smallest ids of
    * each equal-cosine class, so results are bit-identical to the direct
    * all-member join (duplicates share their cosine by construction).
    */
  /** [[knnJoin]] with the bucket width derived from the corpus size via
    * [[adaptiveNbits]] — the form that holds at 100 TB. Fixed nbits makes
    * the in-bucket candidate join grow quadratically with the corpus
    * (measured 5.9× for 10× distinct vectors at the sf1 leg); nbits
    * rising with log₂(n) pins MEAN bucket occupancy at `targetBucket`,
    * making candidate pairs ~n·targetBucket — linear. The count is one
    * metadata-cheap aggregate; the derived width rides into the plan as
    * a literal, and because plane weights depend only on bit index the
    * adaptive bucket is exactly the low `nbits` bits of the 16-bit
    * bucket — which is how the SQL oracle recomputes it without dynamic
    * SQL (the s08 precedent).
    */
  def knnJoinAdaptive(embeddings: DataFrame, k: Int,
                      targetBucket: Long = 16L): DataFrame =
    knnJoin(embeddings, adaptiveNbits(embeddings.count(), targetBucket), k)

  def knnJoin(embeddings: DataFrame, nbits: Int, k: Int): DataFrame = {
    // group bit-identical vectors; ids sorted so slice(1, k+1) keeps the
    // tie-break winners of each group
    val groups = embeddings.groupBy($"embedding")
      .agg(sort_array(collect_list($"vec_id")).as("ids"))
      .withColumn("gid", $"ids"(0))
    val reps = groups.select($"gid", $"embedding")
      .withColumn("bucket", Vectors.hyperplaneBucket($"embedding", nbits))
      .withColumn("nrm", Vectors.norm($"embedding"))
    // candidate DISTINCT-vector pairs in one bucket, cosine per pair —
    // the same expression the all-member join evaluated, on the same
    // values, so scores carry over bit-for-bit
    val gpairs = reps.as("a")
      .join(reps.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.gid") =!= col("b.gid"))
      .select(col("a.gid").as("ga"), col("b.gid").as("gb"),
        Vectors.cosineWithNorms(
          col("a.embedding"), col("b.embedding"),
          col("a.nrm"), col("b.nrm")).as("cos_sim"))
    // duplicate cliques: members are each other's neighbours at the
    // self-cosine (same expression, both sides the shared content)
    val selfNrm = Vectors.norm($"embedding")
    val selfs = groups.where(size($"ids") > 1)
      .select($"gid".as("ga"), $"gid".as("gb"),
        Vectors.cosineWithNorms(
          $"embedding", $"embedding", selfNrm, selfNrm).as("cos_sim"))
    // expand: per candidate group keep only its k+1 smallest member ids
    // (one slot may be the probe itself) — the window below never needs
    // more than k from one equal-cosine class
    val bIds = groups.select($"gid".as("gb"), $"ids".as("b_ids"))
    val aIds = groups.select($"gid".as("ga"), $"ids".as("a_ids"))
    val w = Window.partitionBy($"vec_id").orderBy($"cos_sim".desc, $"neighbor_id")
    gpairs.unionByName(selfs)
      .join(bIds, Seq("gb"))
      .select($"ga", $"cos_sim", explode(slice($"b_ids", 1, k + 1)).as("neighbor_id"))
      .join(aIds, Seq("ga"))
      .select(explode($"a_ids").as("vec_id"), $"neighbor_id", $"cos_sim")
      .where($"vec_id" =!= $"neighbor_id")
      .withColumn("nn_rank", row_number().over(w).cast("long"))
      .where($"nn_rank" <= k)
      .select($"vec_id", $"neighbor_id", $"nn_rank", round($"cos_sim", 4).as("cos_sim"))
      .orderBy($"vec_id", $"nn_rank")
  }

  /** Int8 scalar quantization of the embedding store (s09) — the standard
    * serving compression (FAISS `SQ8`, every vector DB's int8 option):
    * each vector keeps one double `max_abs` and its components rounded to
    * `⌊v·127/max_abs + ½⌋ ∈ [-127,127]`, stored as a tinyint array — 4×
    * less data at rest and per scan than float32, with ~equal ANN recall
    * at realistic dims. All arithmetic is deterministic double ops +
    * floor, so codes are bit-identical in any engine (unlike
    * round-half-even vs half-away divergence between engines' `round`).
    * Zero vectors quantize to all-zero codes (no 0/0 NaN).
    */
  def int8Quantize(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("max_abs",
        aggregate($"embedding", lit(0.0), (a, x) => greatest(a, abs(x.cast("double")))))
      .withColumn("codes",
        transform($"embedding", x =>
          when($"max_abs" === 0.0, lit(0).cast("byte"))
            .otherwise(floor(x.cast("double") * 127.0 / $"max_abs" + 0.5)
              .cast("int").cast("byte"))))
      .select($"vec_id", $"label", $"max_abs", $"codes")

  /** Top-k cosine search over the int8-quantized store. The per-vector
    * scales cancel out of cosine (`dot = s_a·s_b·Σq_aq_b`, norms carry
    * `s_a`/`s_b` once each), so the score is computed wholly from integer
    * code sums — exact longs into one sqrt/division — making the
    * approximate search itself oracle-gateable bit-for-bit, not just its
    * recall. Plan shape is s02's: 1-row broadcast query, one narrow scan
    * of the (4× smaller) code table, TakeOrderedAndProject — no shuffle.
    * Quantization error vs exact float cosine is spec-gated via
    * [[recallAtK]].
    */
  def int8TopK(quantized: DataFrame, queryId: Long, k: Int): DataFrame = {
    def nrm2(c: org.apache.spark.sql.Column) =
      aggregate(transform(c, x => x.cast("long") * x.cast("long")), lit(0L), _ + _)
    // the query's squared norm is computed ONCE in the 1-row broadcast
    // frame — as a per-row withColumn it would re-reduce the dims-length
    // array for every corpus row in the hot scan
    val q = quantized.where($"vec_id" === queryId)
      .select($"codes".as("qc"), nrm2($"codes").as("qn2"))
    val dot = aggregate(
      zip_with($"codes", $"qc", (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), _ + _)
    quantized.where($"vec_id" =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("dot_q", dot)
      .withColumn("n2", nrm2($"codes"))
      .withColumn("cos_q",
        when($"n2" === 0L || $"qn2" === 0L, lit(0.0))
          .otherwise($"dot_q".cast("double")
            / (sqrt($"n2".cast("double")) * sqrt($"qn2".cast("double")))))
      .orderBy($"cos_q".desc, $"vec_id")
      .limit(k)
      .select($"vec_id", $"label", round($"cos_q", 4).as("cos_sim_q"))
  }

  /** Label-centroid similarity: mean vector per label (the trained-codebook
    * step of IVF as a plain aggregation), then each label's cohesion = mean
    * cosine of members to their centroid.
    */
  def labelCentroids(embeddings: DataFrame): DataFrame = {
    // one-row metadata probe, not a data-plane collect: any corpus width
    // (64, 768, ...) works without truncating the centroid. An empty (or
    // null-first) input short-circuits to width 1 — the aggregation below
    // then returns the correctly-shaped empty result instead of throwing.
    val dims = embeddings.select(size(col("embedding"))).head(1) match {
      case Array(r) if !r.isNullAt(0) && r.getInt(0) > 0 => r.getInt(0)
      case _ => 1
    }
    val sums = (0 until dims).map(d =>
      avg(element_at($"embedding", d + 1).cast("double")).as(s"c$d"))
    val centroids = embeddings.groupBy($"label").agg(sums.head, sums.tail: _*)
      .select($"label".as("c_label"), array((0 until dims).map(d => col(s"c$d")): _*).as("centroid"))
    embeddings.join(broadcast(centroids), $"label" === $"c_label")
      .withColumn("cos_sim", Vectors.cosine($"embedding", $"centroid"))
      .groupBy($"label")
      // round to 3 (not 4) decimals: the centroid averages double sums whose
      // order differs between Spark partial aggregation and the oracle, so a
      // knife-edge 4th decimal could flip with partition count
      .agg(round(avg($"cos_sim"), 3).as("cohesion"), count(lit(1)).as("n"))
      .orderBy($"label")
  }

  /** Inter-label centroid distance matrix (s12) — the embedding-space
    * diagnostic every clustering/metric-learning pipeline prints: how far
    * apart are the class centroids, as EXACT integers. Centroid
    * components are FLOOR-DIVIDED milli-unit means (`⌊Σx'ⱼ / n⌋` over the
    * milli-quantized corpus, the [[kmeansAssignExact]] quantization):
    * bounded by the data's milli-range — NOT by corpus size — so the
    * squared-distance sum stays far inside a long at any scale (the
    * exact-rational cross-multiplied form overflows 2⁶³ once per-label
    * counts reach ~10³; ±1 milli of floor truncation per component is
    * noise for a diagnostic and is the documented trade). Native integer
    * division truncates toward zero in BOTH Spark (`div`) and DuckDB
    * (`//`) — fine, but truncation makes the mean biased toward zero, so
    * the FLOOR convention is spelled explicitly on both sides via the
    * non-negative mod: `(s − pmod(s, n))/n`.
    *
    * Shape: one posexplode + (label, dim) aggregate builds the k·dim sum
    * relation; the k² pair join is metadata-sized (labels, not rows);
    * `zip_with`+`aggregate` folds the distance without leaving codegen.
    * Corpus is scanned once.
    */
  def labelCentroidDistances(embeddings: DataFrame): DataFrame = {
    val xq = embeddings.select($"label",
      transform($"embedding", e => floor(e.cast("double") * 1000).cast("long")).as("x"))
    val sums = xq
      .select($"label", posexplode($"x").as(Seq("j", "xv")))
      .groupBy($"label", $"j").agg(sum($"xv").as("sj"))
    val cents = sums.groupBy($"label")
      .agg(transform(array_sort(collect_list(struct($"j", $"sj"))),
        st => st.getField("sj")).as("s"))
      .join(xq.groupBy($"label").agg(count(lit(1)).as("n")), Seq("label"))
      // floor division (see scaladoc): exact long in any engine
      .withColumn("m", transform($"s", v => ((v - pmod(v, $"n")) / $"n").cast("long")))
    cents.as("a").join(cents.as("b"), col("a.label") < col("b.label"))
      .select(col("a.label").as("label_a"), col("b.label").as("label_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        aggregate(
          zip_with(col("a.m"), col("b.m"), (ma, mb) => (ma - mb) * (ma - mb)),
          lit(0L), (acc, v) => acc + v).as("dist2_milli"))
      .orderBy($"label_a", $"label_b")
  }

  /** Engine-independent Lloyd's k-means over the quantized embedding
    * space — the clustering counterpart of the q59/q51 exact-integer
    * discipline, and the oracle-gated twin of the MLlib-backed PQ
    * codebooks above (whose float seeds no second engine can replay).
    *
    * Exactness argument, the part that makes a *clustering* hash-
    * comparable across engines at all: components quantize to milli-unit
    * longs (`floor(x·1000)` — float→double cast and ×1000 are exact IEEE
    * ops), so a centroid is the exact rational (per-dim sum vector s⃗,
    * member count n). Ranking a point x⃗ against centroid i uses
    * ‖x⃗ − s⃗ᵢ/nᵢ‖² with the ‖x⃗‖² term dropped (common to all i):
    * score_i = (Σs²ᵢ − 2n_i·(x⃗·s⃗ᵢ)) / n²ᵢ. The numerator is exact in any
    * summation order — in longs AND in doubles — only inside an explicit
    * envelope: with A = max|x'ⱼ| and n = max cluster membership, the
    * dominant magnitude is 2·n·(x⃗·s⃗) ≤ 2·dim·n²·A², so exactness needs
    * dim·n²·A² ≤ 2⁵² (which also keeps b = Σs² far below the 2⁶³ long
    * wrap). That is a REAL bound, enforced per round with a `require` on
    * the observed max membership — at A≈526, dim=64 it allows n ≈ 16 000
    * members/cluster, ample for the gate fixture but NOT "any corpus":
    * beyond it, switch to the MLlib float path (whose seeds this exact
    * gate exists to cross-check) or re-quantize coarser. The single
    * division rounds identically in every IEEE engine. Ties (equal
    * score) break toward the smaller cluster id — stated once, shared
    * with the oracle.
    *
    * Scale shape per Lloyd round: centroids are a k-row relation that
    * BROADCASTS (k·dim longs — never collected to the driver); assignment
    * is a broadcast nested-loop with bounded fanout k then a per-point
    * min (window over k rows/point); the update is one posexplode +
    * (cluster, dim) map-side-combining aggregate — shuffle rows bounded
    * by k·dim, not by corpus size. No driver-side loop state beyond the
    * iteration counter; rounds are fixed (`iterations`), not data-
    * dependent, so the whole plan is replayable.
    */
  def kmeansAssignExact(embeddings: DataFrame, k: Int, iterations: Int): DataFrame = {
    require(k >= 1 && iterations >= 1, "kmeansAssignExact: k and iterations must be >= 1")
    val xq = graft.Session.barrier(
      embeddings.select($"vec_id",
        transform($"embedding", e => floor(e.cast("double") * 1000).cast("long")).as("x")))

    // exactness envelope inputs (one metadata-sized action): dim and the
    // max quantized magnitude A — see the scaladoc's dim·n²·A² ≤ 2⁵² bound
    val env = xq.agg(
      max(size($"x")).as("dim"),
      max(aggregate(transform($"x", v => abs(v)), lit(0L),
        (a, v) => greatest(a, v))).as("amax")).head()
    val dim = env.getInt(0).toDouble
    val aMax = env.getLong(1).toDouble

    // seed: the k smallest vec_ids as singleton centroids (s = x, n = 1)
    var cents = xq.orderBy($"vec_id").limit(k)
      .select($"vec_id".cast("int").as("cluster"), $"x".as("s"), lit(1L).as("n"))

    def assign(c: DataFrame): DataFrame = {
      val scored = xq.crossJoin(broadcast(c))
        .withColumn("a", aggregate(zip_with($"x", $"s", (p, q) => p * q),
          lit(0L), (acc, v) => acc + v))
        .withColumn("b", aggregate($"s", lit(0L), (acc, v) => acc + v * v))
        .withColumn("score",
          ($"b".cast("double") - lit(2.0) * $"a".cast("double") * $"n".cast("double")) /
            ($"n" * $"n").cast("double"))
      val best = Window.partitionBy($"vec_id").orderBy($"score", $"cluster")
      scored.withColumn("rk", row_number().over(best)).where($"rk" === 1)
        .select($"vec_id", $"cluster", $"x")
    }

    for (_ <- 1 to iterations) {
      val assigned = assign(cents)
      val sums = assigned
        .select($"cluster", posexplode($"x").as(Seq("j", "xv")))
        .groupBy($"cluster", $"j").agg(sum($"xv").as("sj"))
      val vecs = sums.groupBy($"cluster")
        .agg(transform(array_sort(collect_list(struct($"j", $"sj"))),
          st => st.getField("sj")).as("s"))
      val ns = assigned.groupBy($"cluster").agg(count(lit(1)).as("n"))
      cents = graft.Session.barrier(vecs.join(ns, "cluster"))
      // one metadata action per round guards both failure modes loudly:
      // a cluster that empties would silently shrink k, and a cluster
      // that grows past the exactness envelope (dim·n²·A² ≤ 2⁵², see
      // scaladoc) would silently lose the bit-exact score contract
      val stat = cents.agg(count(lit(1)).as("kc"), max($"n").as("nmax")).head()
      require(stat.getLong(0) == k, s"kmeansAssignExact: a cluster emptied below k=$k")
      val nMax = stat.getLong(1).toDouble
      require(dim * nMax * nMax * aMax * aMax <= math.pow(2.0, 52),
        s"kmeansAssignExact: cluster membership ${stat.getLong(1)} exceeds the " +
          s"exact-score envelope (dim=$dim, A=$aMax requires dim*n^2*A^2 <= 2^52); " +
          "use the MLlib k-means path or coarser quantization at this scale")
    }
    assign(cents)
      .select($"vec_id", $"cluster".cast("long").as("cluster"))
      .orderBy($"vec_id")
  }

  /** [[kmeansAssignExact]] with the envelope fallback WIRED: run the
    * exact-integer path, and when any Lloyd round's exactness envelope
    * `require` trips (dim·n²·A² > 2⁵² — cluster membership beyond the
    * bit-exact score contract), automatically reroute to the MLlib
    * float path instead of aborting. Rows carry `exact` (1 = every
    * score bit-exact and oracle-replayable, 0 = IEEE float path). The
    * switch is loud in the lineage (the column), never silent: a
    * consumer that needs the exact contract filters `exact = 1` or
    * calls [[kmeansAssignExact]] directly. Only the ENVELOPE trip
    * falls back — an emptied cluster still aborts in both paths (k was
    * wrong for the data, a different error class).
    */
  def kmeansAssignAuto(embeddings: DataFrame, k: Int, iterations: Int,
                       seed: Long = 42L): DataFrame =
    try kmeansAssignExact(embeddings, k, iterations)
      .withColumn("exact", lit(1L))
    catch {
      case e: IllegalArgumentException if e.getMessage != null &&
          e.getMessage.contains("exact-score envelope") =>
        kmeansAssignFloat(embeddings, k, iterations, seed)
          .withColumn("exact", lit(0L))
    }

  /** The float Lloyd's path past the exactness envelope: MLlib KMeans
    * (fixed seed → deterministic per Spark/BLAS build, but NOT
    * bit-replayable by an SQL oracle — which is the whole reason the
    * exact path exists). Same output shape as [[kmeansAssignExact]]:
    * (vec_id, cluster). Scale shape: the model is k·dim doubles
    * broadcast by MLlib; assignment is one narrow transform, no
    * shuffle.
    */
  def kmeansAssignFloat(embeddings: DataFrame, k: Int, iterations: Int,
                        seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = embeddings.select($"vec_id",
      array_to_vector(transform($"embedding", _.cast("double"))).as("fv"))
    val model = new KMeans().setK(k).setMaxIter(iterations).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("cluster_i").fit(vecs)
    model.transform(vecs)
      .select($"vec_id", $"cluster_i".cast("long").as("cluster"))
      .orderBy($"vec_id")
  }

  /** S17: hybrid retrieval via reciprocal-rank fusion (Cormack/Clarke/
    * Büttcher SIGIR'09) — the production RAG shape: a lexical ranking
    * ([[Search.keywordSearch]]'s integer tf-idf) and a dense ranking
    * (brute-force cosine vs the query vector) fused by
    * `Σ 1/(κ + rank)`, here in exact integer micro-units
    * `1000000 div (κ + rank)` so the fused score hash-compares across
    * engines. Docs appearing in only one leg contribute only that
    * leg's term (the standard RRF convention) and keep a null rank for
    * the other — the honest "lexical-only / semantic-only hit" signal.
    *
    * Scale shape: each leg is its operator's own bounded plan
    * (TakeOrdered to `poolK`); rank assignment and the full-outer
    * fusion join then run on ≤ poolK rows per leg — explicitly
    * output-bounded, never corpus-sized. At 100 TB the legs dominate
    * and the fusion is free; κ=60 is the paper's constant.
    */
  def rrfFusion(documents: DataFrame, embeddings: DataFrame,
                terms: Seq[String], queryId: Long, poolK: Int, k: Int,
                kappa: Int = 60): DataFrame = {
    require(poolK >= 1 && k >= 1, s"rrfFusion: poolK/k must be >= 1")
    val kw = Search.keywordSearch(documents, terms, poolK)
      .select($"doc_id".as("id"), $"score")
      .withColumn("kw_rank",
        row_number().over(Window.orderBy($"score".desc, $"id")).cast("long"))
    val q = embeddings.where($"vec_id" === queryId).select($"embedding".as("q"))
    val vec = embeddings.where($"vec_id" =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos_sim", Vectors.cosine($"embedding", $"q"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(poolK)
      .select($"vec_id".as("id"), $"cos_sim")
      .withColumn("vec_rank",
        row_number().over(Window.orderBy($"cos_sim".desc, $"id")).cast("long"))
    val micro = 1000000L
    kw.select($"id", $"kw_rank")
      .join(vec.select($"id", $"vec_rank"), Seq("id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr(s"$micro div ($kappa + kw_rank)"), lit(0L)) +
          coalesce(expr(s"$micro div ($kappa + vec_rank)"), lit(0L)))
      .orderBy($"rrf_micro".desc, $"id")
      .limit(k)
      .select($"id", $"kw_rank", $"vec_rank", $"rrf_micro")
  }
}
