package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.implicits._

/** Training-data pipeline plumbing: reproducible sampling and shard
  * assignment (north-star extension alongside dedup/similarity/text).
  */
object Sampling {

  /** 32-hex-digit threshold = floor(fraction × 2¹²⁸), so comparing a
    * lowercase md5 hex string lexicographically against it IS the numeric
    * compare of the 128-bit digest against fraction × 2¹²⁸.
    */
  def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    // java.math.BigDecimal: unlimited precision (Scala's BigDecimal(BigInt)
    // applies a 34-digit MathContext and silently rounds 2^128)
    val t = BigInt(new java.math.BigDecimal(fraction)
      .multiply(new java.math.BigDecimal((BigInt(1) << 128).bigInteger))
      .toBigInteger)
    val capped = t.min((BigInt(1) << 128) - 1)
    String.format("%032x", capped.bigInteger).takeRight(32)
  }

  /** Deterministic content-hash sampling — the reproducible split of a
    * training pipeline: membership depends only on the document bytes, so
    * it is stable across runs, partitionings, and cluster sizes, and two
    * teams sampling the same corpus at the same rate get the same subset.
    * Keep iff md5(text) < fraction × 2¹²⁸ (hex-string compare; md5 is
    * uniform, so the kept fraction concentrates tightly around
    * `fraction`). Narrow projection + filter: codegen'd, zero shuffle.
    */
  def byContentHash(documents: DataFrame, fraction: Double): DataFrame =
    documents
      .withColumn("text_hash", md5($"text".cast("binary")))
      .where($"text_hash" < lit(thresholdHex(fraction)))
      .select($"doc_id", $"source", $"text_hash")
      .orderBy($"doc_id")

  /** Deterministic train/val/test split (t20): consecutive md5-threshold
    * cuts of the SAME content hash assign every document to exactly one
    * split — test = hash < h(testF), val = next h(testF+valF) band, train
    * = the rest. Content-defined membership is the anti-leakage property:
    * two byte-identical documents (a re-crawl, a mirror) ALWAYS land in
    * the same split, so exact duplicates can never straddle train and
    * held-out — the failure mode row-random splits invite at corpus
    * scale. Row-local codegen'd filter, zero shuffle, reproducible across
    * runs, partitioning, and cluster size by construction.
    */
  def trainValTestSplit(documents: DataFrame, testFraction: Double,
                        valFraction: Double): DataFrame = {
    require(testFraction >= 0 && valFraction >= 0 && testFraction + valFraction <= 1.0,
      "fractions must be non-negative and sum to at most 1")
    documents
      .withColumn("text_hash", md5($"text".cast("binary")))
      .select($"doc_id", $"source", $"text_hash",
        when($"text_hash" < lit(thresholdHex(testFraction)), "test")
          .when($"text_hash" < lit(thresholdHex(testFraction + valFraction)), "val")
          .otherwise("train").as("split"))
      .orderBy($"doc_id")
  }

  /** Stratified flavor of [[byContentHash]]: a different reproducible rate
    * per stratum (source) — the "web at 10%, books at 100%" mix every
    * corpus recipe needs. Same hash-threshold mechanics, the threshold
    * just varies by the stratum column; unlisted strata default to 0
    * (excluded). Still one narrow codegen'd filter, zero shuffle.
    */
  def byContentHashStratified(documents: DataFrame,
                              fractions: Map[String, Double]): DataFrame = {
    val threshold = fractions.foldLeft(lit(thresholdHex(0.0))) {
      case (acc, (src, f)) => when($"source" === src, lit(thresholdHex(f))).otherwise(acc)
    }
    documents
      .withColumn("text_hash", md5($"text".cast("binary")))
      .where($"text_hash" < threshold)
      .select($"doc_id", $"source", $"text_hash")
      .orderBy($"doc_id")
  }

  /** Contiguous token-budget sharding: documents in doc_id order are
    * packed into shards of at most `budgetTokens` whitespace tokens
    * (shard_id = floor(exclusive-prefix-sum / budget); a single
    * over-budget document still occupies one shard alone). This is the
    * "pack the corpus into training files of N tokens" step.
    *
    * The prefix sum is computed DISTRIBUTED, not with an unpartitioned
    * window (which funnels the corpus through one task): range-partition
    * by doc_id, materialize (so every downstream job sees the same
    * partitioning), aggregate one total per partition, turn those few
    * totals into per-partition exclusive offsets on the driver (metadata,
    * not data), then a within-partition window adds the local prefix sum
    * to the broadcast offset. Two narrow passes + one tiny aggregate —
    * the textbook distributed scan.
    */
  def tokenShards(documents: DataFrame, budgetTokens: Long,
                  partitions: Int = 0): DataFrame = {
    require(budgetTokens > 0, "budget must be positive")
    val toks = documents
      .select($"doc_id", TextAnalysis.wsTokenCount.as("n_tokens"))
    withPrefixSum(toks, Seq($"doc_id"), "n_tokens", "cum_before",
        resolveParts(documents, partitions))
      .select($"doc_id", $"n_tokens",
        floor($"cum_before" / lit(budgetTokens)).cast("long").as("shard_id"))
      .orderBy($"doc_id")
  }

  /** DSIR data selection EXECUTED (the step after [[TextAnalysis
    * .importanceScores]] ranks the corpus): take the top-importance
    * PREFIX of the corpus whose cumulative whitespace-token count fits
    * `tokenBudget` — "fill the training budget with the most
    * target-like data first". Deterministic prefix-cut semantics: docs
    * are ranked (importance desc, doc_id), `cum_before` counts tokens of
    * ALL higher-ranked docs, and a doc is selected iff
    * `cum_before + n_tokens ≤ budget` — so the selected set is a rank
    * prefix, not a greedy knapsack (a later short doc does not jump an
    * overflow; that would need sequential state and a nondeterministic
    * boundary). Every doc is emitted with its flag — the audit view; the
    * training corpus is `WHERE selected`.
    *
    * Scale shape: the ranking is a RANGE partition on
    * (importance desc, doc_id) and the running sum is the [[tokenShards]]
    * distributed prefix sum over that order — per-partition totals to
    * driver offsets (metadata, not data), within-partition window; no
    * global single-task sort. Importance ratios are IEEE divisions of
    * exact longs, so the cross-engine order (and thus every cum_before)
    * is bit-identical.
    */
  def dsirSelect(corpus: DataFrame, target: DataFrame, tokenBudget: Long,
                 n: Int = 2, buckets: Int = 256,
                 partitions: Int = 0): DataFrame = {
    require(tokenBudget > 0, "budget must be positive")
    val scores = TextAnalysis.importanceScores(corpus, target, n, buckets)
      .select($"doc_id", $"importance")
    val toks = corpus.select($"doc_id", TextAnalysis.wsTokenCount.as("n_tokens"))
    val ranked = scores.join(toks, "doc_id")
    withPrefixSum(ranked, Seq($"importance".desc, $"doc_id"), "n_tokens",
        "cum_before", resolveParts(corpus, partitions))
      .select($"doc_id", $"n_tokens", $"importance", $"cum_before",
        ($"cum_before" + $"n_tokens" <= tokenBudget).as("selected"))
      .orderBy($"doc_id")
  }

  /** Per-domain document cap — the crawl-pipeline quota stage ("at most N
    * pages per site") that keeps a handful of giant domains from dominating
    * the corpus mix. Priority is the content hash, so the kept subset is
    * content-defined: reproducible across runs, partitionings, and cluster
    * sizes (the [[byContentHash]] philosophy applied to ranking instead of
    * thresholding), and docs added to a domain later cannot displace an
    * unrelated doc's verdict unless they genuinely outrank it.
    *
    * Scale shape: `row_number ≤ cap` over the per-source window compiles to
    * Spark's WindowGroupLimit pushdown — each MAP partition is trimmed to
    * its local top-`cap` per source BEFORE the shuffle, so the exchange
    * carries O(cap × sources) rows per partition, not the corpus
    * (PlanGuardSpec pins the Partial/Final pair). A mega-domain therefore
    * costs cap rows per input partition, not a skewed reducer.
    */
  def domainCap(documents: DataFrame, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val w = Window.partitionBy($"source").orderBy($"priority", $"doc_id")
    documents
      .select($"doc_id", $"source", md5($"text".cast("binary")).as("priority"))
      .withColumn("doc_rank", row_number().over(w))
      .where($"doc_rank" <= cap)
      // cast AFTER the filter: InferWindowGroupLimit matches a predicate on
      // the raw rank function; casting first would defeat the map-side trim
      .select($"doc_id", $"source", $"priority",
        $"doc_rank".cast("long").as("doc_rank"))
      .orderBy($"source", $"doc_rank")
  }

  /** GPT-style sequence packing MANIFEST (concat-and-chunk): the corpus is
    * conceptually concatenated in doc_id order and cut into fixed
    * `seqLen`-token training sequences; a document whose token span crosses
    * a cut lands in BOTH chunks (the straddle every causal-LM data loader
    * has to handle). Unlike [[tokenShards]] (doc-atomic shard assignment),
    * this emits the per-CHUNK manifest: how many docs touch the chunk, how
    * many start in it, and the exact token count each chunk receives —
    * `tokens` is `seqLen` everywhere except the final partial chunk, which
    * the spec pins.
    *
    * Scale shape: the global token offsets come from the [[tokenShards]]
    * distributed prefix sum (range partition + per-partition totals as
    * driver metadata + within-partition window — no single-task global
    * window). Each doc then explodes into only the chunks it touches
    * (`len/seqLen + 1` rows worst case, ~1 for real corpora where
    * seqLen ≫ doc length), and the per-chunk rollup is a hash aggregate
    * with map-side partial combine on a dense high-cardinality key. All
    * values are longs — integer-exact in any aggregation order.
    */
  def packSequences(documents: DataFrame, seqLen: Long,
                    partitions: Int = 0): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    // empty docs contribute no tokens and belong to no chunk — dropped
    // explicitly so the straddle formula (cum+n-1) stays well-defined
    val toks = documents
      .select($"doc_id", TextAnalysis.wsTokenCount.as("n_tokens"))
      .where($"n_tokens" > 0L)
    withPrefixSum(toks, Seq($"doc_id"), "n_tokens", "cum_before",
        resolveParts(documents, partitions))
      .select($"doc_id", $"n_tokens", $"cum_before",
        expr(s"cum_before DIV ${seqLen}L").as("first_chunk"),
        expr(s"(cum_before + n_tokens - 1) DIV ${seqLen}L").as("last_chunk"))
      .select($"doc_id", $"n_tokens", $"cum_before", $"first_chunk",
        explode(sequence($"first_chunk", $"last_chunk")).as("chunk_id"))
      // token overlap of [cum_before, cum_before+n) with chunk window
      // [chunk·L, (chunk+1)·L) — exact long arithmetic
      .withColumn("tok_in_chunk",
        least(($"chunk_id" + lit(1L)) * lit(seqLen), $"cum_before" + $"n_tokens")
          - greatest($"chunk_id" * lit(seqLen), $"cum_before"))
      .groupBy($"chunk_id")
      .agg(count(lit(1)).as("n_docs"),
           sum(when($"first_chunk" === $"chunk_id", 1L).otherwise(0L))
             .cast("long").as("n_starts"),
           sum($"tok_in_chunk").cast("long").as("tokens"))
      .orderBy($"chunk_id")
  }

  /** Temperature-based domain mixing weights (the multilingual/multi-domain
    * sampling rule of mBERT/XLM-R and every data-mixture paper since):
    * sample domain i proportional to p_i^α. α is FIXED at 1/2 so the
    * exponent is `sqrt` — correctly rounded IEEE in every engine, unlike
    * `pow(x, 0.3)`/`ln` whose last-bit behavior is libm-specific and would
    * break cross-engine value checks. Weights are reported RELATIVE to the
    * largest domain (`rel_weight` = √nᵢ/√n_max, `upsample` = its inverse —
    * the per-domain epoch multiplier at a fixed token budget): every value
    * is one IEEE division of two exact square roots, with no
    * summation-order-dependent normalizing constant. The probability-
    * normalized form is a driver-side divide at serving time.
    *
    * Scale shape: one corpus pass collapsing map-side to a domains-sized
    * table (map-side partial combine on `source`), then a window over that
    * metadata-sized aggregate — the window's single partition holds one
    * row per DOMAIN, not per document.
    */
  def temperatureMix(documents: DataFrame): DataFrame = {
    // a zero-token domain has no defined mixing weight (its upsample
    // would be ∞); it contributes nothing to training, so it is dropped
    // rather than emitted as a silent Infinity
    val dom = documents
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
           sum(TextAnalysis.wsTokenCount).cast("long").as("tokens"))
      .where($"tokens" > 0L)
    val maxSqrt = max(sqrt($"tokens".cast("double")))
      .over(Window.partitionBy())
    dom
      .withColumn("sqrt_tokens", sqrt($"tokens".cast("double")))
      .withColumn("rel_weight", $"sqrt_tokens" / maxSqrt)
      .withColumn("upsample", maxSqrt / $"sqrt_tokens")
      .orderBy($"source")
  }

  private[operators] def resolveParts(df: DataFrame, partitions: Int): Int =
    if (partitions > 0) partitions
    else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt

  /** Distributed EXCLUSIVE prefix sum of long column `valueCol` in the
    * global order given by `order` (sort expressions): range-partition +
    * local sort, one per-partition total each, driver turns those few
    * totals into per-partition offsets (metadata, not data), and a
    * within-partition window adds the local prefix to the offset. The
    * textbook distributed scan — no unpartitioned window funneling the
    * corpus through one task. The input is materialized first (barrier)
    * so the offsets job and the final job observe the SAME physical
    * range boundaries (they come from sampling); reliable checkpoint
    * when `spark.graft.checkpointDir` is set.
    */
  private[operators] def withPrefixSum(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
                            valueCol: String, outName: String,
                            nParts: Int): DataFrame = {
    val ranged = df
      .repartitionByRange(nParts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("pid", spark_partition_id())
      .transform(graft.Session.barrier)
    val perPart = ranged.groupBy($"pid").agg(sum(col(valueCol)).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      val sorted = perPart.toSeq.sortBy(_._1)
      val cum = sorted.scanLeft(0L)(_ + _._2)
      sorted.map(_._1).zip(cum).toMap
    }
    val offsetCol = coalesce(
      element_at(
        map(offsets.toSeq.sortBy(_._1)
          .flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*),
        $"pid"),
      lit(0L))
    val w = Window.partitionBy($"pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn(outName,
        coalesce(sum(col(valueCol)).over(w), lit(0L)) + offsetCol)
      .drop("pid")
  }
}
