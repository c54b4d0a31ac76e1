package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.implicits._

/** Mergeable sketches — the approximate-aggregation regime exact
  * operators can't reach at 100 TB. An exact `countDistinct(user_id)`
  * over a petabyte stream shuffles every distinct value; an HLL sketch
  * is a few KB per group, pre-aggregates map-side, merges associatively
  * across partitions / days / clusters, and is insertion-ORDER-
  * INDEPENDENT (each register keeps a max), so the estimate is
  * deterministic for a given dataset regardless of partitioning — the
  * property SketchesSpec pins.
  *
  * Built on Spark's Datasketches-backed `hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate` (codegen'd, no UDF). Not
  * SQL-oracle-gated: DuckDB's approx_distinct is a different sketch
  * with different estimates, so this family is spec-gated instead
  * (error bound vs exact, merge = direct, partitioning invariance) —
  * the same treatment as ivfTrained/pqTopK.
  */
object Sketches {

  /** Per-group distinct-count estimate plus the sketch itself — keeping
    * the binary is the point: downstream consumers re-aggregate WITHOUT
    * touching raw data (roll days into months, groups into totals).
    */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  lgConfigK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("sketch"))
      .select(col(groupCol),
        hll_sketch_estimate($"sketch").as("approx_distinct"),
        $"sketch")
      .orderBy(col(groupCol))

  /** Merge per-group sketches into one global estimate — a few-KB-per-
    * group second aggregation, never a second pass over the data. This
    * is the 100 TB shape: partial sketches land in a metadata table;
    * any rollup (all-time, per-region, per-cohort) is a union over
    * sketches.
    */
  def hllMerge(sketches: DataFrame): DataFrame =
    sketches
      .agg(hll_union_agg($"sketch", lit(false)).as("merged"))
      .select(hll_sketch_estimate($"merged").as("approx_distinct"))

  /** Theta sketches: distinct counting WITH set algebra — the question
    * HLL cannot answer. "How many users clicked AND purchased" computed
    * exactly needs a distinct-join of raw data per group pair; theta
    * sketches answer it from the per-group sketches alone. Same
    * mergeable/order-independent properties as HLL (a theta sketch
    * retains the k smallest value hashes — a set property, not a
    * sequence property), and EXACT below the sketch's nominal capacity
    * (~4096 at the default lgK): it only starts estimating when a group
    * exceeds that.
    */
  def thetaDistinct(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(theta_sketch_agg(col(valueCol)).as("sketch"))
      .select(col(groupCol),
        theta_sketch_estimate($"sketch").as("approx_distinct"),
        $"sketch")
      .orderBy(col(groupCol))

  /** Pairwise |A ∩ B| across groups, computed ON THE SKETCHES: the
    * per-group sketch table is group-cardinality-sized (metadata, not
    * data), so the pair join is a join of a few KB rows — at 100 TB the
    * raw-data equivalent is a distinct self-join per pair. Emits each
    * unordered pair once.
    */
  def thetaOverlap(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val sk = df.groupBy(col(groupCol))
      .agg(theta_sketch_agg(col(valueCol)).as("sketch"))
    val a = sk.select(col(groupCol).as("group_a"), $"sketch".as("sk_a"))
    val b = sk.select(col(groupCol).as("group_b"), $"sketch".as("sk_b"))
    a.join(b, $"group_a" < $"group_b")
      .select($"group_a", $"group_b",
        theta_sketch_estimate(theta_intersection($"sk_a", $"sk_b"))
          .as("approx_overlap"))
      .orderBy($"group_a", $"group_b")
  }

  /** Mergeable quantile sketches (KLL): per-group percentile estimates
    * whose PARTIALS are first-class binary columns — land the per-group
    * (or per-day) sketches in a metadata table and answer any later
    * quantile question without re-reading raw data. `approx_percentile`
    * answers one query exactly as cheaply, but its summary is not
    * exposed for storage/re-merge; KLL's is (the spec proves
    * merge-of-halves ≈ sketch-of-whole within the rank-error bound —
    * KLL compaction is randomized, so the guarantee is an error bound,
    * not bit-determinism, unlike HLL/theta above).
    */
  def kllQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                   qs: Seq[Double], k: Int = 200): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1]: $qs")
    require(qs.distinct.size == qs.size,
      s"duplicate quantiles (would collide as columns): $qs")
    // the quantile argument must be FOLDABLE, so each q is its own literal
    // column over the one sketch aggregate; unpivot melts them back to
    // (group, q, value) rows without recomputing anything
    val sk = df.groupBy(col(groupCol))
      .agg(kll_sketch_agg_double(col(valueCol).cast("double"), lit(k)).as("sketch"))
    // dot-free column names ("0_5"): a dotted name would resolve as a
    // nested field reference
    def nm(q: Double) = q.toString.replace('.', '_')
    val wide = sk.select(col(groupCol) +: qs.map(q =>
      kll_sketch_get_quantile_double($"sketch", lit(q)).as(nm(q))): _*)
    wide.unpivot(Array(col(groupCol)), qs.map(q => wide(nm(q))).toArray,
        "q", "approx_value")
      .withColumn("q", translate($"q", "_", ".").cast("double"))
      .orderBy(col(groupCol), $"q")
  }

  /** Mergeable heavy hitters (Misra–Gries 1982, merged per Agarwal et al.,
    * "Mergeable Summaries", PODS 2012) — the frequent-items member of the
    * sketch family: which domains/tokens/users dominate, without the
    * unbounded-cardinality groupBy an exact count needs. Each partition
    * keeps ≤ k counters updated in O(1) amortized; partials merge by
    * counter addition followed by subtracting the (k+1)-th largest count
    * (the mergeable-summaries reduction), so memory is k counters at
    * every level of the aggregation tree no matter how many distinct
    * items stream past.
    *
    * Guarantee (the spec pins it): for a group with n rows, every item
    * with true count > n/(k+1) is present, estimates never exceed the
    * true count, and undercount is at most n/(k+1). When a group's
    * distinct-item count is ≤ k the counters are EXACT (no decrement
    * ever fires) for any partitioning. Counter values above that are
    * merge-order-dependent (the guarantee is not), so the family is
    * spec-gated like HLL/KLL, not SQL-oracle-gated.
    */
  /** The Misra–Gries summary as a reusable aggregate function — the
    * building block [[freqItems]] and the w14 streaming heavy-hitters
    * state share. k counters per group at every level of the aggregation
    * (or streaming state) tree.
    */
  def mgCounters(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(k >= 1, s"need at least one counter, got k=$k")
    udaf(new MisraGries(k))
  }

  def freqItems(df: DataFrame, groupCol: String, valueCol: String,
                k: Int = 16): DataFrame = {
    val mg = mgCounters(k)
    df.groupBy(col(groupCol))
      .agg(mg(col(valueCol).cast("string")).as("counters"))
      .select(col(groupCol), explode($"counters").as(Seq("item", "est_count")))
      .orderBy(col(groupCol), $"est_count".desc, $"item")
  }

  /** EXACT re-aggregatable distinct counts via bucketed 64-bit bitmaps —
    * the Doris/ClickHouse BITMAP-column pattern, and the exact sibling
    * of [[hllDistinct]]: where HLL trades exactness for a constant-size
    * state, the bitmap keeps exactness and trades state for
    * O(distinct/64) rows of 16 bytes each.
    *
    * Non-negative ids land in bucket `id >> 6`, bit `id & 63`; per
    * (group, bucket) the presence masks OR-combine map-side (bit_or is
    * associative+commutative+idempotent, so partial aggregation absorbs
    * every duplicate before the exchange — the shuffle carries at most
    * one 16-byte row per occupied bucket per group, NOT one row per
    * distinct value the way countDistinct's partial-dedup exchange
    * does). The payoff is the second aggregation: per-group masks
    * OR-merge ACROSS groups to the exact global distinct without
    * rescanning the input — the roll-up a plain countDistinct can never
    * provide (distincts don't add; bitmaps union). Emitted as per-group
    * rows plus an `__all__` row computed only from the merged masks.
    *
    * 100 TB shape: group × bucket is bounded by distinct-ids/64 per
    * group; masks land in a metadata-sized table that daily partitions
    * keep OR-merging, exactly like the HLL partial-sketch table but
    * with exact answers. Ids are contract-assumed non-negative
    * (arithmetic shiftright keeps negative ids in distinct buckets from
    * any non-negative id, so counts stay exact, but bucket keys then
    * sprawl; a split-sign map would be the tidy form).
    */
  def bitmapDistinct(df: DataFrame, groupCol: String, idCol: String): DataFrame = {
    // the mask relation materializes ONCE (it's the stored bitmap table
    // in the Doris pattern — metadata-sized, distinct/64 rows per group)
    // so the per-group count and the cross-group roll-up both read it
    // without a second input scan (plan-guarded)
    val masks = graft.Session.barrier(df
      .select(col(groupCol).cast("string").as("grp"),
        shiftright(col(idCol), 6).as("bucket"),
        expr(s"shiftleft(1L, CAST($idCol & 63 AS INT))").as("bit"))
      .groupBy($"grp", $"bucket")
      .agg(expr("bit_or(bit)").as("mask")))
    val perGroup = masks.groupBy($"grp")
      .agg(sum(bit_count($"mask")).cast("long").as("n_distinct"))
    // the re-aggregation lever: global distinct from the masks alone —
    // OR across groups per bucket, then popcount. No second input scan.
    val global = masks.groupBy($"bucket")
      .agg(expr("bit_or(mask)").as("mask"))
      .agg(sum(bit_count($"mask")).cast("long").as("n_distinct"))
      .select(lit("__all__").as("grp"), $"n_distinct")
    perGroup.unionByName(global)
      .select($"grp".as("event_type"), $"n_distinct")
      .orderBy($"event_type")
  }
}

/** The Misra–Gries summary as a typed Aggregator. The buffer is an
  * immutable map (≤ k+1 entries, structurally shared updates); the
  * decrement path drops every counter by one and runs only when a new
  * item arrives at a full summary — O(k), amortized O(1) per row.
  */
private class MisraGries(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      String, Map[String, Long], Map[String, Long]] {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  import org.apache.spark.sql.Encoder

  def zero: Map[String, Long] = Map.empty

  def reduce(m: Map[String, Long], item: String): Map[String, Long] =
    if (item == null) m
    else m.get(item) match {
      case Some(c) => m.updated(item, c + 1)
      case None if m.size < k => m.updated(item, 1L)
      case None => m.collect { case (i, c) if c > 1 => i -> (c - 1) }
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (i, c)) =>
      acc.updated(i, acc.getOrElse(i, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest counter from all; ≤ k survive
      val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      sum.collect { case (i, c) if c > cut => i -> (c - cut) }
    }
  }

  def finish(m: Map[String, Long]): Map[String, Long] = m
  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
