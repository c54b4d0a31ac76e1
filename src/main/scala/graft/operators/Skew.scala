package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.implicits._

/** Skew mitigation for shuffle joins (100 TB checklist: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join handling splits oversized *sort-merge* partitions at
  * runtime and is on by default ([[graft.Session]]) — prefer it. Salting is
  * the explicit fallback for the cases AQE can't fix: a hash-partitioned
  * stateful op keyed on a degenerate column, or a shuffle join whose hot
  * key exceeds a single task even after splitting. The trade: the small
  * side is replicated `salt`× (extra shuffle volume) in exchange for the
  * hot key spreading over `salt` tasks.
  *
  * The reference never needs this (single host, ~10⁶-cell grids), but its
  * grid model invites it at cluster scale: every cell of one month shares
  * the (variable, time) key, so a naive keyBy(variable, time) would put a
  * whole month in one task — exactly what salting disperses.
  */
object Skew {

  /** Inner equi-join `big ⋈ small` on `key`, with the big side scattered
    * over `salt` sub-keys and the small side replicated to match. Result
    * equals the plain join (row-for-row); only the shuffle distribution
    * changes. Scatter is deterministic (hash of the big side's row), so
    * retried tasks land rows identically.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val scatter = pmod(xxhash64(big.columns.map(col): _*), lit(salt))
    val bigS = big.withColumn("__salt", scatter)
    val smallS = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salt - 1L))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase distinct count for a skewed group key: partial distinct per
    * (key, salt) then merge — caps any single task's state at ~1/salt of
    * the hot group. (Plain `countDistinct` already does partial aggregation
    * but keeps per-group hash state keyed only by `key`.)
    */
  def saltedDistinctCount(df: DataFrame, groupKey: String, distinctCol: String,
                          salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    df.withColumn("__salt", pmod(xxhash64(col(distinctCol)), lit(salt)))
      .groupBy(col(groupKey), $"__salt")
      .agg(countDistinct(col(distinctCol)).as("partial"))
      .groupBy(col(groupKey))
      .agg(sum($"partial").as("n_distinct"))
  }

  /** The AQE-managed alternative to [[saltedJoin]]: declare a plain
    * shuffle join (the `shuffle_merge` hint keeps the small side out of
    * a broadcast, which would bypass the skew path entirely) and let
    * `OptimizeSkewedJoin` split oversized partitions at runtime — no
    * replication cost, no salt column, and the split only happens where
    * the data is actually skewed. This is the PREFERRED production shape;
    * salting remains for stateful ops and beyond-one-task hot keys (see
    * object scaladoc).
    */
  def aqeSkewJoin(big: DataFrame, small: DataFrame, key: String): DataFrame =
    big.hint("shuffle_merge").join(small, Seq(key))

  /** AQE thresholds that let a LOCAL-scale fixture's hot key actually
    * trip `OptimizeSkewedJoin`: the production defaults (256 MB skew
    * threshold / 64 MB advisory target) are right for cluster executors
    * and unreachable by a megabyte-sized gate. Apply via [[withConfs]]
    * around a forced materialization.
    */
  val localSkewTuning: Seq[(String, String)] = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "131072",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    // a downstream aggregate on the join key would otherwise veto the
    // split (it reuses the join's output partitioning; splitting breaks
    // that guarantee and AQE declines rather than add a shuffle) — at
    // gate scale the extra exchange is irrelevant, so force it
    "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")

  /** Join-key skew DIAGNOSTIC (x08): the report an operator consults
    * BEFORE choosing a salting factor — per key: row count, share of
    * the table (exact integer ppm, no float), the skew flag (count >
    * factor × the mean), and the salt recommendation
    * ceil(count / mean) for flagged keys. One map-side-combining
    * aggregate + a 1-row broadcast of the totals; emits only keys above
    * the reporting floor so the result is top-heavy-bounded, not
    * key-cardinality-bounded. All arithmetic exact integers — the ppm
    * is (count·1e6) div total, the mean comparison cross-multiplied —
    * so the gate hash-compares.
    */
  def skewReport(df: DataFrame, key: String,
                 flagFactor: Long = 4L, minCount: Long = 2L): DataFrame = {
    require(flagFactor >= 1 && minCount >= 1, "skewReport: degenerate thresholds")
    // exact integer floor division: double `/` rounds, so subtract the
    // remainder first — an exact multiple divides exactly below 2^53
    def fdiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ((a - pmod(a, b)) / b).cast("long")
    // barrier the histogram: totals derive from it, and without the
    // materialization the totals subtree would RESCAN the fact table
    // (PlanGuardSpec pins the single scan) — the histogram is key-
    // cardinality-sized, the right thing to hold regardless
    val counts = graft.Session.barrier(
      df.groupBy(col(key)).agg(count(lit(1)).as("n")))
    val totals = counts.agg(sum($"n").as("total"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .where($"n" >= minCount)
      .select(col(key), $"n", $"total", $"n_keys",
        fdiv($"n" * 1000000L, $"total").as("ppm"),
        // n > flagFactor * mean  <=>  n * n_keys > flagFactor * total
        ($"n" * $"n_keys" > lit(flagFactor) * $"total").as("skewed"),
        // ceil(n·n_keys / total) = recommended salt buckets, 1 if even
        when($"n" * $"n_keys" > lit(flagFactor) * $"total",
          fdiv($"n" * $"n_keys" + $"total" - 1L, $"total"))
          .otherwise(lit(1L)).as("salt_rec"))
      .orderBy($"n".desc, col(key))
  }

  /** Run `body` against a CLONED session carrying the conf overrides.
    * `newSession()` shares the SparkContext, cached data, and global temp
    * views with the parent but owns its own runtime conf, so a query
    * planned concurrently on the parent can never observe the overrides
    * (the old in-place mutate-and-restore form was a documented
    * concurrency foot-gun — e.g. `autoBroadcastJoinThreshold = -1`
    * silently disabling broadcast for an unrelated join). The body
    * receives the clone and must build (or [[rebind]]) its plans ON it —
    * confs bind at the executing Dataset's session, not at call scope.
    */
  def withConfs[A](spark: org.apache.spark.sql.SparkSession,
                   confs: (String, String)*)(body: org.apache.spark.sql.SparkSession => A): A = {
    val s2 = spark.newSession()
    confs.foreach { case (k, v) => s2.conf.set(k, v) }
    body(s2)
  }

  /** Re-bind a DataFrame's (already analyzed) logical plan to another
    * session of the same SparkContext, so it plans and executes under
    * THAT session's conf. Route: a global temp view — the one catalog
    * surface `newSession` clones share — registered, resolved eagerly by
    * `table()` (Dataset analysis is eager), then dropped.
    */
  def rebind(df: DataFrame, to: org.apache.spark.sql.SparkSession): DataFrame = {
    val name = "graft_rebind_" + java.util.UUID.randomUUID().toString.replace("-", "")
    df.createOrReplaceGlobalTempView(name)
    try to.table(s"global_temp.$name")
    finally df.sparkSession.catalog.dropGlobalTempView(name)
  }
}
