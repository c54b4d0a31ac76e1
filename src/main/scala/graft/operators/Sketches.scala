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
}
