package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Iterative graph centrality over relational edge lists — the family
  * (PageRank-style fixed-point over a join+aggregate kernel) that link
  * analysis, citation ranking, and seed-quality scoring pipelines run
  * over exactly the bipartite graphs a warehouse already has (buyer ⇄
  * item, doc ⇄ domain, part ⇄ supplier).
  *
  * Determinism design: classic double-valued PageRank is NOT
  * cross-engine reproducible — per-destination contribution sums are
  * float additions whose order depends on partitioning. Here rank is
  * integer MASS (1e6 per node at start) and every step is integer
  * arithmetic: `mass div outdeg` floor-division routing, an
  * order-independent BIGINT sum per destination, then the damped update
  * `150000 + (850 * inmass) div 1000` (= teleport 0.15 + damping 0.85
  * at the same 1e6 scale). Every engine computes identical bits, which
  * is what lets the g01 gate hold a full value-level DuckDB oracle —
  * unrolled as k nested CTEs — rather than a weak rows-only check.
  *
  * Scale shape (one iteration = one co-partitioned join + one
  * aggregate): edges carry (src, dst, outdeg) and are barriered once —
  * the k unrolled iterations scan the checkpointed edge list, not the
  * fact table, and the rank relation (one row per NODE, not per edge)
  * is the only thing that flows between rounds. Both joins and the
  * contribution aggregate hash-partition on the same keys, so AQE
  * coalesces the exchanges; k is a constant (fixed-point to ~1e-3 of
  * final rank in 3-5 rounds on bounded-degree graphs), so the plan
  * depth is bounded. No driver-side loop state, no collect.
  */
object Graph {

  /** Bidirectional bipartite edges part⇄supplier from the lineitem fact:
    * node ids are disjoint by parity (part → 2k, supplier → 2k+1).
    */
  def partSupplierEdges(lineitem: DataFrame): DataFrame = {
    val pairs = lineitem.select(
      (col("l_partkey") * 2).as("p"),
      (col("l_suppkey") * 2 + 1).as("s"))
    pairs.select(col("s").as("src"), col("p").as("dst"))
      .unionByName(pairs.select(col("p").as("src"), col("s").as("dst")))
      .distinct()
  }

  /** Integer-mass PageRank, k unrolled synchronous iterations.
    * Returns (node, pr) for every node. Bidirectional edges guarantee
    * outdeg ≥ 1 (no dangling mass) and indegree ≥ 1 (every node gets a
    * damped update), so no outer-join/coalesce leg is needed.
    */
  def pagerankInt(edges: DataFrame, iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"pagerankInt: iterations must be >= 1")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // one barrier: iteration plans re-read this, not the edge derivation
    val routed = graft.Session.barrier(edges.join(deg, "src"))
    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to iterations) {
      ranks = routed.join(ranks, routed("src") === ranks("node"))
        .select(col("dst"), expr("pr div outdeg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("inmass"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr("(850 * inmass) div 1000")).as("pr"))
    }
    ranks
  }
}
