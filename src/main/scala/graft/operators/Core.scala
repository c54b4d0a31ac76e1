package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.implicits._

/** Core relational operators, each a pure DataFrame transform.
  *
  * Every operator here re-expresses a dataflow primitive of the reference
  * (SURVEY.md §2) Spark-first: the reference shells out to wgrib/cdo/gdal for
  * per-file kernels (reference src/file-conversions.js:233-257); here each
  * kernel is a declarative plan Catalyst can push down, prune, broadcast and
  * codegen — the shape that survives a 1000-executor 100 TB scale-up.
  */
object Core {

  /** Hash-aggregate summary (reference A1 analog — `cdo timmean` is a mean
    * over a group, src/file-conversions.js:206-217). Partial aggregation
    * (map-side combine) comes free from Catalyst: one shuffle of 6 groups.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        // exact decimal money sum → deterministic double (see Anomaly)
        sum($"l_extendedprice".cast("decimal(18,2)") *
            (lit(1) - $"l_discount".cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")

  /** Distinct values (reference A2 — `new Set(datasets.map(d => d.variable))`
    * so one CDS request serves all datasets, src/sources/era5monthly.js:46).
    */
  def distinctValues(df: DataFrame, col: String): DataFrame =
    df.select(col).distinct().orderBy(col)

  /** Temporal-coverage extent per group (reference A3 — running
    * `start=min, end=max` merge in typical_metadata, src/utility.js:135-142).
    */
  def extent(df: DataFrame, key: String, time: String): DataFrame =
    df.groupBy(col(key))
      .agg(min(col(time)).as("start"), max(col(time)).as("end"), count(lit(1)).as("n"))
      .orderBy(col(key))

  /** Range ("bbox") predicate (reference P2 — the CDS `area: [N,W,S,E]`
    * subset evaluated at the source, src/sources/era5monthly.js:34,55).
    * Catalyst pushes both range predicates into the parquet scan (min/max
    * row-group pruning) — the engine-side equivalent of filtering upstream.
    */
  def rangeFilter(df: DataFrame, x: String, xlo: Double, xhi: Double,
                  y: String, ylo: Double, yhi: Double, order: Seq[String]): DataFrame =
    df.where(col(x).between(xlo, xhi) && col(y).between(ylo, yhi))
      .orderBy(order.map(col): _*)

  /** Regex-match + limit scan (reference S6 — `wgrib2 -match regex -limit n`,
    * src/file-conversions.js:79-87; the only LIMIT in the reference).
    * Ordered before limiting so the result is deterministic.
    */
  def regexLimit(df: DataFrame, c: String, pattern: String, n: Int, order: String): DataFrame =
    df.where(col(c).rlike(pattern)).orderBy(col(order)).limit(n)

  /** Pairwise accumulation diff via window lag (reference J2 —
    * `combine_grib([a,b], (a,b) => a-b)` de-accumulation,
    * src/file-conversions.js:53-55,158-172). A lag window over the partition
    * key avoids the self-join shuffle the naive translation would do: one
    * shuffle on the partition key, then a sorted scan.
    */
  def accumulationDiff(df: DataFrame, part: String, order: Seq[String], value: String): DataFrame = {
    val w = Window.partitionBy(col(part)).orderBy(order.map(col): _*)
    df.select(
        col(part) +: order.map(col) :+ col(value) :+
          lag(col(value), 1).over(w).as("prev"): _*)
      .withColumn("diff", round(col(value) - col("prev"), 2))
      .drop("prev")
      .withColumn(value, round(col(value), 2))
      .orderBy((col(part) +: order.map(col)): _*)
  }

  /** Group mean over a periodic key (reference A1, the climatology normal:
    * mean of the same calendar month over many years,
    * src/sources/era5monthly.js:126-155).
    */
  def periodicMean(df: DataFrame, keys: Seq[Column], value: Column,
                   outKeys: Seq[String]): DataFrame =
    df.groupBy(keys: _*)
      .agg(round(avg(value), 4).as("mean_value"), count(lit(1)).as("n"))
      .orderBy(outKeys.map(col): _*)

  /** Union of two conformed inputs (reference `destructive_cat` —
    * concatenate-then-delete, src/download.js:22-33). unionByName keeps
    * column resolution by name, not position.
    */
  def unionAccounts(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(lit("customer").as("kind"), $"c_acctbal".as("acctbal"))
      .unionByName(supplier.select(lit("supplier").as("kind"), $"s_acctbal".as("acctbal")))
      .groupBy($"kind")
      .agg(count(lit(1)).as("n"), round(sum($"acctbal"), 2).as("total_bal"))
      .orderBy($"kind")

  /** First element strictly after a cutoff, per group (reference
    * `nextOscarDate`: `dates.find(d => d > current)`, src/oscar.js:8-12) —
    * a sorted-scan min-greater-than, expressed as filter + min aggregate.
    */
  def nextAfter(df: DataFrame, key: String, time: String, cutoff: String): DataFrame =
    df.where(col(time) > lit(cutoff).cast("timestamp_ntz"))
      .groupBy(col(key))
      .agg(min(col(time)).as("next_time"), count(lit(1)).as("n_after"))
      .orderBy(col(key))

  /** Anti join (reference P5-adjacent: dropping entities with no data —
    * null-metadata filter, src/rabbit.js:82). NOT EXISTS without a shuffle
    * of the big side when the right side is broadcastable.
    */
  def antiJoin(left: DataFrame, right: DataFrame, lk: String, rk: String,
               outCols: Seq[String]): DataFrame =
    left.join(right, left(lk) === right(rk), "left_anti")
      .select(outCols.map(col): _*)
      .orderBy(col(outCols.head))

  /** Semi join through a small dimension chain (reference P4 — keep datasets
    * whose prefix matches the source, src/rabbit.js:28-30: a semi join of
    * files against a source list). Dimensions are broadcast.
    */
  def semiJoinRegion(supplier: DataFrame, nation: DataFrame, region: DataFrame,
                     regionName: String): DataFrame = {
    val keys = nation.join(broadcast(region),
        nation("n_regionkey") === region("r_regionkey"))
      .where(region("r_name") === regionName)
      .select($"n_nationkey")
    supplier.join(broadcast(keys), supplier("s_nationkey") === keys("n_nationkey"), "left_semi")
      .select($"s_suppkey", $"s_name", $"s_nationkey")
      .orderBy($"s_suppkey")
  }

  /** Hierarchical rollup (reference A5 — the recursive dir→nested-object
    * state-tree aggregation, src/utility.js:56-69, src/rabbit.js:87-89).
    * ROLLUP computes all prefixes in one pass; grouping nulls are coalesced
    * to 'ALL' so the output is a plain string key space.
    */
  def revenueRollup(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                    nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(orders, $"l_orderkey" === $"o_orderkey")
      .join(customer, $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(sum($"l_extendedprice".cast("decimal(18,2)") *
               (lit(1) - $"l_discount".cast("decimal(18,2)")))
             .cast("double").as("revenue"), // exact decimal → deterministic double
           count(lit(1)).as("n_items"))
      .select(coalesce($"r_name", lit("ALL")).as("region_name"),
              coalesce($"n_name", lit("ALL")).as("nation_name"),
              $"revenue", $"n_items")
      .orderBy($"region_name", $"nation_name")

  /** Top-k per group with deterministic tiebreak (sort+limit surface;
    * reference has only the wgrib2 `-limit n` cap, src/file-conversions.js:83).
    * row_number (not rank) + explicit tiebreak key keeps the result stable.
    */
  def topKPerGroup(lineitem: DataFrame, part: DataFrame, k: Int): DataFrame = {
    val rev = lineitem.groupBy($"l_partkey")
      .agg(sum($"l_extendedprice" * (lit(1) - $"l_discount")).as("rev"))
    val joined = rev.join(part, $"l_partkey" === $"p_partkey")
    val w = Window.partitionBy($"p_brand").orderBy($"rev".desc, $"p_partkey")
    joined.withColumn("rk", row_number().over(w).cast("long"))
      .where($"rk" <= k)
      .select($"p_brand", $"p_partkey", round($"rev", 4).as("revenue"), $"rk")
      .orderBy($"p_brand", $"rk")
  }

  /** Inventory gather (reference A4 — read every dataset's metadata.json,
    * aggregate coverage, src/rabbit.js:73-85): per-source coverage stats
    * over the documents corpus.
    */
  def inventory(documents: DataFrame): DataFrame =
    documents.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
           min($"n_chars").as("min_chars"),
           max($"n_chars").as("max_chars"),
           countDistinct($"lang").as("n_langs"))
      .orderBy($"source")

  /** Hierarchical subtotals (q41): ROLLUP over (returnflag, linestatus) —
    * the reference's state-tree rollup (A5, src/cycle.js:141-163)
    * re-expressed as the relational grouping-sets operator every BI layer
    * asks for.
    *
    * Scale shape: Spark plans ROLLUP as ONE scan through an Expand node
    * (each row replicated once per grouping set, null-marked) feeding a
    * single map-side-combined hash aggregate — strictly cheaper at 100 TB
    * than aggregating per level and unioning, which would scan the fact
    * table d+1 times. The replication factor equals the number of
    * grouping sets (3 here), all absorbed before the one shuffle.
    */
  def rollupSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity").cast("long").as("sum_qty"),
           count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)

  /** Arbitrary GROUPING SETS (q54) — the general form rollup/cube are
    * special cases of, for set lists neither can express (here
    * ((priority, status), (status), ()) — skipping the (priority) level
    * a ROLLUP would force). Same plan shape as q41: ONE scan through an
    * Expand (row replicated once per set, null-marked) into a single
    * map-side-combined aggregate — never one aggregation per level
    * unioned. `grouping()` markers disambiguate "NULL because
    * aggregated away" from a genuine NULL group value, and give the
    * deterministic ordering key.
    */
  def groupingSetsSummary(orders: DataFrame): DataFrame =
    orders
      .groupingSets(
        Seq(Seq($"o_orderpriority", $"o_orderstatus"),
            Seq($"o_orderstatus"), Seq()),
        $"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"))
          .as("sum_cents"),
        grouping($"o_orderpriority").cast("long").as("g_pri"),
        grouping($"o_orderstatus").cast("long").as("g_st"))
      .orderBy($"g_pri", $"g_st",
        $"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)

  /** Wide pivot (q42): per-day event counts and exact cent sums spread
    * into one column pair per event type — the long→wide reshape every
    * reporting job runs.
    *
    * Scale shape: the pivot is written as DIRECT conditional aggregation
    * (one `agg` expression per (type, measure) cell) — one scan, ONE
    * shuffle on the day key, map-side combined, plan-guarded. Two forms
    * it deliberately avoids: `.pivot(col)` without a value list runs a
    * collect-distinct driver round trip + re-plan, and `.pivot` with
    * MULTIPLE aggregates plans a (day, type) pre-aggregate plus a
    * PivotFirst re-shuffle — two exchanges where one suffices. Sums are
    * exact integer cents, so wide-row equality against the oracle is
    * bitwise; empty cells are 0, making each wide row a total function
    * of its day.
    */
  def pivotDaily(events: DataFrame, types: Seq[String]): DataFrame = {
    val cells = types.flatMap { t =>
      Seq(
        count(when($"event_type" === t, lit(1))).as(s"${t}_n"),
        coalesce(sum(when($"event_type" === t, $"cents")), lit(0L)).as(s"${t}_cents"))
    }
    events
      .select(to_date($"ts").as("day"), $"event_type",
        floor($"value" * 100).cast("long").as("cents"))
      .groupBy($"day")
      .agg(cells.head, cells.tail: _*)
      .orderBy($"day")
  }

  /** Wide→long melt (q44): the inverse reshape of [[pivotDaily]] via
    * Spark's native `unpivot` (an Expand node — each wide row replicated
    * once per melted column, no shuffle of its own). Round-tripping
    * through pivot THEN unpivot is the gate's point: the melt must
    * reproduce exactly the per-(day, type) aggregate the long form
    * started from, including the explicit 0 rows the zero-filled wide
    * form carries for absent combinations.
    */
  def unpivotDaily(events: DataFrame, types: Seq[String]): DataFrame =
    pivotDaily(events, types)
      .unpivot(Array(col("day")), types.map(t => col(s"${t}_cents")).toArray,
        "event_type", "cents")
      .withColumn("event_type", regexp_replace($"event_type", "_cents$", ""))
      .orderBy($"day", $"event_type")

  /** Exact interpolated percentiles (q43): p50/p90/p99 of integer cents
    * per event type via Spark's exact `percentile` (linear interpolation
    * at rank (n−1)·p — the same definition DuckDB's quantile_cont uses,
    * so values cross-check bitwise on integer inputs).
    *
    * Scale note: the EXACT percentile holds per-group values in memory —
    * the right default at dimension-table group counts (5 types here);
    * for fact-scale group cardinality or streaming, the engine's KLL
    * sketch (Sketches.kll) is the bounded-memory form with a proven rank
    * bound; this gate pins the exact end so the sketch has a verified
    * reference point.
    */
  def percentiles(events: DataFrame): DataFrame =
    events
      .select($"event_type", floor($"value" * 100).cast("long").as("cents"))
      .groupBy($"event_type")
      .agg(
        percentile($"cents", lit(0.5)).as("p50"),
        percentile($"cents", lit(0.9)).as("p90"),
        percentile($"cents", lit(0.99)).as("p99"))
      .orderBy($"event_type")

  /** Global NTILE without a global window (q53): per-decile stats over
    * order totals in exact cents. `ntile(b) OVER (ORDER BY …)` is the
    * one window no partitionBy can save — as written it funnels the
    * whole table through a single task. The distributed shape: a global
    * rank from the range-partition + per-partition-offset prefix sum
    * ([[Sampling.withPrefixSum]] — offsets are nParts driver-side longs,
    * never data), then the SQL-standard tile rule applied as arithmetic:
    * with n rows, q = n div b, m = n mod b, the first m tiles take q+1
    * rows, the rest q — exactly the builtin's assignment, so the result
    * cross-checks against a native ntile() bitwise. The 1-row count
    * broadcasts back q51-style; the tile aggregate is one ordinary
    * map-side-combining shuffle.
    *
    * Total order (cents, o_orderkey) makes ranks — and therefore every
    * tile boundary — deterministic under any partitioning; a bare
    * ORDER BY cents would let equal totals straddle a boundary in
    * partition-dependent order.
    */
  def decileStats(orders: DataFrame, buckets: Int = 10,
                  partitions: Int = 0): DataFrame = {
    require(buckets >= 1, "decileStats: buckets must be >= 1")
    val o = orders.select(
      ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long").as("cents"),
      $"o_orderkey")
    val nParts = Sampling.resolveParts(o, partitions)
    val ranked = Sampling.withPrefixSum(
      o.withColumn("one", lit(1L)),
      Seq($"cents".asc, $"o_orderkey".asc), "one", "rank0", nParts)
    val nRow = broadcast(o.agg(count(lit(1)).as("n")))
    ranked.crossJoin(nRow)
      .withColumn("q", expr(s"n div ${buckets}L"))
      .withColumn("m", expr(s"n % ${buckets}L"))
      // rank0 is the 0-based global rank. The else branch divides by q,
      // which is 0 only when n < b — unreachable there (rank0 < n =
      // m·(q+1) when q = 0), but guarded anyway
      .withColumn("tile", expr(
        """1 + if(rank0 < m * (q + 1),
                  rank0 div (q + 1),
                  m + (rank0 - m * (q + 1)) div greatest(q, 1))"""))
      .groupBy($"tile")
      .agg(count(lit(1)).as("n"), min($"cents").as("min_cents"),
        max($"cents").as("max_cents"), sum($"cents").as("sum_cents"))
      .orderBy($"tile")
  }

  /** Robust per-group outlier detection via median absolute deviation —
    * the robust-statistics counterpart of z-score filtering (median/MAD
    * don't move when the outliers themselves do, which is why quality
    * pipelines prefer them for e.g. balance/price/latency screens).
    *
    * All arithmetic is exact integers over cents: carrying DOUBLED order
    * statistics (`med2` = b_⌈n/2⌉ + b_⌈(n+1)/2⌉, i.e. 2·median with the
    * even-n midpoint exact; `mad2` likewise over |2v − med2| so it is
    * 4·MAD) makes every median — odd or even group size — an integer any
    * engine computes bit-identically, and the outlier rule the integer
    * cross-multiplication `2·|2v − med2| > 3·mad2` ⟺ |v − median| >
    * 3·MAD. No float quantile interpolation anywhere (the q51/g03
    * discipline).
    *
    * Scale shape — the part that matters at 100 TB: both order-statistic
    * passes run over the (group, value) HISTOGRAM, not raw rows. The
    * first groupBy collapses the fact table with map-side combine; every
    * window after that sorts ≤ |value domain| rows per group (cents of a
    * bounded money range — ~10⁶ — regardless of row count), so there is
    * no per-group terabyte sort task; the k-th order statistic reads off
    * the cumulative-count range [lo_rank, hi_rank] that brackets k.
    * Medians broadcast back as one tiny relation per pass.
    */
  def madOutliers(df: DataFrame, groupCol: String, cents: Column): DataFrame = {
    val w = Window.partitionBy($"g").orderBy($"v")
    // one order-statistic pass over a (g, v, c) histogram: the doubled
    // k1/k2-th smallest values, k1 = ⌈n/2⌉, k2 = ⌈(n+1)/2⌉
    def orderStat2(hist: DataFrame): DataFrame =
      hist
        .withColumn("hi_rank", sum($"c").over(w))
        .withColumn("lo_rank", $"hi_rank" - $"c" + 1)
        .withColumn("n", sum($"c").over(Window.partitionBy($"g")))
        .withColumn("k1", expr("(n + 1) div 2"))
        .withColumn("k2", expr("(n + 2) div 2"))
        .groupBy($"g")
        .agg((sum(when($"k1".between($"lo_rank", $"hi_rank"), $"v").otherwise(0L)) +
              sum(when($"k2".between($"lo_rank", $"hi_rank"), $"v").otherwise(0L)))
          .as("stat2"),
          max($"n").as("n"))
    val hist = df.select(col(groupCol).as("g"), cents.as("v"))
      .groupBy($"g", $"v").agg(count(lit(1)).as("c"))
    val meds = orderStat2(hist)
      .select($"g", $"stat2".as("med2"), $"n")
    val devHist = hist.join(broadcast(meds), Seq("g"))
      .select($"g", abs($"v" * 2 - $"med2").as("v"), $"c")
      .groupBy($"g", $"v").agg(sum($"c").as("c"))
    val mads = orderStat2(devHist).select($"g", $"stat2".as("mad2"))
    devHist.join(broadcast(meds), Seq("g")).join(broadcast(mads), Seq("g"))
      .groupBy($"g")
      .agg(max($"n").as("n"), max($"med2").as("med2"), max($"mad2").as("mad2"),
        sum(when($"v" * 2 > $"mad2" * 3, $"c").otherwise(0L)).as("n_outliers"),
        sum(when($"v" * 2 > $"mad2" * 3, $"v" * $"c").otherwise(0L)).as("outlier_dev2_sum"))
      .select($"g".as("segment"), $"n", $"med2", $"mad2",
        $"n_outliers", $"outlier_dev2_sum")
      .orderBy($"segment")
  }

  /** Exact weighted median per group — the 50%-of-mass order statistic
    * (lower weighted median: the smallest v whose cumulative weight
    * reaches half the total, `2·cumw(v) ≥ totw` as an integer
    * cross-multiplication, so no division ever happens).
    *
    * Same scale shape as [[madOutliers]]: the fact table collapses to a
    * (group, value) histogram with map-side combine first, so the one
    * ordered window after it sorts ≤ |value domain| rows per group no
    * matter how many raw rows carried each value — the 100 TB-safe way
    * to take any order statistic over a bounded domain. Both value and
    * weight are exact longs (units and cents), so every engine computes
    * the identical cumulative sums and picks the identical row.
    *
    * Contract: weights must be positive — a zero/negative weight makes
    * the cumulative mass non-monotone and "the 50% point" ill-defined
    * (every textbook definition assumes w > 0). Validate upstream.
    */
  def weightedMedian(df: DataFrame, groupCol: String,
                     value: Column, weight: Column): DataFrame = {
    val hist = df
      .select(col(groupCol).as("g"), value.as("v"), weight.as("w"))
      .groupBy($"g", $"v").agg(sum($"w").as("w"), count(lit(1)).as("c"))
    val win = Window.partitionBy($"g").orderBy($"v")
    hist
      .withColumn("cumw", sum($"w").over(win))
      .withColumn("totw", sum($"w").over(Window.partitionBy($"g")))
      .withColumn("n", sum($"c").over(Window.partitionBy($"g")))
      .where($"cumw" * 2 >= $"totw")
      .groupBy($"g")
      .agg(min($"v").as("wmedian"), max($"n").as("n"), max($"totw").as("tot_weight"))
      .select($"g".as("grp"), $"n", $"tot_weight", $"wmedian")
      .orderBy($"grp")
  }

  /** Deterministic per-group mode: the most frequent value, ties broken
    * toward the smallest value — the rule stated once and shared with the
    * oracle, because "the" mode is otherwise partition-order-dependent.
    *
    * One map-side-combining shuffle builds the (group, value) histogram;
    * the `row_number` window after it ranks only histogram rows — bounded
    * by the value domain per group, not the row count — so the pick is
    * metadata-sized at any corpus scale.
    */
  def modeTop1(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val hist = df
      .select(col(groupCol).as("g"), col(valueCol).as("v"))
      .groupBy($"g", $"v").agg(count(lit(1)).as("cnt"))
    // ties toward MIN v: rank on (cnt desc, v asc) over the tiny histogram
    val win = Window.partitionBy($"g").orderBy($"cnt".desc, $"v".asc)
    hist
      .withColumn("rk", row_number().over(win))
      .withColumn("n_distinct", count(lit(1)).over(Window.partitionBy($"g")))
      .where($"rk" === 1)
      .select($"g".as("grp"), $"v".as("mode_value"), $"cnt".as("n_mode"),
        $"n_distinct".cast("long").as("n_distinct"))
      .orderBy($"grp")
  }

  /** Winsorized sum per group — clamp to the exact p10/p90 ORDER
    * STATISTICS (ranks ⌈n/10⌉ and ⌈9n/10⌉, integer rank arithmetic, no
    * quantile interpolation) and total the clamped values. The robust
    * aggregate quality pipelines use where trimming would bias the count;
    * completes the [[madOutliers]]/[[weightedMedian]] robust-stats family
    * on the same chassis: order-statistic passes over the (group, value)
    * HISTOGRAM (windows sort ≤ |value domain| rows per group, never raw
    * rows), cut values broadcast back as a groups-sized relation, clamped
    * total in one map-side-combining aggregate — all exact longs.
    */
  def winsorizedSum(df: DataFrame, groupCol: String, cents: Column): DataFrame = {
    val hist = df.select(col(groupCol).as("g"), cents.as("v"))
      .groupBy($"g", $"v").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy($"g").orderBy($"v")
    val ranked = hist
      .withColumn("hi_rank", sum($"c").over(w))
      .withColumn("lo_rank", $"hi_rank" - $"c" + 1)
      .withColumn("n", sum($"c").over(Window.partitionBy($"g")))
      .withColumn("k_lo", expr("(n + 9) div 10"))
      .withColumn("k_hi", expr("(9 * n + 9) div 10"))
    // each rank lands inside exactly one value's cumulative range
    val cuts = ranked.groupBy($"g").agg(
      max($"n").as("n"),
      min(when($"k_lo".between($"lo_rank", $"hi_rank"), $"v")).as("cut_lo"),
      min(when($"k_hi".between($"lo_rank", $"hi_rank"), $"v")).as("cut_hi"))
    hist.join(broadcast(cuts), Seq("g"))
      .groupBy($"g")
      .agg(max($"n").as("n2"), max($"cut_lo").as("clo"), max($"cut_hi").as("chi"),
        sum(greatest(least($"v", $"cut_hi"), $"cut_lo") * $"c").as("ws"))
      .select($"g".as("grp"), $"n2".as("n"), $"clo".as("cut_lo"),
        $"chi".as("cut_hi"), $"ws".as("wsum"))
      .orderBy($"grp")
  }

  /** ANALYZE TABLE: the per-column statistics relation a cost-based
    * optimizer (and a zone-map planner — x11's file-level twin) feeds on:
    * row count, null count, EXACT distinct count, min/max bounds, and
    * total value length. One row per column, one input scan.
    *
    * Bounds are emitted as strings TRUNCATED to 16 chars — the Parquet
    * footer discipline (truncated bounds stay valid for pruning; a 2 MB
    * document must not land in a stats table). min/max run on the NATIVE
    * type first (numeric order, not lexicographic) and cast after.
    * `total_len` is over the string rendering — with the row count it
    * yields avg-width, the CBO's size estimator, exact in integers.
    *
    * Scale shape: the multi-distinct aggregate plans as ONE scan + an
    * Expand (one replica per distinct column) into a two-level partial
    * aggregate — the exact form. At 100 TB swap the NDV leg for
    * [[Sketches.hllDistinct]] per column (constant state, same relation
    * shape); exact everything else is already one combiner-friendly pass.
    */
  def analyzeStats(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "analyzeStats: need at least one column")
    val aggs = columns.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"ndv_$c"),
        min(col(c)).cast("string").substr(1, 16).as(s"min_$c"),
        max(col(c)).cast("string").substr(1, 16).as(s"max_$c"),
        sum(length(col(c).cast("string")).cast("long")).as(s"len_$c"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = columns.map { c =>
      s"'$c', nn_$c, ndv_$c, min_$c, max_$c, len_$c"
    }.mkString(", ")
    one.select($"n_rows", expr(
        s"stack(${columns.size}, $stackArgs) AS " +
          "(column_name, n_notnull, ndv, min_val, max_val, total_len)"))
      .select($"column_name", $"n_rows".cast("long").as("n_rows"),
        ($"n_rows" - $"n_notnull").cast("long").as("n_nulls"),
        $"ndv".cast("long").as("ndv"), $"min_val", $"max_val",
        coalesce($"total_len", lit(0L)).as("total_len"))
      .orderBy($"column_name")
  }

  /** Q73: Gini concentration per group — the standard inequality
    * measure, run as a key-skew / revenue-concentration audit (a group
    * whose mass sits in a few orders behaves differently under joins,
    * caps, and sampling than a dispersed one). Exact integers end to
    * end: values are whole dollars (cents div 100 — cents first via the
    * repo's decimal(18,2) contract, so the floor is well-defined), the
    * sorted-rank identity G·n·Σx = Σ(2i−1)xᵢ − n·Σx gives the
    * numerator/denominator pair as BIGINTs, and the band is the
    * cross-multiplied verdict (2·g_num ≥ g_den ⟺ G ≥ 0.5). Ratios are
    * the caller's division — multiplying g_num by 10⁶ would overflow
    * long before the moments themselves do. Envelope: 2·n·Σx < 2⁶³
    * per group (holds through the 30× leg; beyond, pre-scale x).
    *
    * Tie-invariance: equal values occupy a contiguous rank run, so
    * Σ(2i−1)xᵢ is the same under any tie order — the o_orderkey
    * tiebreak only pins the intermediate relation. Scale shape: one
    * group-keyed rank window + one group fold (the q61 order-statistic
    * cost, the honest price of exact ranks).
    */
  def giniConcentration(orders: DataFrame): DataFrame = {
    val cents = ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long")
    val w = Window.partitionBy($"grp").orderBy($"x", $"o_orderkey")
    orders
      .select($"o_orderpriority".as("grp"), $"o_orderkey", cents.as("cents"))
      .withColumn("x", expr("cents div 100"))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy($"grp")
      .agg(count(lit(1)).as("n"), sum($"x").as("sum_x"),
        sum(($"i" * 2 - 1) * $"x").as("s"))
      .select($"grp", $"n", $"sum_x",
        ($"s" - $"n" * $"sum_x").as("g_num"),
        ($"n" * $"sum_x").as("g_den"))
      .withColumn("band",
        when($"g_num" * 2 >= $"g_den", "concentrated").otherwise("dispersed"))
      .orderBy($"grp")
  }

  /** Q75: skyline / Pareto frontier (Börzsönyi et al., ICDE'01) — per
    * brand, the parts no other part strictly dominates on (price ↓,
    * size ↑): the multi-objective shortlist query every catalog/
    * candidate-selection pipeline runs. The textbook form is the
    * quadratic NOT EXISTS self-join (the oracle's form); the engine
    * exploits the 2-D total order instead: after collapsing duplicate
    * (price, size) points, sort each brand by (price asc, size desc) —
    * a point is dominated iff some EARLIER point has size ≥ its own
    * (earlier ⇒ price ≤, with the price-tie case strict on size by the
    * dedup), so one running `max(size)` window replaces the O(n²)
    * pair scan. O(n log n), one window sort per brand partition.
    *
    * Scale shape: a groupBy dedup + ONE partitioned window — no join
    * at any size; brands partition the sort, so 100 TB of parts is 25
    * independent sorted streams, and the dedup's partial aggregation
    * collapses the (brand, price, size) value domain map-side.
    */
  def skylineFrontier(part: DataFrame): DataFrame = {
    val pts = part.select($"p_brand".as("brand"),
        ($"p_retailprice".cast("decimal(18,2)") * 100).cast("long")
          .as("price_cents"),
        $"p_size".cast("long").as("psize"))
      .groupBy($"brand", $"price_cents", $"psize")
      .agg(count(lit(1)).as("n_parts"))
    val w = Window.partitionBy($"brand")
      .orderBy($"price_cents".asc, $"psize".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    pts.withColumn("prev_max", max($"psize").over(w))
      .where($"prev_max".isNull || $"prev_max" < $"psize")
      .select($"brand", $"price_cents", $"psize", $"n_parts")
      .orderBy($"brand", $"price_cents")
  }

  /** Q76: time-decayed top-k leaderboard — the trending/freshness
    * ranking every feed and hot-key monitor runs, with the decay kept
    * EXACT: score = Σ cents ≫ min(age_weeks, 40), i.e. revenue halves
    * per week of age (shift = floor-division by 2^w, deterministic in
    * any engine; the float e^−λt form is not). The clamp at 40 keeps
    * both engines' shift semantics in range (Java wraps shifts ≥ 64)
    * and is semantically free — cents < 2⁴⁰ shifted by 40 is already 0.
    * Age is anchored at 2001-12-01, the month after the fixture's last
    * shipdate (2001-11-04 at every SF); the clamp BELOW at 0 makes the
    * gate robust to a fixture whose dates cross the anchor — a negative
    * shift is where Spark (Java masks the count) and DuckDB's `>>`
    * silently diverge, and the integer division of a negative datediff
    * is itself a truncate-vs-floor trap; both are clamped away in the
    * engine AND the oracle.
    *
    * Scale shape: one partial-aggregating groupBy on the supplier key,
    * then a global top-k via TakeOrdered (map-side per-partition heaps,
    * k rows to the driver — never a full sort); ties broken by key.
    */
  def decayTopk(lineitem: DataFrame, k: Int = 25): DataFrame = {
    lineitem.select($"l_suppkey",
        ($"l_extendedprice".cast("decimal(18,2)") * 100).cast("long")
          .as("cents"),
        greatest(least(expr("datediff(date'2001-12-01', l_shipdate) div 7"),
            lit(40)), lit(0))
          .cast("int").as("age_w"))
      .select($"l_suppkey", $"cents", expr("shiftright(cents, age_w)").as("decayed"))
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n_items"), sum($"cents").as("raw_cents"),
        sum($"decayed").as("score"))
      .orderBy($"score".desc, $"l_suppkey".asc)
      .limit(k)
  }

  /** Q77: RFM segmentation (Hughes 1994) — the recency/frequency/
    * monetary quintile scoring every CRM and retention pipeline runs:
    * per customer, days since last order (anchored at 2001-12-01, the
    * month after the fixture's last date, like q76), order count, and
    * whole-cents spend; each dimension scored 1–5 by `ntile(5)` WITHIN
    * the customer's market segment (recent/frequent/big = 5), composed
    * into the classic 3-digit RFM code and an action band.
    *
    * Determinism: ntile needs a total order — every window breaks ties
    * by custkey, and both engines share the standard ntile fill rule
    * (first n mod 5 tiles take the extra row). Scale shape: one
    * order-fold, one customer join (both key-partitioned), then three
    * sorts over ONE segment exchange — the quintile sort parallelizes
    * by segment, which is also the honest bound: an UNpartitioned
    * exact ntile is a single-reducer sort at any scale, so global RFM
    * at 100 TB wants [[equiDepthHistogram]]'s value-domain route
    * instead.
    */
  def rfmSegments(orders: DataFrame, customer: DataFrame): DataFrame = {
    val per = orders.groupBy($"o_custkey").agg(
      max($"o_orderdate").as("last_order"),
      count(lit(1)).as("n_orders"),
      sum(($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"))
        .as("sum_cents"))
    val withSeg = per.join(customer.select($"c_custkey", $"c_mktsegment"),
        per("o_custkey") === $"c_custkey")
      .select($"c_custkey".as("custkey"), $"c_mktsegment".as("segment"),
        datediff(lit("2001-12-01").cast("date"), $"last_order")
          .cast("long").as("recency_days"),
        $"n_orders", $"sum_cents")
    val wR = Window.partitionBy($"segment")
      .orderBy($"recency_days".desc, $"custkey")
    val wF = Window.partitionBy($"segment").orderBy($"n_orders".asc, $"custkey")
    val wM = Window.partitionBy($"segment").orderBy($"sum_cents".asc, $"custkey")
    withSeg
      .withColumn("r_score", ntile(5).over(wR).cast("long"))
      .withColumn("f_score", ntile(5).over(wF).cast("long"))
      .withColumn("m_score", ntile(5).over(wM).cast("long"))
      .withColumn("rfm", $"r_score" * 100 + $"f_score" * 10 + $"m_score")
      .withColumn("band",
        when($"r_score" >= 4 && $"f_score" >= 4 && $"m_score" >= 4, "champion")
          .when($"r_score" <= 2 && $"m_score" >= 4, "at_risk")
          .otherwise("regular"))
      .select($"custkey", $"segment", $"recency_days", $"n_orders",
        $"sum_cents", $"r_score", $"f_score", $"m_score", $"rfm", $"band")
      .orderBy($"custkey")
  }

  /** X16: exact equi-depth histogram (the CBO statistic [[analyzeStats]]
    * lacks — selectivity estimation's workhorse) WITHOUT a global row
    * sort: whole-dollar order values fold to a (value → count) table
    * first — bounded by the VALUE DOMAIN, not the row count (the q61
    * weighted-median discipline) — then one window over that bounded
    * relation accumulates counts, and each value row emits the bucket
    * ids whose rank thresholds ⌈b·n/B⌉ it closes (explode over the
    * arithmetic b-range; ceil as `(b·n + B−1) div B`, exact on
    * BIGINTs). Boundary rows report the bucket's inclusive upper value
    * and the exact cumulative row count at that boundary.
    *
    * Scale shape: one value-domain fold + one value-domain window +
    * a ×(buckets-closed) generate — no row ever leaves its aggregate,
    * the single-partition window touches only distinct values (~200k
    * for whole-dollar order totals at ANY row count). The naive form —
    * ntile(B) over all rows — is a single-reducer sort of the table.
    */
  def equiDepthHistogram(orders: DataFrame, buckets: Int = 32): DataFrame = {
    // barriered: the fold feeds both the cumulative window and the
    // totals row — one value-domain relation, computed once (x15's cut)
    val vals = graft.Session.barrier(orders
      .select(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 100")
        .as("x"))
      .groupBy($"x").agg(count(lit(1)).as("cnt")))
    val w = Window.orderBy($"x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = vals.agg(sum($"cnt").as("n"), count(lit(1)).as("n_vals"))
    val bl = buckets.toLong
    // b_lo = smallest b with ceil(b·n/B) > cum−cnt; the least() cap keeps
    // the explode range non-descending (b_lo ≤ B always, since prev < n)
    vals.withColumn("cum", sum($"cnt").over(w))
      .crossJoin(broadcast(tot))
      .withColumn("b_lo", expr(s"($bl * (cum - cnt)) div n + 1"))
      .withColumn("b_hi",
        least(lit(bl), expr(s"($bl * cum) div n + 1")))
      .withColumn("b", explode(sequence($"b_lo", $"b_hi")))
      .where(expr(s"(b * n + ${bl - 1}) div $bl > cum - cnt") &&
        expr(s"(b * n + ${bl - 1}) div $bl <= cum"))
      .select($"b".as("bucket"), $"x".as("hi_value"), $"cum".as("cum_rows"),
        $"n_vals")
      .orderBy($"bucket")
  }

  /** Q78: ABC / Pareto inventory classification — the cumulative-share
    * banding every supply-chain and catalog pipeline runs (class A =
    * the items covering the first 80% of revenue, B to 95%, C the
    * tail): per brand, parts rank by revenue (cents, partkey
    * tiebreak), the running share is exact ppm (`1000000·cum div
    * total`), and the class thresholds bind on the ppm integer —
    * no float share ever exists, so the banding is bit-identical.
    *
    * Scale shape: one partkey fold, one part join, then ONE
    * brand-partitioned window (the q75 sort shape) against a
    * broadcast brand-total table; ppm headroom holds to ~10¹²
    * cents per brand (10 TB of revenue per brand before 2⁶³ risk).
    */
  def abcClassification(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val rev = lineitem.groupBy($"l_partkey")
      .agg(sum(($"l_extendedprice".cast("decimal(18,2)") * 100).cast("long"))
        .as("cents"))
    val wp = rev.join(part.select($"p_partkey", $"p_brand".as("brand")),
        rev("l_partkey") === $"p_partkey")
      .select($"brand", $"p_partkey".as("partkey"), $"cents")
    val w = Window.partitionBy($"brand").orderBy($"cents".desc, $"partkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = wp.groupBy($"brand").agg(sum($"cents").as("tot_cents"))
    wp.withColumn("cum_cents", sum($"cents").over(w))
      .join(broadcast(tot), Seq("brand"))
      .withColumn("cum_ppm", expr("(1000000 * cum_cents) div tot_cents"))
      .withColumn("abc_class",
        when($"cum_ppm" <= 800000, "A").when($"cum_ppm" <= 950000, "B")
          .otherwise("C"))
      .select($"brand", $"partkey", $"cents", $"cum_ppm", $"abc_class")
      .orderBy($"brand", $"partkey")
  }

  /** X17: selectivity-estimator audit — [[equiDepthHistogram]] put to
    * its actual CBO use and GRADED against ground truth in one gate:
    * for each probe cutoff C, the histogram's estimate of
    * |{x ≤ C}| under the textbook uniform-within-bucket interpolation
    * (exact milli-row integer arithmetic — the floor is part of the
    * estimator's definition) sits next to the exact count and the
    * error in ppm of the table. This is the estimator a planner would
    * consult before picking a join side at 100 TB; the gate proves the
    * histogram, the interpolation, and the error accounting agree
    * bit-for-bit across engines.
    *
    * Scale shape: the barriered 32-row histogram crossed with a 5-row
    * probe list (driver-side constants); ground truth is ONE
    * conditional-sum pass over the value fold — never a per-probe
    * rescan.
    */
  def selectivityEstimate(orders: DataFrame,
                          cutoffs: Seq[Long] = Seq(50000L, 150000L, 250000L,
                            350000L, 450000L)): DataFrame = {
    val hist = graft.Session.barrier(equiDepthHistogram(orders))
    val cuts = hist.sparkSession.range(1)
      .select(explode(array(cutoffs.map(lit(_)): _*)).as("cutoff"))
    val est = cuts.crossJoin(broadcast(hist))
      .groupBy($"cutoff").agg(
        coalesce(max(when($"hi_value" <= $"cutoff", $"cum_rows")), lit(0L))
          .as("cum_prev"),
        coalesce(max(when($"hi_value" <= $"cutoff", $"hi_value")), lit(0L))
          .as("hi_prev"),
        min(when($"hi_value" > $"cutoff", $"hi_value")).as("hi_next"),
        min(when($"hi_value" > $"cutoff", $"cum_rows")).as("cum_next"),
        max($"cum_rows").as("n_rows"))
      .withColumn("est_milli", when($"hi_next".isNull, $"n_rows" * 1000)
        .otherwise(expr("1000 * cum_prev + (1000 * (cum_next - cum_prev)" +
          " * (cutoff - hi_prev)) div (hi_next - hi_prev)")))
    val x = expr(
      "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 100")
    val actsWide = orders.select(x.as("x")).agg(
      sum(when($"x" <= cutoffs.head, 1L).otherwise(0L)).as("a0"),
      cutoffs.tail.zipWithIndex.map { case (c, i) =>
        sum(when($"x" <= c, 1L).otherwise(0L)).as(s"a${i + 1}") }: _*)
    val acts = actsWide.selectExpr(s"stack(${cutoffs.size}, " +
      cutoffs.zipWithIndex.map { case (c, i) =>
        s"CAST($c AS BIGINT), a$i" }.mkString(", ") + ") as (cutoff, act_rows)")
    est.join(acts, Seq("cutoff"))
      .withColumn("err_ppm",
        expr("(abs(est_milli div 1000 - act_rows) * 1000000) div n_rows"))
      .select($"cutoff", $"est_milli", $"act_rows", $"n_rows", $"err_ppm")
      .orderBy($"cutoff")
  }

  /** Q79: Benford first-digit audit — the classic fraud/anomaly screen
    * finance and data-quality pipelines run over monetary columns
    * (Nigrini 1996): observed first-significant-digit shares vs the
    * Benford expectation, with the expectation PINNED as exact milli
    * constants (301, 176, …, 46 — log10(1+1/d) pre-rounded once, so no
    * transcendental ever runs in either engine) and the deviation as
    * an exact ppm delta with an over/under/ok verdict at ±100000 ppm
    * (ppm stays under 2⁵³ to n ≈ 9·10¹² rows — the χ² form would
    * square past 2⁶³ at ~10⁶ rows and stays out). A digit spine
    * left-join keeps absent digits as honest zero rows.
    *
    * Scale shape: first digit is a row-local string head; ONE 9-group
    * fold; everything after runs on 9 rows.
    */
  def benfordAudit(orders: DataFrame): DataFrame = {
    val benfordMilli = Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)
    val digit = expr(
      "CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100" +
        " AS BIGINT) div 100 AS STRING), 1, 1) AS BIGINT)")
    val obs = graft.Session.barrier(
      orders.select(digit.as("digit")).groupBy($"digit")
        .agg(count(lit(1)).as("obs")))
    val tot = obs.agg(sum($"obs").as("n"))
    val spine = obs.sparkSession.range(1)
      .select(posexplode(array(benfordMilli.map(lit(_)): _*))
        .as(Seq("pos", "exp_milli")))
      .select(($"pos" + 1).cast("long").as("digit"), $"exp_milli")
    spine.join(obs, Seq("digit"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("obs", coalesce($"obs", lit(0L)))
      .withColumn("obs_ppm", expr("(1000000 * obs) div n"))
      .withColumn("dev_ppm", abs($"obs_ppm" - $"exp_milli" * 1000))
      .withColumn("band",
        when($"obs_ppm" - $"exp_milli" * 1000 > 100000L, "over")
          .when($"obs_ppm" - $"exp_milli" * 1000 < -100000L, "under")
          .otherwise("ok"))
      .select($"digit", $"obs", $"n", $"exp_milli", $"obs_ppm",
        $"dev_ppm", $"band")
      .orderBy($"digit")
  }

  /** X18: Bloom-prefilter join audit — Spark's runtime-filter /
    * bloom-join lever made explicit AND graded: the small side's keys
    * set two multiplicative-hash bits each in an 8192-bit filter (the
    * positions relation broadcasts — it is ≤ 2·|keys| longs), the big
    * side passes only when BOTH its positions are set, and the gate
    * reports what a planner needs to know before trusting the filter:
    * rows in, rows passing the bloom, true matches (exact semi-join),
    * false positives, and the fp rate in ppm of the true negatives.
    * Hashes are pure integer multiply-mod (Knuth 2654435761) —
    * portable, no crypto needed for a join prefilter.
    *
    * Scale shape: ONE pass over the big side with two broadcast
    * position lookups and a broadcast key lookup riding the same scan
    * (left joins to flags, one fold) — never a second scan, never a
    * shuffle of the big side.
    */
  def bloomPrefilterAudit(lineitem: DataFrame, supplier: DataFrame,
                          nation: Long = 3L, bits: Long = 8192L): DataFrame = {
    val keys = graft.Session.barrier(
      supplier.where($"s_nationkey" === nation)
        .select($"s_suppkey".cast("long").as("k")).distinct())
    val pos = graft.Session.barrier(
      keys.select(expr(s"(k * 2654435761) % $bits").as("pos"))
        .unionByName(keys.select(expr(s"(k * 40503 + 17) % $bits").as("pos")))
        .distinct())
    val big = lineitem.select($"l_suppkey".cast("long").as("k"))
      .withColumn("h1", expr(s"(k * 2654435761) % $bits"))
      .withColumn("h2", expr(s"(k * 40503 + 17) % $bits"))
    big
      .join(broadcast(pos.select($"pos".as("h1"), lit(1L).as("b1"))),
        Seq("h1"), "left")
      .join(broadcast(pos.select($"pos".as("h2"), lit(1L).as("b2"))),
        Seq("h2"), "left")
      .join(broadcast(keys.select($"k", lit(1L).as("tr"))), Seq("k"), "left")
      .agg(count(lit(1)).as("n_big"),
        sum(when($"b1" === 1L && $"b2" === 1L, 1L).otherwise(0L)).as("n_pass"),
        sum(coalesce($"tr", lit(0L))).as("n_true"))
      .withColumn("n_false_pos", $"n_pass" - $"n_true")
      .withColumn("fp_ppm",
        expr("(1000000 * n_false_pos) div greatest(n_big - n_true, 1)"))
      .select($"n_big", $"n_pass", $"n_true", $"n_false_pos", $"fp_ppm")
  }

  /** Q80: CUSUM changepoint detection (Page 1954) over the daily order
    * series — the level-shift detector every ops/metrics pipeline runs.
    * Kept EXACT by never dividing: the cumulative deviation from the
    * mean after day i is S_i − i·S_N/N, which scaled by N is the
    * integer `N·S_i − i·S_N`; the changepoint is the day of maximum
    * |scaled CUSUM| (earliest day on ties). Every day row carries its
    * scaled CUSUM — a hash over the whole trajectory, not just the
    * argmax — plus the flag on the winner.
    *
    * Scale shape: ONE day-keyed fold (the value domain is the
    * calendar — ~2.5k rows at any SF), then windows over that bounded
    * relation; headroom: |N·S_i| < 2⁶³ to ~3·10⁹ orders/day-scale.
    */
  def cusumChangepoint(orders: DataFrame): DataFrame = {
    val daily = graft.Session.barrier(orders
      .select(date_trunc("day", $"o_orderdate").cast("timestamp_ntz").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("c")))
    val wOrd = Window.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withTot = daily
      .withColumn("i", count(lit(1)).over(wOrd))
      .withColumn("s_i", sum($"c").over(wOrd))
      .crossJoin(broadcast(daily.agg(count(lit(1)).as("n_days"),
        sum($"c").as("s_n"))))
      .withColumn("cusum_scaled", $"n_days" * $"s_i" - $"i" * $"s_n")
    val wAbs = Window.orderBy(abs($"cusum_scaled").desc, $"day".asc)
    withTot
      .withColumn("rk", row_number().over(wAbs))
      .select($"day", $"c".as("n_orders"), $"cusum_scaled",
        ($"rk" === 1).as("is_changepoint"))
      .orderBy($"day")
  }

  /** Q81: Wald–Wolfowitz runs test over the daily order deltas — the
    * randomness screen auditors run after [[benfordAudit]]: too FEW
    * sign runs means level-clustering (a regime the CUSUM should have
    * flagged), too MANY means oscillation (alternating corrections, a
    * classic smoothing-fraud tell). Exact: sign(Δ) with the zero-delta
    * convention pinned to +1, runs = 1 + sign changes, and the
    * expectation E[runs] = (2·n⁺·n⁻ + n)/n compared CROSS-MULTIPLIED —
    * `runs·n` vs `2·n⁺·n⁻ + n` with a ±20% band (`tol = e_num div 5`),
    * so no σ, no sqrt, no float ever materializes.
    *
    * Scale shape: ONE day fold (calendar-bounded), one lag window over
    * it, one summary row.
    */
  def runsTest(orders: DataFrame): DataFrame = {
    val daily = graft.Session.barrier(orders
      .select(date_trunc("day", $"o_orderdate").cast("timestamp_ntz").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("c")))
    val w = Window.orderBy($"day")
    val signs = daily
      .withColumn("prev", lag($"c", 1).over(w))
      .where($"prev".isNotNull)
      .withColumn("sgn", when($"c" >= $"prev", 1L).otherwise(-1L))
      .withColumn("prev_sgn", lag($"sgn", 1).over(w))
    signs.agg(
        count(lit(1)).as("n"),
        sum(when($"sgn" === 1L, 1L).otherwise(0L)).as("n_pos"),
        sum(when($"sgn" === -1L, 1L).otherwise(0L)).as("n_neg"),
        (sum(when($"prev_sgn".isNotNull && $"sgn" =!= $"prev_sgn", 1L)
          .otherwise(0L)) + 1L).as("runs"))
      .withColumn("e_num", lit(2L) * $"n_pos" * $"n_neg" + $"n")
      .withColumn("runs_scaled", $"runs" * $"n")
      .withColumn("band",
        when($"runs_scaled" < $"e_num" - expr("e_num div 5"), "clustered")
          .when($"runs_scaled" > $"e_num" + expr("e_num div 5"), "oscillating")
          .otherwise("random"))
      .select($"n", $"n_pos", $"n_neg", $"runs", $"e_num", $"runs_scaled",
        $"band")
  }

  /** X19: layout-pruning audit — the "why Z-ORDER exists" measurement,
    * run as a gate: the same rows assigned to 16 files under a LINEAR
    * layout (cluster by dim1 only) and under a Z-ORDER layout (4+4-bit
    * interleave of both dims, top nibble = file ⇒ files are 4×4 tiles
    * of the key plane), zone maps (per-file min/max of both dims) built
    * from the actual rows, and a 2-D box predicate
    * (d1 ∈ [4,7] ∧ d2 ∈ [8,11]) pruned against them. The report is
    * what a table-format planner needs: files pruned, rows scanned,
    * rows matched, and the scan amplification in ppm — linear scans
    * ~4× the matching rows, Z-order ~1× (the 100 TB argument for
    * r10/x11's Z-order machinery, now measured exactly).
    *
    * Scale shape: ONE row pass assigning both layouts (the layout
    * relation explodes ×2), a ≤32-row file-stats fold, pruning and
    * the summary on that metadata relation.
    */
  def layoutPruningAudit(orders: DataFrame): DataFrame = {
    val dims = orders.select(
      ($"o_custkey" % 16).cast("long").as("d1"),
      ($"o_orderkey" % 16).cast("long").as("d2"))
    val assigned = dims.select($"d1", $"d2", explode(array(
        struct(lit("linear").as("layout"), $"d1".as("file")),
        struct(lit("zorder").as("layout"),
          (expr("((d1 div 8) % 2) * 8 + ((d2 div 8) % 2) * 4" +
            " + ((d1 div 4) % 2) * 2 + (d2 div 4) % 2")).as("file"))))
        .as("a"))
      .select($"d1", $"d2", $"a.layout".as("layout"), $"a.file".as("file"))
    val stats = graft.Session.barrier(assigned
      .groupBy($"layout", $"file")
      .agg(count(lit(1)).as("rows"),
        min($"d1").as("min1"), max($"d1").as("max1"),
        min($"d2").as("min2"), max($"d2").as("max2"),
        sum(when($"d1".between(4, 7) && $"d2".between(8, 11), 1L)
          .otherwise(0L)).as("matched")))
    stats
      .withColumn("pruned",
        $"max1" < 4 || $"min1" > 7 || $"max2" < 8 || $"min2" > 11)
      .groupBy($"layout")
      .agg(count(lit(1)).as("n_files"),
        sum(when($"pruned", 1L).otherwise(0L)).as("n_pruned"),
        sum(when(!$"pruned", $"rows").otherwise(0L)).as("rows_scanned"),
        sum($"matched").as("rows_matched"))
      .withColumn("amp_ppm",
        expr("(1000000 * rows_scanned) div greatest(rows_matched, 1)"))
      .orderBy($"layout")
  }

  /** Q82: Shewhart individuals control chart (SPC) over the daily order
    * series — the third audit next to [[cusumChangepoint]] (level
    * shifts) and [[runsTest]] (sign randomness): center line = mean
    * count, control limits = CL ± 2.66·(mean moving range), the d2
    * constant PINNED in milli (2660) so no float ever runs. All
    * divisions are floor-div of nonnegative integers (identical in
    * both engines); per-day comparisons cross-multiply the count
    * against the milli limits. Every day row carries its flag — the
    * chart, not just the alarms.
    *
    * Scale shape: ONE calendar-bounded day fold (barriered — it feeds
    * the MR window AND the summary), a lag window, a 1-row broadcast
    * of the limits.
    */
  def spcLimits(orders: DataFrame): DataFrame = {
    val daily = graft.Session.barrier(orders
      .select(date_trunc("day", $"o_orderdate").cast("timestamp_ntz").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("c")))
    val w = Window.orderBy($"day")
    val mr = daily.withColumn("prev", lag($"c", 1).over(w))
      .withColumn("mr", abs($"c" - $"prev"))
    val summary = mr.agg(
        count(lit(1)).as("n"), sum($"c").as("s"),
        sum($"mr").as("s_mr"), count($"mr").as("n_mr"))
      .withColumn("cl_milli", expr("(1000 * s) div n"))
      .withColumn("mrbar_milli", expr("(1000 * s_mr) div greatest(n_mr, 1)"))
      .withColumn("ucl_milli",
        expr("cl_milli + (2660 * mrbar_milli) div 1000"))
      .withColumn("lcl_milli",
        greatest(lit(0L), expr("cl_milli - (2660 * mrbar_milli) div 1000")))
      .select($"cl_milli", $"ucl_milli", $"lcl_milli")
    daily.crossJoin(broadcast(summary))
      .withColumn("ooc",
        $"c" * 1000 > $"ucl_milli" || $"c" * 1000 < $"lcl_milli")
      .select($"day", $"c".as("n_orders"), $"cl_milli", $"ucl_milli",
        $"lcl_milli", $"ooc")
      .orderBy($"day")
  }

  /** Q83: seasonal-naive forecast backtest — the baseline every
    * forecasting system is judged against (forecast(month) = actual of
    * the same month last year), run as an audit over the order series:
    * per backtestable month the actual, the forecast, the absolute
    * error, and the APE in ppm — all exact integers on an integer
    * month key (`year·12 + month`), so the 12-month join is an
    * equi-join with no calendar arithmetic ambiguity.
    *
    * Scale shape: ONE calendar-bounded month fold (barriered — both
    * join sides), one self-equi-join on the shifted key.
    */
  def seasonalNaiveBacktest(orders: DataFrame): DataFrame = {
    val monthly = graft.Session.barrier(orders
      .select((year($"o_orderdate") * 12 + month($"o_orderdate"))
        .cast("long").as("mk"))
      .groupBy($"mk").agg(count(lit(1)).as("c")))
    monthly.as("cur")
      .join(monthly.as("prev"), col("cur.mk") === col("prev.mk") + 12)
      .select(col("cur.mk").as("month_key"), col("cur.c").as("actual"),
        col("prev.c").as("forecast"))
      .withColumn("abs_err", abs($"actual" - $"forecast"))
      .withColumn("ape_ppm", expr("(1000000 * abs_err) div greatest(actual, 1)"))
      .orderBy($"month_key")
  }

  /** Q84: growth accounting (the Social Capital framework) over the
    * weekly active-user sets — the decomposition every product
    * dashboard runs: active(w) = new + retained + resurrected, with
    * churn assigned to the week the user went missing. Weeks are the
    * epoch-Monday day count div 7 (an INTEGER key — ISO-week string
    * semantics differ across engines and stay out). The cover is exact
    * and disjoint by construction (first = w excludes prev-active;
    * retained means prev-active; resurrected is the remainder), which
    * the spec pins as a law.
    *
    * Scale shape: one distinct (user, week) fold (barriered — feeds
    * three consumers), a first-week fold, two key-shifted equi-joins;
    * every relation is user×week bounded.
    */
  def growthAccounting(events: DataFrame): DataFrame = {
    val a = graft.Session.barrier(events.select($"user_id",
      expr("datediff(CAST(ts AS DATE), DATE'1970-01-05') div 7")
        .cast("long").as("wk")).distinct())
    val firsts = a.groupBy($"user_id").agg(min($"wk").as("first_wk"))
    val prev = a.select($"user_id", ($"wk" + 1).as("wk"), lit(1L).as("was_prev"))
    val cur = a.join(prev, Seq("user_id", "wk"), "left")
      .join(firsts, Seq("user_id"))
      .groupBy($"wk").agg(
        count(lit(1)).as("active"),
        sum(when($"first_wk" === $"wk", 1L).otherwise(0L)).as("new_users"),
        sum(when($"was_prev" === 1L, 1L).otherwise(0L)).as("retained"),
        sum(when($"was_prev".isNull && $"first_wk" < $"wk", 1L).otherwise(0L))
          .as("resurrected"))
    val churn = a.select($"user_id", ($"wk" + 1).as("wk"))
      .join(a, Seq("user_id", "wk"), "left_anti")
      .groupBy($"wk").agg(count(lit(1)).as("churned"))
    cur.join(churn, Seq("wk"), "left")
      .withColumn("churned", coalesce($"churned", lit(0L)))
      .select($"wk", $"active", $"new_users", $"retained", $"resurrected",
        $"churned")
      .orderBy($"wk")
  }

  /** Q85: ABC class MIGRATION — [[abcClassification]] run on two
    * periods and cross-tabulated (the inventory-drift matrix supply
    * chains watch: A→C demotions are dying products, C→A promotions
    * are breakouts, N rows are entries/exits). The split is a pinned
    * timestamp boundary; parts absent from a period class as 'N'.
    * One classification kernel, both halves — the matrix cannot
    * disagree with q78's banding.
    *
    * Scale shape: two q78 pipelines (each one fold + one window) and
    * a partkey full-outer join folded to the ≤16-cell matrix.
    */
  def abcMigration(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val h1 = abcClassification(
        lineitem.where(expr("l_shipdate < TIMESTAMP'1999-01-01 00:00:00'")),
        part)
      .select($"partkey", $"abc_class".as("class_h1"))
    val h2 = abcClassification(
        lineitem.where(expr("l_shipdate >= TIMESTAMP'1999-01-01 00:00:00'")),
        part)
      .select($"partkey", $"abc_class".as("class_h2"))
    h1.join(h2, Seq("partkey"), "full_outer")
      .select(coalesce($"class_h1", lit("N")).as("class_h1"),
        coalesce($"class_h2", lit("N")).as("class_h2"))
      .groupBy($"class_h1", $"class_h2")
      .agg(count(lit(1)).as("n_parts"))
      .orderBy($"class_h1", $"class_h2")
  }

  /** X15: MERGEABLE column statistics — the maintenance half of
    * [[analyzeStats]]. At 100 TB nobody re-ANALYZEs the table; each
    * partition (here: `source`) keeps a summary and the table-level row
    * derives from the SUMMARIES alone. rows/nulls/total_len merge by
    * sum, bounds by min/max; exact NDV is the one super-constant piece,
    * carried as the partition's distinct-value SET (the two-level
    * distinct-aggregate state made explicit) and merged by set union —
    * bounded here by the column's vocabulary, the honest cost of
    * exactness (swap for an HLL register when approximate is enough;
    * same merge shape).
    *
    * The per-partition relation barriers (it IS the stored stats
    * table); the `__all__` roll-up hangs off that cut, so the final
    * plan contains ZERO input scans — equality with the oracle's
    * full-scan recompute is the proof the merge laws are right.
    */
  def incrementalStats(documents: DataFrame): DataFrame = {
    val per = graft.Session.barrier(
      documents.groupBy($"source").agg(
        count(lit(1)).as("n_rows"),
        sum(when($"lang".isNull, 1L).otherwise(0L)).as("n_nulls"),
        min($"lang").as("min_lang"), max($"lang").as("max_lang"),
        sum(length($"text")).cast("long").as("total_len"),
        sort_array(collect_set($"lang")).as("langs")))
    val perOut = per.select($"source", $"n_rows", $"n_nulls",
      $"min_lang", $"max_lang", $"total_len",
      size($"langs").cast("long").as("ndv_lang"))
    val allOut = per.agg(
        sum($"n_rows").as("n_rows"), sum($"n_nulls").as("n_nulls"),
        min($"min_lang").as("min_lang"), max($"max_lang").as("max_lang"),
        sum($"total_len").as("total_len"),
        size(array_distinct(flatten(collect_list($"langs"))))
          .cast("long").as("ndv_lang"))
      .select(lit("__all__").as("source"), $"n_rows", $"n_nulls",
        $"min_lang", $"max_lang", $"total_len", $"ndv_lang")
    perOut.unionByName(allOut).orderBy($"source")
  }
}
