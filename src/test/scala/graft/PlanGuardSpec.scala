package graft

import org.apache.spark.sql.execution.ExplainMode

/** Mechanical regression guard for the plan properties SCALE.md/PLANS.md
  * argue from. Each assertion is a property that held when the operator
  * was tuned — a silent Catalyst/code change that reintroduces a scan,
  * a shuffle, or a theta join fails here, not at 100 TB.
  */
class PlanGuardSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q14_rollup: dims broadcast, no sort-merge join, fact scanned once") {
    val p = planOf("q14_rollup")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    // one fact pass: exactly one lineitem scan node (one Location line)
    p.linesIterator.count(_.contains("lineitem.parquet")) shouldBe 1
  }

  test("q04_range_filter: predicates reach the parquet scan") {
    val p = planOf("q04_range_filter")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    // the detail line must EXIST (a Spark change dropping it would make a
    // contains-nothing assertion pass vacuously) and must not be empty
    pushed should not be empty
    pushed.mkString should not include "PushedFilters: []"
  }

  test("s06_knn_join: top-k cut happens before the shuffle (WindowGroupLimit Partial)") {
    val p = planOf("s06_knn_join")
    p should include("WindowGroupLimit")
    p should include("Partial")
  }

  test("t15_domain_cap: the per-source cap trims map-side (WindowGroupLimit Partial)") {
    // a mega-domain must cost O(cap) rows per input partition at the
    // exchange, not its full document count
    val p = planOf("t15_domain_cap")
    p should include("WindowGroupLimit")
    p should include("Partial")
  }

  test("q25/q26: no cartesian or nested-loop join anywhere in the time joins") {
    Seq("q25_asof_join", "q26_range_join").foreach { q =>
      val p = planOf(q)
      p should not include "CartesianProduct"
      p should not include "BroadcastNestedLoopJoin"
    }
  }

  // formatted mode prints each exchange's partitioning on its own
  // "Arguments: hashpartitioning(...)" line — count those, not the node
  // names (an "Exchange hashpartitioning" substring never occurs here)
  private def hashExchanges(plan: String): Int =
    plan.linesIterator.count(_.trim.startsWith("Arguments: hashpartitioning"))

  test("t10_quality_filter: no hash-partition exchange (row-local rules)") {
    val p = planOf("t10_quality_filter")
    p should include("Scan parquet") // sanity: a real plan was rendered
    hashExchanges(p) shouldBe 0
  }

  test("t08_decontaminate: the benchmark gram set broadcasts") {
    planOf("t08_decontaminate") should include("BroadcastExchange")
  }

  test("s02_cosine_topk: global top-k is TakeOrdered, not a full sort") {
    planOf("s02_cosine_topk") should include("TakeOrderedAndProject")
  }

  test("d10_dup_spans: cross-doc test costs one hash exchange, not countDistinct's two") {
    val p = planOf("d10_dup_spans")
    // exactly two hash exchanges: the gram aggregate and the per-doc
    // window — a countDistinct regression would add a third (partial
    // dedup on (g, doc_id) before the re-aggregate on g)
    hashExchanges(p) shouldBe 2
  }

  test("t12_dsir_importance: both frequency tables broadcast; corpus never self-joins") {
    val p = planOf("t12_dsir_importance")
    // count node detail headers "(N) BroadcastExchange", not raw substring
    // hits — formatted explain prints every node twice (tree line +
    // detail header), so a substring count of 2 is satisfied by ONE node
    p.linesIterator.count(_.trim.matches("""\(\d+\) BroadcastExchange""")) should be >= 2
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
  }

  test("s07_keyword_search: df broadcasts, top-k is TakeOrdered, corpus scans once") {
    val p = planOf("s07_keyword_search")
    p should include("TakeOrderedAndProject")
    p should include("BroadcastExchange")
    p should not include "SortMergeJoin"
    // the scale property lives in the RUNTIME plan: the df branch must
    // reuse the tf posting shuffle, not re-scan the corpus (Catalyst
    // pruning the child aggregate to a distinct breaks canonical equality
    // and silently doubles the 100 TB scan — the regression this pins)
    val df = SparkEntry.queries("s07_keyword_search")(spark, sf0001)
    df.collect()
    // AdaptiveSparkPlan.toString prints Final Plan then Initial Plan —
    // only the final (actually executed) section matters here
    val executed = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    executed should include("ReusedExchange")
    executed.linesIterator.count(_.contains("FileScan")) shouldBe 1
  }

  test("t22_lm_score: model tables broadcast; ctx rollup reuses the pair shuffle at runtime") {
    val p = planOf("t22_lm_score")
    // pair-frequency + context-frequency + per-doc join-back: ≥ 3
    // broadcasts, and scoring never sort-merge-joins the corpus
    p.linesIterator.count(_.trim.matches("""\(\d+\) BroadcastExchange""")) should be >= 3
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
    // the static plan prints the (b_ctx, b_pair) aggregate twice (pairFreq
    // and ctxFreq's child); the two subtrees are canonically equal, so the
    // executed plan must collapse them — the corpus is scanned for the
    // model ONCE (plus the scoring pass and the ≤2-column doc_id spine)
    val df = SparkEntry.queries("t22_lm_score")(spark, sf0001)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    executed should include("ReusedExchange")
  }

  test("s09_int8_topk: quantized search is broadcast + TakeOrdered, no shuffle join") {
    val p = planOf("s09_int8_topk")
    p should include("TakeOrderedAndProject")
    p should include("BroadcastExchange")
    p should not include "SortMergeJoin"
  }

  test("d14_incremental_minhash: band equi-join only — no cartesian, no nested loop") {
    val p = planOf("d14_incremental_minhash")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("r11_regrid: one hash aggregate with map-side partial combine, no join") {
    val p = planOf("r11_regrid")
    p should not include "Join"
    // partial + final pair of the coarse-cell aggregate (plus the grid
    // build's own): map-side combine collapses blocks before the exchange
    p.linesIterator.count(_.trim.matches("""\(\d+\) HashAggregate""")) should be >= 2
  }

  test("t05/t14: running sums ride pid-partitioned windows, never a global window") {
    // the distributed-prefix-sum claim mechanized: every window spec in
    // both plans is partitioned by the range-partition id — a regression
    // to an unpartitioned window (one task swallowing the corpus) fails
    // here, not at 100 TB
    Seq("t05_token_shards", "t14_dsir_select").foreach { q =>
      val p = planOf(q)
      val winArgs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
      winArgs should not be empty
      all(winArgs) should include("windowspecdefinition(pid#")
    }
  }

  test("s08_lsh_adaptive: bucket equi-join, no cartesian, nbits a plan literal") {
    val p = planOf("s08_lsh_adaptive")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    // 500-vector fixture → adaptiveNbits = 5 rides in as the literal
    p should include("5 AS nbits")
  }

  test("t17_upsert: the CHANGES side collapses map-side; the snapshot is never windowed") {
    val p = planOf("t17_upsert")
    // collapseChanges' rn<=1 must compile to a WindowGroupLimit pair so a
    // hot key's queued changes are trimmed per map partition pre-exchange
    p should include("WindowGroupLimit")
    p should include("Partial")
    // exactly one window family (over changes) — a regression to the naive
    // union+window-over-everything shape would window the snapshot too
    p.linesIterator.count(_.trim.matches("""\(\d+\) Window""")) shouldBe 1
    p should not include "CartesianProduct"
  }

  test("d12_incremental_bloom: only the might-contain sliver joins history") {
    val p = planOf("d12_incremental_bloom")
    // one join (the maybe-branch left join); the fresh branch must reach
    // the union without any join operator
    val joins = p.linesIterator.count(l =>
      l.trim.matches("""\(\d+\) (SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin).*"""))
    joins shouldBe 1
    p should include("Union")
    // the windowed batch is barriered before the branch split, so the
    // union branches scan the materialized result instead of each
    // re-planning (and re-shuffling) the window subtree: at most one
    // hash exchange total (the history-index join side; the in-batch
    // window's exchange happened before the barrier, outside this plan)
    hashExchanges(p) should be <= 1
    p.linesIterator.count(_.contains("ExistingRDD")) should be >= 1
  }

  test("t23/t25: packing and bucketing prefix sums ride pid-partitioned windows") {
    // same property as t05/t14 — no single task ever swallows the corpus
    Seq("t23_pack_sequences", "t25_ppl_buckets").foreach { q =>
      val p = planOf(q)
      val winArgs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
      winArgs should not be empty
      all(winArgs) should include("windowspecdefinition(pid#")
    }
  }

  test("t24_temperature_mix: one corpus pass; windows only over the domain aggregate") {
    val p = planOf("t24_temperature_mix")
    // a single documents scan feeds the per-domain rollup
    p.linesIterator.count(_.contains("documents.parquet")) shouldBe 1
    // exactly one hash exchange (the groupBy source) — the unpartitioned
    // max window is fine because its input is the domains-sized aggregate,
    // which sits BELOW it in the plan
    hashExchanges(p) shouldBe 1
    p should include("HashAggregate")
  }

  test("s10_lsh_rerank: 1-row broadcast probe + TakeOrdered — no shuffle anywhere") {
    val p = planOf("s10_lsh_rerank")
    // the Hamming predicate joins against a broadcast single row: a
    // nested-loop there is a filter, not an explosion (unlike q25/q26
    // where BNLJ would be a real blowup)
    p should include("BroadcastNestedLoopJoin")
    p should include("TakeOrderedAndProject")
    hashExchanges(p) shouldBe 0
    // the query row never re-enters the corpus side: its exclusion is
    // pushed into the parquet scan
    p should include("Not(EqualTo(vec_id,0))")
  }

  test("q37_funnel: one shuffle, chained windows, never a k-way self-join") {
    val p = planOf("q37_funnel")
    // the sequential step dependency must ride ONE user_id exchange
    // through three Window passes — the naive formulation self-joins the
    // event table once per step
    hashExchanges(p) shouldBe 1
    p.linesIterator.count(_.trim.matches("""\(\d+\) Window""")) shouldBe 3
    p should not include "Join"
    // the per-user collapse reuses the window partitioning (no exchange
    // between the windows and the aggregate): both aggregate modes are
    // present with nothing shuffled in between
    p should include("HashAggregate")
  }

  test("q38_retention: window cohorts — events scanned once, shuffled once, no join") {
    val p = planOf("q38_retention")
    // the aggregate+join formulation would scan and shuffle the fact
    // table twice (its two exchanges cannot collapse: one ships
    // partial-min states, the other rows); the window formulation must
    // read it once with no join operator anywhere
    p should not include "Join"
    p.linesIterator.count(_.contains("events.parquet")) shouldBe 1
    // user_id window + final rollup: exactly 2 hash exchanges — the
    // distinct's clustering keys include user_id, so it runs on the
    // window's partitioning without an exchange of its own
    hashExchanges(p) shouldBe 2
    p.linesIterator.count(_.trim.matches("""\(\d+\) Window""")) shouldBe 1
  }

  test("q39_transitions: lead + agg + metadata-sized top-k — events scanned once, no join") {
    val p = planOf("q39_transitions")
    // the successor relation comes from ONE user_id window over one event
    // scan; the per-source rank runs over the |types|²-bounded aggregate,
    // never back over events — and nothing joins
    p should not include "Join"
    p.linesIterator.count(_.contains("events.parquet")) shouldBe 1
    // exchanges: user_id window, (event_type, next_event) aggregate,
    // event_type rank window — exactly 3
    hashExchanges(p) shouldBe 3
    p.linesIterator.count(_.trim.matches("""\(\d+\) Window""")) shouldBe 2
    // the transition aggregate combines map-side before its shuffle
    p should include("HashAggregate")
  }

  test("q40_rolling_range: one shuffle, one RANGE-frame window, no join") {
    val p = planOf("q40_rolling_range")
    p should not include "Join"
    p.linesIterator.count(_.contains("events.parquet")) shouldBe 1
    hashExchanges(p) shouldBe 1
    p.linesIterator.count(_.trim.matches("""\(\d+\) Window""")) shouldBe 1
  }

  test("e01_fuzzy_pairs: deletion-neighborhood blocking equi-joins — no cartesian, no BNLJ") {
    // the naive levenshtein theta join can only run as a cartesian
    // product; the SymSpell blocking must turn it into a hash-key
    // equi-join with the exact check applied AFTER the join
    val p = planOf("e01_fuzzy_pairs")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin")) shouldBe true
  }

  test("q41_rollup: one fact scan through Expand into one combined aggregate") {
    val p = planOf("q41_rollup")
    p should include("Expand")
    p.linesIterator.count(_.contains("lineitem.parquet")) shouldBe 1
    // one grouping-key shuffle; the d+1-pass union formulation would
    // show d+1 scans and multiple exchanges
    hashExchanges(p) shouldBe 1
    p should not include "Union"
  }

  test("q42_pivot: explicit value list compiles to ONE scan + one day-key shuffle") {
    val p = planOf("q42_pivot")
    p.linesIterator.count(_.contains("events.parquet")) shouldBe 1
    hashExchanges(p) shouldBe 1
    p should not include "Join"
  }

  test("q43_percentiles: exact percentile aggregates in one pass, one exchange") {
    val p = planOf("q43_percentiles")
    p.linesIterator.count(_.contains("events.parquet")) shouldBe 1
    hashExchanges(p) shouldBe 1
    // partial_percentile before the exchange: per-group state combines
    // map-side instead of shipping raw rows
    p.toLowerCase should include("partial_percentile")
  }

  test("q44_unpivot: melt adds an Expand, not a join or a second shuffle") {
    val p = planOf("q44_unpivot")
    p should include("Expand")
    p should not include "Join"
    p.linesIterator.count(_.contains("events.parquet")) shouldBe 1
    hashExchanges(p) shouldBe 1 // the pivot's day-key shuffle, nothing more
  }

  test("q45_rolling_dau: one scan, bounded explode, no join at all") {
    val p = planOf("q45_rolling_dau")
    p should include("Generate") // the 7-day explode
    p should not include "Join"
    p.linesIterator.count(_.contains("events.parquet")) shouldBe 1
  }

  test("q46_forward_fill: one shuffle, one window, no join") {
    val p = planOf("q46_forward_fill")
    p should not include "Join"
    hashExchanges(p) shouldBe 1
    p.linesIterator.count(_.trim.matches("""\(\d+\) Window""")) shouldBe 1
  }

  test("x03_bucketed_join: co-bucketed layout joins with zero input exchanges") {
    // with broadcast off, the SortMergeJoin must consume both bucketed
    // tables directly — the only hash exchange left is the rollup on
    // o_orderpriority (not a bucket key). A regression that drops the
    // bucket spec re-shuffles 2 more times and fails here.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = planOf("x03_bucketed_join")
      p should include("SortMergeJoin")
      p.linesIterator.count(_.contains("Bucketed: true")) shouldBe 2
      p should include("SelectedBucketsCount: 8 out of 8")
      hashExchanges(p) shouldBe 1
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q48_linreg: moment sums partial-aggregate into ONE exchange; normal equations join-free") {
    val p = planOf("q48_linreg")
    p should not include "Join"
    hashExchanges(p) shouldBe 1
    p.linesIterator.count(_.contains("lineitem.parquet")) shouldBe 1
  }

  test("q49_top_orders: dim broadcast, top-10 via TakeOrderedAndProject (no global sort)") {
    val p = planOf("q49_top_orders")
    p should include("BroadcastHashJoin")
    p should include("TakeOrderedAndProject")
    p should not include "CartesianProduct"
    // filters reach all three parquet scans
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    pushed should not be empty
    pushed.mkString should not include "PushedFilters: []"
  }

  test("q50_streaks: two exchanges over collapsed pairs; island + user rollups reuse the window shuffle") {
    val p = planOf("q50_streaks")
    // distinct shuffle on (user_id, day) + window shuffle on user_id — and
    // NOTHING more: the (user_id, anchor) and user_id aggregates must ride
    // the window's hashpartitioning(user_id) (subset-satisfies-Clustered)
    hashExchanges(p) shouldBe 2
    p should not include "Join"
  }

  test("q51_histogram: 1-row extent broadcasts back; binning carries no shuffle beyond the aggregate") {
    val p = planOf("q51_histogram")
    p should include("BroadcastExchange")
    // the bin aggregate's exchange is the only hash partitioning
    hashExchanges(p) shouldBe 1
    p should not include "SortMergeJoin"
  }

  test("e04_er_entities: blocking equi-joins only — no cartesian, no BNLJ") {
    val p = planOf("e04_er_entities")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("x04_dpp_join: the filtered month dim prunes fact partitions at runtime") {
    val p = planOf("x04_dpp_join")
    // the fact scan must carry a dynamic pruning partition filter fed by
    // the dim side — the whole point of the partitioned layout
    p.toLowerCase should include("dynamicpruning")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }

  test("r13_gradient: two axis-window exchanges, no join, one fact scan") {
    val p = planOf("r13_gradient")
    // distinct-grid aggregate + two window repartitions... the claim in
    // Raster.gradient is two exchanges FOR THE WINDOWS; the grid twin
    // derivation adds its own aggregate exchange. Pin the full shape.
    p should not include "Join"
    p.linesIterator.count(_.contains("lineitem.parquet")) shouldBe 1
  }

  test("q54_grouping_sets: one scan through Expand into one combined aggregate") {
    val p = planOf("q54_grouping_sets")
    p should include("Expand")
    p.linesIterator.count(_.contains("orders.parquet")) shouldBe 1
    p should not include "Union"
  }

  test("q59_mad_outliers: medians/MADs broadcast back; no sort-merge join over the histogram") {
    val p = planOf("q59_mad_outliers")
    // both order-statistic joins are broadcast of metadata-sized med/mad
    // relations onto the histogram — a sort-merge join here would mean a
    // corpus-keyed shuffle the histogram collapse exists to avoid
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("t36_vocab_profile: histogram collapses with map-side partial aggregation") {
    val p = planOf("t36_vocab_profile")
    // explode feeds a partial_count before any exchange: the (source,
    // token) histogram combines map-side, so the shuffle carries at most
    // |vocab|x|sources| rows per partition, not the token stream
    p should include("partial_count")
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
  }

  test("q61_weighted_median: histogram before any window, one window exchange, no join") {
    val p = planOf("q61_weighted_median")
    p should not include "Join"
    // the (g, v) histogram collapses with map-side combine BEFORE the
    // window sort — a raw-row window would drop the partial aggregate
    p should include("partial_count")
    // cumw + totw + the final pick all reuse ONE keyed exchange; only
    // the histogram shuffle and the output sort may add more
    p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange""")) should be <= 3
  }

  test("s11_kmeans: centroids broadcast (k-row relation), rank=1 as a group limit, no SMJ") {
    val p = planOf("s11_kmeans")
    p should include("BroadcastNestedLoopJoin")
    p should include("WindowGroupLimit")
    p should not include "SortMergeJoin"
  }

  test("g06_node_similarity: no cartesian or BNLJ anywhere in the wedge pipeline") {
    val p = planOf("g06_node_similarity")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    // the barriered edge list is an RDD scan — the fact table is NOT
    // re-scanned for adjacency/degree derivations
    p should not include "Scan parquet"
  }

  test("s13_filtered_topk: per-label top-k trims map-side before the exchange") {
    val p = planOf("s13_filtered_topk")
    p should include("WindowGroupLimit")
    p should include("Partial")
    p should not include "SortMergeJoin"
  }

  test("t44_tfidf_keywords: tf histogram materializes once, top-k trims map-side") {
    val p = planOf("t44_tfidf_keywords")
    p should include("WindowGroupLimit")
    // df re-collapses from the barriered tf histogram: the corpus parquet
    // is not in the plan at all (checkpoint scans only)
    p should not include "documents.parquet"
  }

  test("g08_label_prop: rounds join the barriered symmetric edges, label rows only") {
    val p = planOf("g08_label_prop")
    p should not include "CartesianProduct"
    // the lineitem fact feeds the one-off edge derivation barrier, never
    // the unrolled rounds — the round plan reads checkpoints only
    p should not include "lineitem.parquet"
  }

  test("e05_phonetic_pairs: bucket join is an equi-join, never a cartesian") {
    val p = planOf("e05_phonetic_pairs")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("r22_grib2_count: the COUNT(*) reaches the format (header-only scan)") {
    val p = planOf("r22_grib2_count")
    p should include("PushedAggregation: [COUNT(*)]")
    p should include("PushedFilters: [In(variable")
  }

  test("g09_ppr: rounds read the barriered routed edges and seed set, never the fact table") {
    val p = planOf("g09_ppr")
    p should not include "lineitem.parquet"
    p should not include "CartesianProduct"
  }

  test("t45_novelty: gram stream materializes once; both legs read the checkpoint") {
    val p = planOf("t45_novelty")
    p should not include "documents.parquet"
    p should not include "CartesianProduct"
  }

  test("r21_vector_speed: component pairing is ONE scan (conditional pivot, no self-join)") {
    val p = planOf("r21_vector_speed")
    p.linesIterator.count(_.contains("lineitem.parquet")) shouldBe 1
    p should not include "Join"
  }

  test("r17_remap_bilinear: the corner lattice broadcasts; the grid joins as a hash join") {
    val p = planOf("r17_remap_bilinear")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
    // the lattice is generated from Ranges — no data-side scan feeds it
    p.linesIterator.count(_.contains("lineitem.parquet")) shouldBe 1
  }

  test("d18_cjk_neardup: the CJK mapping materializes ONCE (checkpoint scan), pairing is an equi-join") {
    val p = planOf("d18_cjk_neardup")
    // both corpus references must read the barrier, not recompute the
    // per-word PolyHash chain (the O(n^2)-per-doc regression of r8)
    p should include("Scan ExistingRDD")
    p should not include "Scan parquet"
    p should not include "CartesianProduct"
  }

  test("x08_skew_report: histogram materializes once; totals broadcast back over it") {
    val p = planOf("x08_skew_report")
    // the barrier ran the single fact scan eagerly — the final plan
    // reads the checkpointed histogram, never the fact table again
    p should include("Scan ExistingRDD")
    p should not include "Scan parquet"
    p should include("BroadcastNestedLoopJoin")
    p should not include "SortMergeJoin"
  }

  test("r18_mosaic: union + one aggregate — no join operator anywhere") {
    val p = planOf("r18_mosaic")
    p should include("Union")
    p should not include "Join"
  }

  test("r29_remap_conservative: axis tables broadcast; the grid scans once, no theta join") {
    val p = planOf("r29_remap_conservative")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p.linesIterator.count(_.contains("lineitem.parquet")) shouldBe 1
  }

  test("t47_html_extract: row-local extraction — no exchange before the sort") {
    val p = planOf("t47_html_extract")
    p should not include "Join"
    // one scan, one projection chain; the only exchange is the final
    // presentation orderBy's range partitioning — never a hash shuffle
    p.linesIterator.count(_.contains("documents.parquet")) shouldBe 1
    p should not include "hashpartitioning"
  }

  test("e08_golden_record: survivorship is entity-keyed — no cartesian, no nested loop") {
    val p = planOf("e08_golden_record")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("r31_zonal_stats: tile join broadcast, zone fold partial-aggregates") {
    val p = planOf("r31_zonal_stats")
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    // the per-zone stats must combine map-side before the poly_id shuffle
    p should include("partial_count")
  }

  test("e09_sorted_neighborhood: rank-shift candidates are hash equi-joins, never a rank-range theta") {
    val p = planOf("e09_sorted_neighborhood")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("t49_link_extract: row-local extraction — no join, one scan, no hash shuffle") {
    val p = planOf("t49_link_extract")
    p should not include "Join"
    p.linesIterator.count(_.contains("documents.parquet")) shouldBe 1
    p should not include "hashpartitioning"
  }

  test("x12_cdc_apply: automaton windows over the log only — the snapshot is never window-sorted") {
    // window partitioning must be on the log relation; the snapshot side
    // contributes scans + joins only. Guard: no cartesian/BNLJ, and the
    // number of Window nodes is exactly the automaton's one + merge's one
    val p = planOf("x12_cdc_apply")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    // exactly "(N) Window" — WindowGroupLimit is a different (cheaper) node
    p.linesIterator.count(_.trim.matches("""\(\d+\) Window""")) should be <= 2
  }

  test("s16_binary_topk: both cuts are TakeOrdered — no global sort") {
    val p = planOf("s16_binary_topk")
    p should include("TakeOrderedAndProject")
    p should not include "CartesianProduct" // the 1-row query broadcast is BNLJ-free too
  }

  test("g12/m22: banded/wedge candidates are equi-joins — no cartesian, no BNLJ") {
    Seq("g12_link_prediction", "m22_image_neardup").foreach { q =>
      val p = planOf(q)
      p should not include "CartesianProduct"
      p should not include "BroadcastNestedLoopJoin"
    }
  }

  test("q70_interval_overlap: bin equi-join only — no theta fallback") {
    val p = planOf("q70_interval_overlap")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("m21_audio_resample: pure generator chain — no join, no hash shuffle") {
    val p = planOf("m21_audio_resample")
    p should not include "Join"
    p should not include "hashpartitioning"
    p should include("Generate") // the per-clip output-position explode
  }

  test("x14_analyze_stats: one input scan feeds every column's statistics") {
    // the naive form is one scan PER COLUMN union'd together; the
    // multi-aggregate must collapse to a single pass (Expand replicas
    // inside one two-level aggregate, no Union of scans)
    val p = planOf("x14_analyze_stats")
    p.linesIterator.count(_.contains("documents.parquet")) shouldBe 1
    p should not include "Join"
  }

  test("q71_bitmap_distinct: both counts read the materialized masks, never rescan events") {
    // the mask relation barriers (it's the stored bitmap table); the
    // per-group count AND the __all__ OR-merge hang off that cut — the
    // input scan appears ZERO times in the final plan. Without the
    // barrier Spark duplicates the whole subplan (two events scans).
    val p = planOf("q71_bitmap_distinct")
    p.linesIterator.count(_.contains("events.parquet")) shouldBe 0
    p should not include "Join"
  }

  test("g13_hits: per-round co-partitioned equi-joins — no cartesian, no BNLJ, partial top-k") {
    val p = planOf("g13_hits")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    // per-role top-20 emits through TakeOrdered, never a global sort
    p should include("TakeOrderedAndProject")
  }

  test("g14_ktruss: peel rounds are equi-join only — no cartesian, no BNLJ") {
    val p = planOf("g14_ktruss")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("t50_readability: row-local codegen — no join, no hash shuffle") {
    val p = planOf("t50_readability")
    p should not include "Join"
    p should not include "hashpartitioning"
  }

  test("r33_horn_slope: explode-to-9 + ONE cell-keyed fold above the grid build") {
    // the naive Horn stencil is eight per-offset self-joins; the
    // contribution plan must show zero joins and exactly two hash
    // exchanges (grid twin build + the single cell fold)
    val p = planOf("r33_horn_slope")
    p should not include "Join"
    p should include("Generate")
    hashExchanges(p) shouldBe 2
  }

  test("m23_audio_mixdown: per-doc array ops — samples never explode to rows, no shuffle") {
    val p = planOf("m23_audio_mixdown")
    p should not include "Join"
    p should not include "hashpartitioning"
    p should not include "Generate"
  }

  test("s17_rrf_fusion: both legs cut to their pool via TakeOrdered before fusion") {
    val p = planOf("s17_rrf_fusion")
    // one TakeOrdered per leg — rank/fusion then run on <= poolK rows
    p.linesIterator.count(_.contains("TakeOrderedAndProject")) should be >= 2
    p should not include "CartesianProduct"
  }

  test("m24_blur_detect: decode + kernel stay in the row — no join, no hash shuffle") {
    val p = planOf("m24_blur_detect")
    p should not include "Join"
    p should not include "hashpartitioning"
  }

  test("g15_modularity: label joins are equi-joins — no cartesian, no BNLJ") {
    val p = planOf("g15_modularity")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("t51_lexical_diversity: the tf histogram is the only width — two hash exchanges, no join") {
    val p = planOf("t51_lexical_diversity")
    p should not include "Join"
    hashExchanges(p) shouldBe 2 // (doc, term) histogram + doc fold
  }

  test("r34_flow_direction: explode-to-9 + ONE cell fold, argmax in the row") {
    val p = planOf("r34_flow_direction")
    p should not include "Join"
    p should include("Generate")
    hashExchanges(p) shouldBe 2 // grid twin build + cell-keyed gather
  }

  test("q72_attribution: the attribution join is a window — no join, one user exchange") {
    val p = planOf("q72_attribution")
    p should not include "Join"
    hashExchanges(p) shouldBe 1
    p should include("RangeFrame")
  }

  test("x15_incremental_stats: __all__ derives from summaries — zero input scans") {
    val p = planOf("x15_incremental_stats")
    p.linesIterator.count(_.contains("documents.parquet")) shouldBe 0
    p should not include "Join"
  }

  test("g16_assortativity: degree joins are equi-joins — no cartesian, no BNLJ") {
    val p = planOf("g16_assortativity")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("d20_dedup_weights: banded candidates only — no cartesian, no BNLJ") {
    val p = planOf("d20_dedup_weights")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("t52_code_detect: row-local regex battery — no join, no hash shuffle") {
    val p = planOf("t52_code_detect")
    p should not include "Join"
    p should not include "hashpartitioning"
  }

  test("m25_hist_equalize: decode + remap stay in the row — no join, no hash shuffle") {
    val p = planOf("m25_hist_equalize")
    p should not include "Join"
    p should not include "hashpartitioning"
  }

  test("q73_gini: rank window and fold share ONE group exchange, no join") {
    val p = planOf("q73_gini")
    p should not include "Join"
    hashExchanges(p) shouldBe 1
  }

  test("m26_audio_features: decode + fold stay in the row — no join, no hash shuffle") {
    val p = planOf("m26_audio_features")
    p should not include "Join"
    p should not include "hashpartitioning"
  }

  test("r35_flow_accum: walk joins are equi-joins — no cartesian, no BNLJ") {
    val p = planOf("r35_flow_accum")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("r36_watershed: pointer-jump rounds are equi-joins — no cartesian, no BNLJ") {
    val p = planOf("r36_watershed")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("q74_basket_lift: pair expansion + count joins only, partial top-k emit") {
    val p = planOf("q74_basket_lift")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("TakeOrderedAndProject")
  }

  test("q75_skyline: the NOT-EXISTS quadratic replaced by dedup + ONE window — no join") {
    val p = planOf("q75_skyline")
    p should not include "Join"
    p should include("Window")
    // dedup fold + brand-partitioned window sort: two hash exchanges max
    hashExchanges(p) should be <= 2
  }

  test("q76_decay_topk: one supplier fold, global top-k via map-side heaps") {
    val p = planOf("q76_decay_topk")
    p should not include "Join"
    p should include("TakeOrderedAndProject")
    hashExchanges(p) shouldBe 1
  }

  test("r37_ruggedness: explode-to-9 + ONE cell-keyed fold, no per-offset self-joins") {
    val p = planOf("r37_ruggedness")
    p should not include "Join"
    p should include("Generate")
    // grid twin build + the single cell fold
    hashExchanges(p) shouldBe 2
  }

  test("m27_sobel_edges: decode + kernel stay in the row — no join, no hash shuffle") {
    val p = planOf("m27_sobel_edges")
    p should not include "Join"
    p should not include "hashpartitioning"
  }

  test("g17_clustering: wedge join is equi-keyed — no cartesian, no BNLJ") {
    val p = planOf("g17_clustering")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("t53_markdown_extract: pure codegen regexp chain — no join, no hash shuffle") {
    val p = planOf("t53_markdown_extract")
    p should not include "Join"
    p should not include "hashpartitioning"
  }

  test("q77_rfm: three quintile windows, no cartesian") {
    val p = planOf("q77_rfm")
    p should include("Window")
    p should not include "CartesianProduct"
  }

  test("x16_equi_depth_hist: ONE value-domain fold feeds the window — no row sort") {
    val p = planOf("x16_equi_depth_hist")
    p should include("Window")
    p should include("Generate")
    // the (value -> count) fold is barriered away; what remains sees
    // only the bounded value domain — zero hash exchanges, and the two
    // SinglePartition exchanges (window + totals) carry value-domain
    // row counts, never the raw rows
    hashExchanges(p) shouldBe 0
    p should include("Scan ExistingRDD") // the barrier cut is in place
  }

  test("m28_dominant_color: decode + histogram stay in the row — no join, no shuffle") {
    val p = planOf("m28_dominant_color")
    p should not include "Join"
    p should not include "hashpartitioning"
  }

  test("s18_bm25_exact: broadcast df/stats, top-k via TakeOrdered, no SMJ") {
    val p = planOf("s18_bm25_exact")
    p should include("TakeOrderedAndProject")
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
  }

  test("t54_garble_detect: pure codegen regexp counts — no join, no hash shuffle") {
    val p = planOf("t54_garble_detect")
    p should not include "Join"
    p should not include "hashpartitioning"
  }

  test("g18_scc_local: doubling rounds are equi-joins on barriered cuts") {
    val p = planOf("g18_scc_local")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    // the final plan hangs off checkpointed reach relations, not a
    // re-derivation of all four rounds
    p should include("Scan ExistingRDD")
  }

  test("m29_clipping: decode + run fold stay in the row — no join, no hash shuffle") {
    val p = planOf("m29_clipping")
    p should not include "Join"
    p should not include "hashpartitioning"
  }

  test("q78_abc_class: brand totals broadcast, one partitioned window") {
    val p = planOf("q78_abc_class")
    p should include("Window")
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
  }

  test("q79_benford: one 9-group fold, everything after runs on 9 rows") {
    val p = planOf("q79_benford")
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
    // the digit fold is barriered; the spine/totals side is broadcast
    p should include("Scan ExistingRDD")
  }

  test("x18_bloom_prefilter: ONE big-side pass, all lookups broadcast") {
    val p = planOf("x18_bloom_prefilter")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
    p.linesIterator.count(_.contains("lineitem.parquet")) shouldBe 1
  }

  test("g19_coreness: peel sweep is equi-joins on barriered cuts") {
    val p = planOf("g19_coreness")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("Scan ExistingRDD")
  }

  test("m30_onset_detect: decode + frame fold stay in the row — no join, no shuffle") {
    val p = planOf("m30_onset_detect")
    p should not include "Join"
    p should not include "hashpartitioning"
  }

  test("t55_fim_transform: pure codegen substring chain — no join, no hash shuffle") {
    val p = planOf("t55_fim_transform")
    p should not include "Join"
    p should not include "hashpartitioning"
  }

  test("q80_cusum: windows run over the barriered day fold, never the rows") {
    val p = planOf("q80_cusum")
    p should include("Window")
    p should include("Scan ExistingRDD")
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
    hashExchanges(p) shouldBe 0
  }

  test("r38_landforms: two stencil folds, equi-join on the cell key only") {
    val p = planOf("r38_landforms")
    p should include("Generate")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("g20_rectangles: wedge fold + metadata crossjoins, no cartesian of data") {
    val p = planOf("g20_rectangles")
    p should not include "CartesianProduct"
  }

  test("m31_bitplanes: decode + plane fold stay in the row — no join, no shuffle") {
    val p = planOf("m31_bitplanes")
    p should not include "Join"
    p should not include "hashpartitioning"
  }

  test("q81_runs_test: lag windows over the barriered day fold only") {
    val p = planOf("q81_runs_test")
    p should include("Window")
    p should include("Scan ExistingRDD")
    p should not include "SortMergeJoin"
    hashExchanges(p) shouldBe 0
  }

  test("t56_span_corruption: pure codegen substring chain — no join, no shuffle") {
    val p = planOf("t56_span_corruption")
    p should not include "Join"
    p should not include "hashpartitioning"
  }

  test("r39_fill_sinks: rounds hang off checkpointed cuts, equi-joins only") {
    val p = planOf("r39_fill_sinks")
    p should include("Scan ExistingRDD")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("x19_layout_pruning: the summary runs on the barriered file stats") {
    val p = planOf("x19_layout_pruning")
    p should include("Scan ExistingRDD")
    p should not include "SortMergeJoin"
    // the orders scan happened once, inside the stats barrier
    p.linesIterator.count(_.contains("orders.parquet")) shouldBe 0
  }

  test("m32_hist_match: decode + remap stay in the row — no join, no shuffle") {
    val p = planOf("m32_hist_match")
    p should not include "Join"
    p should not include "hashpartitioning"
  }

  test("r40_strahler: fixpoint sweeps hang off checkpointed cuts, equi-joins only") {
    val p = planOf("r40_strahler")
    p should include("Scan ExistingRDD")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("m33_patchify: decode + patch fold stay in the row — no join, no shuffle") {
    val p = planOf("m33_patchify")
    p should not include "Join"
    p should not include "hashpartitioning"
  }

  test("q82_spc_limits: chart rows come from the barriered day fold, limits broadcast") {
    val p = planOf("q82_spc_limits")
    p should include("Scan ExistingRDD")
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
    hashExchanges(p) shouldBe 0
  }

  test("q83_seasonal_naive: the shifted-key join runs on the barriered month fold") {
    val p = planOf("q83_seasonal_naive")
    p should include("Scan ExistingRDD")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("t57_curation_route: doc_id-keyed composition, no cartesian") {
    val p = planOf("t57_curation_route")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("m34_gray_world: decode + gains stay in the row — no join, no shuffle") {
    val p = planOf("m34_gray_world")
    p should not include "Join"
    p should not include "hashpartitioning"
  }

  test("q84_growth_accounting: key-shifted equi-joins over the barriered week fold") {
    val p = planOf("q84_growth_accounting")
    p should include("Scan ExistingRDD")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("g21_degree_profile: one degree fold, bins row-local") {
    val p = planOf("g21_degree_profile")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("e10_er_quality: metadata-sized set arithmetic on barriered cuts") {
    val p = planOf("e10_er_quality")
    p should include("Scan ExistingRDD")
    p should not include "CartesianProduct"
  }

  test("t58_token_budget: the weights join is doc-keyed, no cartesian") {
    val p = planOf("t58_token_budget")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("q85_abc_migration: two banding pipelines, partkey outer join only") {
    val p = planOf("q85_abc_migration")
    p should include("Window")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("r41_zonal_mode: stencil folds + a metadata argmax, no cartesian") {
    val p = planOf("r41_zonal_mode")
    p should include("Generate")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("x17_selectivity_est: 32-row histogram broadcast; truth is ONE fold pass") {
    val p = planOf("x17_selectivity_est")
    p should include("BroadcastExchange")
    p should not include "SortMergeJoin"
    // ground truth: conditional sums over the value fold, not a
    // per-cutoff rescan — the orders scan appears at most twice
    // (histogram build is barriered away; one scan for the act pass)
    p.linesIterator.count(_.contains("orders.parquet")) should be <= 1
  }
}
