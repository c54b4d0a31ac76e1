package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.implicits._

/** Entity resolution: fuzzy self-match over a name column — the
  * "same customer, typo'd name" dedup every master-data pipeline runs.
  *
  * The naive form is a quadratic theta join (`levenshtein(a,b) <= d` as
  * the join condition), which Spark can only execute as a cartesian
  * product — a non-starter at any scale. The distributed shape here is
  * the SymSpell / FastSS deletion-neighborhood algorithm (Schulz &
  * Mihov 2002; public domain): two strings within Levenshtein distance
  * 1 ALWAYS share a member of each other's delete-1 neighborhood
  * (the string itself plus every string obtained by deleting one
  * character) —
  *   - substitution at position i: both sides' delete-at-i agree;
  *   - insertion/deletion: deleting the inserted char from the longer
  *     side yields the shorter side verbatim (its delete-0 member).
  * So candidate generation is an EQUI-join on hashed variants, and the
  * exact `levenshtein` check runs only on the candidate sliver.
  */
object Entity {

  /** All fuzzy pairs (a_id < b_id) within Levenshtein distance 1,
    * found via deletion-neighborhood blocking + exact verification.
    *
    * Scale shape, in three stages that keep the quadratic part confined
    * to genuine OUTPUT enumeration:
    *  1. EXACT-DUPLICATE COLLAPSE first: ids group by name, so the
    *     expensive stages run over DISTINCT names. Real corpora (and the
    *     bench's key-shifted scale copies) carry heavy exact duplication;
    *     without this collapse each copy re-pays the variant explode and
    *     join (measured 17.8× at the 10× scale leg — the duplicated
    *     names made the blocking join itself quadratic).
    *  2. Deletion-neighborhood blocking over distinct names: length+1
    *     variants hashed to 8-byte keys; the candidate join is a plain
    *     equi-join on that hash (plan-guarded: no cartesian, no
    *     broadcast-nested-loop), candidates verified with one exact
    *     levenshtein. Hash collisions only ADD candidates; the verify
    *     removes them.
    *  3. Pair expansion: distance-0 pairs unfold within each name group;
    *     distance-1 pairs cross the two groups' id lists. Both are
    *     output-bounded — the pair SET is quadratic in duplication by
    *     definition, and no stage pays more than the rows it emits.
    */
  def fuzzyPairs(rows: DataFrame, idCol: String, nameCol: String): DataFrame = {
    val named = rows.select(col(idCol).as("id"), col(nameCol).as("name"))
    // ids per distinct name, sorted so within-group pairs are (low, high)
    val groups = named.groupBy($"name")
      .agg(sort_array(collect_list($"id")).as("ids"))

    // distance-0: all id pairs within one name group (slice from i+2 in
    // 1-based terms = everything after the current element)
    val dist0 = groups
      .where(size($"ids") > 1)
      .select($"name", posexplode($"ids").as(Seq("i", "x_id")))
      .join(groups, Seq("name"))
      .select($"name", $"x_id",
        explode(slice($"ids", $"i" + lit(2), size($"ids") - $"i" - 1)).as("y_id"))
      .select($"x_id".as("a_id"), $"name".as("a_name"),
        $"y_id".as("b_id"), $"name".as("b_name"), lit(0L).as("dist"))

    val variants = deleteVariants(groups.select($"name"))
    val candidates = variants.select($"name".as("x_name"), $"vhash")
      .join(variants.select($"name".as("y_name"), $"vhash"), Seq("vhash"))
      .where($"x_name" < $"y_name")
      .select($"x_name", $"y_name").distinct()
      .where(levenshtein($"x_name", $"y_name") === 1)

    // expand the verified distinct-name pairs to id pairs; the output
    // pair is ordered by id, so names follow their ids through the swap
    val dist1 = candidates
      .join(groups.select($"name".as("x_name"), $"ids".as("x_ids")), Seq("x_name"))
      .join(groups.select($"name".as("y_name"), $"ids".as("y_ids")), Seq("y_name"))
      .select($"x_name", $"y_name", explode($"x_ids").as("x_id"), $"y_ids")
      .select($"x_name", $"y_name", $"x_id", explode($"y_ids").as("y_id"))
      .select(
        least($"x_id", $"y_id").as("a_id"),
        when($"x_id" < $"y_id", $"x_name").otherwise($"y_name").as("a_name"),
        greatest($"x_id", $"y_id").as("b_id"),
        when($"x_id" < $"y_id", $"y_name").otherwise($"x_name").as("b_name"),
        lit(1L).as("dist"))

    dist0.unionByName(dist1).orderBy($"a_id", $"b_id")
  }

  /** Delete-1 neighborhood of each distinct name, hashed to 8-byte keys:
    * (name, vhash) rows covering the name itself plus every one-char
    * deletion. The delete list is guarded on length > 0: sequence(1, 0)
    * would generate a DESCENDING [1, 0] (Spark's step defaults to -1
    * when start > stop), turning an empty name into junk variants via
    * negative-length substr. Hash collisions only ADD candidates — every
    * caller verifies with an exact string predicate.
    */
  private def deleteVariants(names: DataFrame): DataFrame =
    names
      .withColumn("variant",
        explode(concat(
          array($"name"),
          when(length($"name") > 0,
            transform(sequence(lit(1), length($"name")), i =>
              concat($"name".substr(lit(1), i - 1),
                     $"name".substr(i + 1, length($"name")))))
            .otherwise(array().cast("array<string>")))))
      .select($"name", xxhash64($"variant").as("vhash"))
      .distinct() // a name's own delete-set can self-collide

  /** End-to-end entity resolution (e04): records → entity ids. The full
    * master-data pipeline in one call — [[fuzzyPairs]] finds the pairs;
    * this produces what the warehouse actually stores: a resolved
    * `entity_id` per RECORD, constant across each transitive match
    * cluster.
    *
    * Stages, each with the same scale discipline as its standalone kin:
    *  1. Collapse to DISTINCT names (the e01 lesson — expensive stages
    *     never see duplication); each name node carries min(record id)
    *     as its initial label.
    *  2. Candidate edges via delete-1 blocking ([[deleteVariants]] —
    *     hashed equi-join, no cartesian), verified `levenshtein == 1 AND
    *     jaro_winkler >= minJw`: the edit-distance block bounds the
    *     candidate set, the Jaro-Winkler floor applies the linkage
    *     policy (census-style: prefix-weighted similarity, so "same
    *     record, one typo" passes and "different entity, one digit"
    *     variants can be tuned out).
    *  3. Min-label propagation over the name graph to convergence —
    *     O(diameter) rounds of one shuffle-join + aggregate
    *     ([[Dedup.dedupClusters]]'s kernel); match graphs are tiny
    *     cliques, so 2-4 rounds regardless of corpus size, and a
    *     `require(converged)` fails loudly rather than returning
    *     half-propagated labels.
    *  4. One equi-join expands name labels back to records.
    *
    * The result holds a full value-level oracle: every predicate is
    * integer/string-exact except Jaro-Winkler, whose fixture values sit
    * ≥ 0.005 from `minJw` (plateaued rational values — verified at gate
    * build time), so a last-ulp divergence between independent
    * implementations cannot flip an edge.
    */
  def resolveEntities(rows: DataFrame, idCol: String, nameCol: String,
                      minJw: Double = 0.96, maxRounds: Int = 20): DataFrame = {
    val named = rows.select(col(idCol).as("id"), col(nameCol).as("name"))
    val names = named.groupBy($"name").agg(min($"id").as("mid"))
    val variants = deleteVariants(names.select($"name"))
    val cand = variants.select($"name".as("x"), $"vhash")
      .join(variants.select($"name".as("y"), $"vhash"), Seq("vhash"))
      .where($"x" < $"y")
      .select($"x", $"y").distinct()
      .where(levenshtein($"x", $"y") === 1 &&
             graft.functions.JaroWinkler($"x", $"y") >= minJw)
    // min-label propagation over the name graph — the shared CC kernel
    val edges = cand.select($"x".as("src"), $"y".as("dst"))
      .unionByName(cand.select($"y".as("src"), $"x".as("dst")))
    val labels = Graph.minLabelComponents(
      edges, names.select($"name".as("node"), $"mid".as("label")), maxRounds)
    named.join(labels.select($"node".as("name"), $"label".as("entity_id")),
        Seq("name"))
      .select($"id", $"name", $"entity_id")
      .orderBy($"id")
  }

  /** Golden-record survivorship (e08) — the canonicalization step after
    * [[resolveEntities]]: one master row per resolved entity, each
    * attribute chosen by its own survivorship rule (the MDM playbook):
    *   - `canonical_name`: the LONGEST member name (most complete
    *     value), lexicographic min on ties;
    *   - `nation`: the mode, smallest value on count ties;
    *   - `segment`: source priority (crm beats web), min id on ties —
    *     the "most trusted system wins" rule;
    *   - `bal_cents`: max across members ("highest observed balance");
    *   - `n_members`/`min_id`: lineage audit.
    * Ties break on exact integer sort keys encoded arithmetically
    * (`cnt·10⁶ − nation`, `priority·10¹⁰ + id`), so `max_by`/`arg_max`
    * pick identical rows in any engine — no engine-specific mode() or
    * struct-ordering semantics in play.
    *
    * Scale shape: everything shuffles on `entity_id`; the window and
    * both aggregates are over entity-sized groups (bounded by cluster
    * size, which the resolver's candidate discipline already bounds),
    * and the nation mode pre-collapses to (entity, nation) counts
    * map-side. No self-join, no all-pairs.
    */
  def goldenRecords(records: DataFrame, entities: DataFrame): DataFrame = {
    val r = records.join(entities, Seq("id"))
    val wEnt = org.apache.spark.sql.expressions.Window.partitionBy($"entity_id")
    val prioKey = (when($"src" === "crm", 0L).otherwise(1L) * 10000000000L) + $"id"
    val main = r.withColumn("maxlen", max(length($"name")).over(wEnt))
      .groupBy($"entity_id")
      .agg(
        min(when(length($"name") === $"maxlen", $"name")).as("canonical_name"),
        count(lit(1)).as("n_members"),
        min($"id").as("min_id"),
        max($"bal_cents").as("bal_cents"),
        min_by($"segment", prioKey).as("segment"))
    val nation = r.groupBy($"entity_id", $"nation")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"entity_id")
      .agg(max_by($"nation", $"cnt" * 1000000L - $"nation").as("nation"))
    main.join(nation, Seq("entity_id"))
      .select($"entity_id", $"canonical_name", $"nation", $"segment",
        $"bal_cents", $"n_members", $"min_id")
      .orderBy($"entity_id")
  }

  /** Blocking-quality report (e06): the standard ER blocking evaluation
    * — REDUCTION RATIO (share of the quadratic comparison space the
    * blocking skips) and blocking PRECISION (share of candidates that
    * verify as true lev≤1 matches), as exact integer ppm over the
    * distinct-name universe. Pair completeness is checked by the GATE
    * construction rather than reported as a trivial constant: the
    * oracle counts true matches with its own brute-force scan, so a
    * candidate set that missed any true pair hash-mismatches on
    * `n_matches`.
    *
    * Variants join as STRINGS here, not [[deleteVariants]]' 8-byte
    * hashes: the candidate COUNT is the deliverable, and a hash
    * collision would silently inflate it — the hashed form is right
    * exactly when a post-verify removes collisions (e01), wrong when
    * the count itself is the answer. Costs wider shuffle rows on a
    * vocabulary-sized relation; the quadratic total-pair count is
    * arithmetic (n·(n−1)/2), never an enumerated join.
    */
  def blockingReport(rows: DataFrame, nameCol: String): DataFrame = {
    val names = rows.select(col(nameCol).as("name")).distinct()
    val variants = names
      .withColumn("variant",
        explode(concat(
          array($"name"),
          when(length($"name") > 0,
            transform(sequence(lit(1), length($"name")), i =>
              concat($"name".substr(lit(1), i - 1),
                     $"name".substr(i + 1, length($"name")))))
            .otherwise(array().cast("array<string>")))))
      .select($"name", $"variant").distinct()
    val candidates = variants.select($"name".as("x_name"), $"variant")
      .join(variants.select($"name".as("y_name"), $"variant"), Seq("variant"))
      .where($"x_name" < $"y_name")
      .select($"x_name", $"y_name").distinct()
    val cstats = candidates.agg(
      count(lit(1)).as("n_candidates"),
      sum(when(levenshtein($"x_name", $"y_name") <= 1, 1L).otherwise(0L))
        .as("n_matches"))
    names.agg(count(lit(1)).as("n_names"))
      .crossJoin(cstats) // two 1-row aggregates
      .select($"n_names",
        expr("n_names * (n_names - 1) div 2").as("n_total_pairs"),
        $"n_candidates", $"n_matches",
        expr("""(n_names * (n_names - 1) div 2 - n_candidates) * 1000000L
                div (n_names * (n_names - 1) div 2)""").as("reduction_ppm"),
        expr("n_matches * 1000000L div n_candidates").as("precision_ppm"))
  }

  /** The SQL-Server-variant Soundex key (the H/W-bridging rule of the
    * genealogy variant deliberately omitted — this variant is fully
    * expressible as the same column algebra in any engine, which is
    * what lets e05 carry a value oracle): uppercase first letter +
    * first three non-zero digit codes after collapsing ADJACENT equal
    * codes over the full mapped string, zero-padded. Pure per-row
    * column expressions (translate / indexed-lambda filter / slice) —
    * no UDF, stays inside codegen.
    */
  def soundexKey(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val letters = lower(regexp_replace(c, "[^A-Za-z]", ""))
    val codes = translate(letters, "abcdefghijklmnopqrstuvwxyz",
      "01230120022455012623010202")
    val cs = split(codes, "")
    val collapsed = filter(cs, (x, i) => i === lit(0) || x =!= element_at(cs, i))
    val digits = substring(
      regexp_replace(array_join(slice(collapsed, 2, 1000), ""), "0", ""), 1, 3)
    concat(upper(substring(letters, 1, 1)), rpad(digits, 3, "0"))
  }

  /** Phonetic blocking pairs (e05): the third candidate-generation
    * family beside delete-1 neighborhoods ([[fuzzyPairs]]) and hashed
    * n-gram blocks — sound-alike words land in one [[soundexKey]]
    * bucket, the exact levenshtein verify prunes the bucket to real
    * near-matches. Runs over the DISTINCT word vocabulary of a name
    * column (the exact-dup-collapse discipline of stage 1 in
    * [[fuzzyPairs]]): the block join is vocabulary-sized regardless of
    * row count, and at 100 TB the key is 4 ASCII bytes — the shuffle
    * carries (key, word), never source rows.
    */
  def phoneticPairs(rows: DataFrame, nameCol: String, maxDist: Int): DataFrame = {
    val vocab = rows
      .select(explode(split(lower(col(nameCol)), "\\s+")).as("w"))
      .where($"w".rlike("^[a-z]{2,}$")).distinct()
    val keyed = vocab.withColumn("key", soundexKey($"w"))
    keyed.as("a").join(keyed.as("b"),
        col("a.key") === col("b.key") && col("a.w") < col("b.w"))
      .select(col("a.key").as("key"), col("a.w").as("w1"), col("b.w").as("w2"),
        levenshtein(col("a.w"), col("b.w")).cast("long").as("dist"))
      .where($"dist" <= maxDist)
      .orderBy($"key", $"w1", $"w2")
  }

  /** TF-IDF-weighted cosine entity matcher (e07): the fourth
    * candidate-generation family — weight each name token by its
    * rarity, block on SHARED tokens, and score candidate pairs with the
    * cosine of their weighted token vectors (the WHIRL / canopy-
    * clustering shape of Cohen 1998 and McCallum et al. 2000: common
    * tokens like "Inc" contribute ~nothing, rare tokens nearly decide
    * the match alone).
    *
    * Exactness discipline: the usual `ln(N/df)` idf is not bit-portable
    * across engines, so the weight is the INTEGER inverse document
    * frequency `w_t = K div df_t` (binary tf over the token SET) — every
    * numerator and norm is then an exact BIGINT sum (w ≤ K = 10^6,
    * ≤ dozens of tokens per name keeps Σw² far under 2^63), and the
    * score pays exactly one correctly-rounded sqrt/division at the end.
    *
    * Scale shape: df counts are vocabulary-sized; the candidate join is
    * an equi-join on token with tokens of df > maxDf DROPPED before
    * pairing (both from the pair numerators AND the norms — capped
    * semantics, the d02/d06 discipline), so no stopword token ever
    * explodes the join; pair scoring is one map-side Σw² per group.
    */
  def tfidfCosinePairs(rows: DataFrame, idCol: String, nameCol: String,
                       minCos: Double, maxDf: Long = 128,
                       k: Long = 1000000L): DataFrame = {
    require(minCos > 0 && minCos <= 1, s"minCos $minCos outside (0, 1]")
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val toks = rows
      .select(col(idCol).cast("long").as("id"),
        explode(array_distinct(split(col(nameCol), "\\s+"))).as("tok"))
      .where(length($"tok") > 0)
    val weights = toks.groupBy($"tok").agg(count(lit(1)).as("df"))
      .where($"df" <= maxDf)
      .select($"tok", expr(s"$k div df").as("w"))
    val wtoks = toks.join(weights, Seq("tok"))
    val norms = wtoks.groupBy($"id").agg(sum($"w" * $"w").as("n2"))
    wtoks.select($"tok", $"id".as("a_id"), $"w")
      .join(wtoks.select($"tok", $"id".as("b_id")), Seq("tok"))
      .where($"a_id" < $"b_id")
      .groupBy($"a_id", $"b_id").agg(sum($"w" * $"w").as("num"))
      .join(norms.select($"id".as("a_id"), $"n2".as("na")), Seq("a_id"))
      .join(norms.select($"id".as("b_id"), $"n2".as("nb")), Seq("b_id"))
      .withColumn("cos", $"num" / (sqrt($"na") * sqrt($"nb")))
      .where($"cos" >= minCos)
      .select($"a_id", $"b_id", round($"cos", 4).as("cos_sim"))
      .orderBy($"a_id", $"b_id")
  }

  /** E10: ER quality report — the resolved pairs GRADED against a known
    * truth set (the evaluation every entity-resolution deployment runs
    * before trusting its threshold): true/false positives, misses, and
    * precision/recall in exact ppm, one row. Fed by [[tfidfCosinePairs]]
    * on the constructed-duplicate fixture whose truth is closed-form —
    * the gate quantifies what e06's blocking report only bounds.
    */
  def erQuality(pairs: DataFrame, truth: DataFrame): DataFrame = {
    val p = graft.Session.barrier(pairs.select($"a_id", $"b_id"))
    val t = graft.Session.barrier(truth.select($"a_id", $"b_id"))
    val tp = p.join(t, Seq("a_id", "b_id"), "left_semi")
      .agg(count(lit(1)).as("tp"))
    val np = p.agg(count(lit(1)).as("n_pairs"))
    val nt = t.agg(count(lit(1)).as("n_truth"))
    tp.crossJoin(np).crossJoin(nt)
      .withColumn("fp", $"n_pairs" - $"tp")
      .withColumn("fn", $"n_truth" - $"tp")
      .withColumn("precision_ppm",
        expr("(1000000 * tp) div greatest(n_pairs, 1)"))
      .withColumn("recall_ppm",
        expr("(1000000 * tp) div greatest(n_truth, 1)"))
      .select($"tp", $"fp", $"fn", $"n_pairs", $"n_truth",
        $"precision_ppm", $"recall_ppm")
  }

  /** Sorted-neighborhood ER blocking (e09) — the third classic blocking
    * family next to deletion-neighborhood ([[fuzzyPairs]]) and phonetic
    * keys: sort records by a constructed blocking key, candidates are
    * records within `window` positions of each other in that order
    * (Hernández & Stolfo 1995), verified with one exact `levenshtein`.
    * Catches the transpositions and prefix typos that equality-shaped
    * blocks miss, with a candidate count LINEAR in n (≤ n·(window−1))
    * by construction.
    *
    * The sequential scan in the textbook version hides a global rank —
    * the distributed shape here is the [[Sampling.withPrefixSum]] scan
    * (range partition on the key, per-partition totals as driver
    * metadata, within-partition window), so no single-task window ever
    * sees the corpus. Candidates then come from `window − 1` rank-SHIFT
    * equi-joins (rank_b = rank_a + k, the shift exploded on the left),
    * hash joins on a long key — never a rank-range theta join, which
    * Spark could only run as a nested loop.
    *
    * Ties: (key, id) is a total order (id unique), so ranks — and hence
    * the candidate set — are deterministic on any partitioning.
    */
  def sortedNeighborhoodPairs(rows: DataFrame, idCol: String, nameCol: String,
                              keyCol: String, window: Int, maxDist: Int): DataFrame = {
    require(window >= 2 && window <= 64,
      s"sortedNeighborhoodPairs: window $window out of [2, 64]")
    require(maxDist >= 0, s"sortedNeighborhoodPairs: maxDist $maxDist < 0")
    val sel = rows.select(col(idCol).as("id"), col(nameCol).as("name"),
        col(keyCol).as("key"))
      .withColumn("one", lit(1L))
    val ranked = Sampling.withPrefixSum(sel, Seq($"key", $"id"), "one", "rank",
        Sampling.resolveParts(sel, 0))
      .select($"id", $"name", $"rank")
    val a = ranked.select($"id".as("x_id"), $"name".as("x_name"), $"rank")
      .withColumn("k", explode(sequence(lit(1), lit(window - 1))))
      .withColumn("rank", $"rank" + $"k")
    a.join(ranked.select($"id".as("y_id"), $"name".as("y_name"), $"rank"),
        Seq("rank"))
      .withColumn("dist", levenshtein($"x_name", $"y_name").cast("long"))
      .where($"dist" <= maxDist)
      .select(
        least($"x_id", $"y_id").as("a_id"),
        when($"x_id" < $"y_id", $"x_name").otherwise($"y_name").as("a_name"),
        greatest($"x_id", $"y_id").as("b_id"),
        when($"x_id" < $"y_id", $"y_name").otherwise($"x_name").as("b_name"),
        $"dist")
      .orderBy($"a_id", $"b_id")
  }
}
