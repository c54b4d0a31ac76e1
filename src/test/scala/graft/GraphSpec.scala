package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** g01's integer-mass PageRank: fixed-point and structure laws on
  * hand-checkable graphs, plus the bipartite edge derivation.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edgesOf(pairs: (Long, Long)*) =
    pairs.toDF("src", "dst")

  test("regular graphs are a fixed point: every node keeps exactly 1e6 mass") {
    // K3, bidirectional: each node receives 2 * (1e6 div 2) = 1e6,
    // update = 150000 + 850*1e6/1000 = 1000000 — exact at every round
    val k3 = edgesOf((1L,2L),(2L,1L),(2L,3L),(3L,2L),(1L,3L),(3L,1L))
    val r = Graph.pagerankInt(k3, 5).as[(Long, Long)].collect().toMap
    r shouldBe Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L)
  }

  test("star graph: the hub outranks every leaf; total mass is conserved up to floor loss") {
    val star = edgesOf((0L,1L),(1L,0L),(0L,2L),(2L,0L),(0L,3L),(3L,0L),(0L,4L),(4L,0L))
    val r = Graph.pagerankInt(star, 3).as[(Long, Long)].collect().toMap
    val (hub, leaves) = (r(0L), (1L to 4L).map(r))
    leaves.distinct should have size 1      // symmetry
    hub should be > leaves.head
    // teleport + damping preserve scale: total stays within floor-division
    // loss of the starting 5e6 (each div drops < 1 per edge per round)
    val total = r.values.sum
    total should be <= 5000000L
    total should be > (5000000L * 95 / 100)
  }

  test("iterating from the uniform start actually moves mass (not a no-op) and stays positive") {
    val chain = edgesOf((1L,2L),(2L,1L),(2L,3L),(3L,2L))
    val r1 = Graph.pagerankInt(chain, 1).as[(Long, Long)].collect().toMap
    r1(2L) should be > r1(1L)   // middle of the path collects from both ends
    r1.values.foreach(_ should be >= 150000L)  // teleport floor
  }

  test("partSupplierEdges: disjoint-parity node ids, bidirectional, deduped") {
    val e = Graph.partSupplierEdges(table("lineitem"))
    e.count() shouldBe e.distinct().count()
    // every edge connects opposite parities (bipartite by construction)
    e.where(($"src" % 2) === ($"dst" % 2)).count() shouldBe 0L
    // symmetric: reversing the edge set yields the same set
    e.select($"dst".as("src"), $"src".as("dst")).exceptAll(e).count() shouldBe 0L
  }

  test("gate plan: no cartesian, no broadcast-nested-loop, top-k not a global sort") {
    val p = SparkEntry.queries("g01_pagerank")(spark, sf0001)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("TakeOrderedAndProject")
  }

  test("triangle census: K4 has 4 triangles, 12 wedges; a path has none") {
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("u", "v")
    val c = Graph.triangleCensus(k4).as[(Long, Long, Long, Long)].head()
    c shouldBe ((4L, 6L, 4L, 12L))  // nodes, edges, triangles, wedges
    val path = Seq((1L,2L),(2L,3L),(3L,4L)).toDF("u","v")
    val p = Graph.triangleCensus(path).as[(Long, Long, Long, Long)].head()
    p._3 shouldBe 0L
    p._4 shouldBe 2L               // two wedges through the middle nodes
  }

  test("triangle census: hub star plus one rim edge — exactly the one triangle, hub not a hot join key") {
    // star hub 0 with leaves 1..6, plus rim edge (1,2): one triangle (0,1,2)
    val und = (((1L to 6L).map(l => (0L, l))) :+ (1L, 2L)).toDF("u", "v")
    val c = Graph.triangleCensus(und).as[(Long, Long, Long, Long)].head()
    c._3 shouldBe 1L
    // orientation law: the hub (max degree) can only ever be a dst
    val deg = und.select($"u".as("n")).unionByName(und.select($"v".as("n")))
      .groupBy($"n").count()
    deg.orderBy($"count".desc).select($"n").as[Long].head() shouldBe 0L
  }

  test("co-supply edges are canonical (u < v) and deduped") {
    val e = Graph.coSupplierEdges(table("lineitem"))
    e.where($"u" >= $"v").count() shouldBe 0L
    e.count() shouldBe e.distinct().count()
  }

  test("itemPairsCF: co-occurrence counts, support floor, exact Jaccard fraction") {
    // baskets: {1,2,3}, {1,2}, {1,2}, {3,4} -> (1,2) common 3, (1,3)/(2,3) common 1, (3,4) common 1
    val b = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L),
      (40L, 3L), (40L, 4L)).toDF("basket", "item")
    val all = Graph.itemPairsCF(b, 10, minBaskets = 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    all((1L, 2L)) shouldBe ((3L, 3L))   // 3 shared of 3+3-3 -> Jaccard 1
    all((1L, 3L)) shouldBe ((1L, 4L))   // 1 shared of 3+2-1
    all((3L, 4L)) shouldBe ((1L, 2L))
    // support floor drops all the singleton pairs
    val floored = Graph.itemPairsCF(b, 10, minBaskets = 2L).collect()
    floored.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe Seq((1L, 2L))
  }

  test("itemPairsCF: duplicate basket lines don't inflate counts; k cuts deterministically") {
    val b = Seq((1L, 5L), (1L, 5L), (1L, 6L), (1L, 6L), (2L, 5L), (2L, 6L))
      .toDF("basket", "item")
    val out = Graph.itemPairsCF(b, 10, minBaskets = 1L).collect()
    out should have length 1
    (out.head.getLong(2), out.head.getLong(3)) shouldBe ((2L, 2L))
    // k=2 on the fixture: ties inside a common-count group break by (u, w)
    val po = table("lineitem")
      .select($"l_orderkey".as("basket"), $"l_partkey".as("item"))
    val k2 = Graph.itemPairsCF(po, 2).collect().map(r => (r.getLong(0), r.getLong(1)))
    val k5 = Graph.itemPairsCF(po, 5).collect().map(r => (r.getLong(0), r.getLong(1)))
    k5.take(2).toSeq shouldBe k2.toSeq    // prefix-stable under k
  }

  test("g03 gate plan: no cartesian, no BNLJ, top-k is TakeOrderedAndProject") {
    val p = SparkEntry.queries("g03_item_cf")(spark, sf0001)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("TakeOrderedAndProject")
  }

  test("minLabelComponents: a chain propagates the min label end-to-end; isolated nodes keep theirs") {
    // path 1-2-3-4 plus isolated 9: all path nodes -> label 1, 9 -> 9
    val und = Seq((1L,2L),(2L,3L),(3L,4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val init = Seq(1L, 2L, 3L, 4L, 9L).toDF("node").withColumn("label", $"node")
    val out = Graph.minLabelComponents(edges, init).as[(Long, Long)].collect().toMap
    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 9L)
  }

  test("g02's node-sampled census estimates g04's exact count within the variance bound") {
    // the 1-in-4 part sample keeps a triangle iff all 3 nodes survive
    // (p^3 = 1/64); the Doulion-style estimator sampled x 64 is unbiased.
    // sigma under triangle-independence = sqrt(t (1-p^3)/p^3) =
    // sqrt(63 t); x2 covers the positive covariance of triangles
    // sharing nodes (a crude union bound, generous but not vacuous:
    // at sf0.001 the observed deviation is ~1.4 sigma, and a broken
    // estimator — wrong power of p, biased sample — lands hundreds off)
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val exact = Graph.triangleCensus(Graph.coPurchaseEdges(li)).collect()(0)
    val sampled = Graph.triangleCensus(
      Graph.coPurchaseEdges(li.where($"l_partkey" % 4 === 0))).collect()(0)
    val t = exact.getAs[Long]("n_triangles")
    val est = sampled.getAs[Long]("n_triangles") * 64L
    t should be > 0L
    math.abs(est - t).toDouble should be <= 6 * math.sqrt(63.0 * t)
  }

  test("minLabelComponents: nodes absent from init still propagate (null-prev counts as changed)") {
    // edges A-X, X-B with init covering only {A, B}: X first appears in
    // round 1 with prev=NULL. If that row didn't count as changed, the
    // kernel could declare convergence while X's fresh label (min(A))
    // still needs to cross to B — A and B would land in different
    // components despite being connected through X
    val und = Seq((1L, 10L), (10L, 2L)) // A=1, X=10, B=2
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val init = Seq(1L, 2L).toDF("node").withColumn("label", $"node")
    val out = Graph.minLabelComponents(edges, init).as[(Long, Long)].collect().toMap
    out(1L) shouldBe 1L
    out(2L) shouldBe 1L
    out(10L) shouldBe 1L
  }

  test("minLabelComponents: refuses to return half-propagated labels when rounds run out") {
    // a 6-node path has diameter 5: one round cannot finish
    val und = (1L to 5L).map(i => (i, i + 1))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val init = (1L to 6L).toDF("node").withColumn("label", $"node")
    val e = intercept[IllegalArgumentException] {
      Graph.minLabelComponents(edges, init, maxRounds = 1)
    }
    e.getMessage should include("did not converge")
  }

  private def starCC(edges: Seq[(Long, Long)], nodes: Seq[Long],
                     maxRounds: Int = 30): Map[Long, Long] =
    Graph.alternatingStarComponents(
        edges.toDF("u", "v"), nodes.toDF("node"), maxRounds)
      .as[(Long, Long)].collect().toMap

  test("alternatingStarComponents: a 300-hop path converges in O(log n) rounds") {
    // diameter 300 — min-label's one-hop-per-round kernel would need 300
    // shuffle rounds; star contraction must finish inside 30 (~2 log n)
    val path = (0L until 300L).map(i => (i, i + 1))
    val out = starCC(path, 0L to 300L)
    out.values.toSet shouldBe Set(0L)
    out should have size 301
  }

  test("alternatingStarComponents: matches minLabelComponents on a seeded random graph") {
    val rnd = new scala.util.Random(1234)
    val nodes = (0L until 200L)
    val edges = Seq.fill(150)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    val star = starCC(edges, nodes)
    val sym = (edges ++ edges.map(_.swap)).toDF("src", "dst")
    val init = nodes.toDF("node").withColumn("label", $"node")
    val ml = Graph.minLabelComponents(sym, init, maxRounds = 200)
      .as[(Long, Long)].collect().toMap
    star shouldBe ml
  }

  test("alternatingStarComponents: isolated nodes, self-loops, duplicate edges") {
    // self-loops are dropped, duplicates collapse, node 9 never appears
    // in an edge and labels itself
    val out = starCC(Seq((2L, 1L), (1L, 2L), (2L, 2L), (1L, 2L), (3L, 2L)),
      Seq(1L, 2L, 3L, 9L))
    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L)
  }

  test("g05's chain graph: engine components match a driver-side union-find of the same edges") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val labels = Graph.alternatingStarComponents(
        Graph.docChainEdges(docs),
        docs.select($"doc_id".as("node")))
      .as[(Long, Long)].collect()
    // independent truth: sequential scan with the same md5 gate
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    var root = Map.empty[Long, Long]
    var cur = ids.head
    ids.foreach { i =>
      val hex = md.digest(i.toString.getBytes("UTF-8"))
        .take(1).map(b => f"$b%02x").mkString
      if (i == ids.head || hex == "ff" || !root.contains(i - 1)) cur = i
      root += i -> cur
    }
    labels.toMap shouldBe root
  }

  test("neighborJaccard: hand-computed intersections, unions, and the minInter filter") {
    // N(1)={2,3} N(2)={1,3,4} N(3)={1,2,4} N(4)={2,3}
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("u", "v")
    val out = Graph.neighborJaccard(edges, minInter = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    out((1L, 4L)) shouldBe ((2L, 2L, 1.0))   // identical neighborhoods
    out((2L, 3L)) shouldBe ((2L, 4L, 0.5))   // adjacency does not exclude
    out.size shouldBe 2                      // all inter=1 pairs filtered
  }

  test("kCore: pendant chain peels in cascading rounds, triangle survives as the 2-core") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val core = Graph.kCore(edges, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    core shouldBe Map(1L -> 2L, 2L -> 2L, 3L -> 2L) // 5 peels, THEN 4 peels
  }

  test("kCore: k above the densest core returns the empty graph, converged") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("u", "v")
    Graph.kCore(edges, k = 3).count() shouldBe 0L
  }

  test("kTruss: 4-clique survives k=4, lone triangle and pendant peel away") {
    // 4-clique {1,2,3,4} (every edge in 2 triangles), triangle {4,5,6}
    // (each edge in 1), pendant (6,7) (in none)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L)).toDF("u", "v")
    val t4 = Graph.kTruss(edges, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    t4 shouldBe Map((1L, 2L) -> 2L, (1L, 3L) -> 2L, (1L, 4L) -> 2L,
      (2L, 3L) -> 2L, (2L, 4L) -> 2L, (3L, 4L) -> 2L)
    // k=3 keeps every triangle edge (support >= 1), drops only the pendant
    val t3 = Graph.kTruss(edges, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    t3 shouldBe Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L))
  }

  test("kTruss: shared-edge triangle chain cascades to empty at k=4") {
    // T1={1,2,3}, T2={2,3,4}: edge (2,3) starts at support 2, but round 1
    // kills its support-1 companions, round 2 kills (2,3) — the cascade
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("u", "v")
    Graph.kTruss(edges, k = 4).count() shouldBe 0L
    // empty input converges immediately with the support column intact
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    val out = Graph.kTruss(empty, k = 4)
    out.columns.toSeq shouldBe Seq("u", "v", "support")
    out.count() shouldBe 0L
  }

  test("personalizedPagerankInt: teleport only to seeds; unreachable nodes never appear") {
    // star 0-{1,2,3,4} plus a disconnected pair {5,6}; seed = hub 0
    val edges = edgesOf((0L,1L),(1L,0L),(0L,2L),(2L,0L),(0L,3L),(3L,0L),
      (0L,4L),(4L,0L),(5L,6L),(6L,5L))
    val seeds = Seq(0L).toDF("node")
    // round 1: leaves get 850*(1e6 div 4)//1000 = 212500, hub keeps its
    // 150000 teleport; round 2: hub = 150000 + 850*850000//1000 = 872500,
    // leaves = 850*(150000 div 4)//1000 = 31875
    val r = Graph.personalizedPagerankInt(edges, seeds, 2)
      .as[(Long, Long)].collect().toMap
    r shouldBe Map(0L -> 872500L, 1L -> 31875L, 2L -> 31875L,
      3L -> 31875L, 4L -> 31875L)
    // nodes 5/6 carry mass in GLOBAL pagerank but never in this PPR
    Graph.pagerankInt(edges, 2).as[(Long, Long)].collect().toMap.keySet should contain (5L)
  }

  test("labelPropagation: two triangles with a bridge settle into their min-label communities") {
    // hand-unrolled: l1 = (1→2, 2→1, 3→1, 4→3, 5→4, 6→4),
    // l2 = (1→1, 2→1, 3→1, 4→4, 5→3, 6→3), l3/l4 stable at the split below
    val edges = Seq((1L,2L),(1L,3L),(2L,3L),(4L,5L),(4L,6L),(5L,6L),(3L,4L)).toDF("u", "v")
    val got = Graph.labelPropagation(edges, rounds = 4)
      .as[(Long, Long)].collect().toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L)
  }

  test("labelPropagation: synchronous sweeps are well-defined on an oscillating path") {
    // P3 cycles with period 2 under synchronous updates — the fixed shared
    // round count is what makes the gate deterministic; pin round 2 exactly
    val p3 = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    Graph.labelPropagation(p3, rounds = 2).as[(Long, Long)].collect().toMap shouldBe
      Map(1L -> 1L, 2L -> 2L, 3L -> 1L)
    // and round 1 pins the min-label TIE break (node 2 sees {1, 3}, counts equal)
    Graph.labelPropagation(p3, rounds = 1).as[(Long, Long)].collect().toMap shouldBe
      Map(1L -> 2L, 2L -> 1L, 3L -> 2L)
  }

  test("coPurchaseEdgesSupported drops pairs co-occurring in a single order") {
    val li = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),  // order 1: pairs (10,11) (10,12) (11,12)
      (2L, 10L), (2L, 11L),             // order 2: (10,11) again -> support 2
      (2L, 10L)                         // duplicate line must not double-count
    ).toDF("l_orderkey", "l_partkey")
    val got = Graph.coPurchaseEdgesSupported(li, minSupport = 2)
      .as[(Long, Long)].collect().toSet
    got shouldBe Set((10L, 11L))
  }

  test("bfsDistances: hop cap, multi-source min, symmetric edges, unreachable absent") {
    // path 0-1-2-3-4-5-6 plus an isolated pair 100-101
    val edges = ((0L to 5L).map(k => (k, k + 1)) :+ ((100L, 101L)))
      .toDF("u", "v")
    def run(seeds: Seq[Long], hops: Int): Map[Long, Long] =
      Graph.bfsDistances(edges, seeds.toDF("node"), hops)
        .as[(Long, Long)].collect().toMap
    // single seed at one end: the cap trims the horizon
    run(Seq(0L), 4) shouldBe Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L)
    // two seeds: every node takes the CLOSER one (the min fold)
    run(Seq(0L, 6L), 4) shouldBe Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L,
      4L -> 2L, 5L -> 1L, 6L -> 0L)
    // edges traverse BOTH ways even though stored one way
    run(Seq(6L), 2) shouldBe Map(6L -> 0L, 5L -> 1L, 4L -> 2L)
    // zero hops: the seed set itself
    run(Seq(3L), 0) shouldBe Map(3L -> 0L)
    // the isolated component never appears for main-path seeds
    run(Seq(0L), 16).contains(100L) shouldBe false
    an[IllegalArgumentException] should be thrownBy run(Seq(0L), 17)
  }

  test("linkPrediction: RA mass, non-edges only, hub discount") {
    // star around hub 0 (deg 4) plus a triangle tail: 1-2 are both
    // neighbors of 0 AND connected (existing edge -> excluded); 3-4
    // share only the hub; 5-6 share low-degree node 2
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (1L, 2L),
      (2L, 5L), (2L, 6L)).toDF("u", "v")
    val out = Graph.linkPrediction(edges, 1, 10)
      .select($"x", $"y", $"common", $"ra_score")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // deg: 0->4, 1->2, 2->4, 3->1, 4->1, 5->1, 6->1
    // 3-4 share hub 0 only: score = 10^6 div 4
    out((3L, 4L)) shouldBe ((1L, 250000L))
    // 5-6 share node 2 (deg 4): same mass as the hub here
    out((5L, 6L)) shouldBe ((1L, 250000L))
    // 1-3 share 0; 1-5 share 2: single-common pairs present at min 1
    out((1L, 3L)) shouldBe ((1L, 250000L))
    // 1-2 is an EXISTING edge: never predicted, despite 1 common nbr
    out.contains((1L, 2L)) shouldBe false
    // 3-5 share nothing: absent
    out.contains((3L, 5L)) shouldBe false
    // minCommon 2 keeps only pairs with >= 2 shared neighbors: none here
    Graph.linkPrediction(edges, 2, 10).count() shouldBe 0L
  }

  test("ssspWeighted: later-round improvement, parallel-edge min, edge budget") {
    // direct 0-1 costs 10; the detour 0-2-1 costs 2 but needs 2 edges
    val edges = Seq((0L, 1L, 10L), (0L, 2L, 1L), (2L, 1L, 1L)).toDF("u", "v", "w")
    def run(es: org.apache.spark.sql.DataFrame, seeds: Seq[Long], cap: Int) =
      Graph.ssspWeighted(es, seeds.toDF("node"), cap)
        .as[(Long, Long)].collect().toMap
    // 1-edge budget: the expensive direct edge is the only path to 1
    run(edges, Seq(0L), 1) shouldBe Map(0L -> 0L, 1L -> 10L, 2L -> 1L)
    // 2-edge budget: node 1 IMPROVES in round 2 via the cheap detour
    run(edges, Seq(0L), 2) shouldBe Map(0L -> 0L, 1L -> 2L, 2L -> 1L)
    // parallel edges collapse to the cheapest before any round
    run(edges.unionByName(Seq((0L, 1L, 3L)).toDF("u", "v", "w")), Seq(0L), 1) shouldBe
      Map(0L -> 0L, 1L -> 3L, 2L -> 1L)
    // multi-seed: each node takes the cheaper source; edges run both ways
    run(edges, Seq(1L, 2L), 1) shouldBe Map(0L -> 1L, 1L -> 0L, 2L -> 0L)
    // zero budget: seeds only
    run(edges, Seq(0L), 0) shouldBe Map(0L -> 0L)
    an[IllegalArgumentException] should be thrownBy run(edges, Seq(0L), 17)
  }

  test("hitsInt: exact integer masses, directed roles, duplicate collapse") {
    // hubs 1,2,3 point at authorities 10,11; hand-unrolled:
    //   h0 = 1 everywhere
    //   a1(10)=h(1)+h(2)=2, a1(11)=h(1)+h(3)=2
    //   h1(1)=a(10)+a(11)=4, h1(2)=2, h1(3)=2
    //   a2(10)=h(1)+h(2)=6,  a2(11)=6;  h2(1)=12, h2(2)=6, h2(3)=6
    val edges = edgesOf((1L,10L),(1L,11L),(2L,10L),(3L,11L))
    def masses(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    masses(Graph.hitsInt(edges, 1, 20)) shouldBe Map(
      ("auth", 10L) -> 2L, ("auth", 11L) -> 2L,
      ("hub", 1L) -> 4L, ("hub", 2L) -> 2L, ("hub", 3L) -> 2L)
    masses(Graph.hitsInt(edges, 2, 20)) shouldBe Map(
      ("auth", 10L) -> 6L, ("auth", 11L) -> 6L,
      ("hub", 1L) -> 12L, ("hub", 2L) -> 6L, ("hub", 3L) -> 6L)
    // parallel duplicate edges collapse before any round: same answer
    masses(Graph.hitsInt(edges.unionByName(edgesOf((1L, 10L))), 2, 20)) shouldBe
      masses(Graph.hitsInt(edges, 2, 20))
    // direction matters: pure sinks are never hubs, pure sources never auths
    val roles = Graph.hitsInt(edges, 1, 20)
      .as[(String, Long, Long)].collect().groupBy(_._1)
    roles("hub").map(_._2).toSet shouldBe Set(1L, 2L, 3L)
    roles("auth").map(_._2).toSet shouldBe Set(10L, 11L)
    // top-k truncates per role independently
    val k1 = Graph.hitsInt(edges, 1, 1).as[(String, Long, Long)].collect()
    k1.length shouldBe 2
    k1.map(r => r._1 -> r._2).toMap shouldBe Map("hub" -> 1L, "auth" -> 10L)
    an[IllegalArgumentException] should be thrownBy Graph.hitsInt(edges, 0, 20)
  }

  test("modularity: exact integer Q contributions on two bridged triangles") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6} joined by the bridge 3-4
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L)).toDF("u", "v")
    val out = Graph.modularity(und, rounds = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    val labels = Graph.labelPropagation(und, 4)
      .as[(Long, Long)].collect().toMap
    // recompute every contribution from (edges, labels) independently
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val m = edges.length.toLong
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (n, xs) => n -> xs.length.toLong }
    val byLabel = labels.groupBy(_._2)
    val expected = byLabel.toSeq.map { case (lab, members) =>
      val nodes = members.keySet
      val mIn = edges.count(e => nodes(e._1) && nodes(e._2)).toLong
      val dTot = nodes.toSeq.map(deg).sum
      (lab, nodes.size.toLong, mIn, dTot, 4L * m * mIn - dTot * dTot)
    }.sortBy(_._1)
    out.toSeq shouldBe expected
    // conservation laws: degrees partition 2m; intra-edges never exceed m
    out.map(_._4).sum shouldBe 2 * m
    out.map(_._3).sum should be <= m
    // the contribution identity holds row-wise
    out.foreach { case (_, _, mIn, dTot, q) => q shouldBe 4 * m * mIn - dTot * dTot }
    // and the partition found here is genuinely modular (Q > 0)
    out.map(_._5).sum should be > 0L
  }

  test("assortativity: star is disassortative, cycle neutral, moments exact") {
    import spark.implicits._
    def moments(pairs: (Long, Long)*) = {
      val r = Graph.assortativity(pairs.toDF("u", "v")).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6))
    }
    // star K_{1,3}: hub degree 3 meets leaves of degree 1 on every edge
    val star = moments((0L, 1L), (0L, 2L), (0L, 3L))
    // ends: 6; per direction dx·dy = 3; Σx = 3·(3+1) = 12; Σx² = 3·(9+1) = 30
    star shouldBe ((6L, 18L, 12L, 30L, 6 * 18 - 12 * 12, 6 * 30 - 12 * 12,
      "disassortative"))
    star._5 should be < 0L
    // 4-cycle: all degrees 2 — zero variance, r_num = r_den = 0, neutral
    val cyc = moments((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    (cyc._5, cyc._6, cyc._7) shouldBe ((0L, 0L, "neutral"))
    // two disjoint edges + a triangle: like links to like -> assortative
    val mixed = moments((1L, 2L), (3L, 4L), (5L, 6L), (6L, 7L), (5L, 7L))
    mixed._7 shouldBe "assortative"
    mixed._5 should be > 0L
  }

  test("basketLift: lift ranks a rare-but-correlated pair above a popular one") {
    import spark.implicits._
    // x,y co-occur whenever either appears (perfect association, rare);
    // p,q are popular but only loosely associated
    val baskets = Seq(
      (1L, 100L), (1L, 200L),           // x=100, y=200 together
      (2L, 100L), (2L, 200L),
      (3L, 10L), (3L, 20L),             // p=10, q=20 together (3 times)
      (4L, 10L), (4L, 20L),
      (5L, 10L), (5L, 20L),
      (6L, 10L), (7L, 20L)              // ...but each also appears alone
    ).toDF("basket", "item")
    val out = Graph.basketLift(baskets, k = 10, minBaskets = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // N = 7 baskets; x,y: c=2 each, together 2 -> lift = 7·2/4 = 3.5
    out((100L, 200L)) shouldBe ((2L, 2L, 2L, 3500L, 1000L))
    // p,q: c=4 each, together 3 -> lift = 7·3/16 = 1.3125 -> 1312 milli
    out((10L, 20L)) shouldBe ((3L, 4L, 4L, 1312L, 750L))
    // the lift order INVERTS the raw co-occurrence order — the metric's point
    val ranked = Graph.basketLift(baskets, k = 10, minBaskets = 2L)
      .select($"a", $"b").as[(Long, Long)].collect().toSeq
    ranked.indexOf((100L, 200L)) should be < ranked.indexOf((10L, 20L))
  }

  test("localClustering: triangle + pendant, then two triangles sharing an edge") {
    // K3 {1,2,3} plus pendant 3-4: node 4 (deg 1) is excluded, nodes
    // 1/2 close their only wedge (lcc 1000), node 3 closes 1 of 3
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val out = Graph.localClustering(tri).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L)
    out(1L) shouldBe ((2L, 1L, 1000L))
    out(2L) shouldBe ((2L, 1L, 1000L))
    out(3L) shouldBe ((3L, 1L, 333L))
    // K4 minus (1,4): triangles (1,2,3) and (2,3,4) — shared-edge nodes
    // 2/3 carry tri=2 over 3 wedges, outer nodes 1/4 are fully clustered
    val bow = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("u", "v")
    val out2 = Graph.localClustering(bow).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out2(1L) shouldBe ((2L, 1L, 1000L))
    out2(4L) shouldBe ((2L, 1L, 1000L))
    out2(2L) shouldBe ((3L, 2L, 666L))
    out2(3L) shouldBe ((3L, 2L, 666L))
    // triangle-free star: every wedge open, lcc exactly 0 (rows, not absence)
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("u", "v")
    val out3 = Graph.localClustering(star).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    out3 shouldBe Map(0L -> 0L)
  }

  test("rectangleCensus: the halved diagonal-pair sum is the exact C4 count") {
    // a single 4-cycle: 4 wedges, two diagonal pairs with 2 centers
    // each -> sum C(2,2) = 2, halved = 1 rectangle
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val r1 = Graph.rectangleCensus(c4).as[(Long, Long, Long)].head()
    r1 shouldBe ((4L, 4L, 1L))
    // K4 has exactly 3 four-cycles (each pair of disjoint edges)
    val k4 = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)).toDF("u", "v")
    Graph.rectangleCensus(k4).as[(Long, Long, Long)].head()._3 shouldBe 3L
    // a triangle has wedges but no 4-cycles
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    Graph.rectangleCensus(tri).as[(Long, Long, Long)].head()._3 shouldBe 0L
  }

  test("coreness: nested cores sum exactly; the cap binds on K5") {
    // K4 {1,2,3,4} + pendant 4-5: K4 members have coreness 3 (each has
    // degree 3 inside K4 -> 3-core, no 4-core), the pendant 1
    val k4 = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)) :+ ((4L, 5L))
    val out = Graph.coreness(k4.toDF("u", "v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 1L)
    // K6: true coreness 5, the maxK=4 sweep reports the honest cap
    val k6 = (for { a <- 1L to 6L; b <- (a + 1) to 6L } yield (a, b)).toDF("u", "v")
    Graph.coreness(k6).collect().map(_.getLong(1)).toSet shouldBe Set(4L)
    // chain: everyone peels at k=2 -> coreness 1 across the board
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    Graph.coreness(chain).collect().map(_.getLong(1)).toSet shouldBe Set(1L)
  }

  test("sccLocal: doubling horizon equals an independent 16-hop FW-BW recompute") {
    val ids = (0L to 60L)
    val docs = ids.toDF("doc_id")
    val out = Graph.sccLocal(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    out.map(_._1).toSeq shouldBe ids
    // independent recompute: same md5 gates, BFS to 16 hops, mutual reach
    def md5hex(n: Long): String = java.security.MessageDigest.getInstance("MD5")
      .digest(n.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val idSet = ids.toSet
    val edges = ids.flatMap { u =>
      val fwd = if (idSet(u + 1) && md5hex(u).take(2) != "ff")
        Seq(u -> (u + 1)) else Nil
      val back = if (idSet(u - 4) && md5hex(u).take(1) == "a")
        Seq(u -> (u - 4)) else Nil
      fwd ++ back
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def reach(u: Long): Set[Long] = {
      var cur = Set(u); var seen = Set(u)
      for (_ <- 1 to 16) {
        cur = cur.flatMap(n => edges.getOrElse(n, Set.empty)) -- seen
        seen ++= cur
      }
      seen
    }
    val fwd = ids.map(u => u -> reach(u)).toMap
    val expLabel = ids.map { u =>
      u -> fwd(u).filter(m => fwd(m).contains(u)).min
    }.toMap
    val expSize = expLabel.values.groupBy(identity).map { case (l, g) => l -> g.size }
    out.foreach { case (node, label, size, cyc) =>
      label shouldBe expLabel(node)
      size shouldBe expSize(label).toLong
      cyc shouldBe (size > 1)
    }
    // the graph is non-trivial in both directions at this seed range:
    // at least one real cycle and at least one singleton
    out.exists(_._4) shouldBe true
    out.exists(!_._4) shouldBe true
  }

  test("degreeProfile: log2 bins exact on a star; totals conserve nodes") {
    // star K1,5: hub degree 5 (bin 2), five leaves degree 1 (bin 0)
    val star = (1L to 5L).map(l => (0L, l)).toDF("u", "v")
    val out = Graph.degreeProfile(star).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out shouldBe Map(0L -> ((5L, 1L, 1L)), 2L -> ((1L, 5L, 5L)))
    // bin boundaries: degree 2^b lands in bin b (half-open intervals)
    val k3 = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v") // all deg 2
    Graph.degreeProfile(k3).collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
  }
}
