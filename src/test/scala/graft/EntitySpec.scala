package graft

import graft.operators.Entity

/** Deletion-neighborhood entity resolution (SymSpell blocking): the
  * candidate equi-join must find exactly the Levenshtein-distance ≤ 1
  * pairs — substitutions, insertions, deletions — and nothing past 1.
  */
class EntitySpec extends SparkSpec {
  import spark.implicits._

  private def names(rows: (Long, String)*) = rows.toDF("id", "name")

  private def pairs(d: org.apache.spark.sql.DataFrame) =
    Entity.fuzzyPairs(d, "id", "name").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getAs[Long]("dist")))

  test("finds substitution, insertion, and deletion neighbors; skips distance 2") {
    val out = pairs(names(
      1L -> "smith",
      2L -> "smyth",   // substitution: dist 1 of smith
      3L -> "smiths",  // insertion: dist 1 of smith, dist 2 of smyth
      4L -> "smit",    // deletion: dist 1 of smith, dist 2 of smit(h)s
      5L -> "jones"))  // unrelated
    out.toSet shouldBe Set((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L))
  }

  test("identical names pair at distance 0") {
    val out = pairs(names(1L -> "acme", 2L -> "acme"))
    out.toSeq shouldBe Seq((1L, 2L, 0L))
  }

  test("empty and single-char names are safe (no sequence(1,0) junk variants)") {
    // sequence(1, 0) descends [1, 0] in Spark: unguarded, an empty name
    // would explode into negative-length-substr variants
    val out = pairs(names(1L -> "", 2L -> "a", 3L -> "b", 4L -> "ab"))
    // "" ↔ "a", "" ↔ "b" (insertion), "a" ↔ "b" (substitution),
    // "a" ↔ "ab" and "b" ↔ "ab" (insertion); "" ↔ "ab" is distance 2
    out.toSet shouldBe Set(
      (1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L), (2L, 4L, 1L), (3L, 4L, 1L))
  }

  test("matches a brute-force levenshtein scan on the customer fixture") {
    val c = table("customer").select($"c_custkey".as("id"), $"c_name".as("name"))
    val blocked = pairs(c).toSet
    val brute = c.as("a").join(c.as("b"),
        $"a.id" < $"b.id" &&
          org.apache.spark.sql.functions.levenshtein($"a.name", $"b.name") <= 1)
      .select($"a.id", $"b.id",
        org.apache.spark.sql.functions.levenshtein($"a.name", $"b.name")
          .cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    blocked shouldBe brute
    blocked should not be empty
  }

  test("resolveEntities: transitive matches share one entity id; strangers keep their own") {
    val d = names(
      1L -> "smith",
      2L -> "smyth",    // dist 1 of smith
      3L -> "smythe",   // dist 1 of smyth, dist 2 of smith -> same entity transitively
      4L -> "jones",
      5L -> "smith")    // exact duplicate of 1
    val out = Entity.resolveEntities(d, "id", "name", minJw = 0.0).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    out(1L) shouldBe 1L
    out(2L) shouldBe 1L
    out(3L) shouldBe 1L   // via the smyth bridge: needs >= 2 propagation rounds
    out(4L) shouldBe 4L
    out(5L) shouldBe 1L   // same name, same entity
  }

  test("resolveEntities: the Jaro-Winkler floor severs low-similarity lev-1 edges") {
    // "ab" ~ "b" is lev 1 but jaro-winkler 0 (no common prefix weighting
    // rescues a half-empty match); a strict floor must keep them apart
    val d = names(1L -> "ab", 2L -> "b")
    val strict = Entity.resolveEntities(d, "id", "name", minJw = 0.9).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    strict(1L) should not be strict(2L)
    val loose = Entity.resolveEntities(d, "id", "name", minJw = 0.0).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    loose(1L) shouldBe loose(2L)
  }

  test("resolveEntities: every record appears exactly once with its own name") {
    val c = table("customer").select($"c_custkey".as("id"), $"c_name".as("name"))
    val out = Entity.resolveEntities(c, "id", "name")
    out.count() shouldBe c.count()
    out.select($"id").distinct().count() shouldBe c.count()
    // entity ids are real record ids, and each entity contains its label record
    out.where($"entity_id" > $"id").count() shouldBe 0L
  }

  test("blockingReport: hand-checkable reduction and precision on a 4-name universe") {
    // names: ab, ac, ad, xy -> total pairs C(4,2)=6
    // delete-1 candidates: {ab,ac,ad} pairwise share variant "a" -> 3
    // candidate pairs; xy shares nothing. All 3 verify at lev 1.
    val rows = Seq((1L, "ab"), (2L, "ac"), (3L, "ad"), (4L, "xy"), (5L, "ab"))
      .toDF("id", "name")
    val r = Entity.blockingReport(rows, "name").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((4L, 6L, 3L, 3L))
    r.getLong(4) shouldBe 500000L  // (6-3)*1e6 div 6
    r.getLong(5) shouldBe 1000000L // 3/3 candidates verify
  }

  test("soundexKey: classic anchors, adjacent-code collapse, zero padding, our H/W variant") {
    val rows = Seq("Robert", "Rupert", "Pfister", "Tymczak", "ray", "Ashcraft")
      .toDF("w").select($"w", Entity.soundexKey($"w").as("k"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    rows("Robert") shouldBe "R163"
    rows("Rupert") shouldBe "R163"  // sound-alikes share the key
    rows("Pfister") shouldBe "P236" // adjacent 1,1 collapses
    rows("Tymczak") shouldBe "T522" // vowel-separated 2,2 does NOT collapse
    rows("ray") shouldBe "R000"     // all-vowel tail zero-pads
    // the SQL-Server variant deliberately skips H/W bridging: genealogy
    // soundex gives A261 here, ours keeps the post-h code run intact
    rows("Ashcraft") shouldBe "A226"
  }

  test("phoneticPairs: buckets sound-alikes present in the corpus; never invents words") {
    // the operator is PURE — it pairs only words that actually occur
    // (gate-side twin seeding is SparkEntry's concern, not the API's)
    val bare = Seq((1L, "batch scan xyz")).toDF("doc_id", "text")
    Entity.phoneticPairs(bare, "text", 2).count() shouldBe 0L
    val docs = Seq(
      (1L, "batch scan xyz"),
      (2L, "betch scen robert rupert")).toDF("doc_id", "text")
    val out = Entity.phoneticPairs(docs, "text", 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    out should contain allOf (
      ("B320", "batch", "betch", 1L),
      ("S500", "scan", "scen", 1L),
      ("R163", "robert", "rupert", 2L))
    out.map(_._2) should not contain "xyz" // bucket partner-less
  }

  private def tfidfPairs(d: org.apache.spark.sql.DataFrame,
                         minCos: Double, maxDf: Long = 128) =
    Entity.tfidfCosinePairs(d, "id", "name", minCos, maxDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("tfidfCosinePairs: integer-idf cosine matches the hand formula exactly") {
    val d = names(
      1L -> "acme corp inc",
      2L -> "acme corporation inc",
      3L -> "zeta gmbh",
      4L -> "acme corp ltd")
    // dfs: acme=3 (w=333333), corp=2 (500000), inc=2 (500000),
    // corporation/ltd/gmbh/zeta=1 (1000000)
    val wAcme = 1000000L / 3; val wHalf = 500000L; val wFull = 1000000L
    def cos(num: Long, na: Long, nb: Long) =
      BigDecimal(num / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n1 = wAcme * wAcme + 2 * wHalf * wHalf
    val n2 = wAcme * wAcme + wFull * wFull + wHalf * wHalf
    val n4 = wAcme * wAcme + wHalf * wHalf + wFull * wFull
    val out = tfidfPairs(d, minCos = 0.05)
    out.toSet shouldBe Set(
      (1L, 2L, cos(wAcme * wAcme + wHalf * wHalf, n1, n2)),
      (1L, 4L, cos(wAcme * wAcme + wHalf * wHalf, n1, n4)),
      (2L, 4L, cos(wAcme * wAcme, n2, n4)))
  }

  test("tfidfCosinePairs: df cap drops stopword tokens from pairing AND norms") {
    val d = names(
      1L -> "inc alpha", 2L -> "inc beta", 3L -> "inc gamma", 4L -> "inc alpha")
    // maxDf=3: 'inc' (df=4) is dropped everywhere, so only the exact
    // rare-token twin survives — at cos 1.0, its full remaining vector
    val out = tfidfPairs(d, minCos = 0.5, maxDf = 3)
    out.toSeq shouldBe Seq((1L, 4L, 1.0))
    // uncapped, 'inc' links every pair but contributes little weight:
    // the shared-stopword-only pairs sit far below the twin
    val all = tfidfPairs(d, minCos = 0.01, maxDf = 128)
    all.map(p => (p._1, p._2)).toSet shouldBe
      Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    all.find(p => (p._1, p._2) == (1L, 4L)).get._3 shouldBe 1.0
    all.filter(p => (p._1, p._2) != ((1L, 4L))).map(_._3).max should be < 0.2
  }

  test("goldenRecords: every survivorship rule and its tie-break, hand-computed") {
    val recs = Seq(
      // entity 1: name-length tie -> lex min; nation mode 7; crm segment
      // wins despite higher web ids; max balance from a web member
      (1L, "Alexander", 5L, "AUTO", 100L, "crm"),
      (2L, "Alexandre", 7L, "BIKE", 250L, "web"),
      (3L, "Alexander", 7L, "CAR", 50L, "web"),
      // entity 4: nation count tie -> min nation; all-web -> min id segment
      (4L, "Bob", 2L, "S1", 5L, "web"),
      (5L, "Bobb", 1L, "S2", 7L, "web"),
      // singleton passes through
      (9L, "Zoe", 3L, "X", 10L, "web"))
      .toDF("id", "name", "nation", "segment", "bal_cents", "src")
    val ents = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (9L, 9L))
      .toDF("id", "entity_id")
    val out = Entity.goldenRecords(recs, ents).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    out(1L) shouldBe (("Alexander", 7L, "AUTO", 250L, 3L, 1L))
    out(4L) shouldBe (("Bobb", 1L, "S1", 7L, 2L, 4L))
    out(9L) shouldBe (("Zoe", 3L, "X", 10L, 1L, 9L))
  }

  test("sortedNeighborhoodPairs: window on the key order, verify filter, determinism") {
    // key order: (a, 1) (a, 3) (b, 2) (b, 5) (c, 4) — the window crosses
    // key-block boundaries (the SNM point: ONE sorted pass, not per-block)
    val d = Seq(
      (1L, "anna", "a"), (3L, "anne", "a"), (2L, "bob", "b"),
      (5L, "rob", "b"), (4L, "ann", "c"))
      .toDF("id", "name", "key")
    def run(w: Int, dmax: Int) =
      Entity.sortedNeighborhoodPairs(d, "id", "name", "key", w, dmax)
        .select("a_id", "b_id", "dist")
        .as[(Long, Long, Long)].collect().toSet
    // window 2: only rank-adjacent pairs; anna~anne dist 1, bob~rob dist 1
    run(2, 1) shouldBe Set((1L, 3L, 1L), (2L, 5L, 1L))
    // window 3 adds rank-distance-2 candidates (anna~bob, anne~rob,
    // bob~ann) but the distance verify rejects them all
    run(3, 2) shouldBe Set((1L, 3L, 1L), (2L, 5L, 1L))
    // the full window reaches across blocks: anna~ann and anne~ann
    // (ranks 4 and 3 apart) surface only now
    run(5, 2) shouldBe Set((1L, 3L, 1L), (2L, 5L, 1L), (1L, 4L, 1L), (3L, 4L, 1L))
    an[IllegalArgumentException] should be thrownBy run(1, 1)
    an[IllegalArgumentException] should be thrownBy run(2, -1)
  }

  test("tfidfCosinePairs: candidate join is an equi-join (no cartesian / BNLJ)") {
    val d = names(1L -> "a b", 2L -> "b c", 3L -> "c d")
    val plan = Entity.tfidfCosinePairs(d, "id", "name", 0.1)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("erQuality: tp/fp/fn and the ppm ratios are exact set arithmetic") {
    import spark.implicits._
    val pairs = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("a_id", "b_id")
    val truth = Seq((1L, 10L), (2L, 20L), (5L, 50L)).toDF("a_id", "b_id")
    val r = Entity.erQuality(pairs, truth).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe ((2L, 2L, 1L))
    r.getLong(5) shouldBe 500000L  // precision 2/4
    r.getLong(6) shouldBe 666666L  // recall 2/3, floored
    // degenerate: empty pairs -> zero tp, full fn, precision guards
    val r0 = Entity.erQuality(pairs.where($"a_id" > 100), truth)
      .collect().head
    (r0.getLong(0), r0.getLong(2), r0.getLong(5)) shouldBe ((0L, 3L, 0L))
  }
}
