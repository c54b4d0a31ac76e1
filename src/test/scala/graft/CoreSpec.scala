package graft

import org.apache.spark.sql.functions._
import graft.operators.Core

class CoreSpec extends SparkSpec {
  import spark.implicits._

  test("pricingSummary aggregates per (returnflag, linestatus)") {
    val li = Seq(
      ("A", "F", 10.0, 100.0, 0.1),
      ("A", "F", 20.0, 200.0, 0.0),
      ("N", "O", 5.0, 50.0, 0.2)
    ).toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount")
    val rows = Core.pricingSummary(li).collect()
    rows.length shouldBe 2
    val af = rows.head
    af.getAs[String]("l_returnflag") shouldBe "A"
    af.getAs[Double]("sum_qty") shouldBe 30.0
    af.getAs[Double]("sum_base_price") shouldBe 300.0
    af.getAs[Double]("sum_disc_price") shouldBe (100.0 * 0.9 + 200.0)
    af.getAs[Long]("count_order") shouldBe 2L
  }

  test("distinctValues dedupes and sorts") {
    val df = Seq("b", "a", "b", "c", "a").toDF("v")
    Core.distinctValues(df, "v").as[String].collect() shouldBe Array("a", "b", "c")
  }

  test("extent computes min/max/count per key") {
    val df = Seq(
      ("x", "2020-01-01 00:00:00"), ("x", "2020-03-01 00:00:00"), ("y", "2020-02-01 00:00:00")
    ).toDF("k", "t").withColumn("t", $"t".cast("timestamp_ntz"))
    val r = Core.extent(df, "k", "t").collect()
    r.map(_.getString(0)) shouldBe Array("x", "y")
    r(0).get(1).toString should startWith("2020-01-01")
    r(0).get(2).toString should startWith("2020-03-01")
    r(0).getLong(3) shouldBe 2L
  }

  test("rangeFilter keeps only the 2-D box (bbox pushdown analog)") {
    val df = (1 to 100).map(i => (i.toDouble / 100, (101 - i).toDouble / 100, i, 1))
      .toDF("l_discount", "l_quantity", "l_orderkey", "l_linenumber")
    val out = Core.rangeFilter(df, "l_discount", 0.2, 0.4, "l_quantity", 0.5, 0.7,
      Seq("l_orderkey", "l_linenumber")).collect()
    all(out.map(_.getDouble(0))) should (be >= 0.2 and be <= 0.4)
    all(out.map(_.getDouble(1))) should (be >= 0.5 and be <= 0.7)
    out.map(_.getInt(2)).toSeq shouldBe out.map(_.getInt(2)).toSeq.sorted
  }

  test("regexLimit is the wgrib2 -match/-limit analog") {
    val df = (1 to 50).map(i => (i.toLong, if (i % 10 == 0) s"TMP level $i" else s"UGRD level $i"))
      .toDF("doc_id", "text")
    val out = Core.regexLimit(df, "text", "^TMP", 3, "doc_id").collect()
    out.length shouldBe 3
    out.map(_.getLong(0)) shouldBe Array(10L, 20L, 30L)
  }

  test("accumulationDiff = lag subtraction per partition key (J2)") {
    val df = Seq(
      (1L, "2020-01-01 00:00:00", 1L, 10.0),
      (1L, "2020-02-01 00:00:00", 2L, 25.0),
      (1L, "2020-03-01 00:00:00", 3L, 45.0),
      (2L, "2020-01-01 00:00:00", 4L, 7.0)
    ).toDF("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      .withColumn("o_orderdate", $"o_orderdate".cast("timestamp_ntz"))
    val out = Core.accumulationDiff(df, "o_custkey", Seq("o_orderdate", "o_orderkey"), "o_totalprice")
      .collect()
    out.map(r => Option(r.getAs[java.lang.Double]("diff")).map(_.doubleValue)) shouldBe
      Array(None, Some(15.0), Some(20.0), None)
  }

  test("unionAccounts unions by name then aggregates") {
    val c = Seq((1L, 10.0), (2L, 20.0)).toDF("c_custkey", "c_acctbal")
    val s = Seq((1L, 5.0)).toDF("s_suppkey", "s_acctbal")
    val out = Core.unionAccounts(c, s).collect()
    out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))) shouldBe
      Array(("customer", 2L, 30.0), ("supplier", 1L, 5.0))
  }

  test("nextAfter finds the min element strictly after the cutoff (oscar.js find analog)") {
    val df = Seq(
      (1L, "2020-01-01 00:00:00"), (1L, "2020-06-01 00:00:00"), (1L, "2020-09-01 00:00:00")
    ).toDF("k", "t").withColumn("t", $"t".cast("timestamp_ntz"))
    val out = Core.nextAfter(df, "k", "t", "2020-05-31 00:00:00").collect()
    out.length shouldBe 1
    out(0).get(1).toString should startWith("2020-06-01")
    out(0).getLong(2) shouldBe 2L
  }

  test("antiJoin returns rows with no match (NOT EXISTS)") {
    val cust = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("c_custkey", "c_name", "c_acctbal")
    val ord = Seq(Tuple1(2L)).toDF("o_custkey")
    Core.antiJoin(cust, ord, "c_custkey", "o_custkey", Seq("c_custkey", "c_name", "c_acctbal"))
      .as[(Long, String, Double)].collect().map(_._1) shouldBe Array(1L, 3L)
  }

  test("rollup on sf0.001: ALL/ALL row equals the sum of leaf rows") {
    val out = Core.revenueRollup(table("lineitem"), table("orders"), table("customer"),
      table("nation"), table("region")).collect()
    val all = out.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    all.length shouldBe 1
    val leaves = out.filter(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
    val sumLeaves = leaves.map(_.getDouble(2)).sum
    math.abs(all(0).getDouble(2) - sumLeaves) should be < 1e-4 * math.abs(sumLeaves)
  }

  test("topKPerGroup keeps at most k rows per brand, revenue-descending") {
    val out = Core.topKPerGroup(table("lineitem"), table("part"), 3).collect()
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      rows.length should be <= 3
      val revs = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      revs.toSeq shouldBe revs.sorted(Ordering[Double].reverse).toSeq
    }
  }

  test("semiJoinRegion matches a manual nationkey filter") {
    val expected = {
      val nk = table("nation").join(table("region"),
          $"n_regionkey" === $"r_regionkey").where($"r_name" === "AFRICA")
        .select($"n_nationkey").as[Long].collect().toSet
      table("supplier").where($"s_nationkey".isin(nk.toSeq: _*)).count()
    }
    Core.semiJoinRegion(table("supplier"), table("nation"), table("region"), "AFRICA")
      .count() shouldBe expected
  }

  test("decileStats: the arithmetic tile rule reproduces Spark's own ntile bitwise") {
    import org.apache.spark.sql.expressions.Window
    val o = table("orders")
    val direct = o.select(
        (o("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        o("o_orderkey"))
      .withColumn("tile",
        ntile(10).over(Window.orderBy($"cents", $"o_orderkey")).cast("long"))
      .groupBy($"tile")
      .agg(count(lit(1)).as("n"), min($"cents").as("min_cents"),
        max($"cents").as("max_cents"), sum($"cents").as("sum_cents"))
      .orderBy($"tile")
      .collect().toSeq
    Core.decileStats(o).collect().toSeq shouldBe direct
  }

  test("decileStats: tile sizes follow the first-m-get-one-extra rule at awkward n/b splits") {
    // 9 rows into 6 tiles: sizes must be 2,2,2,1,1,1 (NOT the Bresenham
    // spread 2,1,2,1,2,1 an equal-width rank formula would produce)
    val nine = (1L to 9L).map(i => (i, i * 100.0)).toDF("o_orderkey", "o_totalprice")
    val sizes = Core.decileStats(nine, buckets = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sizes shouldBe Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L, 6L -> 1L)
  }

  test("groupingSetsSummary: exactly the requested sets — the ROLLUP-impossible skip holds") {
    val out = Core.groupingSetsSummary(table("orders")).collect()
    val markers = out.map(r => (r.getLong(4), r.getLong(5))).toSet
    // sets: (pri,status)->(0,0), (status)->(1,0), ()->(1,1).
    // (0,1) = "priority only" was SKIPPED and must not appear
    markers shouldBe Set((0L, 0L), (1L, 0L), (1L, 1L))
    // grand total row counts every order
    val total = out.filter(r => r.getLong(4) == 1L && r.getLong(5) == 1L)
    total should have length 1
    total.head.getLong(2) shouldBe table("orders").count()
  }

  test("t31 gate: canonical form folds host case and strips query/fragment") {
    val out = SparkEntry.queries("t31_url_canon")(spark, sf0001).limit(5).collect()
    all(out.map(_.getAs[String]("canonical"))) should include(".example.com/docs/")
    out.foreach { r =>
      r.getAs[String]("canonical") should not include "?"
      r.getAs[String]("canonical") should not include "#"
      r.getAs[String]("host") should include(".Example.COM")  // parse preserves case
      r.getAs[String]("lang_param") should fullyMatch regex "[a-z]{2}"
    }
  }

  test("madOutliers: doubled medians exact at odd and even n; the 3-MAD rule flags only the spike") {
    import spark.implicits._
    val rows = Seq(
      ("A", 10L), ("A", 20L), ("A", 30L), ("A", 40L), ("A", 1000L), // n=5
      ("B", 10L), ("B", 20L), ("B", 30L), ("B", 40L))               // n=4
      .toDF("seg", "cents")
    val out = Core.madOutliers(rows, "seg", $"cents")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // A: median 30 -> med2 60; devs(2v-60) 40,20,0,20,1940 -> mad2 20+20=40
    //    outlier rule 2*dev > 120 -> only the 1000-cent spike (dev 1940)
    out("A") shouldBe ((5L, 60L, 40L, 1L, 1940L))
    // B even n: med2 = 20+30 = 50 (exact midpoint, no float interpolation);
    //    devs 30,10,10,30 -> mad2 = 10+30 = 40; nothing beyond 3 MAD
    out("B") shouldBe ((4L, 50L, 40L, 0L, 0L))
  }

  test("madOutliers: duplicate-heavy groups (histogram c > 1) bracket the k-th correctly") {
    import spark.implicits._
    // 7 copies of 5 plus one 100: k1=k2=4 falls INSIDE the 5-run
    val rows = (Seq.fill(7)(5L) :+ 100L).map(("G", _)).toDF("seg", "cents")
    val out = Core.madOutliers(rows, "seg", $"cents").collect().head
    out.getLong(2) shouldBe 10L  // med2 = 2*5
    // devs: 0 x7, 190 -> mad2 = 0; rule 2*dev > 0 flags the single spike
    out.getLong(3) shouldBe 0L
    out.getLong(4) shouldBe 1L
  }

  test("weightedMedian: 50%-of-mass pick, exact at boundary and with duplicate values") {
    val rows = Seq(
      // A: weights 1,1,6 on values 10,20,30 -> half of 8 reached at v=30
      ("A", 10L, 1L), ("A", 20L, 1L), ("A", 30L, 6L),
      // B: 2*cumw == totw exactly at v=1 (boundary: >= keeps the LOWER value)
      ("B", 1L, 5L), ("B", 2L, 5L),
      // C: duplicate values must collapse into one histogram row first
      ("C", 7L, 1L), ("C", 7L, 1L), ("C", 9L, 1L))
      .toDF("g", "v", "w")
    val out = Core.weightedMedian(rows, "g", $"v", $"w")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    out("A") shouldBe ((3L, 8L, 30L))
    out("B") shouldBe ((2L, 10L, 1L))
    out("C") shouldBe ((3L, 3L, 7L))
  }

  test("winsorizedSum: integer p10/p90 cuts clamp the tails; duplicates collapse first") {
    val a = (1L to 10L).map(("A", _))                 // k_lo=1 -> cut 1, k_hi=9 -> cut 9
    val b = (Seq.fill(7)(5L) :+ 100L).map(("B", _))   // k_lo=1 -> 5, k_hi=8 -> 100 (no clamp)
    val out = Core.winsorizedSum((a ++ b).toDF("g", "cents"), "g", $"cents")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    out("A") shouldBe ((10L, 1L, 9L, 54L)) // 1..9 sum 45, 10 clamps to 9
    out("B") shouldBe ((8L, 5L, 100L, 135L))
  }

  test("modeTop1: most frequent wins, count ties break toward the smallest value") {
    val rows = Seq(
      ("u1", "b"), ("u1", "b"), ("u1", "a"),          // clear winner b
      ("u2", "z"), ("u2", "a"),                       // tie 1-1 -> a
      ("u3", "x")).toDF("u", "v")
    val out = Core.modeTop1(rows, "u", "v")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    out("u1") shouldBe (("b", 2L, 2L))
    out("u2") shouldBe (("a", 1L, 2L))
    out("u3") shouldBe (("x", 1L, 1L))
  }

  test("analyzeStats: native-order bounds, 16-char truncation, null accounting") {
    val df = Seq(
      (2L, Option("hello"), Option("x" * 40)),
      (10L, None, Option("abc")),
      (10L, Option("zz"), None))
      .toDF("n", "s", "big")
    val out = Core.analyzeStats(df, Seq("n", "s", "big")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5), r.getLong(6)))).toMap
    // numeric min/max run BEFORE the cast: 2 < 10 even though "10" < "2"
    out("n") shouldBe ((3L, 0L, 2L, "2", "10", 5L))
    out("s") shouldBe ((3L, 1L, 2L, "hello", "zz", 7L))
    // a 40-char value truncates to 16 in the bounds but counts fully in total_len
    val (_, bigNulls, _, bigMin, bigMax, bigLen) = out("big")
    bigNulls shouldBe 1L
    bigMin shouldBe "abc"
    bigMax shouldBe "x" * 16
    bigLen shouldBe 43L
    // an all-null column: ndv 0, bounds null, total_len coalesces to 0
    val allNull = Seq((1L, null: String), (2L, null: String)).toDF("k", "v")
    val vRow = Core.analyzeStats(allNull, Seq("v")).collect().head
    vRow.getLong(2) shouldBe 2L     // n_nulls
    vRow.getLong(3) shouldBe 0L     // ndv
    vRow.isNullAt(4) shouldBe true
    vRow.getLong(6) shouldBe 0L
    an[IllegalArgumentException] should be thrownBy Core.analyzeStats(df, Seq.empty)
  }

  test("incrementalStats: the summary-only __all__ merge equals a full recompute") {
    import spark.implicits._
    // overlapping langs across sources: the set-union NDV genuinely
    // deduplicates (sum of per-source NDVs would be wrong)
    val docs = Seq(
      (1L, "aa", "en", "web"), (2L, "bbb", "de", "web"),
      (3L, "c", "en", "wiki"), (4L, "dddd", "fr", "wiki"),
      (5L, "ee", null, "wiki")).toDF("doc_id", "text", "lang", "source")
    val out = Core.incrementalStats(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.getString(3)), Option(r.getString(4)),
        r.getLong(5), r.getLong(6)))).toMap
    out("web") shouldBe ((2L, 0L, Some("de"), Some("en"), 5L, 2L))
    out("wiki") shouldBe ((3L, 1L, Some("en"), Some("fr"), 7L, 2L))
    // __all__: 4 distinct langs would be the wrong (summed) answer — the
    // union dedups en across sources to 3
    out("__all__") shouldBe ((5L, 1L, Some("de"), Some("fr"), 12L, 3L))
    // merge laws on the real corpus: __all__ aggregates the per-source
    // rows exactly; NDV bounded by [max per-source, sum per-source]
    val real = Core.incrementalStats(table("documents")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(5), r.getLong(6)))).toMap
    val per = real.filter(_._1 != "__all__").values
    real("__all__")._1 shouldBe per.map(_._1).sum
    real("__all__")._2 shouldBe per.map(_._2).sum
    real("__all__")._3 should be >= per.map(_._3).max
    real("__all__")._3 should be <= per.map(_._3).sum
  }

  test("giniConcentration: equality scores zero, a point mass scores (n-1)/n") {
    import spark.implicits._
    val orders = Seq(
      // group A: perfect equality -> G = 0 exactly
      ("A", 1L, 100.00), ("A", 2L, 100.00), ("A", 3L, 100.00), ("A", 4L, 100.00),
      // group B: one order holds all the (whole-dollar) mass ->
      // G = (n-1)/n = 3/4, i.e. g_num/g_den = 300/400
      ("B", 5L, 0.99), ("B", 6L, 0.99), ("B", 7L, 0.99), ("B", 8L, 100.00)
    ).toDF("o_orderpriority", "o_orderkey", "o_totalprice")
    val out = Core.giniConcentration(orders).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))).toMap
    out("A") shouldBe ((4L, 400L, 0L, 1600L, "dispersed"))
    out("B") shouldBe ((4L, 100L, 300L, 400L, "concentrated"))
    // laws on the real table: 0 <= g_num < g_den (G in [0, 1))
    val real = Core.giniConcentration(table("orders")).collect()
    real should not be empty
    real.foreach { r =>
      r.getLong(3) should be >= 0L
      r.getLong(3) should be < r.getLong(4)
    }
  }

  test("skylineFrontier: strict dominance — price ties, duplicates, incomparables") {
    import spark.implicits._
    val parts = Seq(
      ("X", 1.00, 5), // frontier (nothing weakly better on both dims)
      ("X", 1.00, 3), // dominated by (100, 5): price tie, strictly smaller
      ("X", 1.50, 5), // dominated by (100, 5): same size, higher price
      ("X", 0.80, 2), // incomparable to (100, 5): cheaper but smaller
      ("X", 1.00, 5), // duplicate point — collapses, not self-dominated
      ("Y", 2.00, 7)  // singleton brand is its own frontier
    ).toDF("p_brand", "p_retailprice", "p_size")
    val out = Core.skylineFrontier(parts).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.toSeq shouldBe Seq(
      ("X", 80L, 2L, 1L), ("X", 100L, 5L, 2L), ("Y", 200L, 7L, 1L))
    // frontier law on the real table: no surviving point dominates another
    val real = Core.skylineFrontier(table("part")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    real should not be empty
    for {
      Seq((b1, p1, s1), (b2, p2, s2)) <- real.toSeq.combinations(2)
      if b1 == b2
    } {
      val dom12 = p1 <= p2 && s1 >= s2 && (p1 < p2 || s1 > s2)
      val dom21 = p2 <= p1 && s2 >= s1 && (p2 < p1 || s2 > s1)
      withClue(s"($b1,$p1,$s1) vs ($b2,$p2,$s2): ") {
        dom12 shouldBe false; dom21 shouldBe false
      }
    }
  }

  test("rfmSegments: diagonal fixture pins every quintile, code, and band") {
    import spark.implicits._
    // 5 customers, one segment, one per quintile on every dimension:
    // custkey k has 6-k orders; spends arranged so c5 lands at_risk
    // (old + big) and c1 champion (recent + frequent + big)
    val lastDates = Map(1 -> "2001-11-01", 2 -> "2001-10-01",
      3 -> "2001-09-01", 4 -> "2001-08-01", 5 -> "2001-07-01")
    val spends = Map(
      1 -> Seq(1000.0, 1000.0, 1000.0, 1000.0, 1000.0), // 5 orders, 5000
      2 -> Seq(750.0, 750.0, 750.0, 750.0),             // 4 orders, 3000
      3 -> Seq(1000.0, 500.0, 500.0),                   // 3 orders, 2000
      4 -> Seq(500.0, 500.0),                           // 2 orders, 1000
      5 -> Seq(4000.0))                                 // 1 order, 4000
    val orders = (for {
      (k, ts) <- spends.toSeq; (tp, i) <- ts.zipWithIndex
    } yield (k.toLong, if (i == 0) lastDates(k) else "2001-01-01", tp))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", $"o_orderdate".cast("timestamp"))
    val cust = (1 to 5).map(k => (k.toLong, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
    val out = Core.rfmSegments(orders, cust).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getString(9)))).toMap
    out(1L) shouldBe ((30L, 5L, 500000L, 5L, 5L, 5L, 555L, "champion"))
    out(2L) shouldBe ((61L, 4L, 300000L, 4L, 4L, 3L, 443L, "regular"))
    out(3L) shouldBe ((91L, 3L, 200000L, 3L, 3L, 2L, 332L, "regular"))
    out(4L) shouldBe ((122L, 2L, 100000L, 2L, 2L, 1L, 221L, "regular"))
    out(5L) shouldBe ((153L, 1L, 400000L, 1L, 1L, 4L, 114L, "at_risk"))
    // laws on the real tables: scores in 1..5, the code is the
    // composition, the band is the rule
    val real = Core.rfmSegments(table("orders"), table("customer")).collect()
    real should not be empty
    real.foreach { r =>
      val (rs, fs, ms, code, band) = (r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getString(9))
      Seq(rs, fs, ms).foreach { s => s should be >= 1L; s should be <= 5L }
      code shouldBe rs * 100 + fs * 10 + ms
      band shouldBe (if (rs >= 4 && fs >= 4 && ms >= 4) "champion"
        else if (rs <= 2 && ms >= 4) "at_risk" else "regular")
    }
  }

  test("equiDepthHistogram: exact boundaries on uniform and point-mass domains") {
    import spark.implicits._
    // uniform: 8 distinct whole-dollar values, 4 buckets -> boundaries
    // at every second value
    val uni = (1 to 8).map(v => v + 0.37).toDF("o_totalprice")
    val u = Core.equiDepthHistogram(uni, buckets = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    u.toSeq shouldBe Seq((1L, 2L, 2L), (2L, 4L, 4L), (3L, 6L, 6L), (4L, 8L, 8L))
    // point mass: one value holds 6 of 8 rows -> it closes buckets
    // 1..3, the tail closes bucket 4 (skew collapses boundaries, the
    // histogram stays exact)
    val skew = (Seq.fill(6)(5.0) ++ Seq(7.0, 9.0)).toDF("o_totalprice")
    val s = Core.equiDepthHistogram(skew, buckets = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    s.toSeq shouldBe Seq((1L, 5L, 6L), (2L, 5L, 6L), (3L, 5L, 6L), (4L, 9L, 8L))
    // laws on the real table: exactly 32 buckets, boundaries and
    // cumulative counts monotone, the last boundary closes the table
    val real = Core.equiDepthHistogram(table("orders")).collect()
    real.length shouldBe 32
    real.map(_.getLong(0)).toSeq shouldBe (1L to 32L)
    real.map(_.getLong(1)).toSeq shouldBe real.map(_.getLong(1)).toSeq.sorted
    real.map(_.getLong(2)).toSeq shouldBe real.map(_.getLong(2)).toSeq.sorted
    real.last.getLong(2) shouldBe table("orders").count()
  }

  test("abcClassification: thresholds bind on the exact ppm integer") {
    import spark.implicits._
    // one brand, revenues 80/15/5: cum_ppm hits exactly 800000 and
    // 950000 — both boundary rows must classify INTO the tighter class
    val li = Seq((1L, 800.00), (2L, 150.00), (3L, 50.00))
      .toDF("l_partkey", "l_extendedprice")
    val part = Seq((1L, "B#1"), (2L, "B#1"), (3L, "B#1"))
      .toDF("p_partkey", "p_brand")
    val out = Core.abcClassification(li, part).collect()
      .map(r => r.getLong(1) -> ((r.getLong(3), r.getString(4)))).toMap
    out(1L) shouldBe ((800000L, "A"))
    out(2L) shouldBe ((950000L, "B"))
    out(3L) shouldBe ((1000000L, "C"))
    // laws on the real tables: ppm monotone within brand up to exactly
    // 1e6, class sequence never goes backwards
    val real = Core.abcClassification(table("lineitem"), table("part"))
      .collect()
    real should not be empty
    val byBrand = real.groupBy(_.getString(0))
    byBrand.values.foreach { rows =>
      val sorted = rows.sortBy(r => (-r.getLong(2), r.getLong(1)))
      sorted.last.getLong(3) shouldBe 1000000L
      val classes = sorted.map(_.getString(4)).toSeq
      classes shouldBe classes.sorted // A* then B* then C*
    }
  }

  test("selectivityEstimate: interpolation exact on a hand histogram; error bounded") {
    import spark.implicits._
    // two point masses (10 x $10, 10 x $20): cutoff 15 interpolates
    // halfway -> est 15 rows vs act 10 — the uniform-assumption penalty,
    // exactly; cutoff 25 past the last bucket -> est = n, err 0
    val orders = (Seq.fill(10)(10.0) ++ Seq.fill(10)(20.0)).toDF("o_totalprice")
    val out = Core.selectivityEstimate(orders, cutoffs = Seq(15L, 25L))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(4)))).toMap
    out(15L) shouldBe ((15000L, 10L, 250000L))
    out(25L) shouldBe ((20000L, 20L, 0L))
    // law on the real table: the estimate never strays past one bucket's
    // rows (act and est both live inside the bracketing bucket)
    val real = Core.selectivityEstimate(table("orders")).collect()
    real.length shouldBe 5
    real.foreach { r =>
      r.getLong(4) should be <= (1000000L / 32 + 32000L)
    }
  }

  test("runsTest: monotone series clusters, alternating series oscillates") {
    import spark.implicits._
    def daysOf(counts: Seq[Int]) = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(f"2024-01-${i + 1}%02d")
    }.toDF("o_orderdate").withColumn("o_orderdate", $"o_orderdate".cast("timestamp"))
    // one rise then one fall: two sign blocks, runs = 2 << E -> clustered
    val mono = Core.runsTest(daysOf(Seq(1, 2, 3, 4, 9, 8, 7, 6, 5))).collect().head
    (mono.getLong(0), mono.getLong(3), mono.getString(6)) shouldBe ((8L, 2L, "clustered"))
    // alternating counts: sign flips every day, runs = n -> oscillating
    val alt = Core.runsTest(daysOf(Seq(5, 1, 5, 1, 5, 1, 5))).collect().head
    (alt.getLong(3), alt.getString(6)) shouldBe ((6L, "oscillating"))
    // law on the real table: signs partition and the run count is sane
    val real = Core.runsTest(table("orders")).collect().head
    real.getLong(1) + real.getLong(2) shouldBe real.getLong(0)
    real.getLong(3) should be >= 1L
    real.getLong(3) should be <= real.getLong(0)
  }

  test("layoutPruningAudit: z-order prunes to the tile, linear scans the stripe") {
    import spark.implicits._
    // full uniform coverage of the 16x16 key plane, 4 rows per cell
    val orders = (for { c <- 0 until 16; o <- 0 until 16; _ <- 0 until 4 }
      yield (c.toLong, o.toLong)).toDF("o_custkey", "o_orderkey")
    val out = Core.layoutPruningAudit(orders).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // linear: 4 of 16 files survive (d1 in 4..7), each holds all d2 ->
    // scans 4 * 16 * 4 = 256 rows for 64 matches (4x amplification)
    out("linear") shouldBe ((16L, 12L, 256L, 64L, 4000000L))
    // zorder: the predicate box IS one 4x4 tile -> 1 file, zero waste
    out("zorder") shouldBe ((16L, 15L, 64L, 64L, 1000000L))
    // law on the real table: z-order never scans more than linear
    val real = Core.layoutPruningAudit(table("orders")).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    real("zorder") should be <= real("linear")
  }

  test("abcMigration: demotions, promotions, and period exits land in their cells") {
    import spark.implicits._
    // H1: p1=800/p2=150/p3=50 -> A/B/C (cums 80%/95%/100%). H2 has only
    // p3=800/p2=150: cums 84.2%/100% -> B/C. Matrix: p1 (A,N) exit,
    // p2 (B,C) demotion, p3 (C,B) promotion
    val li = Seq(
      (1L, 800.00, "1998-06-01"), (2L, 150.00, "1998-06-02"),
      (3L, 50.00, "1998-06-03"),
      (3L, 800.00, "1999-06-01"), (2L, 150.00, "1999-06-02")
    ).toDF("l_partkey", "l_extendedprice", "l_shipdate")
      .withColumn("l_shipdate", $"l_shipdate".cast("timestamp"))
    val part = Seq((1L, "B#1"), (2L, "B#1"), (3L, "B#1"))
      .toDF("p_partkey", "p_brand")
    val out = Core.abcMigration(li, part).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    out shouldBe Map(("A", "N") -> 1L, ("B", "C") -> 1L, ("C", "B") -> 1L)
    // conservation law on the real tables: matrix cells sum to the
    // parts that sold in either period
    val real = Core.abcMigration(table("lineitem"), table("part")).collect()
    real.map(_.getLong(2)).sum shouldBe
      table("lineitem").select("l_partkey").distinct().count()
  }

  test("growthAccounting: the four categories cover active disjointly") {
    import spark.implicits._
    // w0: u1,u2 new | w1: u1 retained, u3 new, u2 churns |
    // w2: u2 resurrected, u1 churns? no - u1 absent w2 -> churned(w2)
    def ev(id: Long, uid: Long, day: String) =
      (id, java.sql.Timestamp.valueOf(s"$day 10:00:00"), uid, "view", 1.0)
    val events = Seq(
      ev(1, 1, "2024-01-01"), ev(2, 2, "2024-01-02"),      // week A
      ev(3, 1, "2024-01-08"), ev(4, 3, "2024-01-09"),      // week A+1
      ev(5, 2, "2024-01-15"), ev(6, 3, "2024-01-16")       // week A+2
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Core.growthAccounting(events).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    // (active, new, retained, resurrected, churned)
    out(0) shouldBe ((2L, 2L, 0L, 0L, 0L))
    out(1) shouldBe ((2L, 1L, 1L, 0L, 1L)) // u3 new, u1 retained, u2 churned
    out(2) shouldBe ((2L, 0L, 1L, 1L, 1L)) // u3 retained, u2 back, u1 churned
    // cover law on the real table: active = new + retained + resurrected
    val real = Core.growthAccounting(table("events")).collect()
    real should not be empty
    real.foreach { r =>
      r.getLong(1) shouldBe r.getLong(2) + r.getLong(3) + r.getLong(4)
    }
  }

  test("seasonalNaiveBacktest: year-ago join exact; first year has no forecast") {
    import spark.implicits._
    val orders = (Seq.fill(10)("2023-03-15") ++ Seq.fill(20)("2023-07-01") ++
      Seq.fill(12)("2024-03-02") ++ Seq.fill(20)("2024-07-20"))
      .toDF("o_orderdate")
      .withColumn("o_orderdate", $"o_orderdate".cast("timestamp"))
    val out = Core.seasonalNaiveBacktest(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // only the 2024 months backtest (2023 has no year-ago)
    out.length shouldBe 2
    out(0) shouldBe ((2024L * 12 + 3, 12L, 10L, 2L, 166666L))
    out(1) shouldBe ((2024L * 12 + 7, 20L, 20L, 0L, 0L))
    // law on the real table: ape_ppm is the exact floored ratio
    val real = Core.seasonalNaiveBacktest(table("orders")).collect()
    real should not be empty
    real.foreach { r =>
      r.getLong(4) shouldBe 1000000L * r.getLong(3) / math.max(r.getLong(1), 1)
    }
  }

  test("spcLimits: pinned-d2 limits exact; the spike flags, the plateau does not") {
    import spark.implicits._
    val orders = (Seq.fill(10)("2024-01-01") ++ Seq.fill(10)("2024-01-02") ++
      Seq.fill(10)("2024-01-03") ++ Seq.fill(10)("2024-01-04") ++
      Seq.fill(30)("2024-01-05"))
      .toDF("o_orderdate")
      .withColumn("o_orderdate", $"o_orderdate".cast("timestamp"))
    val out = Core.spcLimits(orders).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
    // mean = 14 -> CL 14000; MRs [0,0,0,20] -> MR-bar 5000;
    // UCL = 14000 + 2660*5 = 27300, LCL = 700
    out.head._2 shouldBe 14000L
    out.head._3 shouldBe 27300L
    out.head._4 shouldBe 700L
    out.map(_._5).toSeq shouldBe Seq(false, false, false, false, true)
    // laws on the real table: LCL <= CL <= UCL and flags recompute
    val real = Core.spcLimits(table("orders")).collect()
    real should not be empty
    real.foreach { r =>
      r.getLong(4) should be <= r.getLong(2)
      r.getLong(2) should be <= r.getLong(3)
      r.getBoolean(5) shouldBe (r.getLong(1) * 1000 > r.getLong(3) ||
        r.getLong(1) * 1000 < r.getLong(4))
    }
  }

  test("cusumChangepoint: level shift lands on the last day of the old level") {
    import spark.implicits._
    // counts [10,10,10,40,40]: scaled cusum = [-60,-120,-180,-90,0] —
    // the max |cusum| sits exactly where the level changes
    val orders = (Seq.fill(10)("2024-01-01") ++ Seq.fill(10)("2024-01-02") ++
      Seq.fill(10)("2024-01-03") ++ Seq.fill(40)("2024-01-04") ++
      Seq.fill(40)("2024-01-05"))
      .toDF("o_orderdate")
      .withColumn("o_orderdate", $"o_orderdate".cast("timestamp"))
    val out = Core.cusumChangepoint(orders).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    out.map(_._2).toSeq shouldBe Seq(-60L, -120L, -180L, -90L, 0L)
    out.map(_._3).toSeq shouldBe Seq(false, false, true, false, false)
    // laws on the real table: the trajectory closes at exactly 0 and
    // exactly one changepoint is flagged
    val real = Core.cusumChangepoint(table("orders")).collect()
    real.last.getLong(2) shouldBe 0L
    real.count(_.getBoolean(3)) shouldBe 1
  }

  test("benfordAudit: digit spine keeps zero rows, bands bind at ±100000 ppm") {
    import spark.implicits._
    // 10 orders: first digits 1x8, 2x2 — digit 1 heavily over Benford,
    // digits 3..9 absent but present as zero rows
    val orders = (Seq.fill(8)(150.0) ++ Seq.fill(2)(250.0)).toDF("o_totalprice")
    val out = Core.benfordAudit(orders).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(4), r.getString(6)))).toMap
    out.keySet shouldBe (1L to 9L).toSet
    out(1L) shouldBe ((8L, 800000L, "over"))   // 800000 vs 301000
    out(2L) shouldBe ((2L, 200000L, "ok"))     // 200000 vs 176000
    out(3L) shouldBe ((0L, 0L, "under"))       // 0 vs 125000
    out(9L) shouldBe ((0L, 0L, "ok"))          // 0 vs 46000: within 100k
    // law on the real table: observed ppm shares sum to ~1e6 (floor slack)
    val real = Core.benfordAudit(table("orders")).collect()
    real.length shouldBe 9
    val s = real.map(_.getLong(4)).sum
    s should be <= 1000000L
    s should be > 999900L
  }

  test("bloomPrefilterAudit: no false negatives, exact fp accounting") {
    import spark.implicits._
    val sup = Seq((1L, 3L), (2L, 3L), (7L, 5L)).toDF("s_suppkey", "s_nationkey")
    val li = Seq(1L, 1L, 2L, 7L, 9L, 11L).toDF("l_suppkey")
    val r = Core.bloomPrefilterAudit(li, sup).collect().head
    val (nBig, nPass, nTrue, nFp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    nBig shouldBe 6L
    nTrue shouldBe 3L    // rows with suppkey in {1, 2}
    nPass should be >= nTrue // a Bloom filter never drops a member
    nFp shouldBe nPass - nTrue
    // laws on the real tables
    val real = Core.bloomPrefilterAudit(table("lineitem"), table("supplier"))
      .collect().head
    real.getLong(1) should be >= real.getLong(2) // pass >= true
    real.getLong(2) should be > 0L               // nation 3 ships things
    real.getLong(4) should be < 100000L          // fp rate sane (< 10%)
  }

  test("decayTopk: halving per week, exact shifts, the 40-week clamp zeroes history") {
    import spark.implicits._
    val li = Seq(
      (1L, 10.00, "2001-12-01"), // age 0 weeks  -> full 1000 cents
      (2L, 10.00, "2001-11-21"), // age 10d -> 1 week -> 1000 >> 1 = 500
      (2L, 10.01, "2001-11-17"), // age 14d -> 2 weeks -> 1001 >> 2 = 250
      (3L, 10000.00, "1995-01-01") // ancient: clamp 40 -> 1000000 >> 40 = 0
    ).toDF("l_suppkey", "l_extendedprice", "l_shipdate")
      .withColumn("l_shipdate", $"l_shipdate".cast("timestamp"))
    val out = Core.decayTopk(li, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.toSeq shouldBe Seq(
      (1L, 1L, 1000L, 1000L),
      (2L, 2L, 2001L, 750L),
      (3L, 1L, 1000000L, 0L))
    // decay law on the real table: score never exceeds raw revenue
    val real = Core.decayTopk(table("lineitem")).collect()
    real should not be empty
    real.foreach { r =>
      r.getLong(3) should be <= r.getLong(2)
      r.getLong(3) should be >= 0L
    }
  }
}
