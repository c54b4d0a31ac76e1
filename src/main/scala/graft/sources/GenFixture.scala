package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, FloatType, TimestampNTZType}

/** Deterministic DISTINCT-CARDINALITY fixture generator.
  *
  * Round-6 verdict item 1: every prior scale leg (10x/30x) was a key-shifted
  * COPY of sf0.1, which multiplies duplicated payload — dedup/similarity/ER
  * legs there measure pair-enumeration pathology (every doc gains k-1 exact
  * replicas), not cardinality scaling. This generator produces a fixture
  * whose DISTINCT-key and DISTINCT-content cardinality grows linearly with
  * the multiplier: fresh keys, fresh text, fresh vectors, with a FIXED
  * (scale-invariant) duplicate rate — the shape a real corpus has at 100 TB.
  *
  * Schema, value domains, and distributions mirror the driver fixture
  * (TESTDATA.md, measured on sf0.1): same columns and physical types, same
  * category sets, same uniform/exponential shapes, ~0.6% exact-dup and
  * ~0.6% near-dup document rate (base: 8 dup pairs / 5000 docs),
  * label-clustered unit-norm 64-dim embeddings.
  *
  * Generation is itself a 100 TB-shaped job: every column is a pure
  * function of the row id via `xxhash64` (counter-based RNG), so the data
  * plane is `spark.range` + whole-stage-codegen'd expressions — no driver
  * loops, no `Math.random` (partitioning-dependent), no shuffle except the
  * parquet write. Regenerating any subset of rows yields identical bytes on
  * any cluster layout, which is what makes a 100 TB fixture reproducible.
  *
  * Usage: `GenFixture <dstDir> <multiplier>`; multiplier 1.0 reproduces
  * sf0.1 row counts (600k lineitem), 10.0 is a genuine sf1 (6M distinct
  * lineitem rows, 50k distinct documents).
  */
object GenFixture {

  /** xxhash64 of (cols..., salt) — the per-cell entropy source. */
  private def h(salt: Long, cols: Column*): Column =
    xxhash64((cols :+ lit(salt)): _*)

  /** Uniform [0,1) derived from h (top 63 bits). */
  private def u01(salt: Long, cols: Column*): Column =
    h(salt, cols: _*).bitwiseAND(lit(Long.MaxValue)).cast(DoubleType) /
      lit(9.223372036854775807e18)

  /** Uniform integer in [0, n). */
  private def ui(n: Int, salt: Long, cols: Column*): Column =
    pmod(h(salt, cols: _*), lit(n.toLong)).cast(IntegerType)

  private def pick(values: Seq[String], salt: Long, cols: Column*): Column =
    element_at(typedLit(values), ui(values.size, salt, cols: _*) + lit(1))

  private def money(c: Column): Column = round(c, 2)

  private def dateIn(from: String, spanDays: Int, salt: Long, cols: Column*): Column =
    date_add(lit(java.sql.Date.valueOf(from)), ui(spanDays, salt, cols: _*))
      .cast(TimestampNTZType)

  private val Segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val Priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val PTypes = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
  private val PAdjs = Seq("large", "hot", "blue", "green", "small", "red", "cold", "dim")
  private val PNouns = Seq("ring", "bolt", "gear", "cap", "rod", "pin", "disk", "tube")
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")
  private val Vocab = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")

  /** Per-label unit centroids for the embedding clusters: deterministic
    * (java.util.Random's algorithm is pinned by its javadoc contract). */
  private val Centroids: Seq[Seq[Float]] = {
    val rnd = new java.util.Random(42)
    (0 until 10).map { _ =>
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
  }

  private def range(spark: SparkSession, n: Long): DataFrame =
    spark.range(0L, n, 1L, 32).toDF("id")

  def region(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"), (4, "MIDDLE EAST"))
      .toDF("r_regionkey", "r_name")
  }

  def nation(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 25).map(i => (i, s"NATION_$i", i % 5)).toDF("n_nationkey", "n_name", "n_regionkey")
  }

  def customer(spark: SparkSession, n: Long): DataFrame =
    range(spark, n).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      ui(25, 11, col("id")).as("c_nationkey"),
      money(lit(-1000.0) + u01(12, col("id")) * lit(11000.0)).as("c_acctbal"),
      pick(Segments, 13, col("id")).as("c_mktsegment"))

  def supplier(spark: SparkSession, n: Long): DataFrame =
    range(spark, n).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      ui(25, 21, col("id")).as("s_nationkey"),
      money(lit(-1000.0) + u01(22, col("id")) * lit(11000.0)).as("s_acctbal"))

  def part(spark: SparkSession, n: Long): DataFrame =
    range(spark, n).select(
      col("id").as("p_partkey"),
      concat(pick(PAdjs, 31, col("id")), lit(" "), pick(PNouns, 32, col("id"))).as("p_name"),
      concat(lit("Brand#"), (ui(25, 33, col("id")) + lit(1)).cast("string")).as("p_brand"),
      pick(PTypes, 34, col("id")).as("p_type"),
      (ui(50, 35, col("id")) + lit(1)).as("p_size"),
      money(lit(900.0) + u01(36, col("id")) * lit(99.9)).as("p_retailprice"))

  def orders(spark: SparkSession, n: Long, nCust: Long): DataFrame =
    range(spark, n).select(
      col("id").as("o_orderkey"),
      pmod(h(41, col("id")), lit(nCust)).as("o_custkey"),
      pick(Seq("O", "P", "F"), 42, col("id")).as("o_orderstatus"),
      money(lit(1000.0) + u01(43, col("id")) * lit(499000.0)).as("o_totalprice"),
      dateIn("1995-01-01", 2405, 44, col("id")).as("o_orderdate"),
      pick(Priorities, 45, col("id")).as("o_orderpriority"))

  def lineitem(spark: SparkSession, n: Long, nOrders: Long, nParts: Long, nSupp: Long): DataFrame =
    range(spark, n).select(
      pmod(h(51, col("id")), lit(nOrders)).as("l_orderkey"),
      pmod(h(52, col("id")), lit(nParts)).as("l_partkey"),
      pmod(h(53, col("id")), lit(nSupp)).as("l_suppkey"),
      (ui(7, 54, col("id")) + lit(1)).as("l_linenumber"),
      (ui(50, 55, col("id")) + lit(1)).cast(DoubleType).as("l_quantity"),
      money(lit(900.0) + u01(56, col("id")) * lit(104100.0)).as("l_extendedprice"),
      (ui(11, 57, col("id")).cast(DoubleType) / lit(100.0)).as("l_discount"),
      (ui(9, 58, col("id")).cast(DoubleType) / lit(100.0)).as("l_tax"),
      pick(Seq("A", "N", "R"), 59, col("id")).as("l_returnflag"),
      pick(Seq("F", "O"), 60, col("id")).as("l_linestatus"),
      dateIn("1995-01-02", 2498, 61, col("id")).as("l_shipdate"))

  def events(spark: SparkSession, n: Long, nUsers: Long): DataFrame =
    range(spark, n).select(
      col("id").as("event_id"),
      (to_timestamp_ntz(lit("2024-01-01 00:00:00")) +
        make_dt_interval(lit(0), lit(0), lit(0),
          u01(71, col("id")) * lit(30.0 * 86400))).as("ts"),
      pmod(h(72, col("id")), lit(nUsers)).as("user_id"),
      pick(EventTypes, 73, col("id")).as("event_type"),
      // exponential(mean 50), matching the base fixture's shape
      // (p50=34.8~50*ln2, mean 49.9)
      round(lit(-50.0) * log(lit(1.0) - u01(74, col("id"))), 2).as("value"),
      format_string("{\"k\": %d}", ui(100, 75, col("id"))).as("props"))

  /** Documents with scale-INVARIANT duplicate structure: each doc's text is
    * a pure function of a content seed; ~0.6% of docs reuse a nearby
    * earlier doc's seed verbatim (exact dup) and ~0.6% reuse it with one
    * word appended (near dup, Jaccard >~ 0.9). Duplicates-per-doc stays
    * constant as n grows — the property the key-shifted copies lacked.
    *
    * The token VOCABULARY grows with the corpus per Heaps' law
    * (V ∝ n^0.5, anchored at 31 tokens for the base 5000 docs — round-11
    * verdict #5): over a CONSTANT vocabulary, 10x documents collapse
    * into the same shingle buckets (occupancy x10, within-bucket pairs
    * x100), so the scale leg measured fixture degeneracy instead of
    * plans. Tokens beyond the base 31 are suffixed variants
    * (`word_k`), keeping multiplier 1.0 byte-identical to before.
    */
  def documents(spark: SparkSession, n: Long): DataFrame = {
    val r = u01(81, col("id"))
    val earlier = greatest(lit(0L), col("id") - lit(1L) - pmod(h(82, col("id")), lit(50L)))
    val seed = when(r < lit(0.012), earlier).otherwise(col("id"))
    val nWords = (ui(101, 83, seed) + lit(10)).cast("long")
    val vocabSize = math.max(31L, math.round(31.0 * math.sqrt(n / 5000.0)))
    val words = transform(
      sequence(lit(0L), nWords - lit(1L)),
      i => {
        val tokId = pmod(h(84, seed, i), lit(vocabSize))
        val base = element_at(typedLit(Vocab),
          pmod(tokId, lit(31L)).cast(IntegerType) + lit(1))
        if (vocabSize == 31L) base
        else concat(base, when(tokId >= lit(31L),
          concat(lit("_"), (tokId / lit(31L)).cast("string"))).otherwise(lit("")))
      })
    val nearExtra = r >= lit(0.006) && r < lit(0.012)
    val text = when(nearExtra,
        concat(concat_ws(" ", words), lit(" "), pick(Vocab, 85, col("id"))))
      .otherwise(concat_ws(" ", words))
    range(spark, n).select(
      col("id").as("doc_id"),
      text.as("text"),
      // base mix: en 41%, de/es/fr/zh ~14.75% each
      when(u01(86, col("id")) < 0.41, "en")
        .when(u01(86, col("id")) < 0.5575, "de")
        .when(u01(86, col("id")) < 0.705, "es")
        .when(u01(86, col("id")) < 0.8525, "fr")
        .otherwise("zh").as("lang"),
      concat(lit("src"), pmod(col("id"), lit(20L)).cast("string")).as("source"))
      .withColumn("n_chars", length(col("text")))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars").cast("long").as("n_chars"))
  }

  /** Label-clustered unit vectors: centroid(label)*2 + iid noise, then
    * L2-normalized — distinct vectors with genuine cluster structure, so
    * ANN/IVF/SemDeDup legs see realistic neighborhoods, not replicas. */
  def embeddings(spark: SparkSession, n: Long): DataFrame = {
    val label = ui(10, 91, col("id"))
    val dims = sequence(lit(0), lit(63))
    val raw = transform(dims, d =>
      element_at(element_at(typedLit(Centroids), label + lit(1)), d + lit(1)).cast(DoubleType) * lit(2.0) +
        (u01(92, col("id"), d) + u01(93, col("id"), d) + u01(94, col("id"), d) - lit(1.5)))
    range(spark, n)
      .select(col("id").as("vec_id"), label.as("label"), raw.as("raw"))
      .withColumn("norm", sqrt(aggregate(col("raw"), lit(0.0), (a, x) => a + x * x)))
      .select(
        col("vec_id"),
        transform(col("raw"), x => (x / col("norm")).cast(FloatType)).as("embedding"),
        col("label"))
      .select(col("vec_id"), col("embedding"), col("label"))
  }

  /** Base row counts at multiplier 1.0 == sf0.1. Dimension tables
    * (region/nation) stay fixed — scaling grows fact cardinality. */
  def generate(spark: SparkSession, dstDir: String, m: Double): Unit = {
    val stampFile = new java.io.File(dstDir, "_GRAFT_GEN_OK")
    val stamp = s"gen multiplier=$m v2" // v2: Heaps-law document vocabulary
    if (stampFile.exists() &&
        new String(java.nio.file.Files.readAllBytes(stampFile.toPath), "UTF-8") == stamp)
      return
    java.nio.file.Files.deleteIfExists(stampFile.toPath)
    new java.io.File(dstDir).mkdirs()
    def n(base: Long): Long = math.max(1L, math.round(base * m))
    val nCust = n(15000); val nSupp = n(1000); val nPart = n(20000)
    val nOrd = n(150000); val nUsers = n(1500)
    val tables: Seq[(String, DataFrame)] = Seq(
      "region" -> region(spark),
      "nation" -> nation(spark),
      "customer" -> customer(spark, nCust),
      "supplier" -> supplier(spark, nSupp),
      "part" -> part(spark, nPart),
      "orders" -> orders(spark, nOrd, nCust),
      "lineitem" -> lineitem(spark, n(600000), nOrd, nPart, nSupp),
      "events" -> events(spark, n(100000), nUsers),
      "documents" -> documents(spark, n(5000)),
      "embeddings" -> embeddings(spark, n(2000)))
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dstDir/$name.parquet")
    }
    java.nio.file.Files.write(stampFile.toPath, stamp.getBytes("UTF-8"))
  }

  def main(args: Array[String]): Unit = {
    val dst = args(0)
    val m = if (args.length > 1) args(1).toDouble else 1.0
    val spark = graft.Session.build("graft-genfixture")
    generate(spark, dst, m)
    spark.stop()
  }
}
