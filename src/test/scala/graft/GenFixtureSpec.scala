package graft

import graft.sources.GenFixture

/** The scale-leg generator's statistical contract: duplicate rates stay
  * scale-invariant while the document vocabulary follows Heaps' law
  * (V ∝ n^0.5) — over a constant vocabulary, 10x documents collapse
  * into the same shingle buckets and the scale leg measures fixture
  * degeneracy, not plans (round-11 verdict #5).
  */
class GenFixtureSpec extends SparkSpec {

  test("document vocabulary grows ~sqrt(n) and stays byte-identical at base size") {
    import org.apache.spark.sql.functions._
    def vocab(n: Long): Long =
      GenFixture.documents(spark, n)
        .select(explode(split(col("text"), " ")).as("w"))
        .select(countDistinct(col("w"))).head().getLong(0)
    val v1 = vocab(5000)
    v1 shouldBe 31L // the base corpus: exactly the 31-token vocabulary
    val v4 = vocab(20000) // 4x docs -> ~2x tokens
    v4 should be >= 55L
    v4 should be <= 62L
    // base text is unchanged by the Heaps extension (multiplier 1.0
    // regenerates the same bytes as before the change)
    val t0 = GenFixture.documents(spark, 5000)
      .orderBy(col("doc_id")).limit(3).collect().map(_.getString(1))
    t0.foreach(t => t.contains("_") shouldBe false)
  }

  test("duplicate-pair rate stays scale-invariant as n grows") {
    import org.apache.spark.sql.functions._
    def exactDupDocs(n: Long): Long = {
      val d = GenFixture.documents(spark, n)
      d.groupBy(col("text")).count().where(col("count") > 1)
        .agg(sum(col("count"))).head().getLong(0)
    }
    val r1 = exactDupDocs(5000).toDouble / 5000
    val r4 = exactDupDocs(20000).toDouble / 20000
    // ~1.2% of docs sit in an exact-dup group (0.6% copiers + sources);
    // the RATE must not grow with n
    r1 should be > 0.004
    r1 should be < 0.03
    (r4 / r1) should be > 0.5
    (r4 / r1) should be < 2.0
  }
}
