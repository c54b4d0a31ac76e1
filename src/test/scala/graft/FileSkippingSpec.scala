package graft

import org.apache.spark.sql.functions._
import graft.operators.FileSkipping

/** Zone-map file skipping (x11): footer-only index build, envelope
  * pruning with a residual filter, and the layout-independence law —
  * pruned scan ≡ full-scan filter for every predicate.
  */
class FileSkippingSpec extends SparkSpec {
  import spark.implicits._

  /** 1000 rows in 5 files with DISJOINT deterministic k-ranges
    * (file b holds k in [200b, 200b+200)): pruning outcomes are exact,
    * not sampler-dependent.
    */
  private lazy val dir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fskip").toString
    val df = spark.range(0, 1000).select($"id".as("k"), ($"id" * 3).as("v"))
    (0 until 5).foreach { b =>
      df.where($"k" >= b * 200 && $"k" < (b + 1) * 200).coalesce(1)
        .write.mode("overwrite").parquet(s"$tmp/base/b=$b")
    }
    s"$tmp/base"
  }

  test("index: one row per file, envelopes and row counts exact") {
    val idx = FileSkipping.buildIndex(spark, dir, "k").collect()
    idx.length shouldBe 5
    idx.map(_.getLong(1)).sum shouldBe 1000L
    idx.foreach { r =>
      r.getBoolean(4) shouldBe true
      val (mn, mx) = (r.getLong(2), r.getLong(3))
      mx - mn shouldBe 199L
      mn % 200 shouldBe 0L
    }
  }

  test("pruneFiles: envelope intersection, zero-survivor and boundary cases") {
    val idx = FileSkipping.buildIndex(spark, dir, "k")
    FileSkipping.pruneFiles(idx, 250, 310).length shouldBe 1 // inside file 1
    FileSkipping.pruneFiles(idx, 150, 450).length shouldBe 3 // spans 0,1,2
    FileSkipping.pruneFiles(idx, 199, 200).length shouldBe 2 // exact edges
    FileSkipping.pruneFiles(idx, 5000, 6000) shouldBe empty  // beyond max
  }

  test("prunedScan == full filter, including the empty-survivor path") {
    val full = spark.read.parquet(dir)
    val idx = FileSkipping.buildIndex(spark, dir, "k")
    for ((lo, hi) <- Seq((250L, 310L), (0L, 999L), (199L, 200L), (5000L, 6000L))) {
      val pruned = FileSkipping.prunedScan(spark, dir, idx, "k", lo, hi)
        .select($"k", $"v").orderBy($"k").collect().toSeq
      val exact = full.where($"k" >= lo && $"k" <= hi)
        .select($"k", $"v").orderBy($"k").collect().toSeq
      pruned shouldBe exact
    }
  }

  test("residual filter drops in-file false positives (stats admit, rows reject)") {
    // one file, k in [0,199]: the envelope admits [150, 500] but only
    // rows 150..199 exist — the residual must trim to exactly those
    val idx = FileSkipping.buildIndex(spark, dir, "k")
    val out = FileSkipping.prunedScan(spark, dir, idx, "k", 150, 500)
    FileSkipping.pruneFiles(idx, 150, 500).length shouldBe 3
    out.agg(min($"k"), max($"k"), count(lit(1))).head.toSeq shouldBe Seq(150L, 500L, 351L)
  }

  test("missing stats are conservative: the file is always read") {
    // a file whose schema lacks the indexed column entirely
    val tmp = java.nio.file.Files.createTempDirectory("graft_fskip2").toString
    spark.range(0, 10).select($"id".as("k")).write.parquet(s"$tmp/b/f1")
    spark.range(0, 10).select($"id".as("other")).write.parquet(s"$tmp/b/f2")
    val idx = FileSkipping.buildIndex(spark, s"$tmp/b", "k")
    val noStats = idx.where(!$"has_stats").collect()
    noStats.length should be >= 1
    // no-stats files survive every predicate, even a non-overlapping one
    val survivors = FileSkipping.pruneFiles(idx, 5000, 6000)
    noStats.map(_.getString(0)).foreach(f => survivors should contain(f))
  }
}
