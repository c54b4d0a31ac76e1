package graft

import org.apache.spark.sql.functions._
import graft.operators.Compaction

/** t18: the maintenance rewrite must hit its file-count plan, never change
  * the data, and (clustered form) give each output file a disjoint key
  * range so row-group stats prune.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))

  private def fixture(dir: String): Unit =
    (1L to 2000L).map(i => (i, s"text body $i", s"src${i % 3}"))
      .toDF("id", "text", "src")
      .repartition(24)
      .write.mode("overwrite").parquet(dir)

  test("planFileCount: ceil division, floored at one file") {
    Compaction.planFileCount(100, 30) shouldBe 4
    Compaction.planFileCount(90, 30) shouldBe 3
    Compaction.planFileCount(1, 1000000) shouldBe 1
    Compaction.planFileCount(0, 1000000) shouldBe 1
  }

  test("dataBytes measures hive-partitioned layouts and skips hidden work dirs by path") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    (1L to 300L).map(i => (i, s"text $i", s"src${i % 3}")).toDF("id", "text", "src")
      .write.partitionBy("src").mode("overwrite").parquet(s"$tmp/in")
    val measured = Compaction.dataBytes(spark, s"$tmp/in")
    measured should be > 0L
    // a stray part file inside a hidden work dir must NOT count
    val junk = java.nio.file.Paths.get(s"$tmp/in/_temporary/0")
    java.nio.file.Files.createDirectories(junk)
    java.nio.file.Files.write(junk.resolve("part-junk.parquet"), Array.fill(4096)(1.toByte))
    Compaction.dataBytes(spark, s"$tmp/in") shouldBe measured
  }

  test("compactClustered reports actual files when empty range partitions write none") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    // one distinct key: range partitioning cannot fill more than one bucket
    (1L to 500L).map(_ => (7L, "same key row")).toDF("id", "text")
      .repartition(8).write.mode("overwrite").parquet(s"$tmp/in")
    val total = Compaction.dataBytes(spark, s"$tmp/in")
    val actual = Compaction.compactClustered(
      spark, s"$tmp/in", s"$tmp/out", Seq("id"), (total + 3) / 4)
    parquetFiles(s"$tmp/out").size shouldBe actual
    spark.read.parquet(s"$tmp/out").count() shouldBe 500L
  }

  test("compact reports the ACTUAL file count when the plan exceeds the read partitions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    (1L to 50L).map(i => (i, s"t$i")).toDF("id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
    // tiny target → plan wants many files, but coalesce cannot split the
    // single read partition: returned count must match what lands on disk
    val actual = Compaction.compact(spark, s"$tmp/in", s"$tmp/out", 64L)
    parquetFiles(s"$tmp/out").size shouldBe actual
    spark.read.parquet(s"$tmp/out").count() shouldBe 50L
  }

  test("compact: fewer files, identical content") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    fixture(s"$tmp/in")
    parquetFiles(s"$tmp/in").size shouldBe 24
    val total = Compaction.dataBytes(spark, s"$tmp/in")
    val planned = Compaction.compact(spark, s"$tmp/in", s"$tmp/out", (total + 3) / 4)
    parquetFiles(s"$tmp/out").size shouldBe planned
    planned should be < 24
    spark.read.parquet(s"$tmp/out").orderBy($"id").collect() shouldBe
      spark.read.parquet(s"$tmp/in").orderBy($"id").collect()
  }

  test("compactClustered: identical content AND disjoint per-file key ranges") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    fixture(s"$tmp/in")
    val total = Compaction.dataBytes(spark, s"$tmp/in")
    val planned = Compaction.compactClustered(
      spark, s"$tmp/in", s"$tmp/out", Seq("id"), (total + 3) / 4)
    planned should be > 1
    spark.read.parquet(s"$tmp/out").orderBy($"id").collect() shouldBe
      spark.read.parquet(s"$tmp/in").orderBy($"id").collect()
    // each output file owns a contiguous id range; ranges must not overlap
    val ranges = spark.read.parquet(s"$tmp/out")
      .select(input_file_name().as("f"), $"id")
      .groupBy($"f").agg(min($"id").as("lo"), max($"id").as("hi"))
      .orderBy($"lo")
      .as[(String, Long, Long)].collect()
    ranges.size shouldBe planned
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }
}
