package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** t26's interchange contract: zstd ORC partitioned by lang must
  * round-trip the corpus byte-exactly, and the layout must buy the two
  * plan properties it exists for — lang-directory partition pruning and
  * predicate pushdown into the ORC scan.
  */
class OrcSpec extends SparkSpec {
  import spark.implicits._

  private def written(): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc").toString
    table("documents")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .write.mode("overwrite").option("compression", "zstd")
      .partitionBy("lang").orc(tmp)
    tmp
  }

  test("zstd ORC partitioned by lang round-trips the corpus exactly") {
    val tmp = written()
    val back = spark.read.orc(tmp)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].longValue())
    val want = table("documents")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].longValue())
    back shouldBe want
    // zstd actually engaged: the files carry the codec postfix
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
    val files =
      try walk.filter(_.toString.endsWith(".orc")).toArray.map(_.toString)
      finally walk.close()
    files should not be empty
    all(files) should include(".zstd.orc")
  }

  test("a lang filter prunes partition directories; n_chars pushes into the ORC scan") {
    val tmp = written()
    val q = spark.read.orc(tmp)
      .where($"lang" === "en" && $"n_chars" > 500L)
      .select($"doc_id", $"n_chars")
    val p = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // partition pruning: the lang predicate becomes a PartitionFilters
    // entry, not a scan-side filter over every directory
    p should include("PartitionFilters")
    p.linesIterator.filter(_.contains("PartitionFilters")).mkString should
      include("lang")
    // predicate pushdown reaches the ORC reader
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    pushed should include("GreaterThan(n_chars,500)")
    // and the result agrees with the parquet-side truth
    q.count() shouldBe table("documents")
      .where($"lang" === "en" && $"n_chars" > 500L).count()
  }
}
