package graft

import java.nio.file.{Files, Paths}
import graft.sources.Jsonl

/** JSONL corpus ingest (t16): explicit-schema line-oriented read with
  * PERMISSIVE corrupt-line quarantine, and byte-exact round-trip fidelity
  * through the JSON escape layer.
  */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val nasty = Seq(
    (1L, "plain ascii text"),
    (2L, "embedded \"quotes\" and \\backslashes\\"),
    (3L, "newline\nand\ttab and\rcarriage"),
    (4L, "unicode: café 日本語 😀 nul-adjacent \u0001"),
    (5L, ""))

  test("round-trip through jsonl is exact, including escapes and unicode") {
    val tmp = Files.createTempDirectory("graft_jsonl").toString
    val in = nasty.toDF("doc_id", "text")
    in.write.mode("overwrite").json(s"$tmp/corpus")
    val back = Jsonl.clean(Jsonl.readCorpus(spark, s"$tmp/corpus", in.schema))
    back.orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getString(1))) shouldBe
      nasty.toArray
  }

  test("malformed lines are quarantined with the raw line, not dropped or fatal") {
    val tmp = Files.createTempDirectory("graft_jsonl2").toString
    val in = nasty.toDF("doc_id", "text")
    in.write.mode("overwrite").json(s"$tmp/corpus")
    Files.writeString(Paths.get(s"$tmp/corpus/part-corrupt.json"),
      "{\"doc_id\": 99, \"text\": unquoted}\n{\"doc_id\":\nnot json at all")
    val parsed = Jsonl.readCorpus(spark, s"$tmp/corpus", in.schema)
    // NOTE: a bare .count() after the corrupt-column filter would prune the
    // scan down to only _corrupt, which Spark disallows over raw files
    // (SPARK-21610) — materialize data columns (or cache) before counting
    Jsonl.clean(parsed).collect() should have length nasty.length
    val bad = Jsonl.corrupt(parsed).collect()
      .map(_.getAs[String](Jsonl.CorruptCol)).sorted
    bad should have length 3
    bad should contain("not json at all")
  }

  test("the document schema may not collide with the corrupt column") {
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add(Jsonl.CorruptCol, "string")
    an[IllegalArgumentException] should be thrownBy
      Jsonl.readCorpus(spark, "/nonexistent", schema)
  }
}
