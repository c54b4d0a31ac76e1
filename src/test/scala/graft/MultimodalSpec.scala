package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal binary-column plumbing: schema'd payloads, codegen'd frame
  * sampling, and the mapPartitions decode pipeline (stub decoder — the
  * Spark-side batch shape is what's under test).
  */
class MultimodalSpec extends SparkSpec {
  import graft.implicits._

  test("withPayload carries bytes + typed metadata") {
    val p = Multimodal.withPayload(table("documents"))
    p.schema("payload").dataType.typeName shouldBe "binary"
    val row = p.where($"doc_id" === 0).select($"meta.n_bytes", $"payload").head()
    row.getLong(0) shouldBe row.getAs[Array[Byte]](1).length.toLong
  }

  test("frame sampling covers the payload head at the declared stride") {
    val f = Multimodal.frameSample(table("documents"), frameChars = 64, maxFrames = 4)
    // every doc emits ≥1 frame, ≤4 frames, frame_nos contiguous from 0
    val perDoc = f.groupBy($"doc_id")
      .agg(count(lit(1)).as("n"), min($"frame_no").as("mn"), max($"frame_no").as("mx"))
    perDoc.where($"mn" =!= 0 || $"mx" =!= $"n" - 1 || $"n" > 4).count() shouldBe 0
    val docs = table("documents").count()
    perDoc.count() shouldBe docs
    // a 64+-char doc's first frame is exactly 64 chars of UTF-8 bytes
    val first = f.join(table("documents"), "doc_id")
      .where(expr("length(text) >= 64") && $"frame_no" === 0)
    first.where($"frame_bytes" < 64).count() shouldBe 0
  }

  test("decodeFeatures runs the stub decoder distributed with a typed schema") {
    val feats = Multimodal.decodeFeatures(table("documents"))
    val n = table("documents").count()
    feats.count() shouldBe n
    val r = feats.filter(_.doc_id == 0L).head()
    // checksum agrees with the engine's own md5 of the payload
    val expected = table("documents").where($"doc_id" === 0)
      .select(md5($"text".cast("binary"))).head().getString(0)
    r.checksum shouldBe expected
    r.width should be >= 16
    r.height should be >= 16
    r.mean_luma should (be >= 0.0 and be <= 1.0)
  }
}
