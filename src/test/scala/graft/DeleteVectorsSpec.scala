package graft

import graft.operators.DeleteVectors
import org.apache.spark.sql.functions._

/** Merge-on-read delete vectors: the anti-join is POSITIONAL —
  * (file_path, row_index) off the parquet metadata columns — and the
  * vector relation is what decides survival, not any logical key.
  */
class DeleteVectorsSpec extends SparkSpec {
  import spark.implicits._

  private def base(): (String, org.apache.spark.sql.DataFrame) = {
    val df = (0L until 40L).map(i => (i, s"row$i")).toDF("id", "payload")
    val dir = java.nio.file.Files.createTempDirectory("graft-dv").toString
    DeleteVectors.writeBase(df, dir, $"id" % 4, Seq($"id"))
    (dir, df)
  }

  test("predicate deletes surface as exactly the complement") {
    val (dir, _) = base()
    val dv = DeleteVectors.buildDeleteVectors(spark, dir, $"id" % 5 === 0)
    dv.count() shouldBe 8
    val out = DeleteVectors.readMergeOnRead(spark, dir, dv)
      .select($"id").as[Long].collect().sorted
    out shouldBe (0L until 40L).filter(_ % 5 != 0).toArray
  }

  test("the vector is positional: hand-built (file, 0) rows delete each file's first row") {
    val (dir, _) = base()
    // first row of every file, no predicate involved
    val dv = spark.read.parquet(dir)
      .select(col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("row_index"))
      .where($"row_index" === 0)
    val out = DeleteVectors.readMergeOnRead(spark, dir, dv)
    // exactly one row per file vanished
    out.count() shouldBe 40 - dv.count()
    // and the survivors still carry no metadata columns in the schema
    out.columns should contain theSameElementsAs Seq("id", "payload")
    // the deleted rows are each file's sort-order minimum (writeBase
    // pins in-file order by id, so position 0 = min id per file)
    val deleted = spark.read.parquet(dir)
      .withColumn("file_path", col("_metadata.file_path"))
      .withColumn("row_index", col("_metadata.row_index"))
      .join(dv, Seq("file_path", "row_index"))
      .select($"id").as[Long].collect().toSet
    val minPerFile = spark.read.parquet(dir)
      .groupBy(col("_metadata.file_path")).agg(min($"id").as("m"))
      .select($"m").as[Long].collect().toSet
    deleted shouldBe minPerFile
  }

  test("empty vector is the identity read") {
    val (dir, df) = base()
    val none = DeleteVectors.buildDeleteVectors(spark, dir, lit(false))
    DeleteVectors.readMergeOnRead(spark, dir, none).count() shouldBe df.count()
  }
}
