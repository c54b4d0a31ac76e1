package graft

import java.time.LocalDateTime

import graft.sources.Grib2

/** DSv2 connector laws (gate r19): `spark.read.format("grib2")` must
  * equal the direct [[Grib2.readRecords]] path, push variable predicates
  * to the RECORD level (pruned before cell flattening, visible in the
  * scan description), and prune columns down to nothing for a count.
  */
class Grib2ConnectorSpec extends SparkSpec {
  import graft.implicits._
  import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}

  private lazy val fixture: String = {
    val dir = java.nio.file.Files.createTempDirectory("grib2dsv2")
    def field(cat: Int, num: Int, base: Int) =
      Grib2.Field(0, cat, num, LocalDateTime.of(2003, 6, 15, 12, 0),
        ni = 7, nj = 5, la1Micro = 40000000L, lo1Micro = -25000000L,
        diMicro = 1500000L, djMicro = 2000000L, decimalScale = 1,
        Array.tabulate(35)(k => Some(base + (k % 7) * 3 + (k / 7) * 11)))
    Grib2.writeFile(dir.resolve("a.grib2"),
      Seq(field(0, 0, 0), field(1, 7, 100))).toString // TMP + PRATE
  }

  test("shortName and fully-qualified provider resolve to the same table") {
    val byName = spark.read.format("grib2").load(fixture)
    val byFqcn = spark.read.format("graft.sources.Grib2DataSource").load(fixture)
    byName.count() shouldBe 70L
    byFqcn.collect().toSet shouldBe byName.collect().toSet
  }

  test("connector output equals the direct readRecords path") {
    val dsv2 = spark.read.format("grib2").load(fixture)
      .orderBy($"variable", $"lat", $"lon").collect()
    val direct = Grib2.readRecords(spark, Seq(fixture))
      .orderBy($"variable", $"lat", $"lon").collect()
    dsv2.toSeq shouldBe direct.toSeq
  }

  test("variable predicates PUSH to the record level; unsupported ones stay with Spark") {
    val df = spark.read.format("grib2").load(fixture).where($"variable" === "TMP")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    plan should include("PushedFilters: [EqualTo(variable,TMP)]")
    df.count() shouldBe 35L
    df.select($"variable").distinct().collect().map(_.getString(0)) shouldBe Array("TMP")
    // IN and contains push too
    spark.read.format("grib2").load(fixture)
      .where($"variable".isin("TMP", "PRATE")).count() shouldBe 70L
    // a value predicate is NOT pushed (stays a Spark Filter) but still applies
    val vf = spark.read.format("grib2").load(fixture).where($"value" > 5.0)
    val vplan = vf.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    vplan should not include "PushedFilters: [GreaterThan(value"
    vf.count() should be < 70L
  }

  test("column pruning reaches the reader; count(*) now pushes as an aggregate") {
    val df = spark.read.format("grib2").load(fixture)
    // an ungrouped count routes to the count-only scan (header walk)
    val plan = df.groupBy().count().queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    plan should include("PushedAggregation: [COUNT(*)]")
    df.count() shouldBe 70L
    // a 2-column projection reads exactly those columns
    val p2 = df.select($"variable", $"value").queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    p2 should include("ReadSchema: struct<variable:string,value:double>")
  }

  test("COUNT(*) pushdown: header-only counts equal the row path, incl. bitmapped records") {
    // a sparse (bitmapped) field: every 4th cell missing — the pushed
    // count must agree with the NaN-dropping cell path, not ni*nj
    val dir = java.nio.file.Files.createTempDirectory("grib2cnt")
    def field(cat: Int, num: Int, mask: Boolean) =
      Grib2.Field(0, cat, num, LocalDateTime.of(2003, 6, 15, 12, 0),
        ni = 7, nj = 5, la1Micro = 40000000L, lo1Micro = -25000000L,
        diMicro = 1500000L, djMicro = 2000000L, decimalScale = 1,
        Array.tabulate(35)(k => if (mask && k % 4 == 0) None else Some(k + 3)))
    val p = Grib2.writeFile(dir.resolve("s.grib2"),
      Seq(field(0, 0, false), field(1, 7, true))).toString // TMP dense, PRATE sparse
    val df = spark.read.format("grib2").load(p)
    // 35 dense + (35 - 9 masked) = 61
    df.count() shouldBe 61L
    df.where($"variable" === "PRATE").count() shouldBe 26L
    df.where($"variable" === "PRATE").collect().length shouldBe 26 // row path agrees
    // a residual (non-pushable) filter blocks the aggregate pushdown —
    // Spark keeps the count correct through the ordinary row path
    val guarded = df.where($"value" > 5.0)
    val gplan = guarded.groupBy().count().queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    gplan should not include "PushedAggregation"
    guarded.count() shouldBe guarded.collect().length.toLong
    // grouped aggregates are NOT pushed (group-by is out of scope)
    val grouped = df.groupBy($"variable").count().queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    grouped should not include "PushedAggregation"
  }

  test("scan reports file-size statistics (metadata-only, no content reads)") {
    import org.apache.spark.sql.connector.read.SupportsReportStatistics
    val builder = new graft.sources.Grib2ScanBuilder(Seq(fixture))
    val stats = builder.build().asInstanceOf[SupportsReportStatistics].estimateStatistics()
    val actual = new java.io.File(fixture).length()
    stats.sizeInBytes().getAsLong shouldBe actual
    stats.numRows().isPresent shouldBe false
  }

  test("DSv2 write: sparse layers round-trip via bitmaps, Spark plans the clustering") {
    import org.apache.spark.sql.functions.{col, lit}
    val tmp = java.nio.file.Files.createTempDirectory("grib2w").toString
    // two layers across variables, one with a HOLE (masked cell) and a
    // synthetic var name; rows deliberately unsorted and in one partition
    val rows = Seq(
      ("TMP", "2004-05-01 00:00:00", 2.0, 11.0, 7.0),
      ("TMP", "2004-05-01 00:00:00", 1.0, 10.0, 4.0),
      ("TMP", "2004-05-01 00:00:00", 1.0, 11.0, 5.0),
      // (2.0, 10.0) missing -> bitmap
      ("var0-9-9", "2004-05-01 00:00:00", 1.0, 10.0, 1.0),
      ("var0-9-9", "2004-05-01 00:00:00", 1.0, 11.0, 2.0),
      ("var0-9-9", "2004-05-01 00:00:00", 2.0, 10.0, 3.0),
      ("var0-9-9", "2004-05-01 00:00:00", 2.0, 11.0, 4.0))
      .toDS().toDF("variable", "ts", "lat", "lon", "value")
      .select(col("variable"), col("ts").cast("timestamp_ntz").as("time"),
        col("lat"), col("lon"), col("value"))
    rows.coalesce(1).write.format("grib2").mode("overwrite")
      .option("decimalScale", "1").save(tmp)
    val back = spark.read.format("grib2").load(tmp)
      .orderBy(col("variable"), col("lat"), col("lon")).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    back shouldBe Array(
      ("TMP", 1.0, 10.0, 4.0), ("TMP", 1.0, 11.0, 5.0), ("TMP", 2.0, 11.0, 7.0),
      ("var0-9-9", 1.0, 10.0, 1.0), ("var0-9-9", 1.0, 11.0, 2.0),
      ("var0-9-9", 2.0, 10.0, 3.0), ("var0-9-9", 2.0, 11.0, 4.0))
  }

  test("DSv2 write rejects silent quantization and unknown names loudly") {
    import org.apache.spark.sql.functions.col
    def df(v: String, value: Double) = Seq(
      (v, "2004-05-01 00:00:00", 1.0, 10.0, value),
      (v, "2004-05-01 00:00:00", 2.0, 11.0, value))
      .toDS().toDF("variable", "ts", "lat", "lon", "value")
      .select(col("variable"), col("ts").cast("timestamp_ntz").as("time"),
        col("lat"), col("lon"), col("value"))
    val tmp = java.nio.file.Files.createTempDirectory("grib2w2").toString
    // 0.25 is not exact at decimalScale=1 -> loud reject, not rounding
    val e = intercept[Exception] {
      df("TMP", 0.25).coalesce(1).write.format("grib2")
        .mode("overwrite").option("decimalScale", "1").save(tmp)
    }
    e.getMessage should include("not exact at decimalScale")
    val e2 = intercept[Exception] {
      df("NOPE", 1.0).coalesce(1).write.format("grib2")
        .mode("overwrite").save(tmp)
    }
    e2.getMessage should include("no GRIB parameter mapping")
  }

  test("directory and glob paths expand; missing paths fail loudly") {
    val dir = new java.io.File(fixture).getParent
    spark.read.format("grib2").load(dir).count() shouldBe 70L
    an[Exception] should be thrownBy
      spark.read.format("grib2").load(s"$dir/nope-*.grib2").count()
  }
}
