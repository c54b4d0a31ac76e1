package graft

import java.time.LocalDateTime

import graft.sources.{Hdf5, Netcdf}

/** DSv2 connector laws for the netcdf source (gate r71/r72):
  * `spark.read.format("netcdf")` must equal the direct
  * [[Netcdf.readRecords]] path across BOTH containers (classic CDF and
  * netCDF-4/HDF5 in one load), push variable predicates to the
  * METADATA walk — proven by corrupting the pruned variable's chunks:
  * if the reader ever inflated them the scan would die — and answer
  * COUNT(*) without materializing rows.
  */
class NetcdfConnectorSpec extends SparkSpec {
  import spark.implicits.StringToColumn

  private val t0 = LocalDateTime.of(2006, 7, 3, 6, 0)

  private def field(v: String, t: LocalDateTime, bump: Int,
                    masked: Boolean = false): Netcdf.Field =
    Netcdf.Field(v, t, ni = 13, nj = 7,
      la1Micro = 40000000L, lo1Micro = -10000000L,
      diMicro = 2000000L, djMicro = 1500000L, decimalScale = 1,
      Array.tabulate(7 * 13) { k =>
        val j = k / 13; val i = k % 13
        if (masked && (i + j) % 5 == 2) None
        else Some(bump + i * 3 + j * 17)
      })

  /** One directory holding a classic CDF-1 file and an HDF5 file —
    * the mixed-archive shape one load() must handle.
    */
  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("ncdsv2")
    Netcdf.writeFile(dir.resolve("classic.nc"),
      Seq(field("TMP", t0, 100), field("PRATE", t0, 700, masked = true)))
    Hdf5.writeFile(dir.resolve("h5.nc"),
      Seq(field("TMP", t0.plusHours(12), 300), field("VGRD", t0.plusHours(12), 500)),
      chunkJ = 3, chunkI = 5)
    dir.toString
  }

  /** An HDF5 file whose VGRD chunks are OVERWRITTEN with zeros (invalid
    * deflate): any decode of VGRD dies loudly, so a scan surviving with
    * `variable = 'TMP'` pushed proves pruning happens at the metadata
    * walk, before chunk I/O.
    */
  private lazy val corruptPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("ncdsv2bad")
    val p = Hdf5.writeFile(dir.resolve("bad.nc"),
      Seq(field("TMP", t0, 100), field("VGRD", t0, 900)), chunkJ = 3, chunkI = 5)
    val bytes = java.nio.file.Files.readAllBytes(p)
    def u16(q: Int) = (bytes(q) & 0xff) | ((bytes(q + 1) & 0xff) << 8)
    def u32(q: Int) = u16(q).toLong | (u16(q + 2).toLong << 16)
    def u64(q: Int) = u32(q) | (u32(q + 4) << 32)
    val vgrd = Hdf5.parseDatasets(bytes, "fix").find(_.name == "VGRD").get
    val Hdf5.Chunked(btree, chunkDims, _) = vgrd.layout
    val n = u16(btree.toInt + 6)
    val keyLen = 8 + 8 * (chunkDims.length + 1)
    (0 until n).foreach { k =>
      val e = btree.toInt + 24 + (keyLen + 8) * k
      val size = u32(e).toInt
      val child = u64(e + keyLen).toInt
      java.util.Arrays.fill(bytes, child, child + size, 0.toByte)
    }
    java.nio.file.Files.write(p, bytes)
    p.toString
  }

  /** A GROUPED netCDF-4 file (obs/TMP, obs/deep/DEW) whose DEW chunks
    * are zeroed: a scan surviving with the GROUP-PATH filter pushed
    * proves group-scoped pruning happens at the metadata walk.
    */
  private lazy val corruptGroupedPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("ncdsv2grp")
    val p = Hdf5.writeFile(dir.resolve("grp.nc"),
      Seq(field("obs/TMP", t0, 100), field("obs/deep/DEW", t0, 900)),
      chunkJ = 3, chunkI = 5)
    val bytes = java.nio.file.Files.readAllBytes(p)
    def u16(q: Int) = (bytes(q) & 0xff) | ((bytes(q + 1) & 0xff) << 8)
    def u32(q: Int) = u16(q).toLong | (u16(q + 2).toLong << 16)
    def u64(q: Int) = u32(q) | (u32(q + 4) << 32)
    val dew = Hdf5.parseDatasets(bytes, "fix").find(_.name == "obs/deep/DEW").get
    val Hdf5.Chunked(btree, chunkDims, _) = dew.layout
    val n = u16(btree.toInt + 6)
    val keyLen = 8 + 8 * (chunkDims.length + 1)
    (0 until n).foreach { k =>
      val e = btree.toInt + 24 + (keyLen + 8) * k
      val size = u32(e).toInt
      val child = u64(e + keyLen).toInt
      java.util.Arrays.fill(bytes, child, child + size, 0.toByte)
    }
    java.nio.file.Files.write(p, bytes)
    p.toString
  }

  test("group-path variables push to the metadata walk (grouped corrupt-chunk pin)") {
    // unpruned: decoding obs/deep/DEW's zeroed chunks dies loudly
    intercept[Exception] {
      spark.read.format("netcdf").load(corruptGroupedPath).count()
    }
    // pushed variable = 'obs/TMP': the pruned group member's chunk
    // B-tree is never walked, so the scan survives
    val tmp = spark.read.format("netcdf").load(corruptGroupedPath)
      .where($"variable" === "obs/TMP")
    val plan = tmp.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    plan should include("PushedFilters: [EqualTo(variable,obs/TMP)]")
    tmp.collect().length shouldBe 91 // unmasked 7x13 layer
    tmp.groupBy().count().head().getLong(0) shouldBe 91L
  }

  test("shortName and FQCN resolve; output equals readRecords across both containers") {
    val byName = spark.read.format("netcdf").load(fixtureDir)
      .orderBy($"variable", $"time", $"lat", $"lon").collect()
    val byFqcn = spark.read.format("graft.sources.NetcdfDataSource").load(fixtureDir)
      .orderBy($"variable", $"time", $"lat", $"lon").collect()
    val direct = Netcdf.readRecords(spark,
      Seq(s"$fixtureDir/classic.nc", s"$fixtureDir/h5.nc"))
      .orderBy($"variable", $"time", $"lat", $"lon").collect()
    byName.toSeq shouldBe direct.toSeq
    byFqcn.toSeq shouldBe direct.toSeq
    // PRATE's masked cells dropped: 4 layers of 7x13 minus the 19
    // cells with (i + j) % 5 == 2
    byName.length shouldBe 4 * 91 - 19
  }

  test("variable predicates push to the metadata walk; unsupported ones stay with Spark") {
    val df = spark.read.format("netcdf").load(fixtureDir)
      .where($"variable" === "TMP")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    plan should include("PushedFilters: [EqualTo(variable,TMP)]")
    df.select($"variable").distinct().collect().map(_.getString(0)) shouldBe Array("TMP")
    val vf = spark.read.format("netcdf").load(fixtureDir)
      .where($"value" > 50.0)
    val vplan = vf.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    vplan should not include "PushedFilters: [GreaterThan(value"
  }

  test("pruned variables' chunks are NEVER decoded (corrupt-chunk pin), row and count paths") {
    // unpruned: decoding VGRD's zeroed chunks dies loudly
    intercept[Exception] {
      spark.read.format("netcdf").load(corruptPath).count()
    }
    // pushed variable = TMP: VGRD's chunk B-tree is never walked
    val tmp = spark.read.format("netcdf").load(corruptPath)
      .where($"variable" === "TMP")
    tmp.collect().length shouldBe 91 // unmasked 7x13 layer
    // same for the count-pushed path
    val cnt = tmp.groupBy().count()
    cnt.head().getLong(0) shouldBe 91L
  }

  test("COUNT(*) pushes as an aggregate, equals the row path, and grouped counts do not push") {
    val df = spark.read.format("netcdf").load(fixtureDir)
    val cplan = df.groupBy().count().queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    cplan should include("PushedAggregation: [COUNT(*)]")
    // fill cells drop from the count exactly as from the rows
    df.groupBy().count().head().getLong(0) shouldBe df.collect().length.toLong
    val filtered = df.where($"variable" === "PRATE").groupBy().count()
    filtered.head().getLong(0) shouldBe
      df.collect().count(_.getString(0) == "PRATE").toLong
    val grouped = df.groupBy($"variable").count().queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    grouped should not include "PushedAggregation"
  }

  test("directory paths expand to .nc files; missing paths fail loudly") {
    spark.read.format("netcdf").load(fixtureDir).count() should be > 0L
    intercept[Exception] {
      spark.read.format("netcdf").load(s"$fixtureDir/nope").count()
    }
  }
}
