package graft.sources

import java.util
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In, StringContains}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for GRIB2: `spark.read.format("grib2")
  * .load(path)` — the idiomatic-Spark face of [[Grib2]], so GRIB files
  * plug into SQL like any table instead of through a bespoke entry
  * point. The connector does the two things DSv2 exists for:
  *
  *  - **record-level filter pushdown**: `variable = 'TMP'` /
  *    `variable IN (...)` / `contains(variable, ...)` prune whole GRIB
  *    records BEFORE their cells are materialized — a 29x13 grid is 377
  *    rows per record, operational files carry hundreds of records per
  *    variable, so pushing the variable predicate is a 100-1000×
  *    row-volume cut at the source (visible as PushedFilters in
  *    explain, pinned by Grib2ConnectorSpec);
  *  - **column pruning**: the reader materializes only the requested
  *    columns (a `count(*)` reads no cell values at all);
  *  - **COUNT(*) aggregate pushdown**: an ungrouped count is answered
  *    from section-5 point counts in a header-only walk — no cell
  *    decode, no per-cell rows; one partial count per file, summed by
  *    Spark (see [[Grib2CountScan]]).
  *
  * Partitioning: one input partition per file — GRIB messages are not
  * independently splittable without an index, and operational
  * distributions ship many files (one per cycle/forecast hour), which
  * is the parallelism axis that matters. Registered by shortName via
  * META-INF/services; schema is fixed long-format
  * (variable, time, lat, lon, value).
  */
class Grib2DataSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "grib2"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Grib2Connector.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    // RAW paths here: reads expand them to concrete files at scan-build
    // time (a write target may legitimately hold no GRIB files yet)
    new Grib2ConnectorTable(Grib2Connector.rawPaths(properties))
}

/** Hadoop `Configuration` is not `Serializable`; this wrapper ships the
  * DRIVER's session hadoopConfiguration to executor-side readers/writers
  * (the pattern Spark's own file sources use), so filesystems configured
  * via `spark.hadoop.*` (S3A/GCS credentials, custom FS impls) resolve
  * identically at planning time and in per-file task I/O. A bare
  * `new Configuration()` on the executor would see only core-default.xml.
  */
class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

object Grib2Connector {
  val Schema: StructType = StructType(Seq(
    StructField("variable", StringType, nullable = false),
    StructField("time", TimestampNTZType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** The driver session's hadoopConfiguration, capture-ready. Called at
    * scan/write BUILD time (driver side) so executor-side I/O sees the
    * same `spark.hadoop.*` view as planning.
    */
  def sessionConf(): SerializableHadoopConf =
    new SerializableHadoopConf(org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration)

  /** The user-supplied path option(s), unexpanded. Spark JSON-encodes the
    * multi-path `paths` option, so it is parsed as a JSON string array —
    * a bracket-strip-and-split would shred any path containing a comma or
    * quote into nonexistent paths that fail later with a misleading
    * "no GRIB files found".
    */
  def rawPaths(properties: util.Map[String, String]): Seq[String] =
    Option(properties.get("paths"))
      .map { p =>
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val node = try mapper.readTree(p) catch {
          case e: Exception =>
            sys.error(s"grib2 source: 'paths' option is not a JSON array: $p (${e.getMessage})")
        }
        require(node != null && node.isArray,
          s"grib2 source: 'paths' option must be a JSON string array, got: $p")
        (0 until node.size).map { i =>
          val el = node.get(i)
          require(el.isTextual, s"grib2 source: non-string entry in 'paths': $el")
          el.asText()
        }
      }
      .orElse(Option(properties.get("path")).map(Seq(_)))
      .getOrElse(sys.error("grib2 source requires a path"))

  /** Expand raw paths to concrete .grib2/.grib files (directories
    * recurse) via the Hadoop FS API — works on any supported filesystem,
    * not just local. Read-side only; called at scan-build time so a
    * write target may start empty.
    */
  def resolvePaths(raw: Seq[String]): Seq[String] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val files = raw.flatMap { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      def walk(st: org.apache.hadoop.fs.FileStatus): Seq[String] =
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(walk)
        else if (st.getPath.getName.matches(".*\\.gri?b2?$")) Seq(st.getPath.toString)
        else Nil
      // globStatus: null for a missing literal path, EMPTY for a glob
      // with no matches — both are a loud error, not a silent 0 rows
      Option(fs.globStatus(hp)).toSeq.flatten.flatMap(walk)
    }
    require(files.nonEmpty,
      s"grib2 source: no GRIB files found under ${raw.mkString(", ")}")
    files
  }

  /** The ONE evaluation of the pushed variable predicates, shared by the
    * row reader and the count-only reader so they can never disagree.
    */
  def keep(pushed: Array[Filter])(variable: String): Boolean = pushed.forall {
    case EqualTo("variable", v: String)  => variable == v
    case In("variable", vs)              => vs.exists(_ == variable)
    case StringContains("variable", v)   => variable.contains(v)
    case _                               => true
  }

  /** Read a whole file's bytes through the Hadoop FS API, using the
    * propagated session configuration. The length guard is load-bearing:
    * `getLen.toInt` on a ≥ 4 GiB file would wrap to a small positive
    * length and, because GRIB files are concatenated messages, a
    * message-boundary-aligned truncation would SILENTLY drop records
    * from both the row scan and the COUNT(*) pushdown.
    */
  def readBytes(path: String, conf: org.apache.hadoop.conf.Configuration): Array[Byte] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(conf)
    val in = fs.open(hp)
    try {
      val len = fs.getFileStatus(hp).getLen
      require(len <= Int.MaxValue,
        s"grib2 source: $path is $len bytes, beyond the 2 GiB whole-file " +
          "read scope — split the file at message boundaries")
      val buf = new Array[Byte](len.toInt)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }
}

class Grib2ConnectorTable(paths: Seq[String])
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"grib2(${paths.mkString(",")})"
  override def schema(): StructType = Grib2Connector.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new Grib2ScanBuilder(paths)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(paths.length == 1, "grib2 writer: exactly one target directory")
    new Grib2WriteBuilder(paths.head, info)
  }
}

class Grib2ScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = Grib2Connector.Schema
  private var countStar = false

  /** Accept variable-column predicates the record header can answer;
    * everything else stays with Spark (returned as not-pushed).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("variable", _: String)       => true
      case In("variable", vs)                   => vs.forall(_.isInstanceOf[String])
      case StringContains("variable", _)        => true
      case _                                    => false
    }
    pushed = accepted
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Ungrouped COUNT(*) pushes all the way into the format: the reader
    * answers it from section-5 point counts (header-only walk, zero
    * section-7 unpack — see [[Grib2.countPresentCells]]) and emits one
    * partial count per FILE; Spark sums the partials (partial pushdown,
    * the parquet-metadata-count pattern). Spark only offers the
    * aggregate when every filter was fully pushed, so the count always
    * agrees with the record-pruned read.
    */
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    val ok = agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]
    if (ok) countStar = true
    ok
  }

  override def build(): Scan =
    if (countStar) new Grib2CountScan(paths, pushed)
    else new Grib2Scan(paths, pushed, required)
}

class Grib2Scan(paths: Seq[String], pushed: Array[Filter], required: StructType)
    extends Scan with Batch with SupportsReportStatistics {
  private lazy val files = Grib2Connector.resolvePaths(paths)
  override def readSchema(): StructType = required
  override def description(): String =
    s"grib2 scan, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(p => Grib2InputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new Grib2ReaderFactory(pushed, required, Grib2Connector.sessionConf())

  /** Metadata-only size statistics (file lengths via the FS API — no
    * content reads on the driver), so Catalyst can cost this source
    * for join-side selection like any file relation; numRows stays
    * unknown (counting would read every file's sections, which is the
    * count-pushdown path's job, not planning's).
    */
  override def estimateStatistics(): Statistics = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val bytes = files.map { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(conf).getFileStatus(hp).getLen
    }.sum
    new Statistics {
      override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(bytes)
      override def numRows(): util.OptionalLong = util.OptionalLong.empty()
    }
  }
}

case class Grib2InputPartition(path: String) extends InputPartition

class Grib2ReaderFactory(pushed: Array[Filter], required: StructType,
                         conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new Grib2PartitionReader(
      partition.asInstanceOf[Grib2InputPartition].path, pushed, required, conf)
}

/** Per-file reader: parses the messages once, drops records the pushed
  * variable predicates reject BEFORE flattening cells, and emits only
  * the pruned columns.
  */
class Grib2PartitionReader(path: String, pushed: Array[Filter],
                           required: StructType, conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private def keepRecord(variable: String): Boolean =
    Grib2Connector.keep(pushed)(variable)

  private val cells: Iterator[Grib2.GridRow] =
    Grib2.parseMessages(Grib2Connector.readBytes(path, conf.value), path).iterator
      .filter(r => keepRecord(r.variable))
      .flatMap(Grib2.cells)

  // column-pruned projection: precompute per-required-field extractors
  private val extractors: Array[Grib2.GridRow => Any] =
    required.fields.map { f =>
      f.name match {
        case "variable" => (r: Grib2.GridRow) => UTF8String.fromString(r.variable)
        case "time" => (r: Grib2.GridRow) =>
          r.time.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            r.time.getNano / 1000L
        case "lat"   => (r: Grib2.GridRow) => r.lat
        case "lon"   => (r: Grib2.GridRow) => r.lon
        case "value" => (r: Grib2.GridRow) => r.value
        case other   => sys.error(s"unknown grib2 column $other")
      }
    }

  private var current: InternalRow = _
  override def next(): Boolean = {
    if (!cells.hasNext) false
    else {
      val r = cells.next()
      val vals = new ArrayBuffer[Any](extractors.length)
      extractors.foreach(e => vals += e(r))
      current = InternalRow.fromSeq(vals.toSeq)
      true
    }
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** COUNT(*)-pushed scan: one partial-count row per file, answered from
  * section headers only ([[Grib2.countPresentCells]]); Spark plans the
  * final sum over the partials. The description line carries the
  * PushedAggregation marker so explain output (and the plan guard) can
  * prove the pushdown engaged.
  */
class Grib2CountScan(paths: Seq[String], pushed: Array[Filter])
    extends Scan with Batch {
  private lazy val files = Grib2Connector.resolvePaths(paths)
  override def readSchema(): StructType =
    StructType(Seq(StructField("count(*)", LongType, nullable = false)))
  override def description(): String =
    s"grib2 count-only scan, PushedFilters: [${pushed.mkString(", ")}], " +
      "PushedAggregation: [COUNT(*)]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(p => Grib2InputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new Grib2CountReaderFactory(pushed, Grib2Connector.sessionConf())
}

class Grib2CountReaderFactory(pushed: Array[Filter], conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new Grib2CountPartitionReader(
      partition.asInstanceOf[Grib2InputPartition].path, pushed, conf)
}

class Grib2CountPartitionReader(path: String, pushed: Array[Filter],
                                conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {
  private var emitted = false
  private var current: InternalRow = _
  override def next(): Boolean =
    if (emitted) false
    else {
      current = InternalRow(Grib2.countPresentCells(
        Grib2Connector.readBytes(path, conf.value), path, Grib2Connector.keep(pushed)))
      emitted = true
      true
    }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

// ------------------------------------------------------------- write path

/** DSv2 write: `df.write.format("grib2").save(dir)`. The interesting
  * part is [[Grib2Write]]'s `RequiresDistributionAndOrdering` — the
  * writer DECLARES that rows must arrive clustered by (variable, time)
  * and sorted by (variable, time, lat, lon), and SPARK plans the shuffle
  * and sort: each GRIB layer then materializes contiguously inside one
  * task, which assembles it into a message with zero writer-side state
  * beyond the current layer. Scope: regular lat/lon lattices (spacing
  * inferred from the data, or pinned via latStepMicro/lonStepMicro
  * options), values exact at the configured decimalScale — anything
  * else rejects loudly, never quantizes silently. Missing cells become
  * a bitmap, so sparse layers round-trip.
  */
class Grib2WriteBuilder(path: String,
                        info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write = {
    val s = info.schema()
    val need = Seq("variable", "time", "lat", "lon", "value")
    require(need.forall(c => s.fieldNames.contains(c)),
      s"grib2 writer needs columns (${need.mkString(", ")}), got ${s.fieldNames.mkString(", ")}")
    new Grib2Write(path, s, doTruncate, info.options())
  }
}

class Grib2Write(path: String, schema: StructType, truncate: Boolean,
                 options: CaseInsensitiveStringMap)
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering
    with org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
  import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection, SortOrder}
  import org.apache.spark.sql.connector.write._

  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(
      Expressions.identity("variable"), Expressions.identity("time")))
  override def requiredOrdering(): Array[SortOrder] =
    Array("variable", "time", "lat", "lon").map(c =>
      Expressions.sort(Expressions.column(c),
        SortDirection.ASCENDING, NullOrdering.NULLS_FIRST))
  override def requiredNumPartitions(): Int = 0 // let Spark pick

  override def toBatch: BatchWrite = this

  // Job-level atomicity: tasks stage their files under a job-scoped temp
  // directory; the destructive steps (truncate deletes, renames into the
  // target) happen ONLY in BatchWrite.commit, after every task has
  // committed — a mid-job failure leaves the target untouched and abort()
  // just drops the staging dir. (The FileCommitProtocol discipline,
  // reduced to this sink's one-directory layout.)
  private val stagingName = ".graft-staging-" + java.util.UUID.randomUUID().toString
  private def stagingDir = new org.apache.hadoop.fs.Path(path, stagingName)
  // captured lazily at first driver-side use (build/commit both run on
  // the driver); executors get it via the factory
  private lazy val sconf = Grib2Connector.sessionConf()

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val fs = stagingDir.getFileSystem(sconf.value)
    fs.mkdirs(stagingDir)
    val dScale = Option(options.get("decimalScale")).map(_.toInt).getOrElse(0)
    val latStep = Option(options.get("latStepMicro")).map(_.toLong)
    val lonStep = Option(options.get("lonStepMicro")).map(_.toLong)
    new Grib2WriterFactory(stagingDir.toString, schema, dScale, latStep, lonStep, sconf)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(sconf.value)
    if (truncate && fs.exists(dir))
      fs.listStatus(dir).filter(_.getPath.getName.matches(".*\\.gri?b2?$"))
        .foreach(st => fs.delete(st.getPath, false))
    messages.foreach {
      case Grib2CommitMessage(file) if file.nonEmpty =>
        val staged = new org.apache.hadoop.fs.Path(file)
        fs.rename(staged, new org.apache.hadoop.fs.Path(dir, staged.getName))
      case _ => ()
    }
    fs.delete(stagingDir, true)
    ()
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = stagingDir.getFileSystem(sconf.value)
    fs.delete(stagingDir, true)
    ()
  }
}

class Grib2WriterFactory(path: String, schema: StructType, dScale: Int,
                         latStep: Option[Long], lonStep: Option[Long],
                         conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new Grib2DataWriter(path, partitionId, taskId, schema, dScale, latStep, lonStep, conf)
}

private case class Grib2CommitMessage(file: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

/** Per-task writer: rows arrive (variable, time)-clustered and fully
  * sorted (the Write's declared requirement), so a layer ends exactly
  * when its key changes — assemble it into one GRIB2 message, append to
  * the task's temp file inside the job's STAGING directory, and rename
  * (still within staging) on task commit; the job-level commit moves
  * staged files into the target (task-level atomicity here, job-level
  * atomicity in [[Grib2Write.commit]]; speculative duplicates can't
  * collide thanks to the task id in the name).
  */
class Grib2DataWriter(dir: String, partitionId: Int, taskId: Long,
                      schema: StructType, dScale: Int,
                      latStep: Option[Long], lonStep: Option[Long],
                      sconf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val iVar = schema.fieldIndex("variable")
  private val iTime = schema.fieldIndex("time")
  private val iLat = schema.fieldIndex("lat")
  private val iLon = schema.fieldIndex("lon")
  private val iVal = schema.fieldIndex("value")

  private val conf = sconf.value
  private val tmpPath = new org.apache.hadoop.fs.Path(dir,
    f".part-$partitionId%05d-$taskId.grib2.inprogress")
  private val finalPath = new org.apache.hadoop.fs.Path(dir,
    f"part-$partitionId%05d-$taskId.grib2")
  private val fs = tmpPath.getFileSystem(conf)
  private lazy val out = fs.create(tmpPath, true)

  private var curVar: String = _
  private var curTime: Long = Long.MinValue
  private val rows = ArrayBuffer[(Double, Double, Double)]()
  private var wrote = false

  override def write(record: InternalRow): Unit = {
    val v = record.getUTF8String(iVar).toString
    val t = record.getLong(iTime)
    if (v != curVar || t != curTime) {
      flushLayer()
      curVar = v; curTime = t
    }
    rows += ((record.getDouble(iLat), record.getDouble(iLon),
      record.getDouble(iVal)))
  }

  private def flushLayer(): Unit = if (rows.nonEmpty) {
    val (d, c, n) = Grib2.paramOf(curVar)
    require(curTime % 1000000L == 0,
      s"grib2 writer: sub-second time for $curVar (section 1 carries seconds)")
    val time = java.time.LocalDateTime.ofEpochSecond(
      curTime / 1000000L, 0, java.time.ZoneOffset.UTC)
    def micro(v: Double, axis: String): Long = {
      val m = Math.round(v * 1e6)
      require(m / 1e6 == v, s"grib2 writer: $axis $v not microdegree-exact")
      m
    }
    val lats = rows.map(r => micro(r._1, "lat")).distinct.sorted.toSeq
    val lons = rows.map(r => micro(r._2, "lon")).distinct.sorted.toSeq
    def step(cs: Seq[Long], fixed: Option[Long], axis: String): Long = fixed.getOrElse {
      require(cs.length >= 2,
        s"grib2 writer: cannot infer $axis spacing from a single value " +
          s"(layer $curVar; pass ${axis}StepMicro)")
      val gaps = cs.sliding(2).map(p => p(1) - p(0)).toSeq
      val g = gaps.min
      require(gaps.forall(_ % g == 0), s"grib2 writer: non-uniform $axis lattice in $curVar")
      g
    }
    val dj = step(lats, latStep, "lat")
    val di = step(lons, lonStep, "lon")
    val la1 = lats.head; val lo1 = lons.head
    val nj = ((lats.last - la1) / dj + 1).toInt
    val ni = ((lons.last - lo1) / di + 1).toInt
    require(ni > 1 && nj > 1,
      s"grib2 writer: degenerate ${ni}x$nj lattice for $curVar (grid template 3.0 needs > 1 per axis)")
    val p10 = math.pow(10.0, dScale)
    val scaled = Array.fill[Option[Int]](ni * nj)(None)
    rows.foreach { case (la, lo, v) =>
      val j = ((micro(la, "lat") - la1) / dj).toInt
      val i = ((micro(lo, "lon") - lo1) / di).toInt
      require((micro(la, "lat") - la1) % dj == 0 && (micro(lo, "lon") - lo1) % di == 0,
        s"grib2 writer: off-lattice cell ($la, $lo) in $curVar")
      val s = Math.round(v * p10)
      require(s / p10 == v && math.abs(s) <= Int.MaxValue,
        s"grib2 writer: value $v not exact at decimalScale=$dScale in $curVar")
      require(scaled(j * ni + i).isEmpty,
        s"grib2 writer: duplicate cell ($la, $lo) in $curVar")
      scaled(j * ni + i) = Some(s.toInt)
    }
    out.write(Grib2.encodeMessage(Grib2.Field(d, c, n, time, ni, nj,
      la1, lo1, di, dj, decimalScale = dScale, scaled, scanMode = 0x40)))
    wrote = true
    rows.clear()
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    flushLayer()
    out.close()
    if (wrote) {
      fs.rename(tmpPath, finalPath)
      Grib2CommitMessage(finalPath.toString)
    } else {
      fs.delete(tmpPath, false) // empty partition: no file
      Grib2CommitMessage("")
    }
  }
  override def abort(): Unit = {
    try out.close() catch { case _: Exception => () }
    fs.delete(tmpPath, false)
    ()
  }
  override def close(): Unit = ()
}
