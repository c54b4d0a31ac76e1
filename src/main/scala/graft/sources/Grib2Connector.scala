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
  *    columns (a `count(*)` reads no cell values at all).
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
    new Grib2ConnectorTable(Grib2Connector.resolvePaths(properties))
}

object Grib2Connector {
  val Schema: StructType = StructType(Seq(
    StructField("variable", StringType, nullable = false),
    StructField("time", TimestampNTZType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Expand the `path`/`paths` options to concrete .grib2/.grib files
    * (directories recurse) via the Hadoop FS API — works on any
    * supported filesystem, not just local.
    */
  def resolvePaths(properties: util.Map[String, String]): Seq[String] = {
    val raw = Option(properties.get("paths"))
      .map(p => p.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq)
      .orElse(Option(properties.get("path")).map(Seq(_)))
      .getOrElse(sys.error("grib2 source requires a path"))
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
}

class Grib2ConnectorTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"grib2(${paths.mkString(",")})"
  override def schema(): StructType = Grib2Connector.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new Grib2ScanBuilder(paths)
}

class Grib2ScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = Grib2Connector.Schema

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

  override def build(): Scan = new Grib2Scan(paths, pushed, required)
}

class Grib2Scan(paths: Seq[String], pushed: Array[Filter], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"grib2 scan, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => Grib2InputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new Grib2ReaderFactory(pushed, required)
}

case class Grib2InputPartition(path: String) extends InputPartition

class Grib2ReaderFactory(pushed: Array[Filter], required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new Grib2PartitionReader(
      partition.asInstanceOf[Grib2InputPartition].path, pushed, required)
}

/** Per-file reader: parses the messages once, drops records the pushed
  * variable predicates reject BEFORE flattening cells, and emits only
  * the pruned columns.
  */
class Grib2PartitionReader(path: String, pushed: Array[Filter],
                           required: StructType)
    extends PartitionReader[InternalRow] {

  private def keepRecord(variable: String): Boolean = pushed.forall {
    case EqualTo("variable", v: String)  => variable == v
    case In("variable", vs)              => vs.exists(_ == variable)
    case StringContains("variable", v)   => variable.contains(v)
    case _                               => true
  }

  private val cells: Iterator[Grib2.GridRow] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(hp)
    val bytes = try {
      val len = fs.getFileStatus(hp).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(0, buf)
      buf
    } finally in.close()
    Grib2.parseMessages(bytes, path).iterator
      .filter(r => keepRecord(r.variable))
      .flatMap(Grib2.cells)
  }

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
