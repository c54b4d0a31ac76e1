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

/** DataSource V2 connector for netCDF (classic CDF-1/2/5 AND the
  * netCDF-4/HDF5 classic-model subset, magic-dispatched per file):
  * `spark.read.format("netcdf").load(path)` — the idiomatic-Spark face
  * of [[Netcdf]]/[[Hdf5]], mirroring [[Grib2DataSource]]
  * (`Grib2Connector.scala`):
  *
  *  - **variable pushdown at the metadata walk**: `variable = 'TMP'` /
  *    `IN` / `contains` prune whole datasets BEFORE any slab or chunk
  *    decode — a pruned netCDF-4 variable's chunk B-tree is never
  *    walked and its chunks never inflated (NetcdfConnectorSpec pins
  *    this by corrupting the pruned variable's chunks: the scan still
  *    succeeds);
  *  - **column pruning**: only requested columns materialize;
  *  - **COUNT(*) aggregate pushdown**: one partial count per file with
  *    ZERO row materialization. Honest scope note: unlike GRIB2 —
  *    whose section-6 bitmap makes COUNT header-only — netCDF fill
  *    cells drop from the flatten and fill-presence is data-dependent,
  *    so KEPT variables' payloads still decode; the pushdown removes
  *    the per-cell explode and never touches pruned variables.
  *
  * Partitioning: one input partition per file — the container is not
  * splittable without its metadata, and real archives ship many files
  * (one per cycle/month), which is the parallelism axis that matters.
  */
class NetcdfDataSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "netcdf"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Grib2Connector.Schema // the shared long-format raster contract
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new NetcdfConnectorTable(Grib2Connector.rawPaths(properties))
}

object NetcdfConnector {
  /** Expand raw paths to concrete .nc/.nc4/.cdf files (directories
    * recurse) via the Hadoop FS API.
    */
  def resolvePaths(raw: Seq[String]): Seq[String] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val files = raw.flatMap { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      def walk(st: org.apache.hadoop.fs.FileStatus): Seq[String] =
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(walk)
        else if (st.getPath.getName.matches(".*\\.(nc4?|cdf)$")) Seq(st.getPath.toString)
        else Nil
      Option(fs.globStatus(hp)).toSeq.flatten.flatMap(walk)
    }
    require(files.nonEmpty,
      s"netcdf source: no .nc/.nc4/.cdf files found under ${raw.mkString(", ")}")
    files
  }
}

class NetcdfConnectorTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"netcdf(${paths.mkString(",")})"
  override def schema(): StructType = Grib2Connector.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NetcdfScanBuilder(paths)
}

class NetcdfScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = Grib2Connector.Schema
  private var countStar = false

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("variable", _: String) => true
      case In("variable", vs)             => vs.forall(_.isInstanceOf[String])
      case StringContains("variable", _)  => true
      case _                              => false
    }
    pushed = accepted
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

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
    if (countStar) new NetcdfCountScan(paths, pushed)
    else new NetcdfScan(paths, pushed, required)
}

class NetcdfScan(paths: Seq[String], pushed: Array[Filter], required: StructType)
    extends Scan with Batch with SupportsReportStatistics {
  private lazy val files = NetcdfConnector.resolvePaths(paths)
  override def readSchema(): StructType = required
  override def description(): String =
    s"netcdf scan, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(p => NetcdfInputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new NetcdfReaderFactory(pushed, required, Grib2Connector.sessionConf())

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

case class NetcdfInputPartition(path: String) extends InputPartition

class NetcdfReaderFactory(pushed: Array[Filter], required: StructType,
                          conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new NetcdfPartitionReader(
      partition.asInstanceOf[NetcdfInputPartition].path, pushed, required, conf)
}

/** Per-file reader: the pushed variable predicates become the `keep`
  * function handed to [[Netcdf.records]], so pruned variables are
  * dropped at the metadata walk — their payloads are never decoded.
  */
class NetcdfPartitionReader(path: String, pushed: Array[Filter],
                            required: StructType, conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val cells: Iterator[Netcdf.GridRow] =
    Netcdf.records(Grib2Connector.readBytes(path, conf.value), path,
      Grib2Connector.keep(pushed))

  private val extractors: Array[Netcdf.GridRow => Any] =
    required.fields.map { f =>
      f.name match {
        case "variable" => (r: Netcdf.GridRow) => UTF8String.fromString(r.variable)
        case "time" => (r: Netcdf.GridRow) =>
          r.time.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            r.time.getNano / 1000L
        case "lat"   => (r: Netcdf.GridRow) => r.lat
        case "lon"   => (r: Netcdf.GridRow) => r.lon
        case "value" => (r: Netcdf.GridRow) => r.value
        case other   => sys.error(s"unknown netcdf column $other")
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

/** COUNT(*)-pushed scan: one partial-count row per file via
  * [[Netcdf.countPresentCells]] — zero row materialization, pruned
  * variables never decoded (kept ones still decode; fill-dropping is
  * data-dependent in this format, see the class scaladoc). The
  * description carries the PushedAggregation marker for the plan guard.
  */
class NetcdfCountScan(paths: Seq[String], pushed: Array[Filter])
    extends Scan with Batch {
  private lazy val files = NetcdfConnector.resolvePaths(paths)
  override def readSchema(): StructType =
    StructType(Seq(StructField("count(*)", LongType, nullable = false)))
  override def description(): String =
    s"netcdf count-only scan, PushedFilters: [${pushed.mkString(", ")}], " +
      "PushedAggregation: [COUNT(*)]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(p => NetcdfInputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new NetcdfCountReaderFactory(pushed, Grib2Connector.sessionConf())
}

class NetcdfCountReaderFactory(pushed: Array[Filter], conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new NetcdfCountPartitionReader(
      partition.asInstanceOf[NetcdfInputPartition].path, pushed, conf)
}

class NetcdfCountPartitionReader(path: String, pushed: Array[Filter],
                                 conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {
  private var emitted = false
  private var current: InternalRow = _
  override def next(): Boolean =
    if (emitted) false
    else {
      current = InternalRow(Netcdf.countPresentCells(
        Grib2Connector.readBytes(path, conf.value), path, Grib2Connector.keep(pushed)))
      emitted = true
      true
    }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
