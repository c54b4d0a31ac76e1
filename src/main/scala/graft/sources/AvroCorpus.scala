package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.{AvroInputFormat, AvroWrapper}
import org.apache.avro.util.Utf8
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro Object-Container-File interchange (the remaining mainstream row
  * format after parquet/ORC/CSV/JSONL — t16/t21/t26's matrix), built on
  * the Avro CORE + mapred jars only: this environment ships no
  * `spark-avro` connector, so the DataFrame boundary is hand-rolled the
  * way [[Grib1]]/[[GeoTiff]] own their formats.
  *
  * Scale shape, both directions:
  *   - WRITE is per-partition: each task streams its rows through one
  *     `DataFileWriter` (deflate-compressed blocks + sync markers) into
  *     `part-NNNNN.avro` via the Hadoop filesystem layer — local dir
  *     here, s3a/hdfs on a cluster, no driver funnel.
  *   - READ uses `AvroInputFormat`, which SPLITS on the container's sync
  *     markers — a 1 TB .avro scans with full task parallelism (unlike
  *     whole-file byte decoding, which is the GRIB atom only because the
  *     packed bitstream there has no intra-record split points).
  *
  * Schema is declared, never inferred (one extra full pass at 100 TB);
  * unsupported Catalyst types are rejected loudly at plan time.
  */
object AvroCorpus {

  /** Catalyst → Avro record schema (nullable unions). JSON string form so
    * executors re-parse it locally (`Schema` itself is not serializable).
    */
  def avroSchemaJson(schema: StructType, name: String = "corpus"): String = {
    val fields = schema.fields.map { f =>
      val t = f.dataType match {
        case LongType => "\"long\""
        case IntegerType => "\"int\""
        case DoubleType => "\"double\""
        case FloatType => "\"float\""
        case BooleanType => "\"boolean\""
        case StringType => "\"string\""
        case BinaryType => "\"bytes\""
        case other =>
          sys.error(s"AvroCorpus: unsupported column type $other for field ${f.name}")
      }
      s"""{"name":"${f.name}","type":["null",$t],"default":null}"""
    }
    s"""{"type":"record","name":"$name","fields":[${fields.mkString(",")}]}"""
  }

  /** Write `df` as deflate-compressed Avro container files, one per
    * partition. Returns the number of files written.
    */
  def write(df: DataFrame, dir: String): Int = {
    val sparkSchema = df.schema
    val json = avroSchemaJson(sparkSchema)
    val n = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val avro = new Schema.Parser().parse(json)
        val conf = new org.apache.hadoop.conf.Configuration()
        val path = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.avro")
        val out = path.getFileSystem(conf).create(path, true)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avro))
          .setCodec(CodecFactory.deflateCodec(6))
          .create(avro, out)
        try {
          rows.foreach { row =>
            val rec = new GenericData.Record(avro)
            var i = 0
            while (i < sparkSchema.length) {
              val v = row.get(i)
              rec.put(i, v match {
                case null => null
                case s: String => new Utf8(s)
                case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
                case other => other
              })
              i += 1
            }
            w.append(rec)
          }
        } finally w.close() // closes the stream; flushes the final block
        Iterator.single(1)
      }
    }.sum().toInt
    n
  }

  /** Read an Avro container tree back as a DataFrame with the declared
    * schema — the splittable `AvroInputFormat` path.
    */
  def read(s: SparkSession, dir: String, schema: StructType): DataFrame = {
    val n = schema.length
    val types = schema.fields.map(_.dataType)
    val rows = s.sparkContext.hadoopFile(
        s"$dir/*.avro",
        classOf[AvroInputFormat[GenericRecord]],
        classOf[AvroWrapper[GenericRecord]],
        classOf[NullWritable])
      // convert to Row IN this stage: GenericRecord must never cross a
      // stage boundary (not serializable-friendly, and the raw object is
      // fatter than the row)
      .map { case (w, _) =>
        val rec = w.datum()
        val vals = new Array[Any](n)
        var i = 0
        while (i < n) {
          vals(i) = rec.get(i) match {
            case null => null
            case u: Utf8 => u.toString
            case b: java.nio.ByteBuffer =>
              val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
            case other => other
          }
          i += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    val df = s.createDataFrame(rows, StructType(schema.fields.map(_.copy(nullable = true))))
    // guard against silent field/type drift between writer and reader
    require(df.schema.length == types.length, "schema arity drift")
    df
  }
}
