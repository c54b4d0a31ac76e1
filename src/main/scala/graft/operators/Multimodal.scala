package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.implicits._

/** Decoded-asset feature row produced by [[Multimodal.decodeFeatures]]. */
case class AssetFeatures(doc_id: Long, n_bytes: Long, checksum: String,
                         width: Int, height: Int, mean_luma: Double)

/** Multimodal-column operators (north-star extension): image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata, and
  * per-asset kernels (decode, feature-extract, frame-sample) run as
  * distributed per-partition functions over the bytes.
  *
  * The reference's multimodal analog is its GRIB byte-stream handling —
  * opaque binary in, per-record kernels out (SURVEY.md §1.2 Binary,
  * src/download.js:58-94 byteranges reassembly) — and this module is the
  * Spark-native shape of that: schema'd binary + metadata columns,
  * codegen'd slicing for sampling, `mapPartitions` for the decoder.
  *
  * The decoders themselves are STUBBED (no image/audio libraries in this
  * environment): [[Multimodal.stubDecode]] is a deterministic fake clearly
  * marked as such. Everything Spark-side — schema, partitioning, batch
  * iteration, typed output — is real and tested.
  */
object Multimodal {

  /** Attach the binary payload + metadata columns: the ingest boundary
    * where an asset table enters the engine. Payload here derives from the
    * fixture's text (UTF-8 bytes) since TESTDATA.md forbids synthesizing
    * independent inputs; a real corpus lands `binaryFile`-format columns
    * the same shape.
    */
  def withPayload(documents: DataFrame): DataFrame =
    documents.select(
      $"doc_id",
      $"text".cast("binary").as("payload"),
      struct(
        length($"text".cast("binary")).cast("long").as("n_bytes"),
        $"source".as("container"),
        lit("application/octet-stream").as("mime")).as("meta"))

  /** Byte-level payload statistics — pure codegen'd projection, no UDF:
    * size, content hash, head bytes. The every-asset pass that feeds
    * dedup/inventory without decoding anything.
    */
  def payloadStats(documents: DataFrame): DataFrame =
    documents
      .select(
        $"doc_id",
        length($"text".cast("binary")).cast("long").as("n_bytes"),
        md5($"text".cast("binary")).as("payload_md5"),
        // head sample is character-aligned (first 8 chars, UTF-8 encoded):
        // portable to the oracle engine, which cannot slice raw blobs
        hex(substring($"text", 1, 8).cast("binary")).as("head_hex"))
      .orderBy($"doc_id")

  /** Frame sampling: slice fixed-stride chunks ("frames") out of each
    * payload and fingerprint each — the video-keyframe / audio-window
    * access pattern as a lateral explode + codegen'd substring, one output
    * row per (asset, frame). Chunking is character-aligned so the oracle
    * (which cannot slice blobs) reproduces it exactly via text substring +
    * UTF-8 encode.
    */
  def frameSample(documents: DataFrame, frameChars: Int = 64, maxFrames: Int = 4): DataFrame =
    documents
      .select($"doc_id", $"text",
        explode(sequence(lit(0), greatest(least(
          floor((length($"text") - 1) / frameChars).cast("int"),
          lit(maxFrames - 1)), lit(0)))).as("frame_no"))
      .select(
        $"doc_id", $"text", $"frame_no".cast("long").as("frame_no"),
        ($"frame_no" * frameChars + 1).as("off"))
      .select(
        $"doc_id", $"frame_no",
        md5($"text".substr($"off", lit(frameChars)).cast("binary")).as("frame_md5"),
        length($"text".substr($"off", lit(frameChars)).cast("binary")).cast("long")
          .as("frame_bytes"))
      .orderBy($"doc_id", $"frame_no")

  /** STUB DECODER — deterministic fake standing in for a real image/audio
    * decode (libraries unavailable offline). Derives pseudo-dimensions and
    * a fake luminance from the bytes; a production build swaps only this
    * function for e.g. an ImageIO/ffmpeg call. Marked stub, never part of
    * any oracle check.
    */
  def stubDecode(payload: Array[Byte]): (Int, Int, Double) = {
    val n = payload.length
    val width = 16 + (if (n == 0) 0 else java.lang.Byte.toUnsignedInt(payload(0)) % 64)
    val height = 16 + (if (n < 2) 0 else java.lang.Byte.toUnsignedInt(payload(1)) % 64)
    val luma = if (n == 0) 0.0
      else payload.iterator.map(java.lang.Byte.toUnsignedInt(_).toDouble).sum / n / 255.0
    (width, height, luma)
  }

  /** Distributed decode + feature extraction over the payload column:
    * `mapPartitions` so a real decoder amortizes per-partition init (codec
    * contexts, model weights) across its batch — the Spark-side plumbing a
    * heavy decoder needs. Output is a typed Dataset with an explicit schema.
    */
  def decodeFeatures(documents: DataFrame): Dataset[AssetFeatures] = {
    val spark = documents.sparkSession
    import spark.implicits._
    withPayload(documents)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (stubbed)
        it.map { case (id, bytes) =>
          val (w, h, luma) = stubDecode(bytes)
          val sum = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          // floor(x·10⁴ + 0.5): identical IEEE ops in the SQL oracle,
          // unlike rint's half-even tie-break which SQL round() lacks
          AssetFeatures(id, bytes.length.toLong,
            sum.map("%02x".format(_)).mkString, w, h,
            math.floor(luma * 10000 + 0.5) / 10000)
        }
      }
  }
}
