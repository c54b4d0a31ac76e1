package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

/** CSV corpus ingest/export — the other wire format corpora and their
  * metadata tables ship in (alongside [[Jsonl]]). Same two 100 TB
  * stances: EXPLICIT schema (no inference pass over every byte) and
  * PERMISSIVE parse with the raw offending line quarantined in
  * [[Jsonl.CorruptCol]] rather than a FAILFAST death hours into a scan.
  *
  * CSV needs dialect pinning that JSONL doesn't — the writer and reader
  * here agree on one RFC-4180-style contract so round-trips are
  * byte-exact (CsvSpec pins each clause):
  *   - quotes escaped by DOUBLING (`escape = "` — Spark's default `\`
  *     escape is not what other CSV tooling emits);
  *   - NULL encoded as the token `\N` (the Hive convention) and the
  *     empty string as `""` — Spark's default maps BOTH to null on read,
  *     collapsing the distinction. The token is RESERVED: a literal
  *     field equal to `\N` reads back as NULL (quoting does not shield
  *     it — the match applies post-unquote), the standard trade every
  *     `\N` dialect makes;
  *   - embedded newlines survive via quoting, read back with
  *     `multiLine` — which makes a file one task, so the corpus-scale
  *     guidance is many files (the writer's one-file-per-partition
  *     layout) rather than one giant CSV; without embedded newlines
  *     `multiLine=false` keeps intra-file range splitting.
  */
object CsvCorpus {

  private val NullToken = "\\N"

  /** Write `df` as headered CSV in the pinned dialect. Spark's writer
    * trims field whitespace by default — disabled here, trailing spaces
    * are data.
    */
  def write(df: DataFrame, path: String): Unit =
    df.write
      .option("header", "true")
      .option("escape", "\"")
      .option("nullValue", NullToken)
      .option("emptyValue", "\"\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .mode("overwrite")
      .csv(path)

  /** Read a CSV tree with the given document schema; rows that fail to
    * parse (cast failures, column-count mismatch) carry the raw line in
    * [[Jsonl.CorruptCol]] with null data columns. `multiLine` must be
    * true when string fields may contain newlines.
    */
  def readCorpus(s: SparkSession, path: String, schema: StructType,
                 multiLine: Boolean = true): DataFrame = {
    require(!schema.fieldNames.contains(Jsonl.CorruptCol),
      s"document schema must not already contain ${Jsonl.CorruptCol}")
    s.read
      .schema(schema.add(Jsonl.CorruptCol, StringType))
      .option("header", "true")
      .option("escape", "\"")
      .option("nullValue", NullToken)
      .option("emptyValue", "")
      .option("multiLine", multiLine.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Jsonl.CorruptCol)
      .csv(path)
  }

  /** Successfully parsed rows, corrupt bookkeeping column dropped (same
    * SPARK-21610 caveat as [[Jsonl.clean]]).
    */
  def clean(parsed: DataFrame): DataFrame =
    parsed.where(col(Jsonl.CorruptCol).isNull).drop(Jsonl.CorruptCol)
}
