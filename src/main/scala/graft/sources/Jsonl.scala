package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL corpus ingest — the wire format LLM training corpora actually
  * ship in (one JSON document per line; the reference's JSON boundary is
  * whole-file state docs, src/cycle.js, but a corpus drop is line-oriented).
  *
  * Two deliberate choices for the 100 TB path:
  *   - EXPLICIT schema, never inference: schema inference is a full extra
  *     pass over every byte before the real read starts.
  *   - PERMISSIVE parse with the offending line captured in [[CorruptCol]]
  *     instead of failing the job: a real crawl drop always contains
  *     malformed lines, and a FAILFAST ingest dies hours into the scan.
  *     The corrupt rows stay queryable (count them, sample them, route
  *     them to quarantine) — dropping them is an explicit, auditable
  *     [[clean]] call, not a silent parser default.
  *
  * The line-oriented format splits on newlines, so Spark assigns file
  * ranges to tasks without any coordination — a single 1 TB .jsonl still
  * scans with full parallelism (unlike multiLine JSON, which is one task
  * per file).
  */
object Jsonl {

  /** Column that receives the raw line when parsing fails. */
  val CorruptCol = "_corrupt"

  /** Read a JSONL tree with the given document schema; rows that fail to
    * parse carry the raw line in [[CorruptCol]] and null data columns.
    */
  def readCorpus(s: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"document schema must not already contain $CorruptCol")
    s.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Successfully parsed rows, corrupt bookkeeping column dropped.
    *
    * @note Spark disallows plans whose raw-file scan is pruned down to
    *       ONLY the corrupt column (SPARK-21610) — so a bare
    *       `clean(df).count()` throws; count after selecting a data
    *       column, or cache the parsed frame first.
    */
  def clean(parsed: DataFrame): DataFrame =
    parsed.where(col(CorruptCol).isNull).drop(CorruptCol)

  /** The quarantine view: rows that failed to parse — raw line in
    * [[CorruptCol]], data columns null. The full row is kept deliberately:
    * Spark disallows queries that reference ONLY the internal corrupt
    * column over raw files (SPARK-21610) — cache first if you need a
    * lines-only projection.
    */
  def corrupt(parsed: DataFrame): DataFrame =
    parsed.where(col(CorruptCol).isNotNull)
}
