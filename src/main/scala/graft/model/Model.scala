package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Typed data model (SURVEY.md §1.1): the long-format raster cell — one row
  * per (variable, time, lat, lon) — that every raster operator consumes.
  * `DataFrame` stays the working currency (schemas are dynamic at the
  * boundaries), but `Dataset[GridCell]` is available wherever compile-time
  * field safety pays: custom per-partition logic, the streaming typed ops,
  * tests.
  */
case class GridCell(variable: String, time: java.time.LocalDateTime,
                    lat: Double, lon: Double, value: Double)

/** A document-corpus row (the LLM-pipeline extension tables). */
case class DocumentRow(doc_id: Long, text: String, lang: String,
                       source: String, n_chars: Long)

/** An embedding row; `embedding` is the fixture's `array<float>`. */
case class EmbeddingRow(vec_id: Long, embedding: Seq[Float], label: Int)

object Model {
  /** Typed view over a grid DataFrame (e.g. Raster.demoGrid output or the
    * partitioned store) — column order independent, fails fast on schema
    * drift instead of at first action.
    */
  def cells(grid: DataFrame): Dataset[GridCell] = {
    val spark = grid.sparkSession
    import spark.implicits._
    grid.select(col("variable"), col("time"), col("lat"), col("lon"), col("value"))
      .as[GridCell]
  }

  def documents(spark: SparkSession, dir: String): Dataset[DocumentRow] = {
    import spark.implicits._
    graft.sources.Tables(spark, dir, "documents").as[DocumentRow]
  }

  def embeddings(spark: SparkSession, dir: String): Dataset[EmbeddingRow] = {
    import spark.implicits._
    graft.sources.Tables(spark, dir, "embeddings").as[EmbeddingRow]
  }
}
