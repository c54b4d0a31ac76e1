package graft

import graft.model.{GridCell, Model}
import graft.operators.Raster

/** Typed model layer: Dataset[T] views bind by name with encoder-checked
  * schemas and interoperate with the DataFrame operators.
  */
class ModelSpec extends SparkSpec {
  import graft.implicits._

  test("cells: typed view over the demo grid round-trips values") {
    val grid = Raster.demoGrid(table("lineitem"))
    val ds = Model.cells(grid)
    val one = ds.filter((c: GridCell) => c.variable == "A").head()
    one.variable shouldBe "A"
    // the typed filter equals the Column filter
    ds.filter((c: GridCell) => c.lat > 0).count() shouldBe
      grid.where($"lat" > 0).count()
  }

  test("documents/embeddings typed readers expose fixture rows") {
    val docs = Model.documents(spark, sf0001)
    docs.head().n_chars should be > 0L
    val emb = Model.embeddings(spark, sf0001)
    emb.head().embedding.length shouldBe 64
  }
}
